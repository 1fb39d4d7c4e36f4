"""WARC codec invariants: framing survives adversarial bodies (binary
payloads containing 'WARC/1.0' and CRLF-CRLF sentinels — Content-Length
slicing, not sentinel splitting), truncation is detected, multi-record
streams parse in order, and the sharded sink round-trips through the Ray
datasource."""

import pytest

from omni_ray.sources.warcfiles import (
    build_warc_record,
    parse_warc_stream,
    read_warc,
    write_warc_shards,
)


def test_adversarial_bodies():
    evil = b"<html>WARC/1.0\r\n\r\nWARC-Type: response\r\n\r\n</html>"
    rec = build_warc_record("http://x.test/a", 1_700_000_000_000_000, evil)
    [(h, st, hh, body)] = list(parse_warc_stream(rec))
    assert body == evil
    assert st == 200
    assert h["WARC-Target-URI"] == "http://x.test/a"
    assert hh["Content-Type"] == "text/html"


def test_multi_record_and_truncation():
    r1 = build_warc_record("http://x.test/1", 1_700_000_000_000_000, b"one")
    r2 = build_warc_record("http://x.test/2", 1_700_000_001_000_000,
                           b"twotwo", status=404)
    recs = list(parse_warc_stream(r1 + r2))
    assert [r[3] for r in recs] == [b"one", b"twotwo"]
    assert [r[1] for r in recs] == [200, 404]
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_stream((r1 + r2)[:-20]))
    with pytest.raises(ValueError, match="bad WARC version"):
        list(parse_warc_stream(b"NOPE/9.9\r\n\r\n"))


@pytest.mark.usefixtures("ray_session")
def test_sharded_roundtrip(tmp_path):
    import pandas as pd
    import ray.data

    n = 50
    df = pd.DataFrame({
        "doc_id": range(n),
        "url": [f"http://h{i % 3}.test/p{i}" for i in range(n)],
        "ts_us": [1_700_000_000_000_000 + i for i in range(n)],
        "payload": [f"body-{i}".encode() * (i % 5 + 1) for i in range(n)],
        "status": [200] * n,
    })
    ds = ray.data.from_pandas(df)
    assert write_warc_shards(ds, str(tmp_path), "doc_id", n_shards=8) == 8
    back = read_warc(str(tmp_path)).to_pandas()
    assert len(back) == n
    got = dict(zip(back["url"], back["payload"]))
    want = dict(zip(df["url"], df["payload"]))
    assert got == want
    assert (back["http_status"] == 200).all()
