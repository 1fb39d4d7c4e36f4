"""Batch 90 planted tests: the framing closed form matches the real builder
byte-for-byte (incl. multibyte payloads), build_cdx offsets slice records
exactly, and the census tiles every shard file."""

from omni_ray.sources.warcfiles import build_cdx, build_warc_record


def _formula(url: str, payload: bytes) -> int:
    n = len(payload)
    http_len = 62 + len(str(n)) + n
    return 153 + len(url) + len(str(http_len)) + http_len + 4


def test_formula_matches_builder_bytes():
    cases = [
        ("https://w0.example.org/doc/0", b""),
        ("https://w3.example.org/doc/123", "héllo wörld".encode()),
        ("https://w6.example.org/doc/999999", b"x" * 10_000),
        ("https://w1.example.org/doc/7", b"\r\n\r\nWARC/1.0\r\n"),  # sentinel
    ]
    for url, payload in cases:
        rec = build_warc_record(url, 1_700_000_000_000_000, payload)
        assert len(rec) == _formula(url, payload), url


def test_cdx_offsets_slice_whole_records():
    recs = [
        build_warc_record(f"https://w{i}.example.org/doc/{i}",
                          1_700_000_000_000_000, f"body-{i}".encode() * (i + 1))
        for i in range(5)
    ]
    data = b"".join(recs)
    idx = build_cdx(data)
    assert [u for u, _o, _l in idx] == [
        f"https://w{i}.example.org/doc/{i}" for i in range(5)]
    pos = 0
    for (u, off, ln), rec in zip(idx, recs):
        assert off == pos and ln == len(rec)
        assert data[off:off + ln] == rec  # offset+length slices one record
        pos += ln
    assert pos == len(data)


def test_census_internal_tiling(ray_session):
    from omni_ray.pipelines.cdxops import warc_cdx_census

    t = warc_cdx_census("/root/testdata/sf0.001").to_pandas()
    assert len(t) == 8
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet").num_rows
    assert t["n_records"].sum() == n_docs
    assert (t["max_record_len"] <= t["file_bytes"]).all()
