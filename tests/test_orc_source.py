"""ORC source/sink: roundtrip fidelity, shard determinism, clean schemas."""

import os

import pyarrow as pa
import pyarrow.orc as orc
import pytest

from omni_ray.sources.orcfiles import read_orc, write_orc_shards

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_orc_roundtrip_preserves_rows(tmp_path):
    from omni_ray.pipelines.queries import _read

    out = str(tmp_path / "orc")
    ds = _read(SF, "documents", columns=["doc_id", "source", "n_chars"])
    n_shards = write_orc_shards(ds, out, "doc_id", n_shards=8)
    assert n_shards == 8

    back = read_orc(out)
    a = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b[a.columns])


@pytest.mark.usefixtures("ray_session")
def test_orc_shards_are_deterministic(tmp_path):
    """Same input ⇒ byte-identical shards (the resume/re-run contract)."""
    from omni_ray.pipelines.queries import _read

    ds = _read(SF, "documents", columns=["doc_id", "n_chars"])
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_orc_shards(ds, d1, "doc_id", n_shards=4)
    write_orc_shards(ds, d2, "doc_id", n_shards=4)
    for f in sorted(os.listdir(d1)):
        assert open(os.path.join(d1, f), "rb").read() == \
            open(os.path.join(d2, f), "rb").read()


@pytest.mark.usefixtures("ray_session")
def test_orc_blocks_are_clean_and_stripe_streamed(tmp_path):
    """Blocks come out schema-metadata-free, one per stripe."""
    p = str(tmp_path / "multi.orc")
    t = pa.table({"x": list(range(10_000)), "y": ["s"] * 10_000})
    # small stripes force nstripes > 1 → multiple streamed blocks
    orc.write_table(t, p, stripe_size=16 * 1024)
    assert orc.ORCFile(p).nstripes > 1

    ds = read_orc(p)
    dirty = int(
        ds.map_batches(
            lambda b: pa.table({"bad": [1 if b.schema.metadata else 0]}),
            batch_format="pyarrow",
        ).to_pandas()["bad"].sum()
    )
    assert dirty == 0
    assert ds.count() == 10_000


@pytest.mark.usefixtures("ray_session")
def test_orc_reader_ignores_tmp_leftovers(tmp_path):
    """A killed writer's .orc.tmp file must be invisible to read_orc — the
    reader-side half of the sink's tmp+rename atomicity contract."""
    d = str(tmp_path / "orc")
    os.makedirs(d)
    orc.write_table(pa.table({"x": [1, 2]}), os.path.join(d, "shard-0000.orc"))
    orc.write_table(pa.table({"x": [99]}),
                    os.path.join(d, ".shard-0001.orc.tmp"))
    got = sorted(read_orc(d).to_pandas()["x"].tolist())
    assert got == [1, 2]
