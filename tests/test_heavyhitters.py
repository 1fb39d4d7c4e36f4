"""Batch 93 planted tests: the MG compress/merge guarantee on adversarial
streams — no key with true freq > n/(k+1) may ever be lost."""

import pandas as pd
import pytest

from omni_ray.pipelines.heavyhitters import _K, _mg_compress


def test_compress_keeps_at_most_k_and_bounded_error():
    counts = pd.Series({f"w{i}": i + 1 for i in range(500)})
    out = _mg_compress(counts, k=10)
    assert len(out) <= 10
    # undercount is uniform and bounded by the (k+1)-th largest
    delta = sorted(counts, reverse=True)[10]
    for key, v in out.items():
        assert counts[key] - v == delta


def test_merged_summaries_never_lose_a_heavy_hitter():
    """Adversarial split: the heavy key is diluted across many blocks, each
    full of distinct noise, so naive per-block top-k would drop it."""
    k = 10
    blocks = []
    n_total = 0
    for b in range(40):
        toks = [f"noise{b}_{i}" for i in range(300)] + ["heavy"] * 40
        n_total += len(toks)
        blocks.append(_mg_compress(pd.Series(toks).value_counts(), k))
    merged = _mg_compress(
        pd.concat(blocks).groupby(level=0).sum(), k)
    true_heavy_count = 40 * 40
    assert true_heavy_count * (k + 1) > n_total  # it IS a heavy hitter
    assert "heavy" in merged.index  # ...and the sketch kept it


@pytest.mark.usefixtures("ray_session")
def test_output_is_exact_counts():
    import duckdb

    from omni_ray.pipelines.heavyhitters import mg_heavy_hitters

    got = mg_heavy_hitters("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    want = con.sql(f"""
        WITH toks AS (SELECT unnest(regexp_extract_all(
            lower(coalesce(text, '')), '[a-z]+')) AS term FROM documents)
        SELECT term, count(*) AS n FROM toks GROUP BY 1
        HAVING count(*) * {_K + 1} > (SELECT count(*) FROM toks)
        ORDER BY term""").df()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["n"].tolist() == want["n"].astype("int64").tolist()
