"""Batch 94 planted tests: a planted one-sided burst must be detected with
exact counts, and the union-of-candidates guarantee must hold when the
changer is diluted across blocks (heavy in ONE window only)."""

import pandas as pd
import pytest

from omni_ray.pipelines.heavychange import _K, _mg_compress


def test_one_sided_burst_survives_its_windows_sketch():
    k = 10
    blocks = []
    n_a = 0
    for b in range(30):
        toks = [f"noise{b}_{i}" for i in range(200)] + ["burst"] * 30
        n_a += len(toks)
        blocks.append(_mg_compress(pd.Series(toks).value_counts(), k))
    merged = _mg_compress(pd.concat(blocks).groupby(level=0).sum(), k)
    assert "burst" in merged.index
    # and it IS a heavy changer vs an empty other window
    assert 30 * 30 * (k + 1) > n_a


@pytest.mark.usefixtures("ray_session")
def test_census_matches_exact_fulljoin():
    import duckdb

    from omni_ray.pipelines.heavychange import heavy_change_census

    got = heavy_change_census("/root/testdata/sf0.01").to_pandas()
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.01/documents.parquet')")
    want = con.sql(f"""
        WITH toks AS (SELECT doc_id % 2 AS w, unnest(regexp_extract_all(
            lower(coalesce(text, '')), '[a-z]+')) AS term FROM documents),
        counts AS (SELECT term,
            sum(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS n_a,
            sum(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS n_b
            FROM toks GROUP BY 1),
        tot AS (SELECT greatest(sum(CASE WHEN w=0 THEN 1 ELSE 0 END),
                                sum(CASE WHEN w=1 THEN 1 ELSE 0 END)) AS bar
                FROM toks)
        SELECT term FROM counts
        WHERE abs(n_a - n_b) * {_K + 1} > (SELECT bar FROM tot)
        ORDER BY term""").df()
    assert got["term"].tolist() == want["term"].tolist()
    assert len(got) > 0  # sf0.01 has real changers
    assert (got["abs_delta"] == (got["n_a"] - got["n_b"]).abs()).all()
