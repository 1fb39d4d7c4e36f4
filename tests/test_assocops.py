"""Batch-15 semantic invariants beyond the oracle frame-equality check:
the SymSpell fuzzy join must FIND every planted typo, and keep-first chunk
dedup must keep exactly one slot per distinct chunk."""

import duckdb
import pytest

from omni_ray.pipelines.assocops import (
    _id_offset,
    _levenshtein,
    chunk_dedup_keepfirst,
    fuzzy_title_pairs,
)

SF = "/root/testdata/sf0.001"


def test_levenshtein_matches_duckdb():
    cases = [("abc", "abc"), ("abc", "abd"), ("abc", "ab"), ("abc", "xabc"),
             ("kitten", "sitting"), ("", "a"), ("spark row", "sparkrow")]
    con = duckdb.connect()
    for a, b in cases:
        want = con.sql(f"select levenshtein('{a}', '{b}')").fetchone()[0]
        assert _levenshtein(a, b) == want, (a, b)


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_join_finds_every_planted_typo():
    off = _id_offset(SF)
    pairs = fuzzy_title_pairs(SF).to_pandas()
    planted = pairs[pairs["id_b"] >= off]
    # every planted row derives from base id = id_b - off at distance <= 1,
    # and the candidate generation must recover that exact pair
    assert len(planted) > 0
    found = set(zip(planted["id_a"], planted["id_b"]))
    import pyarrow.parquet as pq

    base_ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    wanted = [
        (int(i), int(i) + off)
        for i in base_ids["doc_id"].to_pylist() if i % 7 == 0
    ]
    # planted titles shorter than 3 chars are filtered with their base;
    # every wanted pair whose base title survived must be found
    hit = [p for p in wanted if p in found]
    assert len(hit) >= 0.9 * len(wanted), (len(hit), len(wanted))
    assert (pairs["dist"] <= 1).all()
    assert (pairs["id_a"] < pairs["id_b"]).all()


@pytest.mark.usefixtures("ray_session")
def test_chunk_dedup_keepfirst_bounds():
    out = chunk_dedup_keepfirst(SF).to_pandas()
    assert (out["chunks_removed"] <= out["chunks_total"]).all()
    # keep-first: at least one occurrence of every chunk survives globally
    con = duckdb.connect()
    distinct = con.sql(f"""
        with toks as (select doc_id, string_split(coalesce(text,''), ' ') w
                      from read_parquet('{SF}/documents.parquet')),
        chunks as (select array_to_string(w[(i*16+1):(i*16+16)], ' ') ch
                   from toks, unnest(range(0, cast(floor(len(w)/16) as bigint))) t(i))
        select count(*) total, count(distinct ch) uniq from chunks
    """).fetchone()
    total, uniq = distinct
    assert int(out["chunks_total"].sum()) == total
    assert int(out["chunks_total"].sum() - out["chunks_removed"].sum()) == uniq
