"""Driver-style oracle checks: every REGISTRY query vs its DuckDB SQL at
sf0.001 (fast) — row count, column names, and order-insensitive value frame
equality (mirrors the driver's sorted-column value-hash compare)."""

import duckdb
import pandas as pd
import pytest

from omni_ray.pipelines.assocops import ASSOCOPS_REGISTRY
from omni_ray.pipelines.corpusops import CORPUS_REGISTRY
from omni_ray.pipelines.engineops import ENGINEOPS_REGISTRY
from omni_ray.pipelines.graphops import GRAPH_REGISTRY
from omni_ray.pipelines.increment import INCREMENT_REGISTRY
from omni_ray.pipelines.mediaops import MEDIAOPS_REGISTRY
from omni_ray.pipelines.mlqueries import ML_REGISTRY
from omni_ray.pipelines.queries import REGISTRY
from omni_ray.pipelines.relscale import RELSCALE_REGISTRY
from omni_ray.pipelines.spandedup import SPANDEDUP_REGISTRY
from omni_ray.pipelines.statops import STATOPS_REGISTRY
from omni_ray.pipelines.trainprep import TRAINPREP_REGISTRY
from omni_ray.pipelines.curation import CURATION_REGISTRY
from omni_ray.pipelines.mixgraph import MIXGRAPH_REGISTRY
from omni_ray.pipelines.vecsketch import VECSKETCH_REGISTRY
from omni_ray.pipelines.webqa import WEBQA_REGISTRY
from omni_ray.pipelines.webscaleops import WEBSCALE_REGISTRY

ALL = {**REGISTRY, **ML_REGISTRY, **CORPUS_REGISTRY, **TRAINPREP_REGISTRY,
       **GRAPH_REGISTRY, **RELSCALE_REGISTRY, **STATOPS_REGISTRY,
       **MEDIAOPS_REGISTRY, **ENGINEOPS_REGISTRY, **SPANDEDUP_REGISTRY,
       **WEBSCALE_REGISTRY, **WEBQA_REGISTRY, **CURATION_REGISTRY,
       **MIXGRAPH_REGISTRY, **VECSKETCH_REGISTRY, **ASSOCOPS_REGISTRY,
       **INCREMENT_REGISTRY}

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif not pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(str)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(name):
    fn, sql = ALL[name]
    got = fn(SF)
    got_df = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    want_df = oracle(sql)
    assert sorted(got_df.columns) == sorted(want_df.columns), (
        f"{name}: columns {sorted(got_df.columns)} != {sorted(want_df.columns)}"
    )
    assert len(got_df) == len(want_df), f"{name}: {len(got_df)} rows != {len(want_df)}"
    g, w = normalize(got_df), normalize(want_df)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, obj=name)


@pytest.mark.usefixtures("ray_session")
def test_pmi_distributed_path_equals_driver_path():
    """pmi_top_pairs picks the driver finalize below small_side_max and the
    word-bucketed distributed lookup above it; both must be bit-identical."""
    from omni_ray.pipelines.engineops import pmi_top_pairs

    small = pmi_top_pairs(SF).to_pandas()
    forced = pmi_top_pairs(SF, small_side_max=0).to_pandas()
    pd.testing.assert_frame_equal(
        normalize(small), normalize(forced), check_dtype=False,
        obj="pmi path equivalence")


@pytest.mark.usefixtures("ray_session")
def test_triangle_broadcast_path_equals_join_path(monkeypatch):
    """triangle_count closes wedges against a broadcast sorted edge-key
    array below _TRI_EDGE_BCAST_MAX and via a distributed wedge⋈edge hash
    join above it; both paths must produce the identical census."""
    import omni_ray.pipelines.statops as statops

    bcast = statops.triangle_count(SF).to_pydict()
    monkeypatch.setattr(statops, "_TRI_EDGE_BCAST_MAX", 0)
    joined = statops.triangle_count(SF).to_pydict()
    assert bcast == joined
    assert bcast["n_triangles"][0] > 0  # non-degenerate census


@pytest.mark.usefixtures("ray_session")
def test_unigram_logprob_broadcast_equals_join():
    """unigram_logprob broadcasts the LM below small_side_max and hash-joins
    above it; both paths must score every document identically."""
    from omni_ray.pipelines.corpusops import unigram_logprob

    small = unigram_logprob(SF).to_pandas()
    forced = unigram_logprob(SF, small_side_max=0).to_pandas()
    pd.testing.assert_frame_equal(
        normalize(small), normalize(forced), check_dtype=False,
        obj="unigram_logprob path equivalence")


@pytest.mark.usefixtures("ray_session")
def test_pagerank_broadcast_path_equals_join_path(monkeypatch):
    """pagerank_topk broadcasts the dense rank vector below
    _PR_BCAST_MAX_NODES and re-derives ranks through the join shuffle above
    it; both regimes must produce the identical integer top-20."""
    import omni_ray.pipelines.graphops as graphops

    bcast = graphops.pagerank_topk(SF).reset_index(drop=True)
    monkeypatch.setattr(graphops, "_PR_BCAST_MAX_NODES", 0)
    joined = graphops.pagerank_topk(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        normalize(bcast), normalize(joined), check_dtype=False,
        obj="pagerank path equivalence")


@pytest.mark.usefixtures("ray_session")
def test_label_prop_broadcast_path_equals_dataset_path(monkeypatch):
    """label_propagation_2r broadcasts the dense label vector below
    _LP_BCAST_MAX_NODES and keeps labels a Dataset through two bucketed
    shuffles per superstep above it; both regimes must produce the
    identical label census."""
    import omni_ray.pipelines.mixgraph as mixgraph

    bcast = mixgraph.label_propagation_2r(SF).to_pydict()
    monkeypatch.setattr(mixgraph, "_LP_BCAST_MAX_NODES", 0)
    dataset = mixgraph.label_propagation_2r(SF).to_pydict()
    assert bcast == dataset
    assert sum(bcast["n_nodes"]) > 0


@pytest.mark.usefixtures("ray_session")
def test_hits_broadcast_path_equals_join_path(monkeypatch):
    """hits_topk mirrors pagerank's regime auto-switch: the dense-vector
    broadcast fold below _PR_BCAST_MAX_NODES and the edges⋈scores superstep
    join above it must produce the identical integer top-20."""
    import omni_ray.pipelines.graphops as graphops
    import omni_ray.pipelines.webscaleops as webscaleops

    bcast = webscaleops.hits_topk(SF).reset_index(drop=True)
    monkeypatch.setattr(graphops, "_PR_BCAST_MAX_NODES", 0)
    joined = webscaleops.hits_topk(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        normalize(bcast), normalize(joined), check_dtype=False,
        obj="hits path equivalence")


@pytest.mark.usefixtures("ray_session")
def test_crawl_host_report_matches_real_schedule():
    """crawl_host_report predicts per-host wave counts arithmetically from
    the frontier-deduped seed universe; the REAL crawl loop
    (crawl_schedule_core) must agree: max(wave)+1 per host == n_waves."""
    from omni_ray.pipelines.mlqueries import (crawl_host_report,
                                              crawl_schedule_core)

    report = crawl_host_report(SF).to_pandas().set_index("host")
    sched = crawl_schedule_core(SF).to_pandas()
    real = sched.groupby("host")["wave"].max() + 1
    for host, waves in real.items():
        assert report.loc[host, "n_waves"] == waves, host
    assert (report["n_urls"] >= report["budget"] * (report["n_waves"] - 1)).all()


@pytest.mark.usefixtures("ray_session")
def test_hll_accuracy_vs_exact():
    """The HLL raw estimator must land near the true distinct (user, day)
    count. At sf0.001 fill (n/m ≈ 1.5) the uncorrected estimator is in its
    biased low-load regime, so the bound is loose; the oracle test already
    pins the registers and estimate bit-for-bit."""
    from omni_ray.pipelines.trainprep import hll_user_days

    est = hll_user_days(SF).to_pydict()["est_user_days"][0]
    exact = int(oracle(
        "SELECT count(DISTINCT user_id * 1000000 + "
        "epoch_us(ts) // 86400000000) AS n FROM events").iloc[0, 0])
    assert abs(est - exact) / exact < 0.30, (est, exact)


@pytest.mark.usefixtures("ray_session")
def test_kmeans_lloyd_invariants():
    """Full Lloyd's loop: every vector assigned exactly once in the final
    pass, inertia must not increase vs the one-step assignment (two
    re-centerings can only improve or hold the integer objective), and the
    per-cluster summary covers only the K seeded centroid ids."""
    from omni_ray.pipelines.corpusops import kmeans_assign, kmeans_lloyd

    sf = "/root/testdata/sf0.001"
    out = kmeans_lloyd(sf).to_pandas()
    one = kmeans_assign(sf).to_pandas()
    assert out["n_members"].sum() == len(one)  # every vector, exactly once
    assert set(out["cluster"]).issubset(set(range(8)))
    assert int(out["inertia_q"].sum()) <= int(one["dist_q"].sum())
