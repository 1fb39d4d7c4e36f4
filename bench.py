"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) at $RAY_GRAFT_CPUS (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "throughput": {"crawl_urls_per_s": ..., "articles_pages_per_s": ...}}

--scaling: runs the same bench twice in FRESH subprocesses at 8 and 32 CPUs
on identical input (the sandbox proxy for N vs 4N nodes) and reports both
plus scaling efficiency; appends the result to BASELINE.md by hand (see
BASELINE.md table).

This file owns its Ray session (the driver contract in __ray_entry__.py does
not init Ray).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# pages universe size per sf (generated once, cached under /tmp by manifest)
PAGES_N = {"0.001": 400, "0.01": 1200, "0.1": 8000}


def _sf_tag(sf_dir: str) -> str:
    for tag in ("0.001", "0.01", "0.1"):
        if sf_dir.rstrip("/").endswith(f"sf{tag}"):
            return tag
    return "0.1"


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data

    from omni_ray.pipelines import queries as Q
    from omni_ray.pipelines.articles import article_pipeline
    from omni_ray.pipelines.crawl import run_crawl
    from omni_ray.sources.pages import write_pages_dataset

    sf = _sf_tag(SF_DIR)
    n_pages = PAGES_N[sf]
    pages_base = os.path.join("/tmp", f"omni_ray_bench_pages_{n_pages}")
    write_pages_dataset(pages_base, n_rows=n_pages, seed=42, n_buckets=16, parallel=True)

    # untimed warmup: spin up the worker pool and warm the page cache with a
    # read + map + shuffle so timings measure compute, not process startup
    from ray.data.aggregate import Count as _Count

    from omni_ray.pipelines.queries import _read as _clean_read

    warm = _clean_read(SF_DIR, "lineitem", columns=["l_returnflag", "l_quantity"])
    warm.map_batches(lambda t: t, batch_format="pyarrow").groupby("l_returnflag").aggregate(
        _Count()
    ).count()

    timings: dict[str, float] = {}
    throughput: dict[str, float] = {}
    headline_reps: dict[str, list] = {}
    op_reps: dict[str, list] = {}

    def timed(name, fn):
        # best-of-2 for EVERY op, not only the headliners: the shared host
        # shows uniform 1.5-3x inflation in bad windows (one observed run:
        # pagerank 7->23 s, triangle 9->18 s with zero code change), and a
        # single-shot suite total would read as a regression. Peak capacity
        # is the honest per-op signal here; raw pairs kept alongside.
        best_out, best_t = None, float("inf")
        raw = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            raw.append(round(dt, 3))
            if dt < best_t:
                best_out, best_t = out, dt
        timings[name] = round(best_t, 3)
        op_reps[name] = raw
        return best_out

    def timed_best(name, fn, reps=2):
        # headline variance guard: the sandbox host is SHARED and shows 2-3×
        # swings between identical back-to-back runs — record peak capacity
        # (best of `reps`) for the headline pipelines so host-noise artifacts
        # can't masquerade as regressions; per-rep times kept alongside
        best_out, best_t = None, float("inf")
        raw = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            raw.append(round(dt, 3))
            if dt < best_t:
                best_out, best_t = out, dt
        timings[name] = round(best_t, 3)
        headline_reps[name] = raw
        return best_out

    # 1) headline: full article pipeline over the pages universe (M1-M22)
    def bench_articles():
        import shutil

        out_dir = "/tmp/omni_ray_bench_articles"
        shutil.rmtree(out_dir, ignore_errors=True)
        # prune at the read: the pipeline needs 4 of the store's 7 columns
        # (`text` is the generation-time oracle, never an input)
        ds = ray.data.read_parquet(
            f"{pages_base}/pages", columns=["url", "warc_ts", "html", "lang"]
        )
        article_pipeline(ds).write_parquet(out_dir)

    timed_best("articles_pipeline", bench_articles)
    throughput["articles_pages_per_s"] = round(n_pages / timings["articles_pipeline"], 1)

    # 2) headline: frontier crawl loop (dedup + politeness + fetch + extract)
    def bench_crawl():
        import shutil

        out_dir = "/tmp/omni_ray_bench_crawl"
        shutil.rmtree(out_dir, ignore_errors=True)
        return run_crawl(
            pages_dir=f"{pages_base}/pages",
            seeds_path=f"{pages_base}/seeds.parquet",
            out_dir=out_dir,
            budget_per_host=max(64, n_pages // 50),
            n_buckets=16,
            n_seen_shards=4,
        )

    totals = timed_best("crawl_loop", bench_crawl)
    throughput["crawl_urls_per_s"] = round(
        totals.get("scheduled", 0) / timings["crawl_loop"], 1
    )

    # 3) relational + ML operators over the provided sf tables
    for name in [
        "q1_pricing_summary", "global_stats", "per_category_rollup",
        "daily_type_matrix", "nation_revenue", "exact_dedup",
        "last_event_per_user", "window_tumbling", "sessionize",
        "multi_field_search", "search_analytics",
        "asof_join_attribution", "range_join_windows",
        "anti_join_customers", "segment_quantiles",
        "order_revenue_topk", "top3_orders_per_customer",
        "running_total_per_user",
    ]:
        fn, _sql = Q.REGISTRY[name]
        timed(name, lambda f=fn: f(SF_DIR))

    from omni_ray.pipelines.mlqueries import ML_REGISTRY, ML_ROWS_ONLY

    timed("knn_bruteforce", lambda: ML_REGISTRY["knn_bruteforce"][0](SF_DIR))
    timed("minhash_dedup", lambda: ML_REGISTRY["minhash_dedup"][0](SF_DIR))
    timed("simhash_dedup", lambda: ML_REGISTRY["simhash_dedup"][0](SF_DIR))
    timed("embedding_neardup", lambda: ML_REGISTRY["embedding_neardup"][0](SF_DIR))
    timed("text_stats", lambda: ML_ROWS_ONLY["text_stats"](SF_DIR).count())
    timed("knn_lsh", lambda: ML_ROWS_ONLY["knn_lsh"](SF_DIR))
    timed("knn_ivf", lambda: ML_ROWS_ONLY["knn_ivf"](SF_DIR))
    timed("quality_filter", lambda: ML_REGISTRY["quality_filter"][0](SF_DIR).count())
    timed("decontaminate", lambda: ML_REGISTRY["decontaminate"][0](SF_DIR).count())
    timed("training_corpus_pipeline",
          lambda: ML_REGISTRY["training_corpus_pipeline"][0](SF_DIR).num_rows)
    timed("duplicate_of", lambda: ML_REGISTRY["duplicate_of"][0](SF_DIR).count())

    from omni_ray.pipelines.spandedup import SPANDEDUP_REGISTRY

    timed("dup_span_removal",
          lambda: SPANDEDUP_REGISTRY["dup_span_removal"][0](SF_DIR).count())
    timed("semdedup_prune",
          lambda: SPANDEDUP_REGISTRY["semdedup_prune"][0](SF_DIR).count())

    from omni_ray.pipelines.trainprep import TRAINPREP_REGISTRY

    timed("shuffle_shard_assign",
          lambda: TRAINPREP_REGISTRY["shuffle_shard_assign"][0](SF_DIR).count())
    timed("tfidf_top_terms", lambda: ML_REGISTRY["tfidf_top_terms"][0](SF_DIR).num_rows)
    timed("pii_scan", lambda: ML_REGISTRY["pii_scan"][0](SF_DIR).count())
    timed("bigram_top_terms", lambda: ML_REGISTRY["bigram_top_terms"][0](SF_DIR).num_rows)
    timed("dedup_keep_best", lambda: ML_REGISTRY["dedup_keep_best"][0](SF_DIR).num_rows)

    from omni_ray.pipelines.corpusops import CORPUS_REGISTRY

    timed("fingerprint_pairs",
          lambda: CORPUS_REGISTRY["fingerprint_pairs"][0](SF_DIR).num_rows)
    timed("unigram_logprob",
          lambda: CORPUS_REGISTRY["unigram_logprob"][0](SF_DIR).num_rows)
    timed("kmeans_assign",
          lambda: CORPUS_REGISTRY["kmeans_assign"][0](SF_DIR).count())
    timed("kmeans_lloyd",
          lambda: CORPUS_REGISTRY["kmeans_lloyd"][0](SF_DIR).num_rows)
    timed("source_overlap_matrix",
          lambda: CORPUS_REGISTRY["source_overlap_matrix"][0](SF_DIR).num_rows)

    from omni_ray.pipelines.trainprep import TRAINPREP_REGISTRY

    timed("doc_pack",
          lambda: TRAINPREP_REGISTRY["doc_pack"][0](SF_DIR).num_rows)
    timed("boilerplate_segments",
          lambda: TRAINPREP_REGISTRY["boilerplate_segments"][0](SF_DIR).num_rows)
    timed("kmv_distinct_users",
          lambda: TRAINPREP_REGISTRY["kmv_distinct_users"][0](SF_DIR).num_rows)
    timed("hopping_window",
          lambda: TRAINPREP_REGISTRY["hopping_window"][0](SF_DIR).num_rows)
    timed("inverted_index_topk",
          lambda: TRAINPREP_REGISTRY["inverted_index_topk"][0](SF_DIR).num_rows)
    timed("char_entropy",
          lambda: TRAINPREP_REGISTRY["char_entropy"][0](SF_DIR).num_rows)
    timed("hll_user_days",
          lambda: TRAINPREP_REGISTRY["hll_user_days"][0](SF_DIR).num_rows)
    timed("truncation_loss",
          lambda: TRAINPREP_REGISTRY["truncation_loss"][0](SF_DIR).num_rows)
    timed("sq8_quant_stats",
          lambda: CORPUS_REGISTRY["sq8_quant_stats"][0](SF_DIR).num_rows)
    timed("dedup_savings",
          lambda: CORPUS_REGISTRY["dedup_savings"][0](SF_DIR).num_rows)

    from omni_ray.pipelines.graphops import GRAPH_REGISTRY

    # iterative-shuffle (k rounds of join+groupby) and two-pass sketch shapes
    timed("pagerank_topk",
          lambda: GRAPH_REGISTRY["pagerank_topk"][0](SF_DIR))
    timed("heavy_hitters",
          lambda: GRAPH_REGISTRY["heavy_hitters"][0](SF_DIR))

    from omni_ray.pipelines.statops import STATOPS_REGISTRY

    # round-3-late batches: chunker (zero-shuffle explode), co-occurrence
    # graph census (bucketed self-merge + wedge join), sliding distinct,
    # watermark scan, multimodal plumbing
    timed("chunk_documents",
          lambda: STATOPS_REGISTRY["chunk_documents"][0](SF_DIR).num_rows)
    timed("triangle_count",
          lambda: STATOPS_REGISTRY["triangle_count"][0](SF_DIR).num_rows)
    timed("rolling_dau_7d",
          lambda: STATOPS_REGISTRY["rolling_dau_7d"][0](SF_DIR).num_rows)
    timed("late_events",
          lambda: STATOPS_REGISTRY["late_events"][0](SF_DIR).num_rows)
    timed("media_pipeline_stats",
          lambda: ML_REGISTRY["media_pipeline_stats"][0](SF_DIR).num_rows)

    from omni_ray.pipelines.mediaops import MEDIAOPS_REGISTRY

    timed("audio_chunks",
          lambda: MEDIAOPS_REGISTRY["audio_chunks"][0](SF_DIR).num_rows)
    timed("frame_sample_index",
          lambda: MEDIAOPS_REGISTRY["frame_sample_index"][0](SF_DIR).num_rows)

    from omni_ray.pipelines.engineops import ENGINEOPS_REGISTRY

    # classic-engine batch: MERGE (union + keep-last combiner + key shuffle)
    # and PMI (two count combiners + word-hash lookup + pair regroup) are the
    # two shuffle-heavy representatives
    timed("merge_upsert_snapshot",
          lambda: ENGINEOPS_REGISTRY["merge_upsert_snapshot"][0](SF_DIR).num_rows)
    timed("pmi_top_pairs",
          lambda: ENGINEOPS_REGISTRY["pmi_top_pairs"][0](SF_DIR).num_rows)

    from omni_ray.pipelines.webscaleops import WEBSCALE_REGISTRY

    # web-scale batch 6: per-language LM banding (two row-domain bucketed
    # aggregates) and RRF fusion (two pruned retrieval arms) are the
    # representative costs; the rest of the batch is bounded-groupby cheap
    timed("ccnet_ppl_buckets",
          lambda: WEBSCALE_REGISTRY["ccnet_ppl_buckets"][0](SF_DIR).num_rows)
    timed("rrf_fusion",
          lambda: WEBSCALE_REGISTRY["rrf_fusion"][0](SF_DIR).num_rows)
    timed("hll_users_by_type",
          lambda: WEBSCALE_REGISTRY["hll_users_by_type"][0](SF_DIR).num_rows)
    timed("recrawl_schedule",
          lambda: WEBSCALE_REGISTRY["recrawl_schedule"][0](SF_DIR).num_rows)
    timed("bm25_topk",
          lambda: WEBSCALE_REGISTRY["bm25_topk"][0](SF_DIR).num_rows)

    # batch 9: anchor aggregation (one bucketed dst shuffle over 3n edge
    # rows) and split leakage (fp-domain bucketed indicator fold) are the
    # representative costs; HITS is 12 broadcast half-folds over 3n edges
    timed("anchor_text_agg",
          lambda: WEBSCALE_REGISTRY["anchor_text_agg"][0](SF_DIR).num_rows)
    timed("split_leakage",
          lambda: WEBSCALE_REGISTRY["split_leakage"][0](SF_DIR).num_rows)
    timed("hits_topk",
          lambda: len(WEBSCALE_REGISTRY["hits_topk"][0](SF_DIR)))

    # batch 10: the funnel report (two bounded aggs + one combiner-pruned
    # content-hash shuffle) and the planted-dup audit (a full strict
    # minhash run over a 1.04x corpus) are the representative costs
    timed("token_yield_report",
          lambda: WEBSCALE_REGISTRY["token_yield_report"][0](SF_DIR).num_rows)
    timed("minhash_recall_planted",
          lambda: WEBSCALE_REGISTRY["minhash_recall_planted"][0](SF_DIR).num_rows)

    # batch 11: the mixture-divergence fold (one bucketed term shuffle with
    # in-bucket corpus-count recovery) and the canonicalizer audit (a
    # urlsplit-heavy map + one canonical-key shuffle) are the new costs
    from omni_ray.pipelines.webqa import WEBQA_REGISTRY
    timed("js_divergence_sources",
          lambda: WEBQA_REGISTRY["js_divergence_sources"][0](SF_DIR).num_rows)
    timed("url_canonical_collisions",
          lambda: WEBQA_REGISTRY["url_canonical_collisions"][0](SF_DIR).num_rows)

    # batch 12: redirect resolution (7 pointer-doubling supersteps, each one
    # bucketed shuffle of the tagged 2n-row state) and DSIR importance
    # weighting (bounded bucket-count fold + zero-shuffle scoring pass)
    from omni_ray.pipelines.curation import CURATION_REGISTRY
    timed("redirect_resolve",
          lambda: CURATION_REGISTRY["redirect_resolve"][0](SF_DIR).num_rows)
    timed("dsir_weights",
          lambda: CURATION_REGISTRY["dsir_weights"][0](SF_DIR).num_rows)

    # batch 13: the WCC census (hash-to-min propagation over a data-derived
    # sparse edge forest, O(log n) bucketed rounds) and the corpus-common
    # shingle ratio (one shingle-keyed shuffle + one bucketed doc-id sum)
    # are the representative costs; label_propagation_2r rides the
    # broadcast regime at this scale
    from omni_ray.pipelines.mixgraph import MIXGRAPH_REGISTRY
    timed("wcc_sizes",
          lambda: MIXGRAPH_REGISTRY["wcc_sizes"][0](SF_DIR).num_rows)
    timed("common_shingle_ratio",
          lambda: MIXGRAPH_REGISTRY["common_shingle_ratio"][0](SF_DIR).num_rows)
    timed("label_propagation_2r",
          lambda: MIXGRAPH_REGISTRY["label_propagation_2r"][0](SF_DIR).num_rows)

    # batch 14: the CMS frequency audit (term-count combiner + bounded
    # 4096-cell fold + bucketed exact top-k) and the PQ census (broadcast
    # codebook, one zero-shuffle assignment pass) are the new costs
    from omni_ray.pipelines.vecsketch import VECSKETCH_REGISTRY
    timed("cms_freq_audit",
          lambda: VECSKETCH_REGISTRY["cms_freq_audit"][0](SF_DIR).num_rows)
    timed("pq_recon_error",
          lambda: VECSKETCH_REGISTRY["pq_recon_error"][0](SF_DIR).num_rows)

    # batch 15: keep-first chunk dedup (one digest-keyed bucketed shuffle,
    # in-bucket keeper election) and the SymSpell fuzzy title join (variant
    # explosion → equality-keyed shuffle → in-bucket Levenshtein verify →
    # pair-distinct fold) are the representative costs
    from omni_ray.pipelines.assocops import ASSOCOPS_REGISTRY
    timed("chunk_dedup_keepfirst",
          lambda: ASSOCOPS_REGISTRY["chunk_dedup_keepfirst"][0](SF_DIR).count())
    timed("fuzzy_title_pairs",
          lambda: ASSOCOPS_REGISTRY["fuzzy_title_pairs"][0](SF_DIR).count())

    # batch 16: incremental crawl dedup (one fingerprint-keyed bucketed
    # shuffle with in-bucket base/delta flagging) and the per-(user,day)
    # rate-cap audit (user-bucketed window rank + bounded top-k)
    from omni_ray.pipelines.increment import INCREMENT_REGISTRY
    timed("incremental_dedup_delta",
          lambda: INCREMENT_REGISTRY["incremental_dedup_delta"][0](SF_DIR).count())
    timed("rate_limit_violations",
          lambda: INCREMENT_REGISTRY["rate_limit_violations"][0](SF_DIR).count())

    # batch 17: the KMV set-difference audit (events-table hash map + ONE
    # per-user bucketed flag fold beside the O(k) sketch finalize) and
    # seeded PageRank (3 bucketed inflow rounds over the derived graph)
    from omni_ray.pipelines.estmine import ESTMINE_REGISTRY
    timed("kmv_anotb_audit",
          lambda: ESTMINE_REGISTRY["kmv_anotb_audit"][0](SF_DIR).num_rows)
    timed("ppr_seeded",
          lambda: len(ESTMINE_REGISTRY["ppr_seeded"][0](SF_DIR)))

    # batch 18: the k-anonymity audit (one QI-group bucketed shuffle +
    # bounded per-nation rollup) and FD profiling (4x row explosion
    # through two bucketed distinct-census folds) are the new costs
    from omni_ray.pipelines.governance import GOVERNANCE_REGISTRY
    timed("kanon_violations",
          lambda: GOVERNANCE_REGISTRY["kanon_violations"][0](SF_DIR).count())
    timed("fd_violation_audit",
          lambda: GOVERNANCE_REGISTRY["fd_violation_audit"][0](SF_DIR).count())

    # batch 19: the join-size audit (side-tagged count fold over 165k keys,
    # the join never runs) and fanout distribution (same fold + bounded
    # histogram) are the representative costs
    from omni_ray.pipelines.planstats import PLANSTATS_REGISTRY
    timed("join_size_audit",
          lambda: PLANSTATS_REGISTRY["join_size_audit"][0](SF_DIR).num_rows)
    timed("cardinality_fanout_audit",
          lambda: PLANSTATS_REGISTRY["cardinality_fanout_audit"][0](SF_DIR).count())

    # batch 20: significant terms (per-doc distinct tokenize + one
    # term-keyed bucketed fg/bg fold + slice-sized top-k) and bib coupling
    # (dst-keyed shuffle, in-degree-bounded pair expansion, pair fold)
    from omni_ray.pipelines.searchx import SEARCHX_REGISTRY
    timed("significant_terms",
          lambda: SEARCHX_REGISTRY["significant_terms"][0](SF_DIR).count())
    timed("bib_coupling_topk",
          lambda: SEARCHX_REGISTRY["bib_coupling_topk"][0](SF_DIR).count())

    # batch 21: the growth ledger (one user-bucketed shuffle, in-bucket
    # vectorized self-merges, bounded week fold) is the representative cost
    from omni_ray.pipelines.growth import GROWTH_REGISTRY
    timed("growth_accounting",
          lambda: GROWTH_REGISTRY["growth_accounting"][0](SF_DIR).num_rows)

    # batch 22: the forward-fill series (one user-bucketed shuffle +
    # in-bucket dense reindex, users x days output) is the new cost
    from omni_ray.pipelines.opsaudit import OPSAUDIT_REGISTRY
    timed("ffill_gaps",
          lambda: OPSAUDIT_REGISTRY["ffill_gaps"][0](SF_DIR).count())

    # batch 23: the sentence census (sentence explode + one sentence-keyed
    # bucketed fold + bounded census) and the encoding advisor (3x value
    # explode through the distinct fold) are the new costs
    from omni_ray.pipelines.infraops import INFRAOPS_REGISTRY
    timed("sentence_dedup_census",
          lambda: INFRAOPS_REGISTRY["sentence_dedup_census"][0](SF_DIR).count())
    timed("encoding_advisor",
          lambda: INFRAOPS_REGISTRY["encoding_advisor"][0](SF_DIR).num_rows)

    # batch 24: the bloom sizing advisor (3-table union through one
    # key-bucketed exact-distinct fold) and the arrival audit (one bounded
    # type shuffle + vectorized watermark scan) are the new costs
    from omni_ray.pipelines.advisory import ADVISORY_REGISTRY
    timed("bloom_size_advisor",
          lambda: ADVISORY_REGISTRY["bloom_size_advisor"][0](SF_DIR).num_rows)
    timed("ooo_arrival_audit",
          lambda: ADVISORY_REGISTRY["ooo_arrival_audit"][0](SF_DIR).count())

    # batch 25: the nearest-event join (one user-bucketed shuffle +
    # searchsorted two-candidate match) and the merkle digest (per-block
    # md5 fold + bounded day merge + root) are the new costs
    from omni_ray.pipelines.integrity import INTEGRITY_REGISTRY
    timed("nearest_event_join",
          lambda: INTEGRITY_REGISTRY["nearest_event_join"][0](SF_DIR).count())
    timed("merkle_partition_digest",
          lambda: INTEGRITY_REGISTRY["merkle_partition_digest"][0](SF_DIR).num_rows)

    # batch 26: winnowing (per-doc md5 3-gram hashing + stride-view window
    # min, zero shuffle) and the postings gap census (term-bucketed df fold
    # + bounded 20-key gap scan) are the new costs
    from omni_ray.pipelines.fpindex import FPINDEX_REGISTRY
    timed("winnowing_fingerprints",
          lambda: FPINDEX_REGISTRY["winnowing_fingerprints"][0](SF_DIR).count())
    timed("postings_gap_stats",
          lambda: FPINDEX_REGISTRY["postings_gap_stats"][0](SF_DIR).num_rows)

    # batch 27: NDCG (per-doc distinct-term relevance + dual block-local
    # top-10 prune into one bounded source groupby) and the exact EMD drift
    # (bounded value-histogram CDF scan) are the new costs
    from omni_ray.pipelines.evalops import EVALOPS_REGISTRY
    timed("ndcg_eval",
          lambda: EVALOPS_REGISTRY["ndcg_eval"][0](SF_DIR).count())
    timed("emd_length_drift",
          lambda: EVALOPS_REGISTRY["emd_length_drift"][0](SF_DIR).num_rows)

    # batch 28: Q18 (orderkey-bucketed per-order fold + qualifying-set
    # broadcast join-back) and Q22 (row-sized left_outer Dataset.join +
    # scalar-subquery filter) are the new costs
    from omni_ray.pipelines.dssops import DSSOPS_REGISTRY
    timed("large_order_customers_q18",
          lambda: DSSOPS_REGISTRY["large_order_customers_q18"][0](SF_DIR).num_rows)
    timed("low_engagement_q22",
          lambda: DSSOPS_REGISTRY["low_engagement_q22"][0](SF_DIR).num_rows)

    # batch 29: the RFM cube (user-bucketed metric fold + 3x2-pass exact
    # quartile selection + bounded census) and the Lorenz concentration
    # (exact k-th-largest selection + one above-threshold fold) are the
    # new costs
    from omni_ray.pipelines.tsops import TSOPS_REGISTRY
    timed("rfm_segments",
          lambda: TSOPS_REGISTRY["rfm_segments"][0](SF_DIR).num_rows)
    timed("spend_concentration",
          lambda: TSOPS_REGISTRY["spend_concentration"][0](SF_DIR).num_rows)

    # batch 30: the JL distortion audit (per-block quantize+project matmul
    # + one pair-bucketed shuffle) and the shingle novelty curve (5-gram
    # first-occurrence bucketed fold over exact decile cuts) are the new
    # costs
    from omni_ray.pipelines.robustops import ROBUSTOPS_REGISTRY
    timed("jl_distortion_audit",
          lambda: ROBUSTOPS_REGISTRY["jl_distortion_audit"][0](SF_DIR).num_rows)
    timed("gram_novelty_curve",
          lambda: ROBUSTOPS_REGISTRY["gram_novelty_curve"][0](SF_DIR).num_rows)

    # batch 31: the hapax fold (per-block occurrence combiner + one
    # term-bucketed shuffle) and the KS drift (bounded CDF scan) are the
    # new costs
    from omni_ray.pipelines.allocops import ALLOCOPS_REGISTRY
    timed("hapax_rate_by_source",
          lambda: ALLOCOPS_REGISTRY["hapax_rate_by_source"][0](SF_DIR).num_rows)
    timed("ks_length_drift",
          lambda: ALLOCOPS_REGISTRY["ks_length_drift"][0](SF_DIR).num_rows)

    # batch 32: the type-Jaccard bitmask fold (user-bucketed OR + bounded
    # mask census) and the rich-club audit (edge stream + degree folds +
    # broadcast club filter) are the new costs
    from omni_ray.pipelines.expops import EXPOPS_REGISTRY
    timed("type_cooccurrence_jaccard",
          lambda: EXPOPS_REGISTRY["type_cooccurrence_jaccard"][0](SF_DIR).num_rows)
    timed("rich_club_topk",
          lambda: EXPOPS_REGISTRY["rich_club_topk"][0](SF_DIR).num_rows)

    # batch 33: greedy shingle cover (3 bucketed passes over the
    # materialized pair table) and the transition entropy (user-bucketed
    # transition fold + bounded cell entropy) are the new costs
    from omni_ray.pipelines.mraops import MRAOPS_REGISTRY
    timed("greedy_source_cover",
          lambda: MRAOPS_REGISTRY["greedy_source_cover"][0](SF_DIR).num_rows)
    timed("transition_entropy",
          lambda: MRAOPS_REGISTRY["transition_entropy"][0](SF_DIR).num_rows)

    # batch 34: the lagged CCF grid (bounded type-pair scan over the
    # dense day table) and the term movers (term-bucketed half-df fold)
    # are the new costs
    from omni_ray.pipelines.specops import SPECOPS_REGISTRY
    timed("daily_ccf_best_lag",
          lambda: SPECOPS_REGISTRY["daily_ccf_best_lag"][0](SF_DIR).num_rows)
    timed("term_movers_topk",
          lambda: SPECOPS_REGISTRY["term_movers_topk"][0](SF_DIR).num_rows)

    # batch 35: the CUPED moment fold (user-bucketed halves + global
    # moments) and the class-separation matrix (per-block label partials
    # + bounded centroid pair scan) are the new costs
    from omni_ray.pipelines.varops import VAROPS_REGISTRY
    timed("cuped_audit",
          lambda: VAROPS_REGISTRY["cuped_audit"][0](SF_DIR).num_rows)
    timed("class_separation_matrix",
          lambda: VAROPS_REGISTRY["class_separation_matrix"][0](SF_DIR).num_rows)

    # batch 36: the link-prediction wedge join (dst-bucketed in-neighbor
    # pairing + pair-bucketed score fold) and the gap audit (user-bucketed
    # gap census + bounded value histogram) are the new costs
    from omni_ray.pipelines.linkops import LINKOPS_REGISTRY
    timed("link_prediction_topk",
          lambda: LINKOPS_REGISTRY["link_prediction_topk"][0](SF_DIR).num_rows)
    timed("expfit_gap_audit",
          lambda: LINKOPS_REGISTRY["expfit_gap_audit"][0](SF_DIR).num_rows)

    # batch 37: the AMS sketch fold (16 per-block counter partials, one
    # bounded aggregate + the exact bucketed F2) and the lineitem
    # contiguity audit (orderkey-bucketed verdict fold) are the new costs
    from omni_ray.pipelines.sketchops import SKETCHOPS_REGISTRY
    timed("ams_f2_audit",
          lambda: SKETCHOPS_REGISTRY["ams_f2_audit"][0](SF_DIR).num_rows)
    timed("lineitem_density_audit",
          lambda: SKETCHOPS_REGISTRY["lineitem_density_audit"][0](SF_DIR).num_rows)

    # batch 38: the bucket-skew audit (two bounded 256-bucket census
    # folds, one over per-row md5 terms) and the Spearman rank moments
    # (two CDF rank maps + one moment fold) are the new costs
    from omni_ray.pipelines.rankops import RANKOPS_REGISTRY
    timed("bucket_skew_audit",
          lambda: RANKOPS_REGISTRY["bucket_skew_audit"][0](SF_DIR).num_rows)
    timed("spearman_len_vocab",
          lambda: RANKOPS_REGISTRY["spearman_len_vocab"][0](SF_DIR).num_rows)

    # batch 39: the originality census (two shingle/doc bucketed distinct
    # folds over the materialized pair table) and the retry-storm scan
    # (user-bucketed ordered scan) are the new costs
    from omni_ray.pipelines.remedyops import REMEDYOPS_REGISTRY
    timed("originality_census",
          lambda: REMEDYOPS_REGISTRY["originality_census"][0](SF_DIR).num_rows)
    timed("event_dedup_census",
          lambda: REMEDYOPS_REGISTRY["event_dedup_census"][0](SF_DIR).num_rows)

    # batch 40: the price/volume decomposition (dimension broadcast +
    # bounded brand-half groupby) and the isotonic fit (bounded band fold
    # + O(bands^3) exact max-min) are the new costs
    from omni_ray.pipelines.fitops import FITOPS_REGISTRY
    timed("price_volume_decomp",
          lambda: FITOPS_REGISTRY["price_volume_decomp"][0](SF_DIR).num_rows)
    timed("isotonic_value_fit",
          lambda: FITOPS_REGISTRY["isotonic_value_fit"][0](SF_DIR).num_rows)

    # batch 41: the order reconciliation (two bucketed folds + union
    # co-fold over orderkeys) and the syndication census (lead-fingerprint
    # bucketed spread fold) are the new costs
    from omni_ray.pipelines.auditops import AUDITOPS_REGISTRY
    timed("order_reconciliation",
          lambda: AUDITOPS_REGISTRY["order_reconciliation"][0](SF_DIR).num_rows)
    timed("lead_para_dup_census",
          lambda: AUDITOPS_REGISTRY["lead_para_dup_census"][0](SF_DIR).num_rows)

    # batch 42: the capture-recapture fold (term-bucketed half-presence)
    # and the adaptation census (occurrence-combined term fold) are the
    # new costs
    from omni_ray.pipelines.lexops import LEXOPS_REGISTRY
    timed("capture_recapture_vocab",
          lambda: LEXOPS_REGISTRY["capture_recapture_vocab"][0](SF_DIR).num_rows)
    timed("term_adaptation_topk",
          lambda: LEXOPS_REGISTRY["term_adaptation_topk"][0](SF_DIR).num_rows)

    # batch 43: the ABC weighted selection (partkey-bucketed revenue fold
    # + revenue-mass histogram + boundary-bin refine) and the clustering
    # census (node-bucketed adjacency fold) are the new costs
    from omni_ray.pipelines.paradoxops import PARADOXOPS_REGISTRY
    timed("abc_classification",
          lambda: PARADOXOPS_REGISTRY["abc_classification"][0](SF_DIR).num_rows)
    timed("local_clustering_census",
          lambda: PARADOXOPS_REGISTRY["local_clustering_census"][0](SF_DIR).num_rows)

    # batch 44: the learned-index audit (bin histogram + in-bin rank
    # shuffle) and the MUS prefix scan (sort + two-pass block offsets)
    # are the new costs
    from omni_ray.pipelines.sysops import SYSOPS_REGISTRY
    timed("learned_index_audit",
          lambda: SYSOPS_REGISTRY["learned_index_audit"][0](SF_DIR).num_rows)
    timed("monetary_unit_sample",
          lambda: SYSOPS_REGISTRY["monetary_unit_sample"][0](SF_DIR).num_rows)

    # batch 45: the FM sketch fold (8 per-block trailing-zero maxima +
    # exact distinct) and the join-estimate audit (two bucket histograms
    # + a custkey-bucketed exact co-fold) are the new costs
    from omni_ray.pipelines.estops import ESTOPS_REGISTRY
    timed("fm_distinct_audit",
          lambda: ESTOPS_REGISTRY["fm_distinct_audit"][0](SF_DIR).num_rows)
    timed("join_estimate_audit",
          lambda: ESTOPS_REGISTRY["join_estimate_audit"][0](SF_DIR).num_rows)

    # batch 46: the kappa confusion fold (two exact-quintile cut passes +
    # bounded 5x5 matrix) and the circular hour stats (bounded hour
    # histogram + literal-direction fold) are the new costs
    from omni_ray.pipelines.circops import CIRCOPS_REGISTRY
    timed("cohens_kappa_bins",
          lambda: CIRCOPS_REGISTRY["cohens_kappa_bins"][0](SF_DIR).num_rows)
    timed("circular_hour_stats",
          lambda: CIRCOPS_REGISTRY["circular_hour_stats"][0](SF_DIR).num_rows)

    # batch 47: the stump scan (bounded value histogram + cumsum argmin)
    # and the median polish (bounded matrix sweep) are the new costs
    from omni_ray.pipelines.stumpops import STUMPOPS_REGISTRY
    timed("decision_stump_audit",
          lambda: STUMPOPS_REGISTRY["decision_stump_audit"][0](SF_DIR).num_rows)
    timed("median_polish_dowweek",
          lambda: STUMPOPS_REGISTRY["median_polish_dowweek"][0](SF_DIR).num_rows)

    # batch 48: the Hoeffding conversion fold (user-bucketed type/buyer
    # co-fold) and the Sn robust scale (bounded O(days^2) scan) are the
    # new costs
    from omni_ray.pipelines.boundops import BOUNDOPS_REGISTRY
    timed("hoeffding_ci_conversion",
          lambda: BOUNDOPS_REGISTRY["hoeffding_ci_conversion"][0](SF_DIR).num_rows)
    timed("sn_scale_daily",
          lambda: BOUNDOPS_REGISTRY["sn_scale_daily"][0](SF_DIR).num_rows)

    # batch 49: the Chao1 occurrence census (term-bucketed frequency fold)
    # is the new cost; the other estimators share its machinery
    from omni_ray.pipelines.richops import RICHOPS_REGISTRY
    timed("chao1_vocab",
          lambda: RICHOPS_REGISTRY["chao1_vocab"][0](SF_DIR).num_rows)

    # batch 50: the Yule K fold (term-bucketed occurrence census) and the
    # digram entropy (bounded 26x26 cell fold + quantized-ln entropy) are
    # the new costs
    from omni_ray.pipelines.lexstat2 import LEXSTAT2_REGISTRY
    timed("yule_k_by_source",
          lambda: LEXSTAT2_REGISTRY["yule_k_by_source"][0](SF_DIR).num_rows)
    timed("digram_entropy_by_source",
          lambda: LEXSTAT2_REGISTRY["digram_entropy_by_source"][0](SF_DIR).num_rows)

    # batch 51: the source-metrics table (doc fold + term-bucketed vocab
    # fold) feeds all three vote methods; Copeland is the timed headliner
    from omni_ray.pipelines.voteops import VOTEOPS_REGISTRY
    timed("copeland_ranking",
          lambda: VOTEOPS_REGISTRY["copeland_ranking"][0](SF_DIR).num_rows)

    # batch 52: the RBO pipeline (source-metric folds + bounded depth
    # scan) and the price ladder (brand-cents census) are the new costs
    from omni_ray.pipelines.listops import LISTOPS_REGISTRY
    timed("rbo_rankings",
          lambda: LISTOPS_REGISTRY["rbo_rankings"][0](SF_DIR).num_rows)
    timed("price_ladder_audit",
          lambda: LISTOPS_REGISTRY["price_ladder_audit"][0](SF_DIR).num_rows)

    # batch 53: the AUC histogram cross-fold and the Markov transition
    # accuracy fold are the new costs
    from omni_ray.pipelines.auctests import AUCTESTS_REGISTRY
    timed("mann_whitney_auc",
          lambda: AUCTESTS_REGISTRY["mann_whitney_auc"][0](SF_DIR).num_rows)
    timed("markov_top1_accuracy",
          lambda: AUCTESTS_REGISTRY["markov_top1_accuracy"][0](SF_DIR).num_rows)

    # batch 54: the milestone scan (user-bucketed cumulative crossing) and
    # the midmean histogram fold are the new costs
    from omni_ray.pipelines.midops import MIDOPS_REGISTRY
    timed("days_to_spend_milestone",
          lambda: MIDOPS_REGISTRY["days_to_spend_milestone"][0](SF_DIR).num_rows)
    timed("interquartile_mean",
          lambda: MIDOPS_REGISTRY["interquartile_mean"][0](SF_DIR).num_rows)

    # batch 55: the Hill spend fold (user-bucketed + top-20 prune) and
    # the syndication direction fold (fingerprint-bucketed provenance)
    # are the new costs
    from omni_ray.pipelines.tailops import TAILOPS_REGISTRY
    timed("hill_tail_index",
          lambda: TAILOPS_REGISTRY["hill_tail_index"][0](SF_DIR).num_rows)
    timed("syndication_direction",
          lambda: TAILOPS_REGISTRY["syndication_direction"][0](SF_DIR).num_rows)

    # batch 56: the trigram coverage fold (user-bucketed sequence scan +
    # bounded census) and the quiet-run scan are the new costs
    from omni_ray.pipelines.opsmisc import OPSMISC_REGISTRY
    timed("type_trigram_coverage",
          lambda: OPSMISC_REGISTRY["type_trigram_coverage"][0](SF_DIR).num_rows)
    timed("longest_quiet_run",
          lambda: OPSMISC_REGISTRY["longest_quiet_run"][0](SF_DIR).num_rows)

    # batch 57: the dead-stock fold (partkey-bucketed last-shipment max +
    # broadcast brand census) and the second-digit Benford census are the
    # new costs
    from omni_ray.pipelines.forensics2 import FORENSICS2_REGISTRY
    timed("dead_stock_census",
          lambda: FORENSICS2_REGISTRY["dead_stock_census"][0](SF_DIR).num_rows)
    timed("benford2_audit",
          lambda: FORENSICS2_REGISTRY["benford2_audit"][0](SF_DIR).num_rows)

    # batch 58: the contingency association trio shares one bounded fold;
    # Cramer's V is the timed headliner
    from omni_ray.pipelines.catops import CATOPS_REGISTRY
    timed("cramers_v_source_lang",
          lambda: CATOPS_REGISTRY["cramers_v_source_lang"][0](SF_DIR).num_rows)

    # batch 59: the L-moment histogram fold and the three-size shingle
    # sweep (per-doc md5 shingling x3 + bucketed distinct) are the new
    # costs
    from omni_ray.pipelines.lmomops import LMOMOPS_REGISTRY
    timed("l_moments_spend",
          lambda: LMOMOPS_REGISTRY["l_moments_spend"][0](SF_DIR).num_rows)
    timed("shingle_size_sweep",
          lambda: LMOMOPS_REGISTRY["shingle_size_sweep"][0](SF_DIR).num_rows)

    # batch 60: the gap-moment fold (user-bucketed seconds gaps) feeds
    # both renewal diagnostics; the Zipf slope adds a top-50 pair scan
    from omni_ray.pipelines.renewops import RENEWOPS_REGISTRY
    timed("gap_burstiness_b",
          lambda: RENEWOPS_REGISTRY["gap_burstiness_b"][0](SF_DIR).num_rows)
    timed("zipf_slope_theil",
          lambda: RENEWOPS_REGISTRY["zipf_slope_theil"][0](SF_DIR).num_rows)

    # batch 61: the IDF profile (term-bucketed df/occ fold + quantized-ln
    # banding) and the intra-doc similarity census are the new costs
    from omni_ray.pipelines.identops import IDENTOPS_REGISTRY
    timed("bm25_idf_profile",
          lambda: IDENTOPS_REGISTRY["bm25_idf_profile"][0](SF_DIR).num_rows)
    timed("intra_doc_similarity_census",
          lambda: IDENTOPS_REGISTRY["intra_doc_similarity_census"][0](SF_DIR).num_rows)

    # batch 62: the first-touch fold (user-bucketed first-event scan) and
    # the stump PR/F1 histogram pass are the new costs
    from omni_ray.pipelines.funnelops import FUNNELOPS_REGISTRY
    timed("first_touch_census",
          lambda: FUNNELOPS_REGISTRY["first_touch_census"][0](SF_DIR).num_rows)
    timed("stump_pr_f1",
          lambda: FUNNELOPS_REGISTRY["stump_pr_f1"][0](SF_DIR).num_rows)

    # batch 63: the distance-similarity explode (3 pair-keyed shuffles of
    # shingle blobs) and the depth curve fold are the new costs
    from omni_ray.pipelines.localops import LOCALOPS_REGISTRY
    timed("doc_distance_similarity",
          lambda: LOCALOPS_REGISTRY["doc_distance_similarity"][0](SF_DIR).num_rows)
    timed("depth_conversion_curve",
          lambda: LOCALOPS_REGISTRY["depth_conversion_curve"][0](SF_DIR).num_rows)

    # batch 64: the RLE audit (narrow sort + per-block run scan +
    # boundary reconciliation) is the new cost
    from omni_ray.pipelines.rleops import RLEOPS_REGISTRY
    timed("type_rle_audit",
          lambda: RLEOPS_REGISTRY["type_rle_audit"][0](SF_DIR).num_rows)

    # batch 65: the two fact-side hash joins (Q3's filtered join + row-
    # sized rollup + distributed top-k; Q9's double-broadcast profit fold)
    from omni_ray.pipelines.tpchx import TPCHX_REGISTRY
    timed("q3_shipping_priority",
          lambda: TPCHX_REGISTRY["q3_shipping_priority"][0](SF_DIR).num_rows)
    timed("q9_profit_by_nation_year",
          lambda: TPCHX_REGISTRY["q9_profit_by_nation_year"][0](SF_DIR).num_rows)

    # batch 66-69: URL-structure mining, cuckoo placement audit, the
    # stylometry term fold, Allan blocks, and the two text round-trips
    from omni_ray.pipelines.urltmpl import URLTMPL_REGISTRY
    timed("url_template_census",
          lambda: URLTMPL_REGISTRY["url_template_census"][0](SF_DIR).num_rows)
    from omni_ray.pipelines.cuckooaudit import CUCKOOAUDIT_REGISTRY
    timed("cuckoo_collision_audit",
          lambda: CUCKOOAUDIT_REGISTRY["cuckoo_collision_audit"][0](SF_DIR).num_rows)
    from omni_ray.pipelines.styleops import STYLEOPS_REGISTRY
    timed("burrows_delta_sources",
          lambda: STYLEOPS_REGISTRY["burrows_delta_sources"][0](SF_DIR).num_rows)
    timed("allan_variance_daily",
          lambda: STYLEOPS_REGISTRY["allan_variance_daily"][0](SF_DIR).num_rows)
    from omni_ray.pipelines.interop import INTEROP_REGISTRY
    timed("csv_roundtrip_stats",
          lambda: INTEROP_REGISTRY["csv_roundtrip_stats"][0](SF_DIR).num_rows)
    timed("jsonl_roundtrip_stats",
          lambda: INTEROP_REGISTRY["jsonl_roundtrip_stats"][0](SF_DIR).num_rows)

    # batch 70-71: the user-grain holdout fold, the R/S window pass, the
    # signature census + QI ladder
    from omni_ray.pipelines.holdout import HOLDOUT_REGISTRY
    timed("temporal_holdout_census",
          lambda: HOLDOUT_REGISTRY["temporal_holdout_census"][0](SF_DIR).num_rows)
    timed("hurst_rs_audit",
          lambda: HOLDOUT_REGISTRY["hurst_rs_audit"][0](SF_DIR).num_rows)
    from omni_ray.pipelines.linkage import LINKAGE_REGISTRY
    timed("path_edit_distance_pairs",
          lambda: LINKAGE_REGISTRY["path_edit_distance_pairs"][0](SF_DIR).num_rows)
    timed("kanon_generalization_plan",
          lambda: LINKAGE_REGISTRY["kanon_generalization_plan"][0](SF_DIR).num_rows)

    # batch 72: the per-user windowed pair scan and the LOSO stump refits
    from omni_ray.pipelines.episodeops import EPISODEOPS_REGISTRY
    timed("episode_pairs_window",
          lambda: EPISODEOPS_REGISTRY["episode_pairs_window"][0](SF_DIR).num_rows)
    timed("loso_stump_delta",
          lambda: EPISODEOPS_REGISTRY["loso_stump_delta"][0](SF_DIR).num_rows)

    # batch 73-74: the half-split lang pass, the term-hash fold, and the
    # LOO broadcast encode
    from omni_ray.pipelines.hashfeat import HASHFEAT_REGISTRY
    timed("code_switch_census",
          lambda: HASHFEAT_REGISTRY["code_switch_census"][0](SF_DIR).num_rows)
    timed("feature_hash_collision_audit",
          lambda: HASHFEAT_REGISTRY["feature_hash_collision_audit"][0](SF_DIR).num_rows)
    from omni_ray.pipelines.mlprep import MLPREP_REGISTRY
    timed("loo_target_encoding",
          lambda: MLPREP_REGISTRY["loo_target_encoding"][0](SF_DIR).num_rows)

    # batch 75: the three-codec encode+decode fused pass
    from omni_ray.pipelines.mediaops import MEDIAOPS_REGISTRY as _MR
    timed("mixed_codec_image_stats",
          lambda: _MR["mixed_codec_image_stats"][0](SF_DIR).num_rows)

    # batch 76: the per-user chain scan and the (type, gap) fold
    from omni_ray.pipelines.funnelx import FUNNELX_REGISTRY
    timed("strict_funnel_timed",
          lambda: FUNNELX_REGISTRY["strict_funnel_timed"][0](SF_DIR).num_rows)
    timed("gap_median_by_type",
          lambda: FUNNELX_REGISTRY["gap_median_by_type"][0](SF_DIR).num_rows)

    # batch 77: the WARC encode->frame-parse round trip
    from omni_ray.pipelines.interop import INTEROP_REGISTRY as _IR
    timed("warc_roundtrip_stats",
          lambda: _IR["warc_roundtrip_stats"][0](SF_DIR).num_rows)

    # batch 78: the robots probe pass
    from omni_ray.pipelines.robotsops import ROBOTSOPS_REGISTRY
    timed("robots_decision_census",
          lambda: ROBOTSOPS_REGISTRY["robots_decision_census"][0](SF_DIR).num_rows)

    # batch 79: the feed-build + parse + union-dedup pass
    from omni_ray.pipelines.discoveryops import DISCOVERYOPS_REGISTRY
    timed("discovery_union_dedup",
          lambda: DISCOVERYOPS_REGISTRY["discovery_union_dedup"][0](SF_DIR).num_rows)

    # batch 80: the DOM-parse + clean ladder pass
    from omni_ray.pipelines.htmlqueries import HTMLQUERIES_REGISTRY
    timed("clean_boilerplate_census",
          lambda: HTMLQUERIES_REGISTRY["clean_boilerplate_census"][0](SF_DIR).num_rows)

    # batch 81: the validator kernel pass
    from omni_ray.pipelines.enrichqueries import ENRICHQUERIES_REGISTRY
    timed("validator_warning_census",
          lambda: ENRICHQUERIES_REGISTRY["validator_warning_census"][0](SF_DIR).num_rows)

    # batch 82: the live seen-shard routing pass
    from omni_ray.pipelines.kernelmisc import KERNELMISC_REGISTRY
    timed("seen_shard_distribution_census",
          lambda: KERNELMISC_REGISTRY["seen_shard_distribution_census"][0](SF_DIR).num_rows)

    # batch 83: the Q14 broadcast-indicator fold and the Q16 two-level
    # distinct
    from omni_ray.pipelines.tpchx2 import TPCHX2_REGISTRY
    timed("q14_promo_share",
          lambda: TPCHX2_REGISTRY["q14_promo_share"][0](SF_DIR).num_rows)
    timed("q16_parts_supplier_cnt",
          lambda: TPCHX2_REGISTRY["q16_parts_supplier_cnt"][0](SF_DIR).num_rows)

    # batch 84: the term-frequency fold feeding the OOV curve
    from omni_ray.pipelines.trainplan import TRAINPLAN_REGISTRY
    timed("oov_vocab_curve",
          lambda: TRAINPLAN_REGISTRY["oov_vocab_curve"][0](SF_DIR).num_rows)

    # batch 86: continuous crawl (per-wave discovery unioned into the live
    # frontier through the real wave machinery; backlog read from the
    # deferred snapshots — shares one crawl run via the module cache)
    from omni_ray.pipelines.contcrawl import CONTCRAWL_REGISTRY
    timed("continuous_crawl_census",
          lambda: CONTCRAWL_REGISTRY["continuous_crawl_census"][0](SF_DIR).num_rows)
    timed("continuous_backlog_profile",
          lambda: CONTCRAWL_REGISTRY["continuous_backlog_profile"][0](SF_DIR).num_rows)

    # batch 87: the real fallback chain through an actor pool
    from omni_ray.pipelines.fetchchain import FETCHCHAIN_REGISTRY
    timed("fetch_chain_census",
          lambda: FETCHCHAIN_REGISTRY["fetch_chain_census"][0](SF_DIR).num_rows)

    # batch 88: HRW-vs-mod resharding census over real md5 routing
    from omni_ray.pipelines.shardops import SHARDOPS_REGISTRY
    timed("shard_rebalance_census",
          lambda: SHARDOPS_REGISTRY["shard_rebalance_census"][0](SF_DIR).num_rows)

    # batch 89: counter lineage read back from real epoch artifacts
    from omni_ray.pipelines.lineageops import LINEAGEOPS_REGISTRY
    timed("crawl_counter_lineage",
          lambda: LINEAGEOPS_REGISTRY["crawl_counter_lineage"][0](SF_DIR).num_rows)

    # batch 90: WARC shard write + distributed CDX byte-walk
    from omni_ray.pipelines.cdxops import CDXOPS_REGISTRY
    timed("warc_cdx_census",
          lambda: CDXOPS_REGISTRY["warc_cdx_census"][0](SF_DIR).num_rows)

    # batch 91: robots -> sitemap -> gate discovery chain
    from omni_ray.pipelines.robotschain import ROBOTSCHAIN_REGISTRY
    timed("robots_sitemap_chain",
          lambda: ROBOTSCHAIN_REGISTRY["robots_sitemap_chain"][0](SF_DIR).num_rows)

    # batch 92: conditional-GET bandwidth plan
    from omni_ray.pipelines.revalops import REVALPLAN_REGISTRY
    timed("conditional_get_plan",
          lambda: REVALPLAN_REGISTRY["conditional_get_plan"][0](SF_DIR).num_rows)

    # batch 93: Misra-Gries heavy hitters (sketch + exact verify pass)
    from omni_ray.pipelines.heavyhitters import HEAVYHITTERS_REGISTRY
    timed("mg_heavy_hitters",
          lambda: HEAVYHITTERS_REGISTRY["mg_heavy_hitters"][0](SF_DIR).num_rows)
    from omni_ray.pipelines.heavychange import HEAVYCHANGE_REGISTRY
    timed("heavy_change_census",
          lambda: HEAVYCHANGE_REGISTRY["heavy_change_census"][0](SF_DIR).num_rows)
    from omni_ray.pipelines.mrlops import MRLOPS_REGISTRY
    timed("mrl_prefix_top1_audit",
          lambda: MRLOPS_REGISTRY["mrl_prefix_top1_audit"][0](SF_DIR).num_rows)
    from omni_ray.pipelines.trapops import TRAPOPS_REGISTRY
    timed("crawl_trap_detector",
          lambda: TRAPOPS_REGISTRY["crawl_trap_detector"][0](SF_DIR).num_rows)

    # frontier stress: 10M synthetic URLs (1M hosts, 20% duplicate
    # url_hashes) through the crawl's OWN distributed dedup+politeness+rank
    # body (_dedup_and_rank over hash(host)%64 buckets) — the 10^10-frontier
    # machinery exercised at 25x the page-universe bench; bucket hash is a
    # vectorized multiplicative mix (the md5 dictionary trick is annotate-
    # stage cost, measured separately in crawl_loop)
    def bench_frontier_10m():
        import numpy as np
        import pandas as pd

        from omni_ray.pipelines.crawl import _dedup_and_rank

        N = 10_000_000
        ds = ray.data.range(N, override_num_blocks=64)

        def gen(b: pd.DataFrame) -> pd.DataFrame:
            ids = b["id"].to_numpy(np.int64)
            hid = (ids * 2654435761) % 1_000_000
            host = pd.Series(hid).astype(str).radd("h")
            return pd.DataFrame({
                "url": "http://" + host + "/p" + pd.Series(ids).astype(str),
                "url_hash": pd.Series(ids % 8_000_000).astype(str),
                "host": host,
                "priority": (ids % 100).astype("int64"),
                "discovery_ts": ids,
                "seen": np.zeros(len(ids), dtype=bool),
                "robots_allowed": np.ones(len(ids), dtype=bool),
                "host_bucket": ((hid * 2654435761) % 64).astype("int32"),
            })

        from ray.data.aggregate import Sum as _Sum

        fr = ds.map_batches(gen, batch_format="pandas")
        # the hid map is a bijection per 1M block, so every host holds
        # EXACTLY 8 distinct urls after dedup; budget 6 makes the politeness
        # cutoff a sharp invariant (6M scheduled of 8M deduped)
        ranked = fr.groupby("host_bucket").map_groups(
            lambda g: _dedup_and_rank(g, 6), batch_format="pandas")
        agg = ranked.map_batches(
            lambda t: pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array(
                    [pa.compute.sum(pa.compute.cast(
                        t["scheduled"], pa.int64())).as_py() or 0],
                    pa.int64()),
            }),
            batch_format="pyarrow",
        ).aggregate(_Sum("n", alias_name="n"), _Sum("s", alias_name="s"))
        assert agg["n"] == 8_000_000 and agg["s"] == 6_000_000, agg
        return agg["s"]

    import pyarrow as pa

    timed("frontier_10m_dedup_rank", bench_frontier_10m)
    throughput["frontier_10m_urls_per_s"] = round(
        10_000_000 / timings["frontier_10m_dedup_rank"], 1)

    # distributed connected components over a synthetic 1e6-pair set (the
    # huge-pair-set duplicate_of path: hash-to-min label propagation)
    def bench_dupgroups_1m():
        import numpy as np
        import pyarrow as pa

        from omni_ray.stages.dedup import duplicate_groups_distributed

        n = 1_000_000
        rng = np.random.RandomState(3)
        # 80% isolated 2-node components, 20% random chains over a 1e6 space
        a1 = np.arange(0, int(n * 0.8) * 2, 2, dtype=np.int64)
        b1 = a1 + 1
        a2 = rng.randint(2_000_000, 3_000_000, size=n - len(a1)).astype(np.int64)
        b2 = a2 + rng.randint(1, 40, size=len(a2)).astype(np.int64)
        pairs = pa.table({"doc_a": np.concatenate([a1, a2]),
                          "doc_b": np.concatenate([b1, b2])})
        ds = ray.data.from_arrow(pairs).repartition(64)
        return duplicate_groups_distributed(ds).count()

    timed("dupgroups_1m_pairs", bench_dupgroups_1m)

    ray.shutdown()

    total = round(sum(timings.values()), 3)
    return {
        "metric": "frontier-dedup+fetch+extract throughput and operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "num_cpus": NUM_CPUS,
        "throughput": throughput,
        # methodology: headline pipelines report best-of-N on this SHARED
        # host (peak capacity); raw per-rep walls kept for transparency
        "headline_reps": headline_reps,
        "op_reps": op_reps,
    }


# 400k pages is the representative scaling input (campaign c7, BASELINE.md):
# it doubles the steady-state span so ramp/fixed-overhead amortization does
# not masquerade as a scaling deficit on the short 200k job
SCALING_PAGES = int(os.environ.get("GRAFT_SCALING_PAGES", "400000"))


def run_scaling_worker() -> dict:
    """One scaling measurement in THIS process: the compute-bound headline
    (fetch+clean+extract+enrich+validate article pipeline) plus the frontier
    crawl loop, over a large shared pages universe. The small-sf operator
    suite is excluded here on purpose: at sf0.1 it is latency-bound and says
    nothing about cluster scaling."""
    import shutil

    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data

    from omni_ray.pipelines.articles import article_pipeline
    from omni_ray.pipelines.crawl import run_crawl
    from omni_ray.sources.pages import write_pages_dataset

    base = os.path.join("/tmp", f"omni_ray_scaling_pages_{SCALING_PAGES}")
    write_pages_dataset(base, n_rows=SCALING_PAGES, seed=42, n_buckets=32, parallel=True)

    # warmup: spin workers + page cache (untimed)
    ray.data.read_parquet(f"{base}/pages", columns=["url"]).map_batches(
        lambda t: t, batch_format="pyarrow"
    ).count()

    t0 = time.perf_counter()
    shutil.rmtree("/tmp/omni_ray_scaling_arts", ignore_errors=True)
    ds = ray.data.read_parquet(
        f"{base}/pages", columns=["url", "warc_ts", "html", "lang"]
    )
    article_pipeline(ds).write_parquet("/tmp/omni_ray_scaling_arts")
    t_articles = time.perf_counter() - t0

    t0 = time.perf_counter()
    shutil.rmtree("/tmp/omni_ray_scaling_crawl", ignore_errors=True)
    totals = run_crawl(
        pages_dir=f"{base}/pages",
        seeds_path=f"{base}/seeds.parquet",
        out_dir="/tmp/omni_ray_scaling_crawl",
        budget_per_host=SCALING_PAGES,  # single wave: measure pipeline, not wave count
        n_buckets=32,
        # shard count scales with parallelism: 8 shard actors bottleneck the
        # annotate stage's contains() round-trips once 32 cores feed them
        n_seen_shards=max(8, NUM_CPUS // 2),
    )
    t_crawl = time.perf_counter() - t0

    ray.shutdown()
    return {
        "num_cpus": NUM_CPUS,
        "n_pages": SCALING_PAGES,
        "articles_sec": round(t_articles, 3),
        "articles_pages_per_s": round(SCALING_PAGES / t_articles, 1),
        "crawl_sec": round(t_crawl, 3),
        "crawl_urls_per_s": round(totals.get("scheduled", 0) / t_crawl, 1),
    }


def _ceiling_worker_int(_):
    """Fixed pure-Python integer work — zero memory pressure, no Ray, no
    shared state. Per-process wall time is bounded only by the machine."""
    t0 = time.perf_counter()
    x = 0
    for i in range(12_000_000):
        x = (x * 1103515245 + i) & 0xFFFFFFFF
    return time.perf_counter() - t0


def measure_machine_ceiling(lo: int = 8, hi: int = 32) -> dict:
    """Machine core-scaling ceiling: run N independent pure-CPU processes at
    N=lo and N=hi; the ratio of per-process median times bounds ANY job's
    lo→hi scaling efficiency on this box. On this sandbox (virtualized,
    fixed 2.1 GHz, no SMT) the ceiling measures host-level contention /
    steal that a real N vs 4N *node* scale-out does not share — so job
    efficiencies are also reported normalized by it."""
    import multiprocessing as mp

    def run(n: int) -> float:
        with mp.Pool(n) as p:
            times = sorted(p.map(_ceiling_worker_int, range(n)))
        return times[len(times) // 2]

    # lo, hi, lo order brackets load drift; best lo rep is the honest peak
    m_lo1, m_hi, m_lo2 = run(lo), run(hi), run(lo)
    m_lo = min(m_lo1, m_lo2)
    return {
        "lo_median_s": round(m_lo, 3),
        "hi_median_s": round(m_hi, 3),
        "ceiling_efficiency": round(m_lo / m_hi, 3),
    }


def run_scaling() -> dict:
    """Same job in fresh processes at 8 vs 32 CPUs on identical input (the
    sandbox proxy for N vs 4N nodes)."""

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SCALING_WORKER="1",
            GRAFT_SCALING_PAGES=str(SCALING_PAGES),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
    # the sandbox machine is shared: take the best (min-time) of `reps` runs
    # per level — peak capacity at each parallelism, not transient
    # contention. Runs are INTERLEAVED (lo, hi, lo, hi, ...) so external
    # load drifting over the campaign cannot bias one level systematically.
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    ceiling = measure_machine_ceiling(lo, hi)
    r_lo = min(runs_lo, key=lambda r: r["articles_sec"])
    r_hi = min(runs_hi, key=lambda r: r["articles_sec"])
    c_lo = min(r["crawl_sec"] for r in runs_lo)
    c_hi = min(r["crawl_sec"] for r in runs_hi)
    eff_articles = (r_lo["articles_sec"] / r_hi["articles_sec"]) / (hi / lo)
    eff_crawl = (c_lo / c_hi) / (hi / lo)
    ceff = ceiling["ceiling_efficiency"]
    return {
        "metric": "scaling efficiency (8 vs 32 CPUs, fresh sessions, same input, best of %d)" % reps,
        "n_pages": SCALING_PAGES,
        "run_8": r_lo,
        "run_32": r_hi,
        "all_articles_sec": {"8": [r["articles_sec"] for r in runs_lo],
                             "32": [r["articles_sec"] for r in runs_hi]},
        "all_crawl_sec": {"8": [r["crawl_sec"] for r in runs_lo],
                          "32": [r["crawl_sec"] for r in runs_hi]},
        "scaling_efficiency_articles": round(eff_articles, 3),
        "scaling_efficiency_crawl": round(eff_crawl, 3),
        "scaling_efficiency": round(eff_articles, 3),
        # same-campaign machine ceiling (pure-CPU multiprocessing control —
        # the max efficiency ANY job can show on this box at 8→32 busy cores)
        "machine_ceiling": ceiling,
        "scaling_efficiency_articles_normalized": round(eff_articles / ceff, 3),
        "scaling_efficiency_crawl_normalized": round(eff_crawl / ceff, 3),
    }


def run_stats() -> None:
    """Print the headline pipeline's per-stage ds.stats() (fusion, UDF share,
    block sizes) — the wall-time-is-useful-compute evidence."""
    import shutil

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from omni_ray.pipelines.articles import article_pipeline
    from omni_ray.sources.pages import write_pages_dataset

    base = os.path.join("/tmp", "omni_ray_stats_pages_20000")
    write_pages_dataset(base, n_rows=20000, seed=42, n_buckets=16, parallel=True)
    shutil.rmtree("/tmp/omni_ray_stats_arts", ignore_errors=True)
    out = article_pipeline(ray.data.read_parquet(
        f"{base}/pages", columns=["url", "warc_ts", "html", "lang"]
    ))
    out.write_parquet("/tmp/omni_ray_stats_arts")
    print(out.stats())
    ray.shutdown()


if __name__ == "__main__":
    if "--stats" in sys.argv:
        run_stats()
    elif os.environ.get("GRAFT_SCALING_WORKER"):
        print(json.dumps(run_scaling_worker()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
