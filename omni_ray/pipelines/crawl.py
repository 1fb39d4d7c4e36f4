"""The crawl orchestrator: a driver loop of bounded Dataset waves
(SURVEY.md §3.1 Ray-native restatement; north_rule's streaming frontier loop).

Each wave:
  frontier → canonicalize+hash → groupby(url_hash) dedup → SeenSet anti-join
  (sharded filter actors) → optional robots gate → groupby(host) politeness
  schedule → deterministic crawl-order ranking → check_and_add into the seen
  set → bucketed-lookup fetch (groupby(bucket).map_groups against the
  hash-partitioned pages parquet — the distributed "fetch" of SURVEY.md S3)
  → clean/extract/enrich/validate/assemble → epoch-partitioned parquet.

Checkpoint/resume (north_rule): each epoch dir holds the wave's outputs,
the NEXT frontier snapshot, serialized filter shards, per-partition lineage
counters, and a _COMPLETE marker written last. Resume finds the last complete
epoch, restores the shards, and continues from its frontier — finished epochs
are never recomputed, and outputs are keyed by epoch so reruns are idempotent.

Scale notes: frontier metadata (urls, no html) is materialized per wave for
scheduling/counting — at 10^10-URL scale each wave's frontier is still blocks
in the object store; only per-wave COUNTS hit the driver. The wide rows
(html) never enter a shuffle: fetch happens after scheduling, keyed by the
same md5 bucket layout the pages table is written in, so the lookup join
reads only matching buckets (partition pruning at the read).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.canonical import canonicalize_batch
from ..state.filters import SeenSet
from ..state.robots import RobotsCache
from .articles import article_pipeline
from .frontier import (
    SORT_ASC,
    SORT_COLS,
    crawl_order_pandas,
    dedup_frontier_group,
    schedule_host_group,
)

FRONTIER_COLS = ["url", "source", "priority", "depth", "discovery_ts",
                 "canonical_url", "host", "url_hash"]


class _SeenFilter:
    """map_batches callable holding shard handles: drops rows whose url_hash
    is already in the seen set (J2 anti-join), without adding."""

    def __init__(self, shards, n_shards):
        self.shards = shards
        self.n_shards = n_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = batch.column("url_hash").to_pylist()
        groups: dict[int, list[int]] = {}
        for idx, h in enumerate(hashes):
            groups.setdefault(SeenSet.shard_of(h, self.n_shards), []).append(idx)
        futures = {
            sid: self.shards[sid].contains.remote(
                [bytes.fromhex(hashes[i]) for i in idxs]
            )
            for sid, idxs in groups.items()
        }
        keep = [True] * len(hashes)
        for sid, idxs in groups.items():
            for i, seen in zip(idxs, ray.get(futures[sid])):
                keep[i] = not seen
        return batch.filter(pa.array(keep))


class _FetchBucket:
    """groupby('bucket').map_groups body: look up html for a bucket's urls in
    the hash-partitioned pages table (reads ONLY that bucket's file)."""

    def __init__(self, pages_dir: str):
        self.pages_dir = pages_dir

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc

        bucket = int(group["bucket"].iloc[0])
        path = os.path.join(self.pages_dir, f"bucket-{bucket:04d}.parquet")
        urls = group["url"].tolist()
        if os.path.exists(path):
            tbl = pq.read_table(
                path,
                columns=["url", "warc_ts", "html", "lang"],
                filters=pc.field("url").isin(urls),
            )
            pages = tbl.to_pandas()
        else:
            pages = pd.DataFrame(columns=["url", "warc_ts", "html", "lang"])
        merged = group.merge(pages, on="url", how="left")
        merged["http_status"] = [200 if ok else 404 for ok in merged["html"].notna()]
        return merged


def _bucket_batch(batch: pa.Table, n_buckets: int) -> pa.Table:
    from ..sources.pages import url_bucket

    buckets = [url_bucket(u, n_buckets) for u in batch.column("url").to_pylist()]
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


def run_crawl(
    pages_dir: str,
    seeds_path: str,
    out_dir: str,
    budget_per_host: int | None = None,
    n_buckets: int = 8,
    n_seen_shards: int = 4,
    robots_map: dict | None = None,
    respect_robots: bool = False,
    max_waves: int = 100,
    resume: bool = True,
    enrich_concurrency: int | None = None,
) -> dict:
    """Run the full crawl to frontier exhaustion. Returns summary counters."""
    os.makedirs(out_dir, exist_ok=True)
    seen = SeenSet(n_shards=n_seen_shards)
    robots = RobotsCache(robots_map, n_shards=2) if respect_robots else None

    start_wave = 0
    frontier_path = seeds_path
    if resume:
        done = sorted(
            d for d in os.listdir(out_dir)
            if d.startswith("epoch=") and os.path.exists(os.path.join(out_dir, d, "_COMPLETE"))
        )
        if done:
            last = os.path.join(out_dir, done[-1])
            start_wave = int(done[-1].split("=")[1]) + 1
            seen.restore(os.path.join(last, "seen_shards"))
            frontier_path = os.path.join(last, "frontier_next.parquet")

    totals: dict[str, int] = {}
    wave = start_wave
    while wave < start_wave + max_waves:
        frontier_tbl = pq.read_table(frontier_path)
        if frontier_tbl.num_rows == 0:
            break
        epoch_dir = os.path.join(out_dir, f"epoch={wave:04d}")
        os.makedirs(epoch_dir, exist_ok=True)
        counters: list[tuple[str, str, int]] = []  # (partition, counter, value)

        fr = ray.data.from_arrow(frontier_tbl)
        if "url_hash" not in frontier_tbl.column_names:
            fr = fr.map_batches(canonicalize_batch, batch_format="pyarrow")
        # within-wave exact dedup (shuffle on url_hash)
        fr = fr.groupby("url_hash").map_groups(dedup_frontier_group, batch_format="pandas")
        # cross-wave anti-join via filter shards (no shuffle; actor lookups)
        fr = fr.map_batches(
            _SeenFilter(seen.shards, seen.n_shards), batch_format="pyarrow", batch_size=4096
        )
        fresh = fr.materialize()  # narrow url rows; scheduling + counters reuse it
        n_fresh = fresh.count()
        counters.append(("*", "frontier_in", frontier_tbl.num_rows))
        counters.append(("*", "fresh_after_dedup", n_fresh))
        if n_fresh == 0:
            _finish_epoch(epoch_dir, seen, None, counters, wave)
            frontier_path = os.path.join(epoch_dir, "frontier_next.parquet")
            wave += 1
            break

        if robots is not None:
            rob = robots  # capture

            def robots_gate(batch: pa.Table) -> pa.Table:
                ok = rob.allowed(
                    batch.column("host").to_pylist(), batch.column("canonical_url").to_pylist()
                )
                return batch.filter(pa.array(ok))

            before = n_fresh
            fresh = fresh.map_batches(robots_gate, batch_format="pyarrow").materialize()
            blocked = before - fresh.count()
            counters.append(("*", "robots_blocked", blocked))

        # politeness schedule (shuffle on host), then split
        ranked = fresh.groupby("host").map_groups(
            lambda g: schedule_host_group(g, budget_per_host), batch_format="pandas"
        ).materialize()
        scheduled = ranked.map_batches(
            lambda t: t.filter(t.column("scheduled")), batch_format="pyarrow"
        )
        deferred = ranked.map_batches(
            lambda t: t.filter(pa.compute.invert(t.column("scheduled"))), batch_format="pyarrow"
        ).drop_columns(["scheduled"])

        # deterministic crawl order for the wave (conformance artifact)
        sched_pdf = scheduled.to_pandas()  # narrow: url+metadata only
        sched_pdf = crawl_order_pandas(sched_pdf)
        per_host = sched_pdf.groupby("host").size()
        for host, cnt in per_host.items():
            counters.append((str(host), "scheduled", int(cnt)))
        sched_order = pa.Table.from_pandas(
            sched_pdf[["url", "url_hash", "host", "priority", "discovery_ts", "crawl_order"]],
            preserve_index=False,
        )
        pq.write_table(sched_order, os.path.join(epoch_dir, "schedule.parquet"))

        # mark scheduled as seen (exactly once per url_hash)
        seen.check_and_add_hashes(sched_pdf["url_hash"].tolist())

        # fetch (bucketed lookup join) + article pipeline
        sched_ds = ray.data.from_pandas(sched_pdf)
        sched_ds = sched_ds.map_batches(
            lambda t: _bucket_batch(t, n_buckets), batch_format="pyarrow"
        )
        fetch = _FetchBucket(pages_dir)
        fetched = sched_ds.groupby("bucket").map_groups(
            lambda g: fetch(g), batch_format="pandas"
        )
        hits = fetched.map_batches(
            lambda t: t.filter(pa.compute.equal(t.column("http_status"), 200)),
            batch_format="pyarrow",
        ).materialize()
        n_hits = hits.count()
        counters.append(("*", "fetched", n_hits))
        counters.append(("*", "fetch_missed", len(sched_pdf) - n_hits))

        if n_hits:
            articles = article_pipeline(hits, enrich_concurrency=enrich_concurrency)
            art_dir = os.path.join(epoch_dir, "articles")
            articles.write_parquet(art_dir)
            n_articles = ray.data.read_parquet(art_dir).count()
        else:
            n_articles = 0
        counters.append(("*", "articles_stored", n_articles))

        _finish_epoch(epoch_dir, seen, deferred, counters, wave)
        for part, name, val in counters:
            totals[name] = totals.get(name, 0) + val
        frontier_path = os.path.join(epoch_dir, "frontier_next.parquet")
        wave += 1

    totals["waves"] = wave - start_wave
    totals["seen_total"] = seen.total_size()
    with open(os.path.join(out_dir, "SUMMARY.json"), "w") as f:
        json.dump(totals, f)
    seen.shutdown()
    if robots is not None:
        robots.shutdown()
    return totals


def _finish_epoch(epoch_dir, seen, deferred, counters, wave) -> None:
    """Write frontier snapshot + shard checkpoint + counters, then _COMPLETE."""
    deferred_tbl = _empty_frontier()
    if deferred is not None:
        refs = deferred.map_batches(
            lambda t: t.select(FRONTIER_COLS), batch_format="pyarrow"
        ).to_arrow_refs()
        tables = [ray.get(r) for r in refs]
        tables = [t.select(FRONTIER_COLS).cast(deferred_tbl.schema) for t in tables if t.num_rows]
        if tables:
            deferred_tbl = pa.concat_tables(tables)
    pq.write_table(deferred_tbl, os.path.join(epoch_dir, "frontier_next.parquet"))
    seen.checkpoint(os.path.join(epoch_dir, "seen_shards"))
    ctbl = pa.table(
        {
            "wave": pa.array([wave] * len(counters), pa.int32()),
            "partition": pa.array([c[0] for c in counters], pa.string()),
            "counter": pa.array([c[1] for c in counters], pa.string()),
            "value": pa.array([c[2] for c in counters], pa.int64()),
        }
    )
    pq.write_table(ctbl, os.path.join(epoch_dir, "counters.parquet"))
    with open(os.path.join(epoch_dir, "_COMPLETE"), "w") as f:
        f.write("ok")


def _empty_frontier() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "priority": pa.array([], pa.int32()),
            "depth": pa.array([], pa.int32()),
            "discovery_ts": pa.array([], pa.timestamp("us")),
            "canonical_url": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "url_hash": pa.array([], pa.string()),
        }
    )
