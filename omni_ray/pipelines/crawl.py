"""The crawl orchestrator: a driver loop of bounded Dataset waves
(SURVEY.md §3.1 Ray-native restatement; north_rule's streaming frontier loop).

Wave anatomy — ONE fused map chain, ONE frontier shuffle, one fetch shuffle:

  frontier parquet
    → map_batches[fused: canonicalize+hash → seen-annotate (sharded filter
      actors, J2 anti-join) → robots-annotate (robots actors, ST5)]
    → groupby(host).map_groups[dedup by url_hash + politeness budget rank]
      (the single frontier shuffle: dup url_hashes share a host, so host
      grouping subsumes url_hash grouping)
    → driver: split scheduled/deferred, assign deterministic crawl order,
      write schedule + next-frontier snapshots, check_and_add scheduled
      hashes into the seen shards, emit lineage counters
    → scheduled → bucket by md5(url) → groupby(bucket).map_groups[fetch =
      partitioned lookup against the hash-bucketed pages parquet]
      (or, with ``fetch_backend_factory``, a FetchStage actor pool over the
      pluggable seam — parquet store / real HTTP / fallback chain — with
      page metadata riding FetchResult.meta)
    → clean/extract/enrich/validate/assemble → epoch parquet.

In the distributed regime (the default), fetch→extract is ONE streaming
execution per wave (extraction of early buckets overlaps fetching of later
ones), seen-marking runs as its own narrow background pass, and each wave's
fetch→extract→store runs as a background job on a single-worker executor so
the driver prepares wave N+1's split while wave N's extract still streams.

The frontier metadata (urls only, no html) passes through the driver per
wave for scheduling artifacts — at 10^10-URL scale this split writes back to
Parquet via Dataset ops keyed on the same host partitioning instead
(threshold switch left explicit at ``DRIVER_FRONTIER_MAX``); the wide html
rows NEVER pass through the driver in either mode.

Checkpoint/resume (north_rule): each epoch dir holds the wave's outputs, the
NEXT frontier snapshot, serialized filter shards, per-partition lineage
counters, and a _COMPLETE marker written last. Resume restores shards from
the last complete epoch and continues from its frontier snapshot.
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
from ..state.filters import SeenSet, route_packed_digests
from ..state.robots import RobotsCache
from .articles import article_pipeline
from .frontier import SORT_ASC, SORT_COLS

FRONTIER_COLS = ["url", "source", "priority", "depth", "discovery_ts",
                 "canonical_url", "host", "url_hash"]

# beyond this many frontier rows per wave, the driver-side split would need
# to move to the distributed path (groupby(host) → write via Dataset ops)
DRIVER_FRONTIER_MAX = 50_000_000


def _dedup_and_rank(group: pd.DataFrame, budget_per_host: int | None) -> pa.Table:
    """Vectorized dedup + politeness rank over a frame holding WHOLE host
    groups (one host never spans two calls — the shuffle key is
    hash(host) % N buckets). Per host: drop already-seen rows, dedup url_hash
    (first-wins under (priority desc, discovery_ts, url) order), rank allowed
    rows, flag ``scheduled`` within the budget. All column-wise pandas ops —
    no per-host Python apply (a long host tail makes per-group calls the
    bottleneck: ~1.5 ms × #hosts)."""
    g = group.sort_values(["host"] + SORT_COLS, ascending=[True] + SORT_ASC,
                          kind="mergesort")
    fresh = g[~g["seen"]].drop_duplicates("url_hash", keep="first").copy()
    allowed = fresh["robots_allowed"].to_numpy()
    # rank among allowed rows within each host, vectorized (cumsum per host);
    # persisted into the deferred snapshot (shifted by the budget) so a
    # discovery-free next wave can split by rank comparison alone — see the
    # pre-ranked fast path in run_crawl
    ranks = (
        pd.Series(allowed.astype("int64"), index=fresh.index)
        .groupby(fresh["host"].to_numpy(), sort=False)
        .cumsum()
        .to_numpy()
        - 1
    )
    fresh["host_rank"] = ranks
    if budget_per_host is None:
        fresh["scheduled"] = allowed
    else:
        fresh["scheduled"] = allowed & (ranks < budget_per_host)
    # Arrow return with metadata stripped (see _FetchBucket.__call__): the
    # types match what Ray's own pandas→Arrow block conversion would infer,
    # minus the b'pandas' schema metadata that breaks hash(schema)
    return pa.Table.from_pandas(
        fresh, preserve_index=False
    ).replace_schema_metadata(None)


class _AnnotateStage:
    """Fused per-batch stage: canonicalize + seen-annotate + robots-annotate.
    Holds shard handles; ≤ n_shards actor round-trips per batch.

    ``skip_seen=True`` (set per-wave by the driver when the seen set is
    provably empty — fresh wave 0, no resume) elides the contains RPCs
    entirely: every row is unseen by construction."""

    def __init__(self, seen_shards, n_seen, robots_shards, n_robots,
                 user_agent="omni-ray", skip_seen=False):
        self.seen_shards = seen_shards
        self.n_seen = n_seen
        self.robots_shards = robots_shards
        self.n_robots = n_robots
        self.skip_seen = skip_seen

    def __call__(self, batch: pa.Table) -> pa.Table:
        # re-canonicalize when the column is absent OR partially null — a
        # promoted concat of a 5-col seed file with 8-col discovery records
        # leaves the seed rows' url_hash null (canonicalize_batch is
        # idempotent, so recomputing the whole batch is safe)
        if ("url_hash" not in batch.column_names
                or batch.column("url_hash").null_count > 0):
            batch = canonicalize_batch(batch)
        hashes = batch.column("url_hash").to_pylist()
        if self.skip_seen:
            seen = [False] * len(hashes)
        else:
            groups = route_packed_digests(hashes, self.n_seen)
            futures = {
                sid: self.seen_shards[sid].contains.remote(packed)
                for sid, (packed, _idx) in groups.items()
            }
            seen = [False] * len(hashes)
            for sid, (_packed, idxs) in groups.items():
                for i, s in zip(idxs, ray.get(futures[sid])):
                    seen[int(i)] = s
        allowed = [True] * len(hashes)
        if self.robots_shards is not None:
            hosts = batch.column("host").to_pylist()
            urls = batch.column("canonical_url").to_pylist()
            rgroups: dict[int, list[int]] = {}
            for idx, h in enumerate(hosts):
                rgroups.setdefault(RobotsCache.shard_of(h or "", self.n_robots), []).append(idx)
            rfut = {
                sid: self.robots_shards[sid].allowed.remote(
                    [hosts[i] for i in idxs], [urls[i] for i in idxs]
                )
                for sid, idxs in rgroups.items()
            }
            for sid, idxs in rgroups.items():
                for i, ok in zip(idxs, ray.get(rfut[sid])):
                    allowed[i] = ok
        eligible = [not s and a for s, a in zip(seen, allowed)]
        import hashlib as _hashlib
        import numpy as np

        # hosts repeat heavily — md5 only the dictionary, scatter via indices
        hcol = pa.compute.fill_null(batch.column("host"), "").combine_chunks()
        if isinstance(hcol, pa.ChunkedArray):
            hcol = hcol.chunk(0) if hcol.num_chunks == 1 else pa.concat_arrays(hcol.chunks)
        denc = hcol.dictionary_encode()
        ub = np.fromiter(
            (int(_hashlib.md5(h.encode()).hexdigest()[:8], 16) % 64
             for h in denc.dictionary.to_pylist()),
            dtype=np.int32, count=len(denc.dictionary),
        )
        hb = ub[np.asarray(denc.indices)] if len(ub) else np.empty(0, np.int32)
        return (
            batch.append_column("seen", pa.array(seen, pa.bool_()))
            .append_column("robots_allowed", pa.array(allowed, pa.bool_()))
            .append_column("eligible", pa.array(eligible, pa.bool_()))
            .append_column("host_bucket", pa.array(hb, pa.int32()))
        )


@ray.remote(num_cpus=0)
class _WaveCounter:
    """Per-wave lineage tally for the streaming fetch stage (fetch is fused
    into the extract execution, so there is no materialized dataset to count
    afterwards — the north_rule's per-partition counters come from here).

    Adds are keyed by (wave, fine-bucket id), making them IDEMPOTENT under
    Ray task retries / lineage recomputation: a re-executed bucket overwrites
    its own entry instead of double-counting (same requirement the fused
    _SeenAdd documents for actor side effects). Waves overlap now (wave N's
    stream can still be finishing while wave N+1's fetch starts), so tallies
    are stored PER WAVE instead of reset — a late add from a re-executed
    wave-N task lands in wave N's own dict and cannot corrupt wave N+1."""

    def __init__(self):
        self.waves: dict[int, dict[int, tuple[int, int]]] = {}

    def add(self, wave: int, key: int, total: int, hits: int) -> None:
        self.waves.setdefault(wave, {})[key] = (total, hits)

    def get(self, wave: int) -> tuple[int, int]:
        buckets = self.waves.get(wave, {})
        return (sum(t for t, _ in buckets.values()),
                sum(h for _, h in buckets.values()))


class _FetchBucket:
    """groupby('bucket').map_groups body: look up html for a bucket's urls in
    the hash-partitioned pages table (reads ONLY that bucket's file).

    The group key may be a FINE bucket (``n_files × k``): md5 % (n·k) % n ==
    md5 % n, so every fine bucket maps to exactly one pages file. Fine
    bucketing exists to emit more, smaller output blocks — with one
    block per file, the downstream extract stage runs one task per core and
    goes straggler-bound (measured ~35% idle at 32 cpus).

    When the store was written with a ``sub_bucket`` column
    (``_PAGES_META.json`` present — see sources/pages.py), each fine task
    additionally filters ``sub_bucket ∈ {b, b+n_fine, …}``, which parquet
    prunes at row-group level: k fine tasks per file decode DISJOINT slices
    instead of each decoding the whole file (k× redundant CPU otherwise)."""

    def __init__(self, pages_dir: str, n_files: int | None = None, counter=None,
                 wave: int = -1, n_fine: int | None = None):
        self.pages_dir = pages_dir
        self.n_files = n_files
        self.counter = counter
        self.wave = wave
        self.n_fine = n_fine
        self.n_sub = None
        meta_path = os.path.join(pages_dir, "_PAGES_META.json")
        if n_fine and os.path.exists(meta_path):
            import json

            with open(meta_path) as f:
                meta = json.load(f)
            # the sub filter is only sound when fine buckets align with the
            # store's sub granularity (n_fine | n_sub) and file count matches
            if (meta.get("n_files") == n_files
                    and meta.get("n_sub", 0) % n_fine == 0):
                self.n_sub = int(meta["n_sub"])

    def __call__(self, group: pd.DataFrame) -> pa.Table:
        import pyarrow.compute as pc

        bucket = int(group["bucket"].iloc[0])
        if self.n_files:
            bucket = bucket % self.n_files
        path = os.path.join(self.pages_dir, f"bucket-{bucket:04d}.parquet")
        urls = group["url"].tolist()
        if os.path.exists(path):
            filt = pc.field("url").isin(urls)
            if self.n_sub and self.n_fine and self.n_fine > self.n_files:
                fine = int(group["bucket"].iloc[0]) % self.n_fine
                filt = pc.field("sub_bucket").isin(
                    list(range(fine, self.n_sub, self.n_fine))
                ) & filt
            tbl = pq.read_table(
                path,
                columns=["url", "warc_ts", "html", "lang"],
                filters=filt,
            )
            pages = tbl.to_pandas()
        else:
            pages = pd.DataFrame(columns=["url", "warc_ts", "html", "lang"])
        merged = group.merge(pages, on="url", how="left")
        merged["http_status"] = [200 if ok else 404 for ok in merged["html"].notna()]
        if self.counter is not None:
            # synchronous add: the stage's completion must imply the tally
            # is readable (fire-and-forget could race the driver's get());
            # keyed by the fine bucket so task retries overwrite, not double
            ray.get(self.counter.add.remote(
                self.wave, int(group["bucket"].iloc[0]),
                len(merged), int(merged["html"].notna().sum())
            ))
        # return Arrow with schema-level metadata stripped: Ray would convert
        # this pandas frame with from_pandas anyway (same types), but the
        # b'pandas' schema metadata it attaches makes hash(schema) RAISE in
        # pyarrow 16 — every downstream articles-chain task then logs
        # "Failed to hash the schemas" and Ray loses its unify fast path
        return pa.Table.from_pandas(
            merged, preserve_index=False
        ).replace_schema_metadata(None)


class _FetchStageCounting:
    """FetchStage (stages/fetchbackend.py — any FetchBackend: parquet store,
    HTTP, fallback chain) wrapped with the wave's idempotent lineage tally.
    The tally key is content-derived (md5 of first url + row count): Ray
    retries re-run the same block with the same batching, so a re-executed
    batch overwrites its own entry (the _WaveCounter contract)."""

    def __init__(self, backend_factory, timeout_s, counter, wave):
        from ..stages.fetchbackend import FetchStage

        self.stage = FetchStage(backend_factory, timeout_s=timeout_s)
        self.counter = counter
        self.wave = wave

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        import hashlib as _hashlib

        out = self.stage(batch)
        if self.counter is not None and len(batch):
            key = int(_hashlib.md5(
                (str(batch["url"].iloc[0]) + ":" + str(len(batch))).encode()
            ).hexdigest()[:12], 16)
            hits = int(pa.compute.sum(pa.compute.cast(
                pa.compute.equal(out["http_status"], 200), pa.int64()
            )).as_py() or 0)
            ray.get(self.counter.add.remote(
                self.wave, key, out.num_rows, hits))
        return out


def _fetch_dataset(sched_ds, pages_dir, n_buckets, wave_counter, wave, cpus,
                   fetch_backend_factory, fetch_timeout_s):
    """The wave's fetch stage: default = hash-bucketed parquet lookup
    (groupby(bucket).map_groups(_FetchBucket)); with a backend factory =
    the FetchStage actor pool over the pluggable seam (HTTP, chain, store),
    emitting the same (html, warc_ts, lang, http_status) surface."""
    if fetch_backend_factory is not None:
        return sched_ds.map_batches(
            _FetchStageCounting,
            fn_constructor_kwargs=dict(
                backend_factory=fetch_backend_factory,
                timeout_s=fetch_timeout_s, counter=wave_counter, wave=wave),
            batch_format="pandas", batch_size=256,
            concurrency=max(2, cpus // 2),
        )
    n_fine = n_buckets * _fine_factor(cpus, n_buckets)
    ds = sched_ds.map_batches(
        lambda t: _bucket_batch(t, n_fine), batch_format="pyarrow"
    )
    fetch = _FetchBucket(pages_dir, n_files=n_buckets, counter=wave_counter,
                         wave=wave, n_fine=n_fine)
    return ds.groupby("bucket").map_groups(
        lambda g: fetch(g), batch_format="pandas"
    )


def _bucket_batch(batch: pa.Table, n_buckets: int) -> pa.Table:
    from ..sources.pages import batch_url_buckets

    buckets = batch_url_buckets(batch.column("url").to_pylist(), n_buckets)
    return batch.append_column("bucket", pa.array(buckets, type=pa.int32()))


def _fine_factor(cpus: int, n_buckets: int) -> int:
    """Fine-bucket multiplier (≈2 fine buckets per core), rounded DOWN to a
    power of two capped at SUB_BUCKET_FACTOR, so n_fine divides the store's
    sub-bucket count and _FetchBucket's row-group pruning stays exact."""
    from ..sources.pages import SUB_BUCKET_FACTOR

    want = max(1, (2 * cpus) // n_buckets)
    k = 1
    while k * 2 <= min(want, SUB_BUCKET_FACTOR):
        k *= 2
    return k


class _SeenAdd:
    """map_batches passthrough that marks every row's url_hash as seen in the
    sharded filter actors (distributed check_and_add; idempotent set-add, so
    Ray task retries are safe)."""

    def __init__(self, shards, n_shards):
        self.shards = shards
        self.n_shards = n_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = batch.column("url_hash").to_pylist()
        groups = route_packed_digests(hashes, self.n_shards)
        ray.get(
            [self.shards[sid].check_and_add.remote(packed)
             for sid, (packed, _idx) in groups.items()]
        )
        return batch


def _discoveries_to_frontier(extra: pa.Table) -> pa.Table:
    """Normalize freshly discovered records (sources/discovery.discover_batch
    output, or any table carrying url/source/priority/depth/discovery_ts) into
    the frontier snapshot schema: canonicalize, drop feed-only columns
    (title/published), cast. The result deliberately carries NO host_rank —
    the promoted concat in the wave loop nulls that column across the merged
    snapshot, which forces the full annotate+rank split (the pre-ranked fast
    path is only sound for a pure deferred snapshot)."""
    extra = canonicalize_batch(extra)
    return extra.select(FRONTIER_COLS).cast(_frontier_schema())


def _read_frontier(path: str) -> pa.Table:
    """Frontier snapshot reader: a single parquet file (driver mode) or a
    directory of part files (distributed mode)."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not files:
            return _frontier_schema().empty_table()
        # promote: a snapshot mixing pre-ranked parts (host_rank column)
        # with externally merged discoveries (no host_rank) concats with
        # nulls — which correctly disables the pre-ranked fast path
        return pa.concat_tables(
            [pq.read_table(f) for f in files], promote_options="default"
        )
    return pq.read_table(path)


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
    distributed_frontier: bool = True,
    discover_fn=None,
    fetch_backend_factory=None,
    fetch_timeout_s: float = 10.0,
) -> dict:
    """Run the full crawl to frontier exhaustion. Returns summary counters.

    ``discover_fn`` (continuous mode — the reference's flagship
    ``run_continuous`` cycle, omni_orchestrator.py:209-245 + per-cycle
    ``run_discovery``, url_discovery_engine.py:91-106): called once at the
    top of every wave with the wave number; returns an Arrow table of
    freshly discovered frontier records (url/source/priority/depth/
    discovery_ts at minimum), an EMPTY table for "nothing this cycle, keep
    polling", or None for "feed schedule exhausted". Non-empty discoveries
    are canonicalized and unioned into the wave's frontier via the promoted
    concat (their missing host_rank nulls the column, which correctly forces
    the full annotate+rank split for that wave — re-discovered urls whose
    hash was already scheduled are dropped by the seen-shard anti-join,
    exactly the reference's Redis ``_is_visited`` semantics). An empty
    frontier with a live discovery source is an idle cycle: no epoch is
    written and the loop keeps polling until ``max_waves``.

    ``distributed_frontier`` (the DEFAULT) selects the 10^10-scale wave
    regime: the frontier split, seen-set marking, schedule artifact and
    next-frontier snapshot all stay Dataset operations (nothing but per-wave
    COUNTS reaches the driver), and the epoch checkpoint writes (schedule
    sort, deferred snapshot, seen-shard checkpoint) run in background threads
    overlapped with the wave's fetch+extract stage — _COMPLETE is only
    written after they all land. The driver-pandas path
    (``distributed_frontier=False``) is competitive below
    DRIVER_FRONTIER_MAX rows per wave and produces bit-identical schedules;
    the distributed path orders the schedule by writing sorted part files
    (global crawl_order = row position in filename order — same
    deterministic order)."""
    import concurrent.futures as _cf
    os.makedirs(out_dir, exist_ok=True)
    seen = SeenSet(n_shards=n_seen_shards)
    robots = RobotsCache(robots_map, n_shards=2) if respect_robots else None

    start_wave = 0
    frontier_path = seeds_path
    if not resume:
        # explicit fresh start into a previously-used out_dir: clear old
        # epoch state (write_parquet APPENDS part files, so leftover COMPLETE
        # dirs would otherwise accumulate duplicate rows under a stale marker)
        import shutil

        for d in os.listdir(out_dir):
            if d.startswith("epoch="):
                shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
        summary = os.path.join(out_dir, "SUMMARY.json")
        if os.path.exists(summary):
            os.remove(summary)
    if resume:
        done = sorted(
            d for d in os.listdir(out_dir)
            if d.startswith("epoch=") and os.path.exists(os.path.join(out_dir, d, "_COMPLETE"))
        )
        if done:
            last = os.path.join(out_dir, done[-1])
            start_wave = int(done[-1].split("=")[1]) + 1
            seen.restore(os.path.join(last, "seen_shards"))
            # snapshot is a file (driver mode) or a parts dir (distributed)
            fp = os.path.join(last, "frontier_next.parquet")
            frontier_path = fp if os.path.exists(fp) else os.path.join(last, "frontier_next")

    # fresh run ⇒ wave 0's seen set is provably empty: its annotate pass can
    # skip every contains RPC (the seeds are the first hashes ever offered)
    seen_known_empty = start_wave == 0

    def _make_annotate(skip_seen: bool) -> "_AnnotateStage":
        return _AnnotateStage(
            seen.shards, seen.n_shards,
            robots.shards if robots else None,
            robots.n_shards if robots else 0,
            skip_seen=skip_seen,
        )

    totals: dict[str, int] = {}

    def _acc(counters) -> None:
        # fold this wave's counters into the run totals — called on EVERY
        # wave exit path, including the terminating empty wave
        for _part, name, val in counters:
            totals[name] = totals.get(name, 0) + val

    completer_failed: list = []  # poison flag: stop marking epochs complete

    def _complete_epoch(futs, epoch_dir, counters, wave) -> None:
        # completer body: all artifacts down, then counters + marker + totals.
        # If an EARLIER epoch's completion failed, refuse to write any later
        # _COMPLETE marker: the resume scan treats the last marker as a
        # complete prefix, so markers must stay contiguous.
        if completer_failed:
            raise RuntimeError(
                f"skipping epoch completion for wave {wave}: an earlier "
                "epoch's completion failed"
            )
        try:
            for f in futs:
                f.result()
            _mark_complete(epoch_dir, counters, wave)
            _acc(counters)
        except BaseException:
            completer_failed.append(wave)
            raise

    def _finish_and_acc(epoch_dir, counters, wave) -> None:
        if completer_failed:
            raise RuntimeError(
                f"skipping epoch completion for wave {wave}: an earlier "
                "epoch's completion failed"
            )
        try:
            _finish_epoch(epoch_dir, seen, None, counters, wave)
            _acc(counters)
        except BaseException:
            completer_failed.append(wave)
            raise

    pool = _cf.ThreadPoolExecutor(max_workers=4)
    # SINGLE-worker completer: joins an epoch's background writes, then
    # writes counters + _COMPLETE and folds totals — overlapped with the
    # NEXT wave's split/fetch/extract. One worker ⇒ epochs complete strictly
    # in wave order (resume scans for the LAST complete epoch) and `totals`
    # has a single mutator thread.
    completer = _cf.ThreadPoolExecutor(max_workers=1)
    # SINGLE-worker job executor (distributed mode): each wave's
    # fetch→extract→store runs as one background job, so the driver prepares
    # wave N+1's split (annotate/rank/schedule artifacts) while wave N's
    # extract still streams. One worker ⇒ jobs run back-to-back in wave
    # order, which keeps completer submissions (and _COMPLETE markers) in
    # wave order and never runs two extract chains concurrently.
    jobs = _cf.ThreadPoolExecutor(max_workers=1)
    epoch_futs: list = []
    job_futs: list = []
    wave_counter = _WaveCounter.remote()  # per-wave fetch lineage tally
    import time as _time

    _timing = os.environ.get("OMNI_RAY_TIMING") == "1"
    _t0 = [_time.perf_counter()]

    def _tick(label: str) -> None:
        if _timing:
            now = _time.perf_counter()
            print(f"[crawl-timing] {label}: {now - _t0[0]:.2f}s", flush=True)
            _t0[0] = now

    def _run_wave_job(sched_ds, epoch_dir, counters, wave, pending):
        """One wave's fetch→extract→store, run on the single-worker job
        executor. Fetch and extract are ONE streaming execution: the sort's
        reduce tasks only do the bucket lookup, and the streaming
        repartition after the hit-filter restores per-block extract tasks —
        extraction of early buckets overlaps fetching of later ones (the
        old post-fetch materialize barrier cost ~2 s per wave at 32 cpus;
        the seen-marking that barrier used to order now runs as its own
        narrow pass, see _mark_and_ckpt in the caller)."""
        cpus = int(ray.cluster_resources().get("CPU", 8))
        fetched = _fetch_dataset(
            sched_ds, pages_dir, n_buckets, wave_counter, wave, cpus,
            fetch_backend_factory, fetch_timeout_s)
        hits = fetched.map_batches(
            lambda t: t.filter(pa.compute.equal(t.column("http_status"), 200)),
            batch_format="pyarrow",
        )
        # the sort sizes its output partitions from its (narrow, bundled)
        # input blocks — a handful of wide blocks would run extract at
        # matching low parallelism; split rows-per-block WITHOUT an
        # all-to-all so the CPU-heavy extract stage fills the cluster
        hits = hits.repartition(target_num_rows_per_block=int(os.environ.get("OMNI_RAY_EXTRACT_BLOCK_ROWS", "1024")))
        articles = article_pipeline(
            hits, enrich_concurrency=enrich_concurrency
        ).materialize()
        _tick("job-fetch-extract")
        if os.environ.get("OMNI_RAY_STATS") == "1":
            print(articles.stats(), flush=True)
        n_articles = articles.count()
        n_total, n_hits = ray.get(wave_counter.get.remote(wave))
        # every scheduled row flowed through fetch, so n_total == n_sched
        counters.append(("*", "fetched", int(n_hits)))
        counters.append(("*", "fetch_missed", n_total - int(n_hits)))
        counters.append(("*", "articles_stored", n_articles))
        if n_articles:
            from .articles import entities_pipeline

            w1 = pool.submit(
                articles.write_parquet, os.path.join(epoch_dir, "articles")
            )
            w2 = pool.submit(
                lambda a=articles: entities_pipeline(a).write_parquet(
                    os.path.join(epoch_dir, "entities")
                )
            )
            pending.extend([w1, w2])
        epoch_futs.append(completer.submit(
            _complete_epoch, list(pending), epoch_dir, counters, wave))

    def _empty_wave_job(epoch_dir, counters, wave):
        # routed through the JOB executor so it queues behind every earlier
        # wave's job — keeps completer submissions in wave order
        epoch_futs.append(completer.submit(
            _finish_and_acc, epoch_dir, counters, wave))

    # wave N-1's seen-marking + shard-checkpoint chain: joined at loop-top
    # before wave N's annotate reads the shards
    mark_ckpt_fut = None
    prev_deferred_fut = None

    try:
        wave = start_wave
        while wave < start_wave + max_waves:
            _tick("loop-top")
            # join wave N-1's deferred-frontier snapshot (we read it next)
            # and its seen-marking/checkpoint chain (annotate reads, then
            # this wave's marking mutates, the same shard actors)
            if prev_deferred_fut is not None:
                prev_deferred_fut.result()
                prev_deferred_fut = None
                _tick("join-deferred")
            if mark_ckpt_fut is not None:
                mark_ckpt_fut.result()
                mark_ckpt_fut = None
                _tick("join-mark")
            # surface background job/completion errors promptly
            for f in job_futs + epoch_futs:
                if f.done():
                    f.result()
            frontier_tbl = _read_frontier(frontier_path)
            _tick("read-frontier")
            n_disc = 0
            discovery_dry = discover_fn is None
            if discover_fn is not None:
                extra = discover_fn(wave)
                if extra is None:
                    discovery_dry = True
                elif extra.num_rows:
                    extra = _discoveries_to_frontier(extra)
                    n_disc = extra.num_rows
                    frontier_tbl = (
                        extra if frontier_tbl.num_rows == 0
                        else pa.concat_tables(
                            [frontier_tbl, extra], promote_options="default"
                        )
                    )
                    _tick("merge-discoveries")
            epoch_dir = os.path.join(out_dir, f"epoch={wave:04d}")
            counters: list[tuple[str, str, int]] = []
            if frontier_tbl.num_rows == 0:
                if not discovery_dry:
                    # idle cycle: nothing deferred and nothing discovered,
                    # but the feed schedule is still live — keep polling
                    # (reference: a cycle that finds no URLs just waits for
                    # the next interval, omni_orchestrator.py:86-87)
                    wave += 1
                    continue
                break
            if os.path.isdir(epoch_dir) and not os.path.exists(
                os.path.join(epoch_dir, "_COMPLETE")
            ):
                # partial output from a killed run (write_parquet appends to
                # existing dirs, so stale part files would duplicate rows)
                import shutil

                shutil.rmtree(epoch_dir)
            os.makedirs(epoch_dir, exist_ok=True)
            counters.append(("*", "frontier_in", frontier_tbl.num_rows))
            if n_disc:
                counters.append(("*", "discovered", n_disc))

            # ---- frontier split ----------------------------------------------
            # from_arrow(table) yields ONE block; slice driver-side (zero-copy
            # views) instead of a repartition stage, which would round-trip
            # the whole frontier through the object store just to split it
            n_parts = max(8, min(64, frontier_tbl.num_rows // 2048))
            step = -(-frontier_tbl.num_rows // n_parts)  # ceil
            fr = ray.data.from_arrow([
                frontier_tbl.slice(i, step)
                for i in range(0, frontier_tbl.num_rows, step)
            ])
            pre_ranked = (
                distributed_frontier
                and budget_per_host is not None
                and robots is None
                and frontier_tbl.num_rows > 0
                and "host_rank" in frontier_tbl.column_names
                and frontier_tbl.column("host_rank").null_count == 0
            )
            if pre_ranked:
                # incremental-frontier fast path: every row came out of the
                # previous wave's deferred snapshot, i.e. it is already
                # canonicalized, url_hash-deduped, politeness-ranked, and
                # provably unseen (a url_hash is deduped to one row at entry,
                # so the scheduled and deferred sets stay disjoint forever) —
                # the split is a per-row rank comparison: no seen-shard
                # round-trips, no host shuffle. Any externally merged
                # discovery lacks host_rank (nulled through the promoted
                # concat) and forces the full path below. This is how a
                # real frontier behaves at 10^10 URLs: maintained
                # incrementally, never rebuilt per wave.
                ranked = fr.map_batches(
                    lambda t, b=budget_per_host: (
                        t.append_column(
                            "seen", pa.array([False] * t.num_rows, pa.bool_())
                        )
                        .append_column(
                            "robots_allowed",
                            pa.array([True] * t.num_rows, pa.bool_()),
                        )
                        .append_column(
                            "scheduled",
                            pa.compute.less(
                                pa.compute.cast(t.column("host_rank"), pa.int64()),
                                b,
                            ),
                        )
                    ),
                    batch_format="pyarrow",
                )
            else:
                # full split: fused annotate chain + single host shuffle on
                # hash(host)%64 buckets (not raw host): a long host tail
                # would make per-group overhead dominate; the rank fn is
                # vectorized over whole buckets and host groups never span
                # buckets
                fr = fr.map_batches(
                    _make_annotate(seen_known_empty),
                    batch_format="pyarrow", batch_size=2048,
                )
                ranked = fr.groupby("host_bucket").map_groups(
                    lambda g: _dedup_and_rank(g, budget_per_host), batch_format="pandas"
                )

            if distributed_frontier:
                out = _wave_distributed(
                    ranked, seen, epoch_dir, counters, robots is not None, pool,
                    budget_per_host,
                )
                if out is None:
                    # route through the JOB queue (then the completer) so
                    # this epoch's _COMPLETE lands after every earlier
                    # epoch's
                    job_futs.append(jobs.submit(
                        _empty_wave_job, epoch_dir, counters, wave))
                    frontier_path = os.path.join(epoch_dir, "frontier_next")
                    wave += 1
                    if not discovery_dry:
                        # continuous mode: this cycle's discoveries were all
                        # already seen/blocked, but the feed is still live
                        continue
                    break
                sched_ds, pending, deferred_fut = out
                _tick("wave-split")
                seen_known_empty = False  # this wave's marking is in flight

                # seen-marking as its OWN narrow pass over the materialized
                # ranked blocks, chained with the epoch's shard checkpoint —
                # off the fetch path, so the fetch→extract stream needs no
                # materialize barrier; the NEXT wave's annotate joins this
                # chain at loop-top before reading the shards
                def _mark_and_ckpt(sds=sched_ds, ed=epoch_dir):
                    _m0 = _time.perf_counter()
                    sds.map_batches(
                        _SeenAdd(seen.shards, seen.n_shards),
                        batch_format="pyarrow", batch_size=4096,
                    ).count()
                    _m1 = _time.perf_counter()
                    seen.checkpoint(os.path.join(ed, "seen_shards"))
                    if _timing:  # own stopwatch: runs on a pool thread
                        print(f"[crawl-timing] mark={_m1 - _m0:.2f}s "
                              f"ckpt={_time.perf_counter() - _m1:.2f}s",
                              flush=True)

                mark_ckpt_fut = pool.submit(_mark_and_ckpt)
                pending.append(mark_ckpt_fut)
                job_futs.append(jobs.submit(
                    _run_wave_job, sched_ds, epoch_dir, counters, wave,
                    pending))
                prev_deferred_fut = deferred_fut
                frontier_path = os.path.join(epoch_dir, "frontier_next")
                wave += 1
                continue
            else:
                ranked_pdf = ranked.to_pandas()
                seen_known_empty = False
                if "host_bucket" in ranked_pdf.columns:
                    ranked_pdf = ranked_pdf.drop(columns=["host_bucket"])
                assert len(ranked_pdf) <= DRIVER_FRONTIER_MAX
                counters.append(("*", "fresh_after_dedup", len(ranked_pdf)))
                if robots is not None:
                    blocked = int((~ranked_pdf["robots_allowed"]).sum()) if len(ranked_pdf) else 0
                    counters.append(("*", "robots_blocked", blocked))

                if len(ranked_pdf) == 0:
                    _finish_epoch(epoch_dir, seen, None, counters, wave)
                    _acc(counters)
                    frontier_path = os.path.join(epoch_dir, "frontier_next.parquet")
                    wave += 1
                    if not discovery_dry:
                        continue  # feed still live (see distributed branch)
                    break

                sched_pdf = ranked_pdf[ranked_pdf["scheduled"]].copy()
                # deferred = allowed but over budget (blocked urls leave the frontier)
                deferred_pdf = ranked_pdf[
                    ~ranked_pdf["scheduled"] & ranked_pdf["robots_allowed"]
                ].copy()

                # deterministic crawl order (conformance artifact)
                sched_pdf = sched_pdf.sort_values(SORT_COLS, ascending=SORT_ASC, kind="mergesort")
                sched_pdf = sched_pdf.reset_index(drop=True)
                sched_pdf["crawl_order"] = range(len(sched_pdf))
                for host, cnt in sched_pdf.groupby("host").size().items():
                    counters.append((str(host), "scheduled", int(cnt)))
                pq.write_table(
                    pa.Table.from_pandas(
                        sched_pdf[["url", "url_hash", "host", "priority", "discovery_ts", "crawl_order"]],
                        preserve_index=False,
                    ).replace_schema_metadata(None),
                    os.path.join(epoch_dir, "schedule.parquet"),
                )

                # mark scheduled as seen (exactly once per url_hash)
                seen.check_and_add_hashes(sched_pdf["url_hash"].tolist())

                drop_cols = ["seen", "robots_allowed", "eligible", "scheduled",
                             "host_rank"]
                sched_ds = ray.data.from_arrow(
                    pa.Table.from_pandas(
                        sched_pdf.drop(
                            columns=[c for c in drop_cols
                                     if c in sched_pdf.columns]),
                        preserve_index=False,
                    ).replace_schema_metadata(None)
                )
                n_sched = len(sched_pdf)
                frontier_next_path = os.path.join(epoch_dir, "frontier_next.parquet")

            # ---- driver-mode fetch, then extract (synchronous) ---------------
            # fine-bucket so the fetch emits ~4 blocks per core (same file per
            # fine bucket — see _FetchBucket); the wave lineage (fetched/missed)
            # comes from the _WaveCounter actor.
            # factor 2 (≈2 fine buckets per core) measured best at 32 cpus: the
            # sort shuffle cost grows with partition count while extract's
            # straggler risk is already covered by the rows-per-block split below
            cpus = int(ray.cluster_resources().get("CPU", 8))
            fetched = _fetch_dataset(
                sched_ds, pages_dir, n_buckets, wave_counter, wave, cpus,
                fetch_backend_factory, fetch_timeout_s)
            _tick("fetch")
            hits = fetched.map_batches(
                lambda t: t.filter(pa.compute.equal(t.column("http_status"), 200)),
                batch_format="pyarrow",
            )
            # the sort sizes its output partitions from its (narrow, bundled)
            # input blocks, so `fetched` can come out as a handful of blocks —
            # 8 observed at 200k rows — which would run extract at 8-task
            # parallelism; split rows-per-block WITHOUT an all-to-all so the
            # CPU-heavy extract stage gets enough tasks to fill the cluster
            hits = hits.repartition(target_num_rows_per_block=int(os.environ.get("OMNI_RAY_EXTRACT_BLOCK_ROWS", "1024")))
            articles = article_pipeline(hits, enrich_concurrency=enrich_concurrency).materialize()
            _tick("extract")
            if os.environ.get("OMNI_RAY_STATS") == "1":
                print(articles.stats(), flush=True)
            n_articles = articles.count()
            n_total, n_hits = ray.get(wave_counter.get.remote(wave))
            counters.append(("*", "fetched", int(n_hits)))
            counters.append(("*", "fetch_missed", n_sched - int(n_hits)))
            if n_articles:
                # the two store writes consume the same materialized dataset —
                # run them concurrently in the writer pool
                from .articles import entities_pipeline

                w1 = pool.submit(articles.write_parquet, os.path.join(epoch_dir, "articles"))
                w2 = pool.submit(
                    lambda a=articles: entities_pipeline(a).write_parquet(
                        os.path.join(epoch_dir, "entities")
                    )
                )
                w1.result()
                w2.result()
            counters.append(("*", "articles_stored", n_articles))

            _finish_epoch_pdf(epoch_dir, seen, deferred_pdf, counters, wave)
            _acc(counters)
            _tick("store")
            frontier_path = frontier_next_path
            wave += 1

        # drain: all wave jobs, then their epoch completions, strictly after
        jobs.shutdown(wait=True)
        for f in job_futs:
            f.result()
        _tick("drain-jobs")
        for f in epoch_futs:
            f.result()
        completer.shutdown(wait=True)
        pool.shutdown(wait=True)
        _tick("drain-completions")
        totals["waves"] = wave - start_wave
        totals["seen_total"] = seen.total_size()
        totals["scheduled"] = totals.get("scheduled", 0)
        with open(os.path.join(out_dir, "SUMMARY.json"), "w") as f:
            json.dump(totals, f)
    finally:
        # cleanup on EVERY exit path (a raised wave would otherwise leak the
        # shard/robots/counter actors and the writer thread pool for the
        # rest of the Ray session)
        # cancel queued work so it cannot run against the actors killed below
        jobs.shutdown(wait=False, cancel_futures=True)
        completer.shutdown(wait=False, cancel_futures=True)
        pool.shutdown(wait=False, cancel_futures=True)
        seen.shutdown()
        if robots is not None:
            robots.shutdown()
        ray.kill(wave_counter)
    return totals


def run_continuous(
    pages_dir: str,
    seeds_path: str,
    out_dir: str,
    feeds_fn,
    cycles: int,
    **kw,
) -> dict:
    """Continuous crawling — the reference's flagship mode
    (omni_orchestrator.py:209-245 ``run_continuous``: each cycle runs
    discovery, crawls what arrived, then waits for the next interval). Here
    one wave == one cycle: ``feeds_fn(cycle)`` returns an Arrow table of
    freshly fetched feed bodies (columns: feed_url, kind ∈ {rss, sitemap},
    body[, feed_seq]) — or an empty table for a quiet cycle, or None once
    the feed schedule is exhausted. Bodies are parsed by the REAL RSS /
    sitemap parsers (sources/discovery.py) and the resulting records are
    unioned into that wave's frontier; already-crawled urls are dropped by
    the seen-shard anti-join and still-deferred duplicates by frontier
    dedup (first-wins under priority desc, discovery_ts, url).

    Scale shape: identical to run_crawl — the only addition is a bounded
    feed-parse at the loop top; the merged snapshot flows through the same
    annotate → host-bucket shuffle → budget split, and cycles with no
    discoveries fall back to the pre-ranked incremental fast path."""
    from ..sources.discovery import discover_batch

    def discover_fn(wave: int):
        feeds = feeds_fn(wave)
        if feeds is None:
            return None
        if feeds.num_rows == 0:
            return feeds
        return discover_batch(feeds)

    return run_crawl(
        pages_dir=pages_dir, seeds_path=seeds_path, out_dir=out_dir,
        discover_fn=discover_fn, max_waves=cycles, **kw,
    )


def _wave_distributed(ranked, seen, epoch_dir, counters, robots_on, pool,
                      budget_per_host=None):
    """Distributed frontier split: everything stays Dataset ops; only counts
    reach the driver. Only ``ranked`` is materialized; the scheduled slice is
    returned LAZY so fetch and extract fuse into one streaming execution
    (seen-marking runs as its own narrow pass in the caller).
    The checkpoint artifacts — sorted schedule (which also emits
    the per-host lineage counters), deferred frontier snapshot — are written
    in background threads (returned as futures) overlapped with
    fetch+extract; the caller joins them before _COMPLETE. Returns
    (scheduled Dataset [unmarked], pending futures) or None when the wave is
    empty."""
    ranked = ranked.map_batches(
        lambda t: t.drop_columns(["host_bucket"]) if "host_bucket" in t.column_names else t,
        batch_format="pyarrow",
    ).materialize()
    n_ranked = ranked.count()
    counters.append(("*", "fresh_after_dedup", n_ranked))
    if robots_on and n_ranked:
        blocked = ranked.map_batches(
            lambda t: pa.table({"b": [int(t.num_rows - pa.compute.sum(
                pa.compute.cast(t.column("robots_allowed"), pa.int64())).as_py())]}),
            batch_format="pyarrow",
        ).to_pandas()["b"].sum()
        counters.append(("*", "robots_blocked", int(blocked)))
    if n_ranked == 0:
        os.makedirs(os.path.join(epoch_dir, "frontier_next"), exist_ok=True)
        return None

    sched = ranked.map_batches(
        lambda t: t.filter(t.column("scheduled")), batch_format="pyarrow"
    )

    import time as _time

    _timing = os.environ.get("OMNI_RAY_TIMING") == "1"

    def _write_schedule() -> None:
        _w0 = _time.perf_counter()
        # per-host lineage counters: a NARROW pass — in-block pyarrow
        # group_by then a tiny driver fold — not a groupby(host) shuffle
        # (hosts usually land whole in one rank-output block, so the partial
        # table is ~|hosts| rows; the fold handles any block-split host).
        # The old all-to-all cost 2.6 s/wave at 32 cpus contending with
        # extract (measured; list.append is atomic, and the caller joins
        # this future before serializing counters)
        parts = sched.map_batches(
            lambda t: t.group_by("host").aggregate([("host", "count")]).rename_columns(
                ["host", "n"]
            ),
            batch_format="pyarrow",
        ).to_pandas()
        hc = parts.groupby("host", sort=False)["n"].sum() if len(parts) else {}
        for host, cnt in hc.items():
            counters.append((str(host), "scheduled", int(cnt)))
        sched_dir = os.path.join(epoch_dir, "schedule")
        if not len(hc):
            # still leave an (empty) artifact so both modes' epoch layouts
            # self-describe a ran-but-empty wave identically
            os.makedirs(sched_dir, exist_ok=True)
            pq.write_table(
                pa.table({
                    "url": pa.array([], pa.string()),
                    "url_hash": pa.array([], pa.string()),
                    "host": pa.array([], pa.string()),
                    "priority": pa.array([], pa.int32()),
                    "discovery_ts": pa.array([], pa.timestamp("us")),
                }),
                os.path.join(sched_dir, "part-empty.parquet"),
            )
            return
        # schedule artifact: globally sorted part files; crawl_order = row
        # position in filename order (deterministic)
        _w1 = _time.perf_counter()
        sched.sort(SORT_COLS, descending=[not a for a in SORT_ASC]).select_columns(
            ["url", "url_hash", "host", "priority", "discovery_ts"]
        ).write_parquet(sched_dir)
        if _timing:
            print(f"[crawl-timing] sched-count={_w1 - _w0:.2f}s "
                  f"sched-sortwrite={_time.perf_counter() - _w1:.2f}s",
                  flush=True)

    def _write_deferred() -> None:
        _d0 = _time.perf_counter()
        # deferred = allowed but over budget → next frontier snapshot;
        # carries host_rank - budget: a host's deferred rows had ranks
        # budget, budget+1, …, so the shifted values are exactly the ranks a
        # full next-wave recompute would assign — the pre-ranked fast path
        # in run_crawl splits on them without re-annotating the frontier
        deferred = ranked.map_batches(
            lambda t: _deferred_snapshot(t, budget_per_host),
            batch_format="pyarrow",
        )
        fdir = os.path.join(epoch_dir, "frontier_next")
        deferred.write_parquet(fdir)
        os.makedirs(fdir, exist_ok=True)  # an all-empty write may create nothing
        if not any(f.endswith(".parquet") for f in os.listdir(fdir)):
            pq.write_table(_frontier_schema().empty_table(),
                           os.path.join(fdir, "empty.parquet"))
        if _timing:
            print(f"[crawl-timing] deferred-write={_time.perf_counter() - _d0:.2f}s",
                  flush=True)

    deferred_fut = pool.submit(_write_deferred)
    pending = [pool.submit(_write_schedule), deferred_fut]

    drop_cols = ["seen", "robots_allowed", "eligible", "scheduled", "host_rank"]
    sched = sched.map_batches(
        lambda t: t.drop_columns([c for c in drop_cols if c in t.column_names]),
        batch_format="pyarrow",
    )
    return sched, pending, deferred_fut


def _deferred_snapshot(t: pa.Table, budget_per_host) -> pa.Table:
    """One batch of the deferred-frontier snapshot: allowed-but-over-budget
    rows in frontier schema, plus the budget-shifted ``host_rank``."""
    kept = t.filter(
        pa.compute.and_(
            pa.compute.invert(t.column("scheduled")), t.column("robots_allowed")
        )
    )
    out = kept.select(FRONTIER_COLS).cast(_frontier_schema())
    if budget_per_host is not None and "host_rank" in kept.column_names:
        shifted = pa.compute.subtract(
            pa.compute.cast(kept.column("host_rank"), pa.int64()),
            budget_per_host,
        )
        out = out.append_column("host_rank", shifted)
    return out


def read_schedule_artifacts(out_dir: str) -> pa.Table:
    """Concatenate every complete epoch's schedule artifact into one table
    with (wave, crawl_order) — either layout: single ``schedule.parquet``
    with a crawl_order column (driver mode) or a sorted-parts ``schedule/``
    dir where crawl_order = row position in filename order (distributed)."""
    frames = []
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("epoch="):
            continue
        p1 = os.path.join(out_dir, d, "schedule.parquet")
        p2 = os.path.join(out_dir, d, "schedule")
        if os.path.exists(p1):
            f = pq.read_table(p1).to_pandas()
        elif os.path.isdir(p2):
            parts = sorted(
                os.path.join(p2, x) for x in os.listdir(p2) if x.endswith(".parquet")
            )
            if not parts:
                continue
            f = pd.concat(
                [pq.read_table(fp).to_pandas() for fp in parts], ignore_index=True
            )
            f["crawl_order"] = range(len(f))
        else:
            continue
        if not len(f):
            continue
        f["wave"] = int(d.split("=")[1])
        frames.append(f)
    if not frames:
        return pa.table({})
    return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False).replace_schema_metadata(None)


def _frontier_schema() -> pa.Schema:
    return pa.schema(
        [
            ("url", pa.string()),
            ("source", pa.string()),
            ("priority", pa.int32()),
            ("depth", pa.int32()),
            ("discovery_ts", pa.timestamp("us")),
            ("canonical_url", pa.string()),
            ("host", pa.string()),
            ("url_hash", pa.string()),
        ]
    )


def _write_counters(epoch_dir, counters, wave) -> None:
    ctbl = pa.table(
        {
            "wave": pa.array([wave] * len(counters), pa.int32()),
            "partition": pa.array([c[0] for c in counters], pa.string()),
            "counter": pa.array([c[1] for c in counters], pa.string()),
            "value": pa.array([c[2] for c in counters], pa.int64()),
        }
    )
    pq.write_table(ctbl, os.path.join(epoch_dir, "counters.parquet"))


def _mark_complete(epoch_dir, counters, wave) -> None:
    """The ONE epoch-finalization tail shared by both modes: lineage counters
    down first, then the _COMPLETE marker last."""
    _write_counters(epoch_dir, counters, wave)
    with open(os.path.join(epoch_dir, "_COMPLETE"), "w") as f:
        f.write("ok")


def _finish_epoch_pdf(epoch_dir, seen, deferred_pdf, counters, wave) -> None:
    schema = _frontier_schema()
    if deferred_pdf is not None and len(deferred_pdf):
        tbl = pa.Table.from_pandas(
            deferred_pdf[FRONTIER_COLS], preserve_index=False
        ).replace_schema_metadata(None).cast(schema)
    else:
        tbl = schema.empty_table()
    pq.write_table(tbl, os.path.join(epoch_dir, "frontier_next.parquet"))
    seen.checkpoint(os.path.join(epoch_dir, "seen_shards"))
    _mark_complete(epoch_dir, counters, wave)


def _finish_epoch(epoch_dir, seen, deferred, counters, wave) -> None:
    _finish_epoch_pdf(epoch_dir, seen, None, counters, wave)
