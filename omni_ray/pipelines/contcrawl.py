"""Continuous-crawl census (round 5, batch 86): drive the REAL continuous
crawl loop — run_crawl with a per-wave discovery hook (the Ray restatement of
the reference's flagship run_continuous cycle, omni_orchestrator.py:209-245 +
url_discovery_engine.py:91-106) — over a frontier synthesized
deterministically from ``documents``, with URLs arriving across four
discovery cycles and planted re-discoveries, then census the schedule and
the per-epoch deferred backlog.

The DuckDB twin uses the batch-service queue closed form: with uniform
priority and cycle-monotone discovery timestamps the per-host service order
is FIFO, and the wave in which the k-th row (0-based, per host, ts order)
is scheduled is

    w_k = max_{j<=k} (a_j + floor((k - j) / B))
        = floor( (k + running_max(a*B - k)) / B )

where a_j is row j's arrival cycle and B the per-host budget — an O(n log n)
window expression, no self-join. Planted re-discoveries (same URL, later
cycle, later ts, same priority) are provably never scheduled: if the
original was already crawled its hash is in the seen set (Redis
``_is_visited`` semantics), otherwise frontier dedup keeps the earlier-ts
row — so the oracle simply excludes them, while the Ray side feeds them
through the real kernel.

Scale shape: the synthesized frontier flows through the production wave
machinery (sharded seen actors, host-bucket shuffle, budget split, deferred
snapshots); the census aggregates the bounded (wave × 5 hosts) grain
driver-side. Each discovery cycle's batch is bounded by the feed size, as in
production.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_BASE = 1_700_000_000_000_000
_CYCLES = 4
_HOSTS = 5


def _frontier_rows(ids: list[int]) -> dict[int, pa.Table]:
    """Per-cycle discovery tables: one URL per doc (host = doc_id % 5,
    arrival cycle = doc_id % 4, ts monotone in cycle and unique per doc),
    plus a planted cycle-3 re-discovery of every doc_id % 3 == 0."""
    def rec(i: int, cyc: int, dup: bool):
        return (
            f"https://c{i % _HOSTS}.example.net/a/{i}",
            _BASE + cyc * 10**13 + (i + (100_000 if dup else 0)) * 1_000_000,
        )

    by_cycle: dict[int, list] = {c: [] for c in range(_CYCLES)}
    for i in ids:
        by_cycle[i % _CYCLES].append(rec(i, i % _CYCLES, False))
    for i in ids:
        if i % 3 == 0:
            by_cycle[_CYCLES - 1].append(rec(i, _CYCLES - 1, True))
    out = {}
    for c, rows in by_cycle.items():
        out[c] = pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "source": pa.array(["rss"] * len(rows), pa.string()),
                "priority": pa.array([10] * len(rows), pa.int32()),
                "depth": pa.array([0] * len(rows), pa.int32()),
                "discovery_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
    return out


_UNIVERSE_CACHE: dict[str, tuple[str, int]] = {}


def _run_continuous_universe(sf_dir: str) -> tuple[str, int]:
    """Run the real continuous crawl over the synthesized universe; returns
    (out_dir, budget). Pages dir is empty — the schedule and deferred
    artifacts do not depend on page bytes (crawl_schedule_core does the
    same). The run is deterministic in sf_dir, so both census queries share
    one per-process run."""
    from .crawl import run_crawl

    key = os.path.abspath(sf_dir)
    if key in _UNIVERSE_CACHE:
        out_dir, budget = _UNIVERSE_CACHE[key]
        if os.path.exists(os.path.join(out_dir, "SUMMARY.json")):
            return out_dir, budget

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = docs.column("doc_id").to_pylist()
    budget = max(16, len(ids) // 30)
    cycles = _frontier_rows(ids)

    workdir = tempfile.mkdtemp(prefix="omni_ray_contcrawl_")
    seeds_path = os.path.join(workdir, "seeds.parquet")
    pq.write_table(cycles[0], seeds_path)
    pages_dir = os.path.join(workdir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    out_dir = os.path.join(workdir, "out")

    def discover_fn(wave: int):
        if 0 < wave < _CYCLES:
            return cycles[wave]
        return None if wave >= _CYCLES else cycles[1].slice(0, 0)

    run_crawl(
        pages_dir=pages_dir, seeds_path=seeds_path, out_dir=out_dir,
        budget_per_host=budget, n_buckets=4, n_seen_shards=2,
        discover_fn=discover_fn,
    )
    _UNIVERSE_CACHE[key] = (out_dir, budget)
    return out_dir, budget


def continuous_crawl_census(sf_dir: str):
    """Per-(wave, host) schedule census of the continuous crawl: row count,
    sum of scheduled doc ids, and the sum of within-wave crawl_order — the
    last pins the GLOBAL within-wave ordering (ts order across hosts), not
    just per-host membership."""
    from .crawl import read_schedule_artifacts

    out_dir, _budget = _run_continuous_universe(sf_dir)
    sched = read_schedule_artifacts(out_dir).to_pandas()
    sched["doc_id"] = sched["url"].str.rsplit("/", n=1).str[1].astype("int64")
    g = (
        sched.groupby(["wave", "host"], as_index=False)
        .agg(n=("url", "size"), sum_doc=("doc_id", "sum"),
             sum_ord=("crawl_order", "sum"))
        .sort_values(["wave", "host"]).reset_index(drop=True)
    )
    for c in ("wave", "n", "sum_doc", "sum_ord"):
        g[c] = g[c].astype("int64")
    return pa.Table.from_pandas(
        g[["wave", "host", "n", "sum_doc", "sum_ord"]], preserve_index=False
    ).replace_schema_metadata(None)


_SQL_QUEUE_CORE = """
WITH params AS (
  SELECT greatest(16, count(*) // 30) AS b FROM documents
), rows_ AS (
  SELECT doc_id,
         doc_id % 5 AS h,
         doc_id % 4 AS a,
         1700000000000000 + (doc_id % 4) * 10000000000000
           + doc_id * 1000000 AS ts
  FROM documents
), pos AS (
  SELECT doc_id, h, a, ts,
         row_number() OVER (PARTITION BY h ORDER BY ts) - 1 AS k
  FROM rows_
), waved AS (
  SELECT doc_id, h, a, ts, k,
         (k + max(a * (SELECT b FROM params) - k) OVER (
              PARTITION BY h ORDER BY k
              ROWS UNBOUNDED PRECEDING
          )) // (SELECT b FROM params) AS wave
  FROM pos
)
"""

SQL_CONTINUOUS_CRAWL_CENSUS = _SQL_QUEUE_CORE + """
, ordered AS (
  SELECT *, row_number() OVER (PARTITION BY wave ORDER BY ts) - 1 AS ord
  FROM waved
)
SELECT CAST(wave AS BIGINT) AS wave,
       'c' || h || '.example.net' AS host,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc,
       CAST(sum(ord) AS BIGINT) AS sum_ord
FROM ordered
GROUP BY 1, 2
ORDER BY 1, 2
"""


def continuous_backlog_profile(sf_dir: str):
    """Per-(epoch, host) deferred-backlog census read from the REAL
    frontier_next snapshots: how many discovered-but-over-budget urls each
    host carries into the next cycle. The closed form: backlog after wave w
    = |{rows with arrival <= w}| - |{rows with wave <= w}| per host."""
    out_dir, _budget = _run_continuous_universe(sf_dir)
    rows = []
    for d in sorted(os.listdir(out_dir)):
        if not d.startswith("epoch="):
            continue
        fdir = os.path.join(out_dir, d, "frontier_next")
        fp = os.path.join(out_dir, d, "frontier_next.parquet")
        if os.path.isdir(fdir):
            t = pq.read_table(fdir, columns=["host"])
        elif os.path.exists(fp):
            t = pq.read_table(fp, columns=["host"])
        else:
            continue
        w = int(d.split("=")[1])
        counts = t.to_pandas().groupby("host").size()
        for host, n in counts.items():
            rows.append((w, str(host), int(n)))
    out = pd.DataFrame(rows, columns=["wave", "host", "backlog"]) \
        .sort_values(["wave", "host"]).reset_index(drop=True)
    out["wave"] = out["wave"].astype("int64")
    out["backlog"] = out["backlog"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CONTINUOUS_BACKLOG_PROFILE = _SQL_QUEUE_CORE + """
, waves AS (
  SELECT DISTINCT wave FROM waved
), hosts AS (
  SELECT DISTINCT h FROM waved
), grid AS (
  SELECT w.wave, hs.h FROM waves w CROSS JOIN hosts hs
), backlog AS (
  SELECT g.wave, g.h,
         (SELECT count(*) FROM waved v
           WHERE v.h = g.h AND v.a <= g.wave) -
         (SELECT count(*) FROM waved v
           WHERE v.h = g.h AND v.wave <= g.wave) AS backlog
  FROM grid g
)
SELECT CAST(wave AS BIGINT) AS wave,
       'c' || h || '.example.net' AS host,
       CAST(backlog AS BIGINT) AS backlog
FROM backlog
WHERE backlog > 0
ORDER BY 1, 2
"""


CONTCRAWL_REGISTRY = {
    "continuous_crawl_census": (continuous_crawl_census,
                                SQL_CONTINUOUS_CRAWL_CENSUS),
    "continuous_backlog_profile": (continuous_backlog_profile,
                                   SQL_CONTINUOUS_BACKLOG_PROFILE),
}
