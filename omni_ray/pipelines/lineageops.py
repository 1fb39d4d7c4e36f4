"""Counter-lineage operators (round 5, batch 89): the ST7 per-epoch
lineage artifacts (counters.parquet — frontier_in / discovered /
fresh_after_dedup / per-host scheduled / fetch_missed, and robots_blocked
when gating is on) read back from REAL continuous-crawl runs and pinned
against the batch-service closed forms. The counters are what a crawl
operator audits after every cycle; a wrong counter means the run's books
don't balance even when the schedule itself is right.

- crawl_counter_lineage: over the batch-86 universe (shared cached run) —
  per wave: frontier_in = backlog(w−1) + arrivals(w) (+ planted dups at
  the last cycle), discovered = cycle arrivals (0 at wave 0: seeds ARE the
  wave-0 frontier), fresh_after_dedup = backlog(w−1) + original arrivals
  (re-discoveries are never fresh: seen-dropped or dedup-dropped),
  n_scheduled = served(w) from the queue identity, fetch_missed =
  n_scheduled (the census universe has an empty pages store).
- continuous_robots_block_census: same cycles with host c0 fully
  disallowed (its own run; robots disables the pre-ranked fast path, so
  every wave takes the full annotate+rank split): blocked urls leave the
  frontier WITHOUT being marked seen, so a cycle-3 re-discovery of a
  blocked url is counted blocked AGAIN (unless its original arrived in
  the same cycle and frontier dedup collapsed them first) — the closed
  form encodes exactly that subtlety, and a seen-marking bug that quietly
  remembered blocked urls would hash wrong.

Scale shape: both read bounded per-epoch artifacts (counters.parquet is
O(hosts) rows per epoch); the underlying crawl is the production wave
machinery.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .contcrawl import _CYCLES, _SQL_QUEUE_CORE, _frontier_rows


def _read_counters(out_dir: str) -> pd.DataFrame:
    frames = []
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d, "counters.parquet")
        if d.startswith("epoch=") and os.path.exists(p):
            frames.append(pq.read_table(p).to_pandas())
    return pd.concat(frames, ignore_index=True)


def _fold(c: pd.DataFrame) -> pd.DataFrame:
    def per_wave(counter: str) -> pd.Series:
        rows = c[c["counter"] == counter]
        return rows.groupby("wave")["value"].sum()

    waves = sorted(c["wave"].unique())
    out = pd.DataFrame({"wave": waves}).set_index("wave")
    for name, col in (("frontier_in", "frontier_in"),
                      ("discovered", "discovered"),
                      ("fresh", "fresh_after_dedup"),
                      ("n_scheduled", "scheduled"),
                      ("fetch_missed", "fetch_missed")):
        out[name] = per_wave(col).reindex(waves).fillna(0).astype("int64")
    return out.reset_index()


def crawl_counter_lineage(sf_dir: str):
    from .contcrawl import _run_continuous_universe

    out_dir, _budget = _run_continuous_universe(sf_dir)
    out = _fold(_read_counters(out_dir))
    out["wave"] = out["wave"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CRAWL_COUNTER_LINEAGE = _SQL_QUEUE_CORE + """
, waves AS (
  SELECT DISTINCT wave FROM waved
), srv AS (
  SELECT wave, count(*) AS served FROM waved GROUP BY 1
), arr AS (
  SELECT a, count(*) AS arrived FROM waved GROUP BY 1
), dups AS (
  SELECT count(*) AS nd FROM documents WHERE doc_id % 3 = 0
), stats AS (
  SELECT w.wave,
         coalesce((SELECT arrived FROM arr WHERE a = w.wave), 0) AS arr_w,
         (SELECT count(*) FROM waved v WHERE v.a < w.wave)
           - (SELECT count(*) FROM waved v WHERE v.wave < w.wave)
           AS backlog_prev,
         (SELECT served FROM srv WHERE srv.wave = w.wave) AS served
  FROM waves w
)
SELECT CAST(s.wave AS BIGINT) AS wave,
       CAST(s.backlog_prev + s.arr_w
            + CASE WHEN s.wave = 3 THEN (SELECT nd FROM dups) ELSE 0 END
            AS BIGINT) AS frontier_in,
       CAST(CASE WHEN s.wave BETWEEN 1 AND 3
                 THEN s.arr_w + CASE WHEN s.wave = 3
                                     THEN (SELECT nd FROM dups) ELSE 0 END
                 ELSE 0 END AS BIGINT) AS discovered,
       CAST(s.backlog_prev + s.arr_w AS BIGINT) AS fresh,
       CAST(s.served AS BIGINT) AS n_scheduled,
       CAST(s.served AS BIGINT) AS fetch_missed
FROM stats s
ORDER BY 1
"""


_ROBOTS_OUT: dict[str, str] = {}


def continuous_robots_block_census(sf_dir: str):
    import tempfile

    from .crawl import run_crawl

    key = os.path.abspath(sf_dir)
    if key not in _ROBOTS_OUT or not os.path.exists(
            os.path.join(_ROBOTS_OUT[key], "SUMMARY.json")):
        docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        ids = docs.column("doc_id").to_pylist()
        budget = max(16, len(ids) // 30)
        cycles = _frontier_rows(ids)
        workdir = tempfile.mkdtemp(prefix="omni_ray_robotscont_")
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
            robots_map={"c0.example.net": "User-agent: *\nDisallow: /\n"},
            respect_robots=True, discover_fn=discover_fn,
        )
        _ROBOTS_OUT[key] = out_dir
    c = _read_counters(_ROBOTS_OUT[key])
    waves = sorted(c["wave"].unique())
    blocked = c[c["counter"] == "robots_blocked"].groupby("wave")["value"].sum()
    sched = c[c["counter"] == "scheduled"].groupby("wave")["value"].sum()
    out = pd.DataFrame({
        "wave": pd.array(waves, dtype="int64"),
        "n_scheduled": sched.reindex(waves).fillna(0).astype("int64").values,
        "robots_blocked": blocked.reindex(waves).fillna(0).astype("int64").values,
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


# hosts 1..4 schedule exactly as in the unblocked queue (same budget);
# host 0's rows are blocked at the wave they (re-)enter the frontier:
#   w in 0..2: its cycle-w originals;
#   w == 3: its cycle-3 originals PLUS re-discoveries of docs whose
#           original arrived in an EARLIER cycle (doc_id % 15 == 0 and
#           doc_id % 4 != 3) — blocked urls were never marked seen, and
#           same-cycle dup pairs collapse in frontier dedup first.
SQL_CONTINUOUS_ROBOTS_BLOCK = _SQL_QUEUE_CORE + """
, allowed AS (
  SELECT doc_id, h, a,
         row_number() OVER (PARTITION BY h ORDER BY ts) - 1 AS k2
  FROM rows_ WHERE h <> 0
), waved2 AS (
  SELECT h, a, k2,
         (k2 + max(a * (SELECT b FROM params) - k2) OVER (
              PARTITION BY h ORDER BY k2
              ROWS UNBOUNDED PRECEDING
          )) // (SELECT b FROM params) AS wave
  FROM allowed
), waves AS (
  SELECT DISTINCT wave FROM waved2
), blocked AS (
  SELECT w.wave,
         CASE WHEN w.wave < 3 THEN
           (SELECT count(*) FROM documents
             WHERE doc_id % 5 = 0 AND doc_id % 4 = w.wave)
         WHEN w.wave = 3 THEN
           (SELECT count(*) FROM documents
             WHERE doc_id % 5 = 0 AND doc_id % 4 = 3)
           + (SELECT count(*) FROM documents
               WHERE doc_id % 15 = 0 AND doc_id % 4 <> 3)
         ELSE 0 END AS n_blocked
  FROM waves w
)
SELECT CAST(w.wave AS BIGINT) AS wave,
       CAST((SELECT count(*) FROM waved2 v WHERE v.wave = w.wave)
            AS BIGINT) AS n_scheduled,
       CAST(b.n_blocked AS BIGINT) AS robots_blocked
FROM waves w JOIN blocked b ON b.wave = w.wave
ORDER BY 1
"""


LINEAGEOPS_REGISTRY = {
    "crawl_counter_lineage": (crawl_counter_lineage,
                              SQL_CRAWL_COUNTER_LINEAGE),
    "continuous_robots_block_census": (continuous_robots_block_census,
                                       SQL_CONTINUOUS_ROBOTS_BLOCK),
}
