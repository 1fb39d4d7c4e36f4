"""Operator batch 64 — run-length structure of the global event stream.

Reference anchors: none in the reference; this adds:

- type_rle_audit: the run-length profile of the event-type column in
  global (ts, event_id) order — run count, RLE compression ratio in ppm
  (runs/n), and the longest run with its type. A temporally clustered
  stream (bursts of one type) RLE-compresses well; an interleaved one
  doesn't — the read behind sort-before-encode decisions.

Scale shape: one sort of the narrow (ts, event_id, type) projection,
then each BLOCK scans its own runs and emits a summary (first/last type,
first/last run length, internal runs, internal max); the driver
reconciles only the bounded block boundaries — merging adjacent blocks
whose border types match (the pk_gap/MUS two-pass discipline)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .queries import _read


def type_rle_audit(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "us": pc.cast(t["ts"], pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"],
        })

    ordered = ev.map_batches(prep, batch_format="pyarrow") \
        .sort(["us", "event_id"]).materialize()

    def block_runs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # Ray's sort may emit empty blocks
            return pa.table({
                "min_us": pa.array([], pa.int64()),
                "min_eid": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "runs": pa.array([], pa.int64()),
                "first_type": pa.array([], pa.string()),
                "last_type": pa.array([], pa.string()),
                "first_len": pa.array([], pa.int64()),
                "last_len": pa.array([], pa.int64()),
                "inner_max": pa.array([], pa.int64()),
                "inner_max_type": pa.array([], pa.string()),
            })
        us = np.asarray(t["us"].to_numpy(), np.int64)
        eid = np.asarray(t["event_id"].to_numpy(), np.int64)
        order = np.lexsort((eid, us))
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)[order]
        n = len(et)
        brk = np.nonzero(et[1:] != et[:-1])[0]
        runs = len(brk) + 1
        # run lengths
        starts = np.concatenate([[0], brk + 1])
        ends = np.concatenate([brk, [n - 1]])
        lens = ends - starts + 1
        inner_max = int(lens[1:-1].max()) if runs > 2 else 0
        inner_max_type = ""
        if runs > 2:
            inner = [(int(lens[k]), str(et[starts[k]]))
                     for k in range(1, runs - 1)]
            inner_max, inner_max_type = min(
                inner, key=lambda p: (-p[0], p[1]))
        return pa.table({
            "min_us": pa.array([int(us[order[0]])], pa.int64()),
            "min_eid": pa.array([int(eid[order[0]])], pa.int64()),
            "n": pa.array([n], pa.int64()),
            "runs": pa.array([runs], pa.int64()),
            "first_type": pa.array([str(et[0])]),
            "last_type": pa.array([str(et[-1])]),
            "first_len": pa.array([int(lens[0])], pa.int64()),
            "last_len": pa.array([int(lens[-1])], pa.int64()),
            "inner_max": pa.array([inner_max], pa.int64()),
            "inner_max_type": pa.array([inner_max_type]),
        })

    parts = ordered.map_batches(block_runs, batch_size=None,
                                batch_format="pyarrow").to_pandas() \
        .sort_values(["min_us", "min_eid"]).reset_index(drop=True)
    total_n = int(parts["n"].sum())
    total_runs = int(parts["runs"].sum())
    # boundary reconciliation: merge adjacent blocks with matching
    # border types; track the cross-block run length for the max
    cand = []
    for i in range(len(parts)):
        cand.append((str(parts["first_type"].iloc[i]),
                     int(parts["first_len"].iloc[i]),
                     str(parts["last_type"].iloc[i]),
                     int(parts["last_len"].iloc[i]),
                     int(parts["runs"].iloc[i]),
                     int(parts["inner_max"].iloc[i]),
                     str(parts["inner_max_type"].iloc[i])))
    best_len, best_type = 0, ""

    def consider(ln, tp):
        nonlocal best_len, best_type
        if ln > best_len or (ln == best_len and tp < best_type):
            best_len, best_type = ln, tp

    run_type, run_len = None, 0
    for (ft, fl, lt, ll, runs, imax, imt) in cand:
        single = runs == 1
        if single:
            # the whole block is one run of type ft (fl == n)
            if run_type == ft:
                total_runs -= 1
                run_len += fl
            else:
                if run_type is not None:
                    consider(run_len, run_type)
                run_type, run_len = ft, fl
            continue
        # multi-run block: merge or close the carry against the first run
        if run_type == ft:
            total_runs -= 1
            consider(run_len + fl, ft)
        else:
            if run_type is not None:
                consider(run_len, run_type)
            consider(fl, ft)
        # interior runs can never merge across blocks
        if imax:
            consider(imax, imt)
        # the block's last run becomes the new carry
        run_type, run_len = lt, ll
    if run_type is not None:
        consider(run_len, run_type)
    out = pd.DataFrame({
        "n_events": [np.int64(total_n)],
        "n_runs": np.int64(total_runs),
        "rle_ratio_ppm": np.int64(total_runs * 1_000_000 // total_n
                                  if total_n else 0),
        "longest_run": np.int64(best_len),
        "longest_type": [best_type],
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_TYPE_RLE_AUDIT = """
WITH s AS (
  SELECT event_type,
         lag(event_type) OVER (ORDER BY epoch_us(ts), event_id) AS prev,
         row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
), marked AS (
  SELECT event_type, rn,
         CASE WHEN prev IS NULL OR prev != event_type
              THEN 1 ELSE 0 END AS is_start
  FROM s
), grouped AS (
  SELECT event_type, rn,
         sum(is_start) OVER (ORDER BY rn) AS grp
  FROM marked
), runs AS (
  SELECT grp, event_type, count(*) AS len FROM grouped
  GROUP BY grp, event_type
), top AS (
  SELECT event_type, len FROM runs
  ORDER BY len DESC, event_type LIMIT 1
)
SELECT CAST((SELECT count(*) FROM events) AS BIGINT) AS n_events,
       CAST((SELECT count(*) FROM runs) AS BIGINT) AS n_runs,
       CAST((SELECT count(*) FROM runs) * 1000000
            // (SELECT count(*) FROM events) AS BIGINT) AS rle_ratio_ppm,
       CAST((SELECT len FROM top) AS BIGINT) AS longest_run,
       (SELECT event_type FROM top) AS longest_type
"""


RLEOPS_REGISTRY = {
    "type_rle_audit": (type_rle_audit, SQL_TYPE_RLE_AUDIT),
}
