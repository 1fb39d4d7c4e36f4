"""Full oracle sweep: every oracle-backed queries() entry vs its DuckDB SQL,
mirroring the driver's sorted-column value compare. Derives the query list
from __ray_entry__ so no registry can be missed.

Beyond value equality, the sweep enforces a DTYPE-KIND match (int vs float vs
object) between the normalized Ray and oracle frames: the driver hashes
serialized values, so an oracle column that comes back float64 (e.g. a DuckDB
HUGEINT sum) against a Ray int64 column value-compares equal here but hash-
mismatches there (round-3's one red row, `asof_broadcast_index`). Kind drift
is a FAILURE even when values match.

Usage (owns its Ray session; run from the repo root):
    python tools/oracle_sweep.py                  # all queries at sf0.01
    python tools/oracle_sweep.py q1,exact_dedup   # a subset
    python tools/oracle_sweep.py --driver-50      # replay the last driver set
    SWEEP_SF=/root/testdata/sf0.1 python tools/oracle_sweep.py
Writes per-query pass/fail + timings to /tmp/sweep_sf01.json.
"""
import glob
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import duckdb
import pandas as pd
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False)

import __ray_entry__ as entry

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()
ALL = {k: (QUERIES[k], ORACLES[k]) for k in QUERIES if k in ORACLES}
if len(sys.argv) > 1:
    if sys.argv[1] == "--driver-50":
        # pre-handoff preflight: replay exactly the key set the driver last
        # hash-checked (latest CORRECTNESS_r*.json), strict dtype discipline
        latest = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))[-1]
        keys = set(json.load(open(latest)))
        ALL = {k: v for k, v in ALL.items() if k in keys}
        print(f"driver-50 preflight: {len(ALL)} queries from {latest}")
        if "--rotate" in sys.argv[2:]:
            # breadth rotation: ALSO draw a seeded-random 50 from the
            # oracle-backed keys the driver did NOT check, so each handoff
            # self-checks ~100 keys with the driver's exact discipline
            import random

            rest = sorted(k for k in QUERIES if k in ORACLES and k not in keys)
            rng = random.Random(int(os.environ.get("ROTATE_SEED", "45")))
            extra = rng.sample(rest, min(50, len(rest)))
            ALL.update({k: (QUERIES[k], ORACLES[k]) for k in extra})
            print(f"rotation: +{len(extra)} seeded-random keys "
                  f"(seed {os.environ.get('ROTATE_SEED', '45')}) "
                  f"-> {len(ALL)} total")
    else:
        only = set(sys.argv[1].split(","))
        ALL = {k: v for k, v in ALL.items() if k in only}

SF = os.environ.get("SWEEP_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def oracle(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def normalize(df):
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


results = {}
for name in sorted(ALL):
    fn, sql = ALL[name]
    t0 = time.time()
    try:
        got = fn(SF)
        got_df = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        want_df = oracle(sql)
        assert sorted(got_df.columns) == sorted(want_df.columns), (
            f"columns {sorted(got_df.columns)} != {sorted(want_df.columns)}")
        assert len(got_df) == len(want_df), f"{len(got_df)} rows != {len(want_df)}"
        gn, wn = normalize(got_df), normalize(want_df)
        kinds_g = [gn[c].dtype.kind for c in gn.columns]
        kinds_w = [wn[c].dtype.kind for c in wn.columns]
        assert kinds_g == kinds_w, (
            f"dtype-kind drift (driver hash risk): ray {list(zip(gn.columns, kinds_g))}"
            f" vs oracle {list(zip(wn.columns, kinds_w))}")
        pd.testing.assert_frame_equal(gn, wn, check_dtype=False, obj=name)
        results[name] = {"ok": True, "rows": len(got_df),
                         "sec": round(time.time() - t0, 2)}
        print(f"PASS {name} rows={len(got_df)} {results[name]['sec']}s", flush=True)
    except Exception as e:
        results[name] = {"ok": False, "err": str(e)[:500],
                         "sec": round(time.time() - t0, 2)}
        print(f"FAIL {name}: {e}", flush=True)
        traceback.print_exc()

n_ok = sum(1 for r in results.values() if r["ok"])
print(f"\n{n_ok}/{len(results)} passed", flush=True)
with open("/tmp/sweep_sf01.json", "w") as f:
    json.dump(results, f, indent=1)
ray.shutdown()
