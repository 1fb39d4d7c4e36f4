"""Overflow-headroom audit (VERDICT r4 item 5): for every oracle whose SQL
needs HUGEINT intermediates, bound the RAY side's int64 magnitudes and
extrapolate to sf1/sf10.

Method: run each flagged query at sf0.01 and sf0.1, take the max |value|
over integer output columns, fit the growth factor g = v(sf0.1)/v(sf0.01)
(clamped >= 1), extrapolate v(sf1) = v(0.1)*g and v(sf10) = v(0.1)*g^2, and
report headroom = (2^63-1)/v.

Scope: the output-magnitude rule bounds block-local partials only for sums
of NONNEGATIVE addends — the house census/ppm idiom, which is what these
oracles overwhelmingly are. It does NOT cover signed-addend sums
(cancelling partials can exceed the result); the repo's signed families
already carry their own overflow constructions instead of relying on this
audit — renewops' base-2^30 int64-limb Sum (BASELINE.md round-4 ledger)
and the rank/weight-bounded L-moment folds — and any NEW signed-sum oracle
must document its partial bound at the query, not here.

Usage: python tools/overflow_audit.py   (owns its Ray session)
Writes /tmp/overflow_audit.json and prints the BASELINE.md table.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import pandas as pd
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False)

import __ray_entry__ as entry

Q = entry.queries()
O = entry.oracle_sql()
targets = sorted(k for k, sql in O.items() if "HUGEINT" in sql)
print(f"{len(targets)} HUGEINT-oracle queries to audit", flush=True)

I64 = 2**63 - 1
rows = []
for k in targets:
    t0 = time.time()
    vals = {}
    try:
        for sf, lab in (("/root/testdata/sf0.01", "v001"),
                        ("/root/testdata/sf0.1", "v01")):
            r = Q[k](sf)
            df = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
            m = 0
            for c in df.columns:
                if pd.api.types.is_integer_dtype(df[c]) and len(df):
                    m = max(m, int(df[c].abs().max()))
            vals[lab] = m
        g = max(vals["v01"] / max(vals["v001"], 1), 1.0)
        v1 = vals["v01"] * g
        v10 = vals["v01"] * g * g
        rows.append({
            "query": k, "max_sf01": vals["v01"], "growth": round(g, 2),
            "proj_sf1": int(v1), "proj_sf10": int(v10),
            "headroom_sf1": round(I64 / max(v1, 1), 1),
            "headroom_sf10": round(I64 / max(v10, 1), 1),
            "sec": round(time.time() - t0, 1),
        })
        print(f"{k}: max(sf0.1)={vals['v01']:.3g} g={g:.2f} "
              f"headroom sf1={rows[-1]['headroom_sf1']:.3g} "
              f"sf10={rows[-1]['headroom_sf10']:.3g}", flush=True)
    except Exception as e:
        rows.append({"query": k, "err": str(e)[:300]})
        print(f"ERR {k}: {e}", flush=True)

flagged = [r for r in rows if r.get("headroom_sf1", 1e30) < 100]
print(f"\nflagged (<100x headroom at sf1): "
      f"{[r['query'] for r in flagged] or 'none'}")
with open("/tmp/overflow_audit.json", "w") as f:
    json.dump(rows, f, indent=1)
ray.shutdown()
