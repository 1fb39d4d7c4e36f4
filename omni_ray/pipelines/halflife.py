"""Activity half-life (round 4, batch 85): per event type, the day (dense
index and epoch-day) at which the cumulative event count first reaches
half of the type's total — the time-to-half-mass read that summarizes
front-loading vs steady arrival in one number per stream. All integer:
the threshold is ceil(total/2) = (total+1)//2, the crossing day is a rank
cut on the bounded per-(type, day) count table.

Scale shape: one bounded (type, day) groupby; the cumulative scan runs on
that bounded table driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count

from .queries import _read


def activity_half_life(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000),
        })

    daily = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"]).aggregate(Count(alias_name="n"))
        .to_pandas().sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    rows = []
    for et, g in daily.groupby("event_type"):
        days = g["day"].to_numpy(np.int64)
        cnt = g["n"].to_numpy(np.int64)
        total = int(cnt.sum())
        need = (total + 1) // 2
        cum = np.cumsum(cnt)
        idx = int(np.searchsorted(cum, need, side="left"))
        rows.append((str(et), total, idx + 1, int(days[idx])))
    out = pd.DataFrame(rows, columns=["event_type", "n_events",
                                      "days_to_half", "half_day"]) \
        .sort_values("event_type").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ACTIVITY_HALF_LIFE = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, day, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY day) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS total,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rk
  FROM daily
)
SELECT event_type, CAST(max(total) AS BIGINT) AS n_events,
       CAST(min(CASE WHEN cum >= (total + 1) // 2 THEN rk END) AS BIGINT)
         AS days_to_half,
       CAST(min(CASE WHEN cum >= (total + 1) // 2 THEN day END) AS BIGINT)
         AS half_day
FROM c GROUP BY 1
"""


HALFLIFE_REGISTRY = {
    "activity_half_life": (activity_half_life, SQL_ACTIVITY_HALF_LIFE),
}
