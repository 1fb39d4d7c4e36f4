"""Robots-policy operators (round 4, batch 78): the ST5 robots stage's
parser (stdlib urllib.robotparser, the from-scratch build the north rule
requires) exercised as oracle-backed QUERIES — synthesized robots.txt per
host with rule sets chosen so every decision has a closed-form SQL twin,
probed over the urltmpl URL universe. The PARSER is the unit under test:
a prefix-match, UA-section, or crawl-delay bug flips counted decisions and
hashes wrong.

- robots_decision_census: even-numbered hosts disallow /tag/ and /item;
  per (source, verdict) URL counts. Pins prefix-match semantics
  (Disallow: /item blocks /item?id=... too).
- robots_ua_matrix: hosts ship BOTH a 'User-agent: omni-ray' section
  (disallow /article/) and a '*' section (disallow /tag/): the named
  agent must pick ITS section, the generic agent the other — per
  (source, agent, verdict) counts pin UA-section selection.
- crawl_delay_budget_matrix: Crawl-delay rotates 0/1/5 s by host; per
  source: the delay, the demand (URLs), the per-wave budget
  (wave_s // delay, unlimited when absent) and the deficit — the
  politeness-planning read that sizes recrawl backlogs.

Scale shape: the robots map is a tiny broadcast (one text per host —
J4); decisions run vectorized per batch against per-actor parser caches;
every output is a bounded census.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count

from .queries import _pd_arrow, _read
from .urltmpl import _SQL_URLS, _synth_urls

_WAVE_S = 60


def _robots_txt(hid: int, ua_sections: bool = False) -> str:
    if ua_sections:
        return ("User-agent: omni-ray\nDisallow: /article/\n\n"
                "User-agent: *\nDisallow: /tag/\n")
    lines = ["User-agent: *"]
    if hid % 2 == 0:
        lines += ["Disallow: /tag/", "Disallow: /item"]
    delay = (0, 1, 5)[hid % 3]
    if delay:
        lines.append(f"Crawl-delay: {delay}")
    return "\n".join(lines) + "\n"


def _hid(source: str) -> int:
    # source values are 'srcN': the numeric suffix is the host id
    digits = "".join(ch for ch in source if ch.isdigit())
    return int(digits) if digits else 0


class _RobotsProbe:
    """Per-batch probe: parses the (bounded, broadcast) host→robots map and
    probes each row's URL. Rebuilding ~20 tiny parsers per batch is noise
    here; the production per-actor cache lives in state/robots.RobotsShard
    — this op exercises the same parse_robots semantics query-side."""

    def __init__(self, robots_map_ref, agents):
        from ..state.robots import parse_robots

        rmap = ray.get(robots_map_ref)
        self.parsers = {h: parse_robots(txt) for h, txt in rmap.items()}
        self.agents = agents

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        url = _synth_urls(df)
        src = df["source"].astype(str)
        rows = {"source": [], "agent": [], "verdict": []}
        for s, u in zip(src, url):
            rp = self.parsers[s]
            for a in self.agents:
                rows["source"].append(s)
                rows["agent"].append(a)
                rows["verdict"].append(
                    "allowed" if rp.can_fetch(a, u) else "blocked")
        return pd.DataFrame(rows)


def robots_decision_census(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    sources = sorted(set(
        ds.groupby("source").aggregate(Count(alias_name="n"))
        .to_pandas()["source"].astype(str)))
    rmap_ref = ray.put({s: _robots_txt(_hid(s)) for s in sources})

    out = (
        ds.map_batches(_pd_arrow(lambda df: _RobotsProbe(
            rmap_ref, ["omni-ray"])(df).drop(columns=["agent"])),
            batch_format="pandas")
        .groupby(["source", "verdict"])
        .aggregate(Count(alias_name="n_urls"))
        .to_pandas().sort_values(["source", "verdict"])
        .reset_index(drop=True)
    )
    out["n_urls"] = out["n_urls"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ROBOTS_DECISION = f"""
WITH urls AS ({_SQL_URLS}),
lab AS (
  SELECT source,
         CASE WHEN CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT)
                   % 2 = 0
               AND (url LIKE '%.example.com/tag/%'
                    OR url LIKE '%.example.com/item%')
              THEN 'blocked' ELSE 'allowed' END AS verdict
  FROM urls
)
SELECT source, verdict, CAST(count(*) AS BIGINT) AS n_urls
FROM lab GROUP BY 1, 2
"""


def robots_ua_matrix(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    sources = sorted(set(
        ds.groupby("source").aggregate(Count(alias_name="n"))
        .to_pandas()["source"].astype(str)))
    rmap_ref = ray.put({s: _robots_txt(_hid(s), ua_sections=True)
                        for s in sources})

    out = (
        ds.map_batches(_pd_arrow(lambda df: _RobotsProbe(
            rmap_ref, ["omni-ray", "genericbot"])(df)),
            batch_format="pandas")
        .groupby(["source", "agent", "verdict"])
        .aggregate(Count(alias_name="n_urls"))
        .to_pandas().sort_values(["source", "agent", "verdict"])
        .reset_index(drop=True)
    )
    out["n_urls"] = out["n_urls"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ROBOTS_UA = f"""
WITH urls AS ({_SQL_URLS}),
agents AS (SELECT unnest(['omni-ray', 'genericbot']) AS agent),
lab AS (
  SELECT u.source, a.agent,
         CASE WHEN a.agent = 'omni-ray'
                   AND u.url LIKE '%.example.com/article/%' THEN 'blocked'
              WHEN a.agent <> 'omni-ray'
                   AND u.url LIKE '%.example.com/tag/%' THEN 'blocked'
              ELSE 'allowed' END AS verdict
  FROM urls u CROSS JOIN agents a
)
SELECT source, agent, verdict, CAST(count(*) AS BIGINT) AS n_urls
FROM lab GROUP BY 1, 2, 3
"""


def crawl_delay_budget_matrix(sf_dir: str):
    from ..state.robots import parse_robots

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    demand = (
        ds.groupby("source").aggregate(Count(alias_name="n_urls"))
        .to_pandas()
    )
    rows = []
    for _, r in demand.iterrows():
        s, n = str(r["source"]), int(r["n_urls"])
        rp = parse_robots(_robots_txt(_hid(s)))
        d = rp.crawl_delay("omni-ray")
        delay = int(d) if d is not None else 0
        budget = n if delay == 0 else _WAVE_S // delay
        rows.append((s, delay, n, budget, max(0, n - budget)))
    out = pd.DataFrame(rows, columns=["source", "delay_s", "n_urls",
                                      "wave_budget", "deficit"]) \
        .sort_values("source").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CRAWL_DELAY = f"""
WITH demand AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_urls
  FROM documents GROUP BY 1
), lab AS (
  SELECT source, n_urls,
         CAST(CASE CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 3
              WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 5 END AS BIGINT) AS delay_s
  FROM demand
)
SELECT source, delay_s, n_urls,
       CAST(CASE WHEN delay_s = 0 THEN n_urls
                 ELSE {_WAVE_S} // delay_s END AS BIGINT) AS wave_budget,
       CAST(greatest(0, n_urls - CASE WHEN delay_s = 0 THEN n_urls
                 ELSE {_WAVE_S} // delay_s END) AS BIGINT) AS deficit
FROM lab
"""


ROBOTSOPS_REGISTRY = {
    "robots_decision_census": (robots_decision_census, SQL_ROBOTS_DECISION),
    "robots_ua_matrix": (robots_ua_matrix, SQL_ROBOTS_UA),
    "crawl_delay_budget_matrix": (crawl_delay_budget_matrix, SQL_CRAWL_DELAY),
}
