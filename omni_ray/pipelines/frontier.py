"""Frontier dedup + politeness scheduling + priority ranking (SURVEY.md O1,
D1, J2, ST4; north_rule "partitioned priority frontier").

Pure, deterministic scheduling policy — shared by the distributed pipeline
(inside groupby(host).map_groups) and the single-process conformance oracle
(tests), so "matching the reference's crawl ordering" is checkable by
construction.

Policy (conformance definition, SURVEY.md §7.5(2)):
  * within-wave dedup: one row per url_hash, keeping the record with
    (max priority, then min discovery_ts, then min source) — first-wins under
    the reference's priority-desc-then-discovery-order scan
    (url_discovery_engine.py:102-106 sort + Redis-set first-wins :108-123)
  * per-host politeness: at most ``budget_per_host`` urls per host per wave
    (the scalable restatement of the reference's global
    asyncio.Semaphore(max_concurrent) throttle, omni_orchestrator.py:122-128);
    rows ranked (priority desc, discovery_ts asc, url asc) within host
  * crawl order within a wave: global sort by (priority desc,
    discovery_ts asc, url asc) — the reference's priority-desc stable sort,
    with discovery sequence as the stable tiebreak. With an unbounded budget
    the whole frontier is one wave and this equals the reference order.
"""

from __future__ import annotations

import pandas as pd

SORT_COLS = ["priority", "discovery_ts", "url"]
SORT_ASC = [False, True, True]


def dedup_frontier_group(group: pd.DataFrame) -> pd.DataFrame:
    """Per-url_hash group → the single winning record (map_groups body)."""
    return group.sort_values(SORT_COLS, ascending=SORT_ASC, kind="mergesort").head(1)


def dedup_frontier_pandas(df: pd.DataFrame) -> pd.DataFrame:
    """Single-process equivalent of groupby(url_hash)→dedup_frontier_group."""
    return (
        df.sort_values(SORT_COLS, ascending=SORT_ASC, kind="mergesort")
        .drop_duplicates("url_hash", keep="first")
    )


def schedule_host_group(group: pd.DataFrame, budget_per_host: int | None) -> pd.DataFrame:
    """Per-host group → adds ``scheduled`` bool by politeness budget
    (map_groups body for groupby('host'))."""
    g = group.sort_values(SORT_COLS, ascending=SORT_ASC, kind="mergesort").copy()
    if budget_per_host is None:
        g["scheduled"] = True
    else:
        g["scheduled"] = [i < budget_per_host for i in range(len(g))]
    return g


def crawl_order_pandas(df: pd.DataFrame) -> pd.DataFrame:
    """Assign the deterministic within-wave crawl order."""
    out = df.sort_values(SORT_COLS, ascending=SORT_ASC, kind="mergesort").reset_index(drop=True)
    out["crawl_order"] = range(len(out))
    return out


def reference_oracle_schedule_continuous(
    seeds: pd.DataFrame,
    discoveries: dict[int, pd.DataFrame],
    budget_per_host: int | None = None,
) -> pd.DataFrame:
    """Single-process oracle for CONTINUOUS crawling: the reference's
    run_continuous cycle (omni_orchestrator.py:209-245) — at the top of
    cycle ``w``, ``discoveries[w]`` (canonicalized frontier records) is
    merged into the pending frontier; records whose url_hash was already
    scheduled are dropped (Redis ``_is_visited``,
    url_discovery_engine.py:108-123), still-pending duplicates resolve
    first-wins; then the per-host politeness budget schedules the wave.
    Cycles where both the pending frontier and the cycle's discoveries are
    empty schedule nothing (idle cycle) but still advance the cycle clock.
    Returns the same (url, url_hash, host, …, wave, crawl_order) frame as
    reference_oracle_schedule."""
    seen: set[str] = set()
    pending = dedup_frontier_pandas(seeds)
    waves = []
    wave = 0
    last_cycle = max(discoveries) if discoveries else -1
    while True:
        if wave in discoveries and len(discoveries[wave]):
            merged = pd.concat([pending, discoveries[wave]], ignore_index=True)
            merged = merged[~merged["url_hash"].isin(seen)]
            pending = dedup_frontier_pandas(merged)
        if not len(pending):
            if wave < last_cycle:
                wave += 1
                continue
            break
        picks, deferred = [], []
        for _, g in pending.groupby("host", sort=False):
            g = g.sort_values(SORT_COLS, ascending=SORT_ASC, kind="mergesort")
            k = len(g) if budget_per_host is None else budget_per_host
            picks.append(g.head(k))
            if len(g) > k:
                deferred.append(g.iloc[k:])
        sched = crawl_order_pandas(pd.concat(picks, ignore_index=True))
        sched["wave"] = wave
        waves.append(sched)
        seen.update(sched["url_hash"])
        pending = (
            pd.concat(deferred, ignore_index=True) if deferred else pending.iloc[0:0]
        )
        wave += 1
    out = pd.concat(waves, ignore_index=True) if waves else seeds.iloc[0:0].copy()
    out = out.sort_values(["wave", "crawl_order"], kind="mergesort").reset_index(drop=True)
    out["crawl_order"] = range(len(out))
    return out


def reference_oracle_schedule(
    seeds: pd.DataFrame, budget_per_host: int | None = None
) -> pd.DataFrame:
    """Single-process oracle of the reference crawler's semantics: md5-set
    dedup (first wins under priority-desc scan) + priority-desc stable sort
    (url_discovery_engine.py:102-123), extended with the per-host wave budget.
    Returns (url, url_hash, host, priority, discovery_ts, wave, crawl_order)
    where crawl_order is global across waves in execution order.
    """
    remaining = dedup_frontier_pandas(seeds)
    waves = []
    wave = 0
    while len(remaining):
        picks = []
        deferred = []
        for _, g in remaining.groupby("host", sort=False):
            g = g.sort_values(SORT_COLS, ascending=SORT_ASC, kind="mergesort")
            k = len(g) if budget_per_host is None else budget_per_host
            picks.append(g.head(k))
            if len(g) > k:
                deferred.append(g.iloc[k:])
        sched = crawl_order_pandas(pd.concat(picks, ignore_index=True))
        sched["wave"] = wave
        waves.append(sched)
        remaining = (
            pd.concat(deferred, ignore_index=True) if deferred else remaining.iloc[0:0]
        )
        wave += 1
    out = pd.concat(waves, ignore_index=True) if waves else seeds.iloc[0:0].copy()
    # global order: by (wave, within-wave order)
    out = out.sort_values(["wave", "crawl_order"], kind="mergesort").reset_index(drop=True)
    out["crawl_order"] = range(len(out))
    return out
