"""Batch 86 planted tests: the batch-service queue closed form
w_k = max_{j<=k}(a_j + floor((k-j)/B)) = floor((k + runmax(a*B - k))/B)
must equal (1) a brute-force wave-by-wave queue simulation, and (2) the
continuous-crawl reference oracle over the census's own synthesized
universe — including the planted re-discoveries, which must never be
scheduled."""

import numpy as np
import pandas as pd
import pytest

from omni_ray.functions.canonical import canonicalize_url, host_of, md5_hex
from omni_ray.pipelines.contcrawl import _CYCLES, _HOSTS, _frontier_rows
from omni_ray.pipelines.frontier import reference_oracle_schedule_continuous


def _closed_form(arrivals: list[int], budget: int) -> list[int]:
    a = np.asarray(arrivals, dtype=np.int64)
    k = np.arange(len(a), dtype=np.int64)
    run = np.maximum.accumulate(a * budget - k)
    return ((k + run) // budget).tolist()


def _brute_queue(arrivals: list[int], budget: int) -> list[int]:
    """Wave-by-wave FIFO batch-service simulation."""
    waves = [None] * len(arrivals)
    w = 0
    backlog: list[int] = []
    nxt = 0
    while nxt < len(arrivals) or backlog:
        while nxt < len(arrivals) and arrivals[nxt] <= w:
            backlog.append(nxt)
            nxt += 1
        for idx in backlog[:budget]:
            waves[idx] = w
        backlog = backlog[budget:]
        if not backlog and nxt < len(arrivals):
            w = max(w + 1, arrivals[nxt])
        else:
            w += 1
    return waves


@pytest.mark.parametrize("budget", [1, 2, 3, 7])
def test_closed_form_equals_brute_queue(budget):
    cases = [
        [0, 0, 0, 0],                  # all at once
        [0, 1, 2, 3, 4],               # steady drip
        [0, 0, 0, 5, 5, 5],            # burst, gap, burst
        [2, 2, 3, 3, 3, 3, 9],         # late start + long gap
        [0] * 10 + [1] * 10 + [3] * 5,
    ]
    for arrivals in cases:
        assert _closed_form(arrivals, budget) == _brute_queue(arrivals, budget), (
            arrivals, budget)


def test_census_universe_matches_continuous_oracle():
    """The census's synthesized universe, run through the single-process
    continuous oracle, must land every row in the wave the closed form
    predicts, and must drop every planted duplicate."""
    ids = list(range(200))
    budget = max(16, len(ids) // 30)
    cycles = _frontier_rows(ids)

    def canon(tbl) -> pd.DataFrame:
        df = tbl.to_pandas()
        df["canonical_url"] = df["url"].map(canonicalize_url)
        df["host"] = df["canonical_url"].map(host_of)
        df["url_hash"] = df["canonical_url"].map(md5_hex)
        return df

    oracle = reference_oracle_schedule_continuous(
        canon(cycles[0]),
        {c: canon(cycles[c]) for c in range(1, _CYCLES)},
        budget_per_host=budget,
    )
    # every original row scheduled exactly once; dups contributed nothing
    assert len(oracle) == len(ids)
    oracle = oracle.copy()
    oracle["doc_id"] = oracle["url"].str.rsplit("/", n=1).str[1].astype("int64")
    assert sorted(oracle["doc_id"]) == ids
    # dup rows carry a +100000-shifted ts; none may appear
    dup_ts = {1_700_000_000_000_000 + (_CYCLES - 1) * 10**13 + (i + 100_000) * 1_000_000
              for i in ids if i % 3 == 0}
    got_ts = set(oracle["discovery_ts"].astype("int64") // 1000)  # ns -> us
    assert not (got_ts & dup_ts)

    # per host, the oracle's wave assignment equals the closed form
    for h in range(_HOSTS):
        g = oracle[oracle["doc_id"] % _HOSTS == h].sort_values("doc_id")
        g = g.sort_values("discovery_ts", kind="mergesort")
        arrivals = (g["doc_id"] % _CYCLES).tolist()
        assert g["wave"].tolist() == _closed_form(arrivals, budget)
