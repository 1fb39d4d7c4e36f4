"""Fetch-chain censuses (round 5, batch 87): drive the REAL engine-fallback
chain (stages/fetchbackend.py — multi_engine_crawler.py:29-53 semantics)
through a map_batches actor pool over a documents-derived url universe with
deterministically scripted engine behavior, and census which engine served
each row and with what status; plus the continuous-crawl queueing-delay
histogram over the batch-service universe.

- fetch_chain_census: engine A is scripted per doc_id — timeout (%5==0),
  error (%5==1), empty-200 (%5==2, unusable), ok otherwise; engine B
  errors on %20==5 (a row A timed out on → terminal 599), times out on
  %20==16 (a row A errored on → terminal 408), and serves the rest. The
  chain contract (first USABLE result wins; empty 200 falls through;
  terminal timeout→408 / error→599, LAST failure's engine recorded) gives
  a closed-form (engine, status) per doc_id — a chain bug (swallowed
  timeout, empty-200 accepted, wrong terminal shaping) changes the census
  and hashes wrong. The kernel under test is the actual
  FetchStage/FallbackChainBackend code the crawl fetch seam ships.
- crawl_wait_histogram: per host, the distribution of waves-waited
  (scheduled wave − arrival cycle) from the SAME continuous-crawl run the
  batch-86 censuses use (shared module cache) — the queueing-delay read a
  capacity planner checks; closed form from the batch-service identity.

Scale shape: the url universe streams through map_batches (the FetchStage
pool is the production fetch shape: backends built once per actor);
censuses aggregate bounded grains ((engine, status); (host, wait)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .contcrawl import _SQL_QUEUE_CORE
from .queries import _pd_arrow, _read


def _scripted_chain_factory():
    """Module-level factory (actor-serializable): the deterministic
    two-engine chain. Scripting derives from the doc id embedded in the
    url, so actors need no shared state."""
    from ..stages.fetchbackend import (
        FallbackChainBackend,
        FetchBackend,
        FetchResult,
        FetchTimeout,
    )

    class ByIdBackend(FetchBackend):
        def __init__(self, name: str, role: str):
            self.name = name
            self.role = role

        def fetch_one(self, url: str, timeout_s: float) -> FetchResult:
            i = int(url.rsplit("-", 1)[1])
            if self.role == "a":
                m = i % 5
                if m == 0:
                    raise FetchTimeout(url)
                if m == 1:
                    raise RuntimeError("scripted error")
                if m == 2:
                    return FetchResult(url, 200, b"", self.name, 0.0)
                return FetchResult(url, 200, b"<html>a</html>", self.name, 0.0)
            if i % 20 == 5:
                raise RuntimeError("scripted error")
            if i % 20 == 16:
                raise FetchTimeout(url)
            return FetchResult(url, 200, b"<html>b</html>", self.name, 0.0)

    return FallbackChainBackend([ByIdBackend("engine_a", "a"),
                                 ByIdBackend("engine_b", "b")])


def fetch_chain_census(sf_dir: str):
    from ..stages.fetchbackend import FetchStage

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def urls(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "url": [f"https://h{i % 3}.chain.test/p-{i}" for i in ids],
            "host": [f"h{i % 3}.chain.test" for i in ids],
        })

    fetched = ds.map_batches(_pd_arrow(urls), batch_format="pandas") \
        .map_batches(
            FetchStage,
            fn_constructor_kwargs={
                "backend_factory": _scripted_chain_factory,
                "timeout_s": 1.0,
            },
            batch_format="pandas", concurrency=2, batch_size=512,
        )
    out = (
        fetched.map_batches(
            lambda t: pa.Table.from_pydict({
                "engine": t["engine"], "http_status": t["http_status"]}),
            batch_format="pyarrow")
        .to_pandas()
        .groupby(["engine", "http_status"]).size().rename("n")
        .reset_index().sort_values(["engine", "http_status"])
        .reset_index(drop=True)
    )
    out["http_status"] = out["http_status"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


# Chain contract per doc_id i (note %20==5 implies %5==0, %20==16 implies
# %5==1 — B's failure rows are exactly rows A already failed on, and B is
# never called when A succeeds, i.e. i%5 in (3,4)):
#   i%20==5 : A timeout, B error   -> terminal LAST failure -> (engine_b, 599)
#   i%20==16: A error,   B timeout -> terminal LAST failure -> (engine_b, 408)
#   i%5 in (0,1,2) otherwise       -> B serves              -> (engine_b, 200)
#   i%5 in (3,4)                   -> A serves              -> (engine_a, 200)
SQL_FETCH_CHAIN_CENSUS = """
WITH shaped AS (
  SELECT CASE WHEN doc_id % 5 IN (3, 4) THEN 'engine_a' ELSE 'engine_b' END
           AS engine,
         CASE WHEN doc_id % 20 = 5 THEN 599
              WHEN doc_id % 20 = 16 THEN 408
              ELSE 200 END AS http_status
  FROM documents
)
SELECT engine, CAST(http_status AS BIGINT) AS http_status,
       CAST(count(*) AS BIGINT) AS n
FROM shaped GROUP BY 1, 2 ORDER BY 1, 2
"""


def crawl_wait_histogram(sf_dir: str):
    """Waves-waited histogram per host from the real continuous-crawl
    schedule artifacts (batch-86 universe, shared run)."""
    from .contcrawl import _run_continuous_universe
    from .crawl import read_schedule_artifacts

    out_dir, _budget = _run_continuous_universe(sf_dir)
    sched = read_schedule_artifacts(out_dir).to_pandas()
    doc = sched["url"].str.rsplit("/", n=1).str[1].astype("int64")
    wait = sched["wave"].astype("int64") - (doc % 4)
    out = (
        pd.DataFrame({"host": sched["host"], "waited": wait})
        .groupby(["host", "waited"]).size().rename("n")
        .reset_index().sort_values(["host", "waited"]).reset_index(drop=True)
    )
    out["waited"] = out["waited"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CRAWL_WAIT_HISTOGRAM = _SQL_QUEUE_CORE + """
SELECT 'c' || h || '.example.net' AS host,
       CAST(wave - a AS BIGINT) AS waited,
       CAST(count(*) AS BIGINT) AS n
FROM waved
GROUP BY 1, 2
ORDER BY 1, 2
"""


FETCHCHAIN_REGISTRY = {
    "fetch_chain_census": (fetch_chain_census, SQL_FETCH_CHAIN_CENSUS),
    "crawl_wait_histogram": (crawl_wait_histogram, SQL_CRAWL_WAIT_HISTOGRAM),
}
