"""Pipeline-composition surface (SURVEY.md §2.10): the user-extension points
of the reference re-expressed Ray-Data-first.

  * ``Stage`` — a named transform (map / filter / shuffle-returning callable
    over a Dataset), mirroring the constructor-injected phases of
    omni_orchestrator.py:39-50.
  * ``Pipeline`` — ordered Stage composition with per-stage row counters
    (lineage), lazily applied: Pipeline([...]).run(ds) returns the composed
    Dataset; counters are collected only if ``count_stages=True`` (each count
    forces an execution — off in production).
  * ``ExtractorChain`` — the engine-registry fallback pattern
    (multi_engine_crawler.py:13-53): an ordered list of per-row extractor
    callables tried until one yields a non-empty result; runs vectorized
    inside one map_batches.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa
import ray.data


@dataclass
class Stage:
    name: str
    fn: Callable[[ray.data.Dataset], ray.data.Dataset]
    kind: str = "map"  # map | filter | shuffle (documentation of cost)


@dataclass
class Pipeline:
    stages: list[Stage] = field(default_factory=list)

    def then(self, name: str, fn, kind: str = "map") -> "Pipeline":
        self.stages.append(Stage(name, fn, kind))
        return self

    def run(self, ds: ray.data.Dataset, count_stages: bool = False):
        counters: dict[str, int] = {}
        for stage in self.stages:
            ds = stage.fn(ds)
            if count_stages:
                ds = ds.materialize()
                counters[stage.name] = ds.count()
        return (ds, counters) if count_stages else ds


class ExtractorChain:
    """Ordered extractor fallback: each extractor is (name, fn(html, url) ->
    str|None); first non-empty wins, its name recorded as crawler_engine —
    the multi-engine registry semantics (multi_engine_crawler.py:33-50)."""

    def __init__(self, extractors: list[tuple[str, Callable[[str, str], str | None]]]):
        self.extractors = extractors

    def __call__(self, batch: pa.Table, html_col: str = "html", url_col: str = "url") -> pa.Table:
        htmls = [
            h.decode("utf-8", "replace") if isinstance(h, (bytes, bytearray)) else (h or "")
            for h in batch.column(html_col).to_pylist()
        ]
        urls = [u or "" for u in batch.column(url_col).to_pylist()]
        texts, engines = [], []
        for html, url in zip(htmls, urls):
            text, engine = "", ""
            for name, fn in self.extractors:
                try:
                    out = fn(html, url)
                except Exception:
                    out = None  # engine failure → fall through (drop-and-count)
                if out:
                    text, engine = out, name
                    break
            texts.append(text)
            engines.append(engine)
        return batch.append_column(
            "extracted_text", pa.array(texts, pa.string())
        ).append_column("crawler_engine", pa.array(engines, pa.string()))
