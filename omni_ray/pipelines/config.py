"""Config-driven pipeline surface (SURVEY.md §2.10): the reference's
``config/master_config.yaml`` + ``discovery_sources.yaml`` keys re-expressed
as a typed config consumed by the crawl entry point.

Mirrored keys (reference file:line):
  * max_concurrent_crawls → budget_per_host (master_config.yaml:7; the
    per-host restatement of the global semaphore, SURVEY.md ST4)
  * respect_robots_txt (master_config.yaml:10)
  * crawl_interval_seconds (master_config.yaml:11 — continuous-mode sleep;
    carried for parity, the wave loop is the bounded-batch equivalent)
  * sources with enabled flags (discovery_sources.yaml:1-20,
    url_discovery_engine.py:97-99)
  * blocked_domains (article_validator.py:28)

Loads from a plain dict (YAML-shaped; no YAML parser needed in-sandbox —
``from_dict(yaml.safe_load(...))`` where available).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SourceConfig:
    url: str
    kind: str = "rss"  # rss | sitemap
    enabled: bool = True


@dataclass
class CrawlConfig:
    budget_per_host: int | None = 5
    respect_robots_txt: bool = True
    crawl_interval_seconds: int = 300
    request_timeout_seconds: int = 30
    sources: list[SourceConfig] = field(default_factory=list)
    blocked_domains: list[str] = field(default_factory=lambda: ["spam.com", "malicious.net"])
    n_seen_shards: int = 4
    n_buckets: int = 8
    distributed_frontier: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "CrawlConfig":
        crawler = d.get("crawler", {})
        sources = [
            SourceConfig(
                url=s.get("url", ""),
                kind=s.get("kind", s.get("type", "rss")),
                enabled=bool(s.get("enabled", True)),
            )
            for s in d.get("sources", [])
        ]
        return cls(
            budget_per_host=crawler.get("max_concurrent_crawls", 5),
            respect_robots_txt=bool(crawler.get("respect_robots_txt", True)),
            crawl_interval_seconds=int(crawler.get("crawl_interval_seconds", 300)),
            request_timeout_seconds=int(crawler.get("request_timeout_seconds", 30)),
            sources=sources,
            blocked_domains=list(
                d.get("validation", {}).get("blocked_domains", ["spam.com", "malicious.net"])
            ),
            n_seen_shards=int(d.get("engine", {}).get("n_seen_shards", 4)),
            n_buckets=int(d.get("engine", {}).get("n_buckets", 8)),
            distributed_frontier=bool(d.get("engine", {}).get("distributed_frontier", False)),
        )

    def enabled_sources(self) -> list[SourceConfig]:
        return [s for s in self.sources if s.enabled]


def run_crawl_with_config(pages_dir: str, seeds_path: str, out_dir: str,
                          cfg: CrawlConfig, robots_map: dict | None = None, **kw) -> dict:
    """Config-driven entry to the wave loop."""
    from .crawl import run_crawl

    return run_crawl(
        pages_dir=pages_dir,
        seeds_path=seeds_path,
        out_dir=out_dir,
        budget_per_host=cfg.budget_per_host,
        n_buckets=cfg.n_buckets,
        n_seen_shards=cfg.n_seen_shards,
        robots_map=robots_map,
        respect_robots=cfg.respect_robots_txt and robots_map is not None,
        distributed_frontier=cfg.distributed_frontier,
        **kw,
    )
