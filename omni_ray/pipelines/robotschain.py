"""Robots→sitemap discovery chain (round 5, batch 91): the real-web
discovery entry chain — robots.txt ``Sitemap:`` directives (REAL stdlib
robotparser via state/robots.parse_robots → ``site_maps()``) fan out to
sitemap bodies (REAL sources/discovery.parse_sitemap), whose urls are then
gated by the SAME host's ``Disallow:`` rules (REAL ``can_fetch`` through an
actor-pool stage caching one parsed robots per host — the RobotsShard
pattern as a map_batches class). The reference declares
respect_robots_txt (config/master_config.yaml:10) and reads sitemaps
(url_discovery_engine.py:58-89); chaining them is how a production crawl
actually bootstraps a new host.

Universe: 6 hosts (doc_id % 6); host h advertises 1 + h % 3 sitemaps and
its docs round-robin across them; docs with doc_id % 7 == 0 sit under
/private/ which every host disallows. Census per host: sitemaps
advertised, urls listed, urls allowed — each number flows through a real
parser, so a dropped Sitemap: directive, a missed <loc>, or a can_fetch
path bug hashes wrong.

Scale shape: robots bodies are one row per host (bounded); sitemap bodies
are a bounded broadcast; url gating streams through the actor-pool stage
with the parser cache built once per actor.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .queries import _read

_HOSTS = 6


class _RobotsGate:
    """map_batches actor body: per-host RobotFileParser cache built from the
    broadcast robots map ONCE PER ACTOR; __call__ gates url batches."""

    def __init__(self, robots_map: dict[str, str], user_agent: str = "omni-ray"):
        from ..state.robots import parse_robots

        self.parsers = {h: parse_robots(txt) for h, txt in robots_map.items()}
        self.user_agent = user_agent

    def __call__(self, t: pa.Table) -> pa.Table:
        hosts = t["host"].to_pylist()
        urls = t["url"].to_pylist()
        allowed = []
        for h, u in zip(hosts, urls):
            rp = self.parsers.get(h)
            allowed.append(True if rp is None
                           else rp.can_fetch(self.user_agent, u))
        return t.append_column("allowed", pa.array(allowed, pa.bool_()))


def robots_sitemap_chain(sf_dir: str):
    import ray.data

    from ..sources.discovery import parse_sitemap
    from ..state.robots import parse_robots

    docs = _read(sf_dir, "documents", columns=["doc_id"]).to_pandas()
    ids = docs["doc_id"].to_numpy()

    robots_map: dict[str, str] = {}
    sitemap_bodies: dict[str, str] = {}
    for h in range(_HOSTS):
        host = f"r{h}.example.org"
        n_maps = 1 + h % 3
        lines = ["User-agent: *", "Disallow: /private/"]
        per_map: dict[int, list[str]] = {j: [] for j in range(n_maps)}
        for i in sorted(int(x) for x in ids if x % _HOSTS == h):
            path = f"/private/{i}" if i % 7 == 0 else f"/a/{i}"
            per_map[(i // _HOSTS) % n_maps].append(f"https://{host}{path}")
        for j in range(n_maps):
            sm_url = f"https://{host}/sitemap-{j}.xml"
            lines.append(f"Sitemap: {sm_url}")
            sitemap_bodies[sm_url] = (
                "<urlset>" + "".join(
                    f"<url><loc>{u}</loc></url>" for u in per_map[j])
                + "</urlset>")
        robots_map[host] = "\n".join(lines) + "\n"

    hosts_ds = ray.data.from_items(
        [{"host": h, "robots": robots_map[h]} for h in sorted(robots_map)])

    # hop 1: REAL robotparser extracts the Sitemap: directives
    def discover_sitemaps(t: pa.Table) -> pa.Table:
        hs, sms = [], []
        for h, body in zip(t["host"].to_pylist(), t["robots"].to_pylist()):
            for sm in (parse_robots(body).site_maps() or []):
                hs.append(h)
                sms.append(sm)
        return pa.table({"host": pa.array(hs, pa.string()),
                         "sitemap_url": pa.array(sms, pa.string())})

    # hop 2: REAL sitemap parse of each advertised sitemap
    def parse_maps(t: pa.Table) -> pa.Table:
        hs, urls = [], []
        for h, sm in zip(t["host"].to_pylist(),
                         t["sitemap_url"].to_pylist()):
            for u in parse_sitemap(sitemap_bodies.get(sm, "")):
                hs.append(h)
                urls.append(u)
        return pa.table({"host": pa.array(hs, pa.string()),
                         "url": pa.array(urls, pa.string())})

    sitemaps = hosts_ds.map_batches(discover_sitemaps, batch_format="pyarrow")
    n_maps_per_host = sitemaps.to_pandas().groupby("host").size()

    gated = (
        sitemaps.map_batches(parse_maps, batch_format="pyarrow")
        .map_batches(
            _RobotsGate,
            fn_constructor_kwargs={"robots_map": robots_map},
            batch_format="pyarrow", concurrency=2, batch_size=1024,
        )
        .to_pandas()
    )
    agg = gated.groupby("host").agg(
        n_urls_listed=("url", "size"), n_allowed=("allowed", "sum"))
    out = pd.DataFrame({
        "host": sorted(robots_map),
        "n_sitemaps": [int(n_maps_per_host.get(h, 0))
                       for h in sorted(robots_map)],
        "n_urls_listed": [int(agg["n_urls_listed"].get(h, 0))
                          for h in sorted(robots_map)],
        "n_allowed": [int(agg["n_allowed"].get(h, 0))
                      for h in sorted(robots_map)],
    })
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_ROBOTS_SITEMAP_CHAIN = """
SELECT 'r' || (doc_id % 6) || '.example.org' AS host,
       CAST(1 + (doc_id % 6) % 3 AS BIGINT) AS n_sitemaps,
       CAST(count(*) AS BIGINT) AS n_urls_listed,
       CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END) AS BIGINT)
         AS n_allowed
FROM documents
GROUP BY 1, 2
ORDER BY 1
"""


ROBOTSCHAIN_REGISTRY = {
    "robots_sitemap_chain": (robots_sitemap_chain, SQL_ROBOTS_SITEMAP_CHAIN),
}
