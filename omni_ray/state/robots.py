"""Robots.txt cache actors (SURVEY.md ST5).

The reference declares ``respect_robots_txt: true`` (config/master_config.yaml:10)
but ships no parser; per the north_rule we build the stage from scratch on
stdlib ``urllib.robotparser`` semantics. A pool of ``RobotsShard`` actors,
host-hash partitioned, each caching parsed robots.txt per host. "Fetching"
robots.txt in-sandbox = looking it up in a robots table ``{host: robots_txt}``
broadcast via ``ray.put`` (tiny side input → no shuffle, SURVEY.md J4 pattern).

Conformance note: the reference's oracle semantics run with robots DISABLED
(it never filters by robots); the crawl pipeline takes ``respect_robots``
and emits a ``robots_blocked`` lineage counter when enabled.
"""

from __future__ import annotations

import hashlib
import urllib.robotparser

import ray


def parse_robots(robots_txt: str, user_agent: str = "omni-ray"):
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(robots_txt.splitlines())
    return rp


@ray.remote(num_cpus=0.1)
class RobotsShard:
    """Caches RobotFileParser per host for its host-hash partition."""

    def __init__(self, robots_map_ref, user_agent: str = "omni-ray"):
        # robots_map_ref: ray.ObjectRef of dict[host -> robots.txt str].
        # Ray auto-dereferences top-level ObjectRef args, so it may arrive
        # as the dict itself.
        if isinstance(robots_map_ref, ray.ObjectRef):
            robots_map_ref = ray.get(robots_map_ref)
        self.robots_map = robots_map_ref or {}
        self.user_agent = user_agent
        self.cache: dict[str, urllib.robotparser.RobotFileParser] = {}

    def _parser_for(self, host: str):
        rp = self.cache.get(host)
        if rp is None:
            txt = self.robots_map.get(host)
            if txt is None:
                rp = False  # no robots.txt → allow all (robotparser default)
            else:
                rp = parse_robots(txt, self.user_agent)
            self.cache[host] = rp
        return rp

    def allowed(self, hosts: list[str], urls: list[str]) -> list[bool]:
        out = []
        for host, url in zip(hosts, urls):
            rp = self._parser_for(host)
            out.append(True if rp is False else rp.can_fetch(self.user_agent, url))
        return out


class RobotsCache:
    """Driver-side handle; host-hash routed shard pool."""

    def __init__(self, robots_map: dict[str, str] | None, n_shards: int = 4,
                 user_agent: str = "omni-ray"):
        ref = ray.put(robots_map or {})
        self.n_shards = n_shards
        # anonymous actors: one pool per crawl run
        self.shards = [RobotsShard.remote(ref, user_agent) for i in range(n_shards)]

    @staticmethod
    def shard_of(host: str, n_shards: int) -> int:
        return int(hashlib.md5(host.encode()).hexdigest()[:8], 16) % n_shards

    def allowed(self, hosts: list[str], urls: list[str]) -> list[bool]:
        groups: dict[int, list[int]] = {}
        for idx, h in enumerate(hosts):
            groups.setdefault(self.shard_of(h or "", self.n_shards), []).append(idx)
        futures = {
            sid: self.shards[sid].allowed.remote(
                [hosts[i] for i in idxs], [urls[i] for i in idxs]
            )
            for sid, idxs in groups.items()
        }
        out = [True] * len(urls)
        for sid, idxs in groups.items():
            for i, ok in zip(idxs, ray.get(futures[sid])):
                out[i] = ok
        return out

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
