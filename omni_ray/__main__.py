"""CLI entry point: ``python -m omni_ray <command>`` — the operational
surface a user of the reference drives through its root scripts and
orchestrator mains (omni_orchestrator.py:246-278 run_once / run_continuous,
src/web/dashboard.py app.run, data_exporter CLI shapes), rebuilt over the
Ray pipelines.

Commands
  crawl       one full crawl to frontier exhaustion (run_crawl)
  compact     merge small part files in finished epoch snapshots
  continuous  discovery-driven cycles: --feeds-dir holds cycle-<k>.parquet
              feed tables (feed_url, kind, body[, feed_seq]); each cycle's
              file is parsed by the real RSS/sitemap parsers and unioned
              into the live frontier
  query       run a registered queries() entry and print the result
  serve       start the dashboard/metrics/analytics HTTP server
  export      articles parquet -> csv / jsonl via the export pipelines

This module OWNS its Ray session (CLAUDE.md rule: only bench.py, scripts
and the test fixture init Ray — __ray_entry__ never does).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False,
              "logging_level": "ERROR"}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_crawl(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.crawl import run_crawl

    robots_map = None
    if args.robots_json:
        with open(args.robots_json) as f:
            robots_map = json.load(f)
    totals = run_crawl(
        pages_dir=args.pages, seeds_path=args.seeds, out_dir=args.out,
        budget_per_host=args.budget, n_buckets=args.n_buckets,
        n_seen_shards=args.n_seen_shards, robots_map=robots_map,
        respect_robots=robots_map is not None, max_waves=args.max_waves,
        resume=not args.fresh,
    )
    print(json.dumps(totals))
    return 0


def cmd_continuous(args) -> int:
    _init_ray(args.num_cpus)
    import pyarrow.parquet as pq

    from .pipelines.crawl import run_continuous

    feeds_dir = args.feeds_dir

    def _cycle_no(fname: str) -> int | None:
        try:
            return int(fname[6:-8])
        except ValueError:
            return None  # not a cycle-<int>.parquet file: ignore, don't die

    def feeds_fn(cycle: int):
        files = [
            f for f in sorted(os.listdir(feeds_dir))
            if f.startswith("cycle-") and f.endswith(".parquet")
            and _cycle_no(f) is not None
        ]
        path = os.path.join(feeds_dir, f"cycle-{cycle}.parquet")
        if os.path.exists(path):
            return pq.read_table(path)
        if any(_cycle_no(f) > cycle for f in files):
            # quiet cycle with later feeds scheduled: keep polling
            return pq.read_table(os.path.join(feeds_dir, files[0])).slice(0, 0)
        return None

    totals = run_continuous(
        pages_dir=args.pages, seeds_path=args.seeds, out_dir=args.out,
        feeds_fn=feeds_fn, cycles=args.cycles,
        budget_per_host=args.budget, n_buckets=args.n_buckets,
        n_seen_shards=args.n_seen_shards,
    )
    print(json.dumps(totals))
    return 0


def cmd_query(args) -> int:
    _init_ray(args.num_cpus)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry

    q = entry.queries()
    if args.name not in q:
        print(f"unknown query {args.name!r}; {len(q)} available "
              f"(try: {', '.join(sorted(q)[:8])}, ...)", file=sys.stderr)
        return 2
    res = q[args.name](args.sf_dir)
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pa.Table):
        res = res.to_pandas()
    elif not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    if args.json:
        print(res.to_json(orient="records"))
    else:
        print(res.to_string(max_rows=args.max_rows))
    return 0


def cmd_serve(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.monitor import SystemMonitor
    from .serve import DashboardServer

    # the FULL registered query surface (every registry __ray_entry__
    # exposes), not just pipelines.queries — the allow-list is the gate
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry

    srv = DashboardServer(
        args.sf_dir, monitor=SystemMonitor(),
        queries=entry.queries(),
        allowed=args.allow.split(",") if args.allow else None,
        port=args.port,
    ).start()
    print(f"serving on {srv.url} (routes: /health /metrics /api/stats "
          f"/api/timeseries /analytics /api/analytics/<kind> "
          f"/api/query/<name>)", flush=True)
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()
    return 0


def cmd_export(args) -> int:
    _init_ray(args.num_cpus)
    import ray.data

    from .pipelines import export as ex

    ds = ray.data.read_parquet(args.articles)
    if args.format == "csv":
        ex.export_articles_csv(ds, args.out)
    elif args.format == "jsonl":
        ex.export_articles_json(ds, args.out)
    else:
        print(f"unknown format {args.format!r}", file=sys.stderr)
        return 2
    print(json.dumps({"rows": ds.count(), "out": args.out}))
    return 0


def cmd_compact(args) -> int:
    from .sinks.compact import compact_epoch_snapshots

    manifests = compact_epoch_snapshots(args.out, args.target_rows)
    print(json.dumps(manifests))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="omni_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    def crawl_args(c):
        c.add_argument("--pages", required=True)
        c.add_argument("--seeds", required=True)
        c.add_argument("--out", required=True)
        c.add_argument("--budget", type=int, default=None)
        c.add_argument("--n-buckets", type=int, default=8)
        c.add_argument("--n-seen-shards", type=int, default=4)

    c = sub.add_parser("crawl")
    crawl_args(c)
    c.add_argument("--max-waves", type=int, default=100)
    c.add_argument("--robots-json", default=None,
                   help="json file: {host: robots.txt body}")
    c.add_argument("--fresh", action="store_true",
                   help="clear prior epochs instead of resuming")
    c.set_defaults(fn=cmd_crawl)

    c = sub.add_parser("continuous")
    crawl_args(c)
    c.add_argument("--feeds-dir", required=True)
    c.add_argument("--cycles", type=int, default=100)
    c.set_defaults(fn=cmd_continuous)

    c = sub.add_parser("query")
    c.add_argument("name")
    c.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    c.add_argument("--json", action="store_true")
    c.add_argument("--max-rows", type=int, default=50)
    c.set_defaults(fn=cmd_query)

    c = sub.add_parser("serve")
    c.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    c.add_argument("--port", type=int, default=0)
    c.add_argument("--allow", default=None,
                   help="comma-separated query allow-list")
    c.set_defaults(fn=cmd_serve)

    c = sub.add_parser("compact")
    c.add_argument("--out", required=True,
                   help="crawl output dir (epoch=* layout)")
    c.add_argument("--target-rows", type=int, default=1_000_000)
    c.set_defaults(fn=cmd_compact)

    c = sub.add_parser("export")
    c.add_argument("--articles", required=True)
    c.add_argument("--format", choices=["csv", "jsonl"], default="csv")
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
