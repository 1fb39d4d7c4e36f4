import os, sys, time, shutil
ncpu = int(sys.argv[1])
os.environ["OMNI_RAY_TIMING"] = "1"
import ray
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data
from omni_ray.pipelines.crawl import run_crawl
from omni_ray.sources.pages import write_pages_dataset
base = "/tmp/omni_ray_scaling_pages_200000"
write_pages_dataset(base, n_rows=200000, seed=42, n_buckets=32, parallel=True)
ray.data.read_parquet(f"{base}/pages", columns=["url"]).map_batches(lambda t: t, batch_format="pyarrow").count()
t0 = time.perf_counter()
shutil.rmtree("/tmp/omni_ray_prof_crawl", ignore_errors=True)
totals = run_crawl(pages_dir=f"{base}/pages", seeds_path=f"{base}/seeds.parquet",
    out_dir="/tmp/omni_ray_prof_crawl", budget_per_host=200000, n_buckets=32,
    n_seen_shards=max(8, ncpu // 2))
print(f"TOTAL ncpu={ncpu}: {time.perf_counter()-t0:.2f}s scheduled={totals.get('scheduled')}")
ray.shutdown()
