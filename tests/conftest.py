"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory):
    """Small deterministic pages+seeds dataset shared across tests."""
    from omni_ray.sources.pages import write_pages_dataset

    out = str(tmp_path_factory.mktemp("pagesdata"))
    write_pages_dataset(out, n_rows=400, seed=42, n_buckets=8)
    return out


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
