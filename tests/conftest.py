import os

import pytest

# Namespace the fail-once chaos marker to THIS test session before any
# ray.init, so local-mode workers (which inherit the driver's environment
# through the raylet) compute the same scripts_ray.faults.FAULT_FILE path
# and markers from other/aborted sessions are invisible here.
os.environ.setdefault("GRAFT_FAULT_TOKEN", f"pytest{os.getpid()}")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()
