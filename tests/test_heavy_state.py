"""Heavy broadcast-state actor pool: the ~200 MB state-blob exercise
(VERDICT r2 Next #9).

The engine's stateful stages load model state from ONE bundled ``ray.put``
ref in ``__init__`` (scripts_ray/pipelines.py Scorer/ScrubScoreGateDemote,
ray#53727 workaround). Until now that path only carried a few-MB unigram
table; this test pushes a genuinely heavy blob (200 MB, the size class of
a real fastText/KenLM model) through the same pattern and asserts the
memory math the design claims:

- each actor materializes the blob exactly ONCE (a per-process load
  counter emitted with every batch never exceeds 1);
- the pool actually fanned out (>= 2 distinct actor processes);
- worker RSS stays in the one-blob size class (no per-batch copy
  accumulation: 50 batches x 200 MB would blow the bound immediately).

NOTE: the stage class is defined INSIDE the test so cloudpickle ships it
by value — a module-level class here would pickle by reference to the
`tests` module, which Ray workers cannot import (observed: actor pool
start times out with every actor failing on import).
"""

import os
import resource

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

BLOB_MB = 200
N_ROWS = 200_000
BATCH = 4096


def test_heavy_state_blob_loads_once_per_actor(ray_session):
    class HeavyStage:
        """Minimal stand-in for a model-actor stage: one heavy ndarray
        loaded once per actor, a vectorized gather against it per batch."""

        _loads = 0  # per actor process: the class object is per-process

        def __init__(self, blob_ref):
            HeavyStage._loads += 1
            # Ray Data may hand the constructor the RESOLVED value
            # instead of the ObjectRef (same guard as pipelines.Scorer)
            self.blob = (
                blob_ref if isinstance(blob_ref, np.ndarray) else ray.get(blob_ref)
            )
            self.loads = HeavyStage._loads

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            idx = batch["id"].to_numpy() % len(self.blob)
            # CURRENT resident set, not ru_maxrss: the high-water mark is
            # process-lifetime, and Ray reuses worker processes across the
            # rest of the pytest session, so earlier tests' peaks would
            # pollute the accumulation check when the suite runs together.
            with open("/proc/self/statm") as f:
                rss_mb = (
                    int(f.read().split()[1]) * resource.getpagesize() // (1024 * 1024)
                )
            return pa.table(
                {
                    "id": batch["id"],
                    "v": pa.array(self.blob[idx]),
                    "pid": pa.array(np.full(n, os.getpid(), dtype=np.int64)),
                    "loads": pa.array(np.full(n, self.loads, dtype=np.int64)),
                    "rss_mb": pa.array(np.full(n, rss_mb, dtype=np.int64)),
                }
            )

    blob = np.arange(BLOB_MB * 1024 * 1024 // 8, dtype=np.int64)
    ref = ray.put(blob)

    out = (
        rd.range(N_ROWS)
        .map_batches(
            HeavyStage,
            fn_constructor_args=(ref,),
            concurrency=(2, 3),
            batch_size=BATCH,
            batch_format="pyarrow",
        )
        .to_pandas()
    )

    assert len(out) == N_ROWS
    # correctness of the gather: v == id % len(blob) since blob[i] == i
    sample = out.sample(n=1000, random_state=0)
    assert (sample["v"] == sample["id"] % len(blob)).all()

    # load-once: no actor process ever built the state twice
    assert out["loads"].max() == 1, "an actor re-materialized the blob"
    # the pool actually fanned out
    assert out["pid"].nunique() >= 2
    # steady memory: one plasma-backed blob view + worker baseline, never
    # an accumulation of per-batch copies (which would exceed this bound
    # within a handful of 200 MB copies)
    assert out["rss_mb"].max() < 3 * BLOB_MB + 500, (
        f"worker RSS {out['rss_mb'].max()} MB is out of the one-blob class"
    )
