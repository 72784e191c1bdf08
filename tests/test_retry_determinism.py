"""At-least-once retry determinism (VERDICT r3 Next #4).

Ray re-executes tasks after worker loss and replaces dead pool actors, so
on a real cluster any stage can run twice for the same input block. These
tests kill ONE worker mid-run (hard `os._exit` via the fail-once chaos
hook in `scripts_ray.faults`) and assert the job still completes with
output byte-identical to a clean run — proving the per-word memo caches,
seeded sampling and gate logic are pure per batch (no cross-batch state a
retry could observe out of order).
"""

import hashlib
import os

import pandas as pd
import pytest

from scripts_ray.faults import FAULT_FILE

SF = "/root/testdata/sf0.001"


def _frame_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    body = "\n".join(
        "|".join(str(v) for v in row) for row in df.itertuples(index=False)
    )
    return hashlib.md5(body.encode()).hexdigest()


def _arm():
    with open(FAULT_FILE, "w") as f:
        f.write("armed")


def _run_flagship(mode: str) -> pd.DataFrame:
    import ray

    from scripts_ray import pipelines
    from scripts_ray.sources import derive_transcripts_ds

    counts_ref = ray.put(pipelines.build_model_counts(SF))
    if mode == "broadcast":
        out = pipelines.quality_filter(
            derive_transcripts_ds(SF),
            counts_ref,
            score_concurrency=(1, 2),
            mode="broadcast",
        )
    else:
        out = pipelines.quality_filter(
            derive_transcripts_ds(SF),
            counts_ref,
            score_concurrency=(1, 2),
            num_partitions=8,
        )
    return out.to_pandas()


@pytest.mark.parametrize("mode", ["broadcast", "exchange"])
def test_flagship_actor_retry_is_deterministic(ray_session, mode):
    """Kill the first scorer ACTOR mid-__call__; the pool must replace it,
    re-run the batch, and produce byte-identical output."""
    if os.path.exists(FAULT_FILE):
        os.unlink(FAULT_FILE)
    clean = _frame_hash(_run_flagship(mode))
    _arm()
    faulted = _frame_hash(_run_flagship(mode))
    assert not os.path.exists(FAULT_FILE), "fault never fired"
    assert faulted == clean


def test_task_stage_retry_is_deterministic(ray_session):
    """Kill a worker inside the stateless scrub TASK stage (qf_scrub runs
    scrub_batch as plain map_batches tasks); Ray's task retry must make the
    run equivalent to a clean one."""
    from scripts_ray.queries import QUERIES

    if os.path.exists(FAULT_FILE):
        os.unlink(FAULT_FILE)
    clean = _frame_hash(QUERIES["qf_scrub"](SF).to_pandas())
    _arm()
    faulted = _frame_hash(QUERIES["qf_scrub"](SF).to_pandas())
    assert not os.path.exists(FAULT_FILE), "fault never fired"
    assert faulted == clean
