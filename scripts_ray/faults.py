"""Fail-once chaos hook for at-least-once retry testing.

Ray executes tasks (and replaces pool actors) at-least-once: on a real
cluster a worker loss mid-run re-executes its task, so every stage must be
deterministic AND side-effect-free per batch or retries silently corrupt
output. The reference's analog is its idempotent in-place rewrite stages
(/root/reference/src/cur-prot/post-pipeline.py re-runs). This hook turns
that property into a tested invariant (VERDICT r3 Next #4):

- the test "arms" the fault by creating `FAULT_FILE`;
- the FIRST worker to enter an instrumented stage atomically claims the
  file (`os.unlink` — exactly one claimant can succeed) and kills its own
  process hard (`os._exit`), which Ray sees as a worker/actor loss, NOT an
  application error — so the task is retried instead of failing the job;
- the run must then produce byte-identical output to a clean run.

Cost when disarmed: one `os.path.exists` stat per batch — nanoseconds
against millisecond-scale batch kernels.
"""

from __future__ import annotations

import os

# The marker is namespaced per arming session (GRAFT_FAULT_TOKEN, set by
# tests/conftest.py BEFORE ray.init so local-mode workers inherit it): two
# concurrent test sessions on one machine, or a stale armed marker left by
# an aborted run, can then never kill a worker in an unrelated run. The
# un-tokened default path exists only for ad-hoc shells and is never armed
# by the test suite.
FAULT_FILE = "/tmp/graft_fault_once_" + os.environ.get(
    "GRAFT_FAULT_TOKEN", "adhoc"
)


def maybe_fail_once() -> None:
    """If the fault marker exists, claim it and die mid-task (simulated
    worker loss). Exactly one process can claim the marker."""
    if not os.path.exists(FAULT_FILE):
        return
    try:
        os.unlink(FAULT_FILE)
    except FileNotFoundError:
        return  # another worker claimed it first
    os._exit(1)
