"""Persistent shared-state components (the raw-Ray-actor escape hatch).

`gather_retry` is the shared RPC wrapper: Ray 2.49's ordered actor-call
path can time out waiting for an earlier seq_no when MANY map-task
workers call one actor concurrently, surfacing the explicitly-retriable
`ActorUnavailableError`. Every shard RPC in this package is idempotent
(set-semantics inserts or pure reads), so resubmitting is always safe.
"""

from __future__ import annotations


def gather_retry(calls, attempts: int = 4):
    """ray.get a batch of shard RPCs, resubmitting any that fail with the
    transient `ActorUnavailableError`. `calls` is a list of
    (actor_method, args_tuple); returns results in order."""
    import time

    import ray

    refs = [m.remote(*a) for m, a in calls]
    results = [None] * len(calls)
    pending = list(range(len(calls)))
    for attempt in range(attempts):
        failed = []
        for idx in pending:
            try:
                results[idx] = ray.get(refs[idx])
            except ray.exceptions.ActorUnavailableError:
                failed.append(idx)
        if not failed:
            return results
        if attempt == attempts - 1:
            raise RuntimeError(
                f"{len(failed)} shard RPCs still unavailable after "
                f"{attempts} attempts"
            )
        time.sleep(0.5 * (attempt + 1))
        for idx in failed:
            m, a = calls[idx]
            refs[idx] = m.remote(*a)
        pending = failed
    return results
