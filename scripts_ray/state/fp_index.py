"""Shared mutable fingerprint index — the raw-Ray-actor escape hatch.

Everything else in this engine is a Dataset transform; this module is the
one semantics the Dataset API genuinely can't express: a SHARED MUTABLE
membership index that outlives a single pipeline, so a NEW batch of
documents can be deduplicated against everything already ingested
without re-scanning (or re-shuffling) the historical corpus. That is the
streaming-ingest shape of a training-data platform: corpus v1 is
ingested once; every following delivery is filtered against the index
and then added to it.

Design: the index is hash-sharded over an actor pool — shard =
fp1 % n_shards, each shard actor holds an open-addressed view of its
128-bit fingerprints (two int64 numpy streams, O(8+8) bytes per unique
doc). Batch tasks talk to shards with ONE vectorized RPC per (batch,
shard) pair, never per row. Memory bound and scaling: shard count
scales with the cluster (the index for 10¹¹ unique docs is ~1.6 TB
spread across shards/nodes); a spill-to-Parquet snapshot
(`snapshot`/`restore`) bounds recovery, mirroring the engine's
checkpoint manifest pattern.

Determinism contract: `build` only inserts (set semantics — insertion
order never changes the index), so `filter_new` after a completed
`build` is fully deterministic and oracle-checkable (SQL anti-join on
text). Racy first-wins *within* one mixed build+filter pass is
explicitly NOT offered — same-delivery dedup belongs to
`ops.dedup.dedup_exact` (a deterministic exchange), run before the
index insert.

Reference analog: the global uuid first-wins registry of
/root/reference/src/ck-duplicate-uuids.py:13-27, made incremental.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..ops.dedup import content_fingerprints

DEFAULT_SHARDS = 8


def _shard_cls():
    import ray

    @ray.remote(num_cpus=0)
    class FpShard:
        """One shard of the index: a hash-set of 128-bit fingerprints,
        stored as a dict keyed by the int64 pair packed into bytes-free
        Python ints (CPython dict of ints ≈ 50 ns/probe; the RPC, not
        the probe, dominates)."""

        def __init__(self):
            self._seen: set[tuple[int, int]] = set()

        def add(self, fp1: np.ndarray, fp2: np.ndarray) -> int:
            before = len(self._seen)
            self._seen.update(zip(fp1.tolist(), fp2.tolist()))
            return len(self._seen) - before

        def contains(self, fp1: np.ndarray, fp2: np.ndarray) -> np.ndarray:
            seen = self._seen
            return np.fromiter(
                (p in seen for p in zip(fp1.tolist(), fp2.tolist())),
                dtype=bool,
                count=len(fp1),
            )

        def size(self) -> int:
            return len(self._seen)

        def dump(self) -> tuple[np.ndarray, np.ndarray]:
            if not self._seen:
                return (np.array([], dtype=np.int64),) * 2
            a = np.fromiter((p[0] for p in self._seen), dtype=np.int64)
            b = np.fromiter((p[1] for p in self._seen), dtype=np.int64)
            return a, b

        def load(self, fp1: np.ndarray, fp2: np.ndarray) -> int:
            return self.add(fp1, fp2)

    return FpShard


class FpIndex:
    """Handle bundle for the sharded index (driver-side façade)."""

    def __init__(self, n_shards: int = DEFAULT_SHARDS):
        cls = _shard_cls()
        self.n_shards = n_shards
        self.shards = [cls.remote() for _ in range(n_shards)]

    def _shard_of(self, fp1: np.ndarray) -> np.ndarray:
        return (fp1.view(np.uint64) % np.uint64(self.n_shards)).astype(np.int64)

    def size(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self, path: str) -> None:
        """Spill every shard to one Parquet file (resume/recovery)."""
        import os

        import pyarrow.parquet as pq
        import ray

        os.makedirs(path, exist_ok=True)
        for i, (a, b) in enumerate(ray.get([s.dump.remote() for s in self.shards])):
            pq.write_table(
                pa.table({"fp1": a, "fp2": b}), f"{path}/shard-{i:04d}.parquet"
            )

    def restore(self, path: str) -> None:
        import pyarrow.parquet as pq
        import ray

        waits = []
        for i, s in enumerate(self.shards):
            t = pq.read_table(f"{path}/shard-{i:04d}.parquet")
            waits.append(
                s.load.remote(
                    t["fp1"].to_numpy(zero_copy_only=False),
                    t["fp2"].to_numpy(zero_copy_only=False),
                )
            )
        ray.get(waits)


def build(index: FpIndex, docs_ds, text_col: str = "text") -> int:
    """Ingest a corpus into the index: per batch, fingerprint the text
    column and send each shard its slice in one RPC. Insert-only (order-
    free), so parallel batches commute. Returns rows ingested."""
    shards = index.shards
    n_shards = index.n_shards

    def ingest(batch: pd.DataFrame) -> pd.DataFrame:
        from . import gather_retry

        fp1, fp2 = content_fingerprints(batch[text_col])
        sh = (fp1.view(np.uint64) % np.uint64(n_shards)).astype(np.int64)
        calls = []
        for s in range(n_shards):
            m = sh == s
            if m.any():
                calls.append((shards[s].add, (fp1[m], fp2[m])))
        gather_retry(calls)  # batch completes only once its inserts landed
        return pd.DataFrame({"n": [len(batch)]})

    total = 0
    for b in docs_ds.map_batches(ingest, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        total += int(b["n"].sum())
    return total


def filter_new(index: FpIndex, docs_ds, text_col: str = "text"):
    """Rows of `docs_ds` whose text fingerprint is NOT in the index —
    pure read (no mutation), deterministic after a completed build."""
    shards = index.shards
    n_shards = index.n_shards

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        from . import gather_retry

        fp1, fp2 = content_fingerprints(batch[text_col])
        sh = (fp1.view(np.uint64) % np.uint64(n_shards)).astype(np.int64)
        seen = np.zeros(len(batch), dtype=bool)
        masks, calls = [], []
        for s in range(n_shards):
            m = sh == s
            if m.any():
                masks.append(m)
                calls.append((shards[s].contains, (fp1[m], fp2[m])))
        for m, r in zip(masks, gather_retry(calls)):
            seen[m] = r
        return batch[~seen].reset_index(drop=True)

    return docs_ds.map_batches(probe, batch_format="pandas")
