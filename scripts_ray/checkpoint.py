"""Resumable partitioned execution with per-partition lineage + counters.

The corpus is hash-partitioned into buckets on `conv_id` (a conversation
never straddles buckets). Each bucket is processed independently and its
output lands atomically (write to a temp dir, rename), after which a
manifest line records the bucket id, row counters and lineage. A restarted
run reads the manifest and processes only the missing buckets — the
engine's analog of the reference's idempotent per-file rewrite + existence
checks (/root/reference/src/add_modern_pagenumbers.py:57-76,
annotate-QC-sample.py:166-168).

At 100 TB the bucket count is thousands of key ranges; the mechanism is
identical.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time

import pandas as pd
import pyarrow as pa

MANIFEST = "manifest.jsonl"
_manifest_lock = threading.Lock()
_fs_resolve_lock = threading.Lock()


def _fs_retry(fn):
    """Run `fn`, retrying once under a lock on the known-transient fsspec
    import race: Ray's path resolution probes `fsspec.implementations.http`
    on EVERY read/write; with aiohttp absent the import always fails and is
    never cached, so two driver threads resolving paths concurrently can
    observe each other's partially-initialized module ("cannot import name
    'HTTPFileSystem'") instead of the ModuleNotFoundError Ray handles. The
    locked retry is single-threaded among our bucket threads, where the
    probe fails cleanly."""
    try:
        return fn()
    except ImportError as e:
        if "HTTPFileSystem" not in str(e):
            raise
        with _fs_resolve_lock:
            return fn()


def conv_bucket(conv_ids, n_buckets: int):
    """Deterministic conv→bucket assignment, vectorized (fixed-key siphash
    — stable across processes/runs, no per-row Python hashing)."""
    import numpy as np

    h = pd.util.hash_array(np.asarray(conv_ids, dtype=object))
    return (h % np.uint64(n_buckets)).astype(np.int32)


def prepare_input(transcripts_ds, work_dir: str, n_buckets: int = 8) -> str:
    """One-time layout pass: write the transcripts partitioned by conv
    bucket so each bucket can later be read with partition pruning."""
    done_flag = os.path.join(work_dir, "_layout_done")
    if os.path.exists(done_flag):
        return work_dir

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = conv_bucket(batch["conv_id"].to_pylist(), n_buckets)
        return batch.append_column("bucket", pa.array(b, type=pa.int32()))

    if os.path.exists(work_dir):
        shutil.rmtree(work_dir)
    transcripts_ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        work_dir, partition_cols=["bucket"]
    )
    with open(done_flag, "w") as f:
        f.write("ok")
    return work_dir


def _completed(out_dir: str) -> dict[int, dict]:
    path = os.path.join(out_dir, MANIFEST)
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                done[rec["bucket"]] = rec
    return done


def _run_one_bucket(work_dir: str, out_dir: str, pipeline_fn, b: int) -> dict:
    import ray.data as rd

    bucket_dir = os.path.join(work_dir, f"bucket={b}")
    if not os.path.isdir(bucket_dir):
        rec = {"bucket": b, "rows_in": 0, "rows_out": 0, "kept": 0, "sec": 0.0}
        _append_manifest(out_dir, rec)
        return rec
    t0 = time.time()
    ds = _fs_retry(lambda: rd.read_parquet(bucket_dir))
    rows_in = ds.count()
    out = pipeline_fn(ds)
    tmp = os.path.join(out_dir, f"_tmp_bucket_{b}")
    final = os.path.join(out_dir, f"bucket={b}")

    def write():
        # the race hits during datasink construction (before any execution),
        # so a retried write restarts from an empty tmp dir
        shutil.rmtree(tmp, ignore_errors=True)
        out.write_parquet(tmp)

    _fs_retry(write)
    kept = _count_kept(tmp)
    rows_out = _count_rows(tmp)
    os.rename(tmp, final)  # atomic publish
    rec = {
        "bucket": b,
        "rows_in": int(rows_in),
        "rows_out": int(rows_out),
        "kept": int(kept),
        "sec": round(time.time() - t0, 3),
    }
    _append_manifest(out_dir, rec)
    return rec


def run_buckets(
    work_dir: str,
    out_dir: str,
    pipeline_fn,
    n_buckets: int = 8,
    resume: bool = True,
    max_buckets: int | None = None,
    concurrency: int = 1,
) -> list[dict]:
    """Process every bucket not yet in the manifest. `pipeline_fn(ds) -> ds`
    is the per-bucket transform. `max_buckets` limits work (used by the
    kill/resume test to simulate an interrupted run).

    `concurrency` > 1 overlaps that many buckets from driver threads —
    each bucket is its own streaming Dataset execution, so one bucket's
    write/commit tail no longer idles the cluster between buckets (the
    inter-bucket bubble grows with bucket count at scale). The manifest
    append is lock-serialized + line-atomic, so concurrent publishes are
    safe and resume semantics are unchanged: a bucket is either fully
    published (dir renamed + manifest line) or will be redone."""
    os.makedirs(out_dir, exist_ok=True)
    done = _completed(out_dir) if resume else {}
    if not resume:
        for entry in os.listdir(out_dir):
            shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)
        done = {}

    pending = [b for b in range(n_buckets) if b not in done]
    if max_buckets is not None:
        pending = pending[:max_buckets]

    fresh: dict[int, dict] = {}
    if concurrency <= 1:
        for b in pending:
            fresh[b] = _run_one_bucket(work_dir, out_dir, pipeline_fn, b)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=concurrency) as ex:
            futs = {
                b: ex.submit(_run_one_bucket, work_dir, out_dir, pipeline_fn, b)
                for b in pending
            }
            fresh = {b: f.result() for b, f in futs.items()}

    records = []
    for b in range(n_buckets):
        if b in done:
            records.append(done[b])
        elif b in fresh:
            records.append(fresh[b])
    return records


def stage_checkpoint(make_ds, ckpt_dir: str, stage: str):
    """Parquet stage boundary for multi-stage compositions (the capstone's
    line-dedup / keep-best / sampled corpora): materialize `make_ds()` to
    `<ckpt_dir>/<stage>/` with an atomic tmp-write + rename publish, then
    hand back a fresh streaming read of the published files.

    Two properties the in-memory ``Dataset.materialize()`` form lacks:

    - the intermediate corpus lives on DISK, not in the object store — at
      100 TB an object-store/spill-resident copy of the whole cleaned
      corpus is the whole-dataset-materialization anti-pattern, while a
      partitioned parquet stage is exactly the reference's restartable
      per-stage file layout (/root/reference/src/cur-prot/
      post-pipeline.py:4-16 — every stage re-runnable from files);
    - RESUME: if the stage directory is already published, `make_ds` is
      never called — a restarted run skips every stage whose output
      survived the crash and recomputes only downstream ones.
    """
    import ray.data as rd

    final = os.path.join(ckpt_dir, stage)
    if not os.path.isdir(final):
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(ckpt_dir, exist_ok=True)
        _fs_retry(lambda: make_ds().write_parquet(tmp))
        os.rename(tmp, final)  # atomic publish
    return _fs_retry(lambda: rd.read_parquet(final))


def _append_manifest(out_dir: str, rec: dict):
    path = os.path.join(out_dir, MANIFEST)
    with _manifest_lock:
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())


def _count_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(os.path.join(path, f)).num_rows
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


def _count_kept(path: str) -> int:
    import pyarrow.dataset as pads

    dataset = pads.dataset(path, format="parquet")
    if "keep" not in dataset.schema.names:
        return 0
    import pyarrow.compute as pc

    t = dataset.to_table(columns=["keep"])
    return int(pc.sum(pc.cast(t["keep"], pa.int64())).as_py() or 0)


def read_output(out_dir: str) -> pd.DataFrame:
    import pyarrow.dataset as pads

    import glob

    files = sorted(glob.glob(os.path.join(out_dir, "bucket=*", "*.parquet")))
    return pads.dataset(files, format="parquet").to_table().to_pandas()
