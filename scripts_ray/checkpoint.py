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

import hashlib
import json
import os
import shutil
import time

import pandas as pd
import pyarrow as pa

MANIFEST = "manifest.jsonl"


def conv_bucket(conv_ids, n_buckets: int):
    import numpy as np

    return np.array(
        [
            int.from_bytes(hashlib.md5(c.encode()).digest()[:4], "big") % n_buckets
            for c in conv_ids
        ],
        dtype=np.int32,
    )


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


def run_buckets(
    work_dir: str,
    out_dir: str,
    pipeline_fn,
    n_buckets: int = 8,
    resume: bool = True,
    max_buckets: int | None = None,
) -> list[dict]:
    """Process every bucket not yet in the manifest. `pipeline_fn(ds) -> ds`
    is the per-bucket transform. `max_buckets` limits work (used by the
    kill/resume test to simulate an interrupted run).

    Scale note: buckets run one at a time from the driver — each is
    internally parallel, but inter-bucket idle tails add up when buckets
    number in the thousands. At that scale either coarsen buckets so each
    saturates the cluster, or overlap 2-3 buckets from driver threads
    (manifest appends are line-atomic, so concurrent publishes are safe);
    the resume/manifest protocol itself is unchanged either way."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    done = _completed(out_dir) if resume else {}
    if not resume:
        for entry in os.listdir(out_dir):
            shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)
        done = {}

    records, processed = [], 0
    for b in range(n_buckets):
        if b in done:
            records.append(done[b])
            continue
        if max_buckets is not None and processed >= max_buckets:
            break
        bucket_dir = os.path.join(work_dir, f"bucket={b}")
        if not os.path.isdir(bucket_dir):
            rec = {"bucket": b, "rows_in": 0, "rows_out": 0, "kept": 0, "sec": 0.0}
            _append_manifest(out_dir, rec)
            records.append(rec)
            processed += 1
            continue
        t0 = time.time()
        ds = rd.read_parquet(bucket_dir)
        rows_in = ds.count()
        out = pipeline_fn(ds)
        tmp = os.path.join(out_dir, f"_tmp_bucket_{b}")
        final = os.path.join(out_dir, f"bucket={b}")
        shutil.rmtree(tmp, ignore_errors=True)
        out.write_parquet(tmp)
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
        records.append(rec)
        processed += 1
    return records


def _append_manifest(out_dir: str, rec: dict):
    path = os.path.join(out_dir, MANIFEST)
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
