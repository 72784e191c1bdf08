"""Resumable delivery ingestion — the user-facing incremental surface.

The reference's curation is batch re-runs over a growing corpus
(/root/reference/src/cur-prot/pipeline.py drives the whole chain per
year range, re-runnable); at 100 TB the corpus instead GROWS by
deliveries, and each delivery must be deduplicated against everything
already accepted WITHOUT re-scanning history. This module composes the
two persistent state components into that pipeline:

    delivery parquet
      → within-delivery exact dedup        (ops.dedup.dedup_exact — a
        deterministic exchange; the racy mixed build+filter shape is
        explicitly not offered by the index)
      → cross-delivery EXACT dedup         (state.fp_index probe)
      → cross-delivery NEAR dedup          (state.lsh_index probe +
        exact Jaccard verify against stored blobs)
      → append survivors to the corpus dir (one parquet dir per
        delivery — the resumable partitioned-output rule)
      → ingest survivors into both indexes; snapshot state ATOMICALLY
        (tmp-write + rename, torn snapshots invisible)

State lives under `state_dir/` (fp/, lsh/, manifest.json); every call
restores from the last published snapshot, so the process can die and
restart between deliveries with no loss. The manifest records
per-delivery lineage counters (rows in, removed per stage, rows out) —
the engine's analog of the reference's per-stage counters.

CLI: `python -m scripts_ray.cli ingest --corpus d2.parquet
--state /state --output /corpus`.
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd

# production LSH preset: 4-row bands (band hit p = J⁴) — the measured
# scale dial (BASELINE.md round 5: 46× probe speedup at equal recall on
# real near-dups). `--hasher verify` selects the oracle-exact 2-row form.
PRODUCTION_HASHER = dict(k=128, bands=32, seed=20240817)


def _atomic_snapshot(snap_fn, final_dir: str) -> None:
    tmp = final_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    snap_fn(tmp)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(tmp, final_dir)  # atomic publish


def _load_state(state_dir: str, n_shards: int, hasher_kwargs: dict | None):
    from .state import fp_index, lsh_index

    fp = fp_index.FpIndex(n_shards=n_shards)
    lsh = lsh_index.LshIndex(n_shards=n_shards, seed_kwargs=hasher_kwargs)
    fp_dir = os.path.join(state_dir, "fp")
    lsh_dir = os.path.join(state_dir, "lsh")
    if os.path.isdir(fp_dir):
        fp.restore(fp_dir)
    if os.path.isdir(lsh_dir):
        lsh.restore(lsh_dir)
    return fp, lsh


def _manifest_path(state_dir: str) -> str:
    return os.path.join(state_dir, "manifest.json")


def read_manifest(state_dir: str) -> dict:
    p = _manifest_path(state_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"n_shards": None, "hasher": None, "deliveries": []}


def ingest_delivery(
    delivery_ds,
    state_dir: str,
    out_dir: str,
    delivery_id: str,
    n_shards: int = 4,
    hasher: str = "production",
) -> dict:
    """Run one delivery through the incremental dedup chain; returns the
    lineage counters that were also appended to the state manifest.
    `delivery_ds` must carry (doc_id, text). Idempotence: a delivery_id
    already in the manifest is skipped (its counters returned as-is), so
    a crashed-after-publish rerun never double-ingests."""
    from .ops.dedup import dedup_exact
    from .ops.hashagg import hash_join
    from .state import fp_index, lsh_index

    manifest = read_manifest(state_dir)
    for rec in manifest["deliveries"]:
        if rec["delivery_id"] == delivery_id:
            return rec  # already fully published — skip (resume path)
    if manifest["n_shards"] is not None and manifest["n_shards"] != n_shards:
        raise ValueError(
            f"state built with n_shards={manifest['n_shards']}, got {n_shards}"
        )
    if manifest["hasher"] is not None and manifest["hasher"] != hasher:
        raise ValueError(
            f"state built with hasher={manifest['hasher']!r}, got {hasher!r}"
        )
    hasher_kwargs = PRODUCTION_HASHER if hasher == "production" else None

    os.makedirs(state_dir, exist_ok=True)
    fp, lsh = _load_state(state_dir, n_shards, hasher_kwargs)

    import ray.data as rd

    dest = os.path.join(out_dir, f"delivery-{delivery_id}")
    rows_in = delivery_ds.count()
    resumed = os.path.isdir(dest)
    if resumed:
        # Crash-after-publish resume: `dest` was computed from the
        # PRE-ingest state and published atomically, so it is the
        # authoritative survivor set — the probes must NOT be re-run
        # (the crashed run may already have ingested these docs, and a
        # fresh probe would then drop the whole delivery). Index
        # re-ingest below is idempotent (set semantics), so finishing
        # from `dest` is safe whether or not the crashed run got that
        # far.
        survivors = rd.read_parquet(dest).materialize()
        n_out = survivors.count()
        n_self = n_exact = None
    else:
        # 1. within-delivery exact dedup (first-wins by doc_id)
        keep_keys = dedup_exact(delivery_ds, "text", ["doc_id"]).map_batches(
            lambda b: b[["first_key"]].rename(columns={"first_key": "doc_id"}),
            batch_format="pandas",
        )
        self_deduped = hash_join(
            delivery_ds, keep_keys, on="doc_id", how="semi",
            empty_right_cols=["doc_id"],
        )

        # 2. cross-delivery exact dedup against the persistent index
        exact_new = fp_index.filter_new(fp, self_deduped)
        # 3. cross-delivery NEAR dedup against the persistent band index.
        #    The two probes are pure reads; the survivor set is
        #    materialized (ids + text of ONE delivery) so the append +
        #    both index ingests consume one pinned result instead of
        #    re-running the probes per consumer.
        survivors = lsh_index.filter_new(lsh, exact_new).materialize()
        n_out = survivors.count()
        n_self = self_deduped.count()
        n_exact = exact_new.count()

        # 4. publish survivors ATOMICALLY (tmp-write + rename): only a
        #    fully written delivery dir is ever treated as authoritative
        tmp = dest + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        survivors.write_parquet(tmp)
        os.rename(tmp, dest)

    # 5. ingest survivors into both indexes (idempotent), snapshot
    #    atomically — torn snapshots are invisible to the next run
    fp_index.build(fp, survivors)
    lsh_index.build(lsh, survivors)
    _atomic_snapshot(fp.snapshot, os.path.join(state_dir, "fp"))
    _atomic_snapshot(lsh.snapshot, os.path.join(state_dir, "lsh"))

    rec = {
        "delivery_id": delivery_id,
        "rows_in": int(rows_in),
        "removed_self_exact": None if resumed else int(rows_in - n_self),
        "removed_cross_exact": None if resumed else int(n_self - n_exact),
        "removed_cross_near": None if resumed else int(n_exact - n_out),
        "rows_out": int(n_out),
        "out_dir": dest,
        "resumed": resumed,
    }
    manifest["n_shards"] = n_shards
    manifest["hasher"] = hasher
    manifest["deliveries"].append(rec)
    tmp = _manifest_path(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _manifest_path(state_dir))  # manifest publish = commit
    return rec


def corpus_ds(out_dir: str):
    """Stream the accepted corpus (all published deliveries)."""
    import ray.data as rd

    return rd.read_parquet(out_dir)
