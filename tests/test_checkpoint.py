"""Resume semantics: an interrupted run completes only the missing buckets
and the final output equals a clean full run."""

import json
import os
import shutil

import pandas as pd

from scripts_ray import checkpoint, pipelines, sources

N_BUCKETS = 6


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[["conv_id", "turn_idx", "keep", "drop_reason", "scrubbed_text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_resume_after_partial_run(ray_session, sf_dir, tmp_path):
    work = str(tmp_path / "input")
    counts_ref = ray_session.put(pipelines.build_model_counts(sf_dir))

    checkpoint.prepare_input(sources.derive_transcripts_ds(sf_dir), work, N_BUCKETS)

    def pipe(ds):
        return pipelines.quality_filter(ds, counts_ref)

    # clean full run
    full_dir = str(tmp_path / "full")
    checkpoint.run_buckets(work, full_dir, pipe, n_buckets=N_BUCKETS, resume=False)
    full = _norm(checkpoint.read_output(full_dir))

    # interrupted run: only 2 buckets, then resume
    part_dir = str(tmp_path / "part")
    recs = checkpoint.run_buckets(
        work, part_dir, pipe, n_buckets=N_BUCKETS, resume=False, max_buckets=2
    )
    assert len(recs) == 2
    manifest = os.path.join(part_dir, checkpoint.MANIFEST)
    assert sum(1 for _ in open(manifest)) == 2

    recs2 = checkpoint.run_buckets(work, part_dir, pipe, n_buckets=N_BUCKETS, resume=True)
    assert len(recs2) == N_BUCKETS
    assert sum(1 for _ in open(manifest)) == N_BUCKETS

    resumed = _norm(checkpoint.read_output(part_dir))
    pd.testing.assert_frame_equal(resumed, full)

    # lineage counters: rows_in == rows_out per bucket, kept matches output
    with open(manifest) as f:
        rows = [json.loads(l) for l in f]
    assert sum(r["rows_out"] for r in rows) == len(full)
    assert sum(r["kept"] for r in rows) == int(full["keep"].sum())


def test_concurrent_buckets_match_sequential(ray_session, sf_dir, tmp_path):
    work = str(tmp_path / "input")
    counts_ref = ray_session.put(pipelines.build_model_counts(sf_dir))
    checkpoint.prepare_input(sources.derive_transcripts_ds(sf_dir), work, N_BUCKETS)

    def pipe(ds):
        return pipelines.quality_filter(ds, counts_ref)

    seq_dir = str(tmp_path / "seq")
    checkpoint.run_buckets(work, seq_dir, pipe, n_buckets=N_BUCKETS, resume=False)

    conc_dir = str(tmp_path / "conc")
    recs = checkpoint.run_buckets(
        work, conc_dir, pipe, n_buckets=N_BUCKETS, resume=False, concurrency=3
    )
    assert len(recs) == N_BUCKETS
    manifest = os.path.join(conc_dir, checkpoint.MANIFEST)
    assert sum(1 for _ in open(manifest)) == N_BUCKETS

    pd.testing.assert_frame_equal(
        _norm(checkpoint.read_output(conc_dir)),
        _norm(checkpoint.read_output(seq_dir)),
    )

    # resume over a concurrent run is still a no-op
    recs2 = checkpoint.run_buckets(
        work, conc_dir, pipe, n_buckets=N_BUCKETS, resume=True, concurrency=3
    )
    assert len(recs2) == N_BUCKETS
    assert sum(1 for _ in open(manifest)) == N_BUCKETS


def test_rerun_is_noop(ray_session, sf_dir, tmp_path):
    work = str(tmp_path / "input")
    counts_ref = ray_session.put(pipelines.build_model_counts(sf_dir))
    checkpoint.prepare_input(sources.derive_transcripts_ds(sf_dir), work, 3)

    def pipe(ds):
        return pipelines.quality_filter(ds, counts_ref)

    out = str(tmp_path / "out")
    checkpoint.run_buckets(work, out, pipe, n_buckets=3, resume=False)
    before = _norm(checkpoint.read_output(out))
    recs = checkpoint.run_buckets(work, out, pipe, n_buckets=3, resume=True)
    assert all("bucket" in r for r in recs)
    after = _norm(checkpoint.read_output(out))
    pd.testing.assert_frame_equal(before, after)
