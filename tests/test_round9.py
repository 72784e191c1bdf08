"""Round 9 (round-5 session): checkpointed, resumable pretrain_pack.

VERDICT r4 "What's wrong" #2: the capstone's in-memory materialize()
points pin a full-text copy of the cleaned corpus in the object store —
the whole-dataset-materialization anti-pattern at 100 TB. The fix routes
every stage boundary through `checkpoint.stage_checkpoint` (atomic
parquet publish + streaming re-read, skip-if-published). These tests pin:

- value equality between the in-memory and checkpointed forms;
- RESUME: after a simulated crash past the line-dedup boundary, a
  restarted run never recomputes the published stage (proved by
  poisoning the raw input — only the checkpointed lineage can produce
  the clean output).
"""

import hashlib
import os

import pandas as pd
import pytest


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = df.astype(str).apply(lambda r: "|".join(r), axis=1).sort_values()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _inputs(sf_dir):
    import ray.data as rd

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]),
    )


def test_pretrain_ckpt_equivalence(ray_session, sf_dir, tmp_path):
    """Checkpointed form == in-memory form, value for value."""
    from scripts_ray.queries import pretrain_pack_pipeline

    raw, src = _inputs(sf_dir)
    mem = pretrain_pack_pipeline(raw, src).to_pandas()

    raw2, src2 = _inputs(sf_dir)
    ckpt_dir = str(tmp_path / "ckpt")
    ck = pretrain_pack_pipeline(
        raw2, src2, checkpoint_dir=ckpt_dir
    ).to_pandas()

    assert len(mem) == len(ck)
    assert sorted(mem.columns) == sorted(ck.columns)
    assert value_hash(mem) == value_hash(ck)
    # all three boundaries were published as parquet stages
    for stage in ["01_line_dedup", "02_keep_best", "03_sampled"]:
        d = os.path.join(ckpt_dir, stage)
        assert os.path.isdir(d), stage
        assert any(f.endswith(".parquet") for f in os.listdir(d)), stage


def test_pretrain_ckpt_resume_from_line_dedup(ray_session, sf_dir, tmp_path):
    """Kill/resume: run up to the line-dedup boundary, 'crash', then
    restart with a POISONED raw input over the same checkpoint dir. The
    restarted run must (a) skip the published stage — proved because the
    poisoned raw could never reproduce the clean corpus — and (b) emit
    output identical to an uninterrupted clean run."""
    import ray.data as rd

    from scripts_ray.queries import pretrain_pack_pipeline

    raw, src = _inputs(sf_dir)
    clean = pretrain_pack_pipeline(raw, src).to_pandas()

    ckpt_dir = str(tmp_path / "ckpt")
    raw1, src1 = _inputs(sf_dir)
    out = pretrain_pack_pipeline(
        raw1, src1, checkpoint_dir=ckpt_dir, stop_after="line_dedup"
    )
    assert out is None  # simulated crash after the first publish
    assert os.path.isdir(os.path.join(ckpt_dir, "01_line_dedup"))
    assert not os.path.isdir(os.path.join(ckpt_dir, "02_keep_best"))

    # restart with garbage raw: if the engine recomputed stage 1 it would
    # pack this single junk doc instead of the checkpointed corpus
    poisoned = rd.from_pandas(
        pd.DataFrame({"doc_id": [10_000_000], "text": ["<p>junk</p>"]})
    )
    _, src2 = _inputs(sf_dir)
    resumed = pretrain_pack_pipeline(
        poisoned, src2, checkpoint_dir=ckpt_dir
    ).to_pandas()

    assert len(resumed) == len(clean)
    assert value_hash(resumed) == value_hash(clean)


def test_stage_checkpoint_atomic_tmp_cleanup(ray_session, tmp_path):
    """A crashed (partial) publish leaves only the .tmp dir; the next run
    rebuilds the stage from scratch and publishes atomically."""
    import ray.data as rd

    from scripts_ray import checkpoint

    ckpt_dir = str(tmp_path)
    # simulate a torn write: stale tmp dir with a bogus file
    stale = os.path.join(ckpt_dir, "s1.tmp")
    os.makedirs(stale)
    with open(os.path.join(stale, "garbage.parquet"), "w") as f:
        f.write("not parquet")

    calls = []

    def make_ds():
        calls.append(1)
        return rd.from_pandas(pd.DataFrame({"x": [1, 2, 3]}))

    out = checkpoint.stage_checkpoint(make_ds, ckpt_dir, "s1")
    assert out.to_pandas()["x"].tolist() == [1, 2, 3]
    assert calls == [1]
    assert not os.path.exists(stale)

    # second call: published stage short-circuits make_ds entirely
    out2 = checkpoint.stage_checkpoint(make_ds, ckpt_dir, "s1")
    assert calls == [1]
    assert sorted(out2.to_pandas()["x"].tolist()) == [1, 2, 3]
