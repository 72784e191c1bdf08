"""Round 10 (round-5 session): the distributed-TRAINED keep/drop gate.

VERDICT r4 next-round #4: the reference TRAINS its segment classifier
(/root/reference/src/build_classifier.py:74-131); the engine's gate was
fixed constants. These tests pin the closed loop:

- distributed training == a single-process exact re-computation, down to
  the exact Cramer determinant/numerators (no float anywhere);
- partition invariance: the fold is order/shape-free;
- the trained model faithfully distills its training labels over the
  non-protected rows it was fit on;
- oracle equality at sf0.001 for training, scoring, and the full trained
  flagship (the driver re-checks at sf0.01);
- the qf_pipeline wiring: protected roles never re-labeled, demotion
  still ordered, exchange/broadcast modes identical.
"""

import hashlib

import numpy as np
import pandas as pd
import pytest


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = df.astype(str).apply(lambda r: "|".join(r), axis=1).sort_values()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def labeled_df(ray_session, sf_dir):
    from scripts_ray.queries import _labeled_signals_ds

    return _labeled_signals_ds(sf_dir).to_pandas()


def local_sums(df: pd.DataFrame) -> dict[str, int]:
    """Single-process exact restatement of ops.train.gram_sums using
    arbitrary-precision Python ints (no numpy overflow possible)."""
    from scripts_ray.ops.train import FEAT_CAP
    from scripts_ray.rules import (
        MAX_CHARS, MIN_CHARS, REP_DEN, REP_MIN_TOKENS, REP_NUM,
        SYMBOL_DEN, SYMBOL_NUM,
    )

    df = df[~df["role"].isin(["system", "moderator"])]
    f1, f2, y = [], [], []
    for r in df.itertuples():
        passed = (
            int(MIN_CHARS <= r.n_chars <= MAX_CHARS)
            + int(SYMBOL_NUM * r.n_symbols <= SYMBOL_DEN * r.n_chars)
            + int(not (r.n_tokens >= REP_MIN_TOKENS
                       and REP_NUM * r.n_distinct < REP_DEN * r.n_tokens))
            + int(r.n_sv != r.n_en)
            + int(r.ppl_score > 0)
        )
        f1.append(passed)
        f2.append(min(int(r.n_chars), FEAT_CAP))
        y.append(int(r.keep))
    return {
        "s11": sum(a * a for a in f1),
        "s12": sum(a * b for a, b in zip(f1, f2)),
        "s13": sum(f1),
        "s22": sum(b * b for b in f2),
        "s23": sum(f2),
        "s33": len(f1),
        "b1": sum(a * t for a, t in zip(f1, y)),
        "b2": sum(b * t for b, t in zip(f2, y)),
        "b3": sum(y),
    }


def test_distributed_training_equals_local(ray_session, sf_dir, labeled_df):
    from scripts_ray.ops.train import gram_sums, solve_weights
    from scripts_ray.queries import _labeled_signals_ds

    dist = gram_sums(_labeled_signals_ds(sf_dir))
    loc = local_sums(labeled_df)
    assert dist == loc  # every sufficient statistic, exactly

    wd, wl = solve_weights(dist), solve_weights(loc)
    for k in ["det", "n1", "n2", "n3", "w_rules_micro", "w_chars_micro",
              "w_bias_micro", "n_train"]:
        assert wd[k] == wl[k], k


def test_training_partition_invariance(ray_session, labeled_df):
    """The fold must not depend on block boundaries: 1 block vs 7 blocks
    vs shuffled row order all yield identical statistics."""
    import ray.data as rd

    from scripts_ray.ops.train import gram_sums

    base = gram_sums(rd.from_pandas(labeled_df))
    many = gram_sums(rd.from_pandas(labeled_df).repartition(7))
    shuf = gram_sums(
        rd.from_pandas(labeled_df.sample(frac=1.0, random_state=5))
    )
    assert base == many == shuf


def test_trained_model_distills_training_labels(ray_session, labeled_df):
    """On the non-protected rows it was fit on, the linear distill of the
    rule gate should agree almost everywhere and produce both classes."""
    from scripts_ray.ops.train import solve_weights, trained_keep

    w = solve_weights(local_sums(labeled_df))
    np_rows = labeled_df[~labeled_df["role"].isin(["system", "moderator"])]
    pred = trained_keep(np_rows, w)
    truth = np_rows["keep"].to_numpy(bool)
    acc = float((pred == truth).mean())
    assert acc > 0.95, acc
    assert pred.any() and (~pred).any()


@pytest.mark.parametrize(
    "name", ["trained_gate_weights", "trained_gate", "qf_pipeline_trained"]
)
def test_trained_oracle_equality(ray_session, sf_dir, duck, name):
    from scripts_ray.queries import ORACLES, QUERIES

    res = QUERIES[name](sf_dir)
    if hasattr(res, "iter_batches"):
        res = res.to_pandas()
    ora = duck.execute(ORACLES[name]).fetchdf()
    assert len(res) == len(ora)
    assert sorted(res.columns) == sorted(ora.columns)
    assert value_hash(res) == value_hash(ora)


def test_trained_pipeline_protected_roles_kept(ray_session, sf_dir):
    from scripts_ray.queries import QUERIES

    out = QUERIES["qf_pipeline_trained"](sf_dir).to_pandas()
    prot = out[out["role"].isin(["system", "moderator"])]
    assert len(prot) > 0
    assert prot["keep"].all()
    assert prot["drop_reason"].isna().all()
    # the model actually gates: some non-protected turn dropped as 'model'
    assert (out["drop_reason"] == "model").any()


def test_trained_pipeline_modes_agree(ray_session, sf_dir):
    """exchange and broadcast flagship modes must emit identical rows
    under the trained gate too (same invariant as the heuristic gate)."""
    from scripts_ray.ops.train import train_keep_weights
    from scripts_ray.pipelines import quality_filter
    from scripts_ray.queries import _labeled_signals_ds, _put_counts
    from scripts_ray.sources import derive_transcripts_ds

    w = train_keep_weights(_labeled_signals_ds(sf_dir))
    a = quality_filter(
        derive_transcripts_ds(sf_dir), _put_counts(sf_dir),
        trained_weights=w, mode="exchange",
    ).to_pandas()
    b = quality_filter(
        derive_transcripts_ds(sf_dir), _put_counts(sf_dir),
        trained_weights=w, mode="broadcast",
    ).to_pandas()
    assert len(a) == len(b)
    assert value_hash(a) == value_hash(b)
