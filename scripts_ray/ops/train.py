"""Distributed-TRAINED keep/drop gate — ridge least squares over the
integer gate signals via exact normal equations.

The reference TRAINS its segment classifier instead of hard-coding it
(/root/reference/src/build_classifier.py:74-131: 300-d fastText document
embeddings -> trained 2-layer head + class log-prior, fit on annotated
paragraphs with the excluded classes left out). The engine analog
distills the rule gate into a trained linear model: per-turn integer
features engineered from the existing signal columns (the count of
passed rule margins + winsorized length), labels = the rule gate's own
per-turn keep decision over NON-PROTECTED roles only (protected roles
are never re-labeled, so they are excluded from training exactly like
the reference's exclude list, reclassify.py:114). Labels are
deterministically derivable, so the whole training run is
oracle-checkable.

Everything is EXACT INTEGER arithmetic end to end, so training and
scoring are bit-identical between the Ray engine and the DuckDB oracle:

- sufficient statistics: int64 per-batch partials of XᵀX / Xᵀy,
  tree-folded by `Dataset.sum` (constant-size — nothing row-scaled
  leaves the map stage, the same mergeable-partials contract as
  `gram_matrix` / the sketches);
- solve: Cramer's rule on the 3×3 ridge system with arbitrary-precision
  Python ints on the driver (the oracle does the same in HUGEINT);
- quantization: weights are published as micro-units
  w_micro = round_half_up(1e6 * n_i / det), computed as the EXACT floor
  division (2·SCALE·n_i + det) // (2·det) — no float touches the model;
- scoring: one int64 dot product per row against the micro weights,
  keep iff w·x ≥ SCALE/2 (i.e. predicted keep-probability ≥ 0.5).

At 100 TB: training is one streaming pass folding nine int64 counters;
the model is three ints broadcast by value into the gate stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..rules import (
    MAX_CHARS,
    MIN_CHARS,
    REP_DEN,
    REP_MIN_TOKENS,
    REP_NUM,
    SYMBOL_DEN,
    SYMBOL_NUM,
)

FEAT_CAP = 4000  # winsorize n_chars: bounds HUGEINT magnitudes in the oracle
RIDGE_LAMBDA = 1  # +λI makes XᵀX positive definite -> det > 0 always
W_SCALE = 1_000_000  # micro-unit weight quantization
KEEP_NUM = W_SCALE // 2  # keep iff w·x ≥ 0.5 in micro-units

SUM_COLS = ("s11", "s12", "s13", "s22", "s23", "s33", "b1", "b2", "b3")
FEATURE_COLS = (
    "n_chars", "n_symbols", "n_tokens", "n_distinct", "n_sv", "n_en",
    "ppl_score",
)


def rule_features(
    n_chars: np.ndarray,
    n_symbols: np.ndarray,
    n_tokens: np.ndarray,
    n_distinct: np.ndarray,
    n_sv: np.ndarray,
    n_en: np.ndarray,
    ppl: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """The two engineered integer features: f1 = how many of the five
    rule margins pass (0..5 — length window, symbol ratio, repetition,
    language decidable, LM log-odds positive), f2 = winsorized length.
    Same thresholds as gate.decide, restated over the raw signals."""
    len_ok = (n_chars >= MIN_CHARS) & (n_chars <= MAX_CHARS)
    sym_ok = SYMBOL_NUM * n_symbols <= SYMBOL_DEN * n_chars
    rep_ok = ~((n_tokens >= REP_MIN_TOKENS) & (REP_NUM * n_distinct < REP_DEN * n_tokens))
    lang_ok = n_sv != n_en
    ppl_ok = ppl > 0
    f1 = (
        len_ok.astype(np.int64) + sym_ok + rep_ok + lang_ok + ppl_ok
    ).astype(np.int64)
    f2 = np.minimum(n_chars.astype(np.int64), FEAT_CAP)
    return f1, f2


def _batch_features(batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    return rule_features(
        *(batch[c].to_numpy(np.int64) for c in FEATURE_COLS)
    )


def gram_sums(labeled_ds) -> dict[str, int]:
    """One streaming pass: fold the nine int64 sufficient statistics of
    the ridge system (upper triangle of XᵀX plus Xᵀy) across all batches,
    over NON-PROTECTED rows only. `labeled_ds` needs the signal columns,
    `role` and `keep`."""
    from ..schema import PROTECTED_ROLES

    prot = list(PROTECTED_ROLES)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[~batch["role"].isin(prot)]
        f1, f2 = _batch_features(batch)
        y = batch["keep"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "s11": [int((f1 * f1).sum())],
                "s12": [int((f1 * f2).sum())],
                "s13": [int(f1.sum())],
                "s22": [int((f2 * f2).sum())],
                "s23": [int(f2.sum())],
                "s33": [len(batch)],
                "b1": [int((f1 * y).sum())],
                "b2": [int((f2 * y).sum())],
                "b3": [int(y.sum())],
            }
        )

    folded = labeled_ds.map_batches(partial, batch_format="pandas").sum(
        list(SUM_COLS)
    )
    return {c: int(folded[f"sum({c})"]) for c in SUM_COLS}


def solve_weights(sums: dict[str, int], lam: int = RIDGE_LAMBDA) -> dict[str, int]:
    """Cramer's rule on the symmetric 3×3 ridge system in exact Python
    ints; returns the micro-quantized weights plus the exact determinant
    and numerators (for the distributed==local equality tests)."""
    a11 = sums["s11"] + lam
    a12, a13 = sums["s12"], sums["s13"]
    a22 = sums["s22"] + lam
    a23 = sums["s23"]
    a33 = sums["s33"] + lam
    b1, b2, b3 = sums["b1"], sums["b2"], sums["b3"]

    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    n1 = (
        b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)
    )
    n2 = (
        a11 * (b2 * a33 - a23 * b3)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    )
    n3 = (
        a11 * (a22 * b3 - a23 * b2)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)
    )
    assert det > 0  # ridge term guarantees positive definiteness
    d2 = 2 * det

    def micro(n: int) -> int:  # round-half-up(W_SCALE * n / det), exact
        return (2 * W_SCALE * n + det) // d2

    return {
        "det": det,
        "n1": n1,
        "n2": n2,
        "n3": n3,
        "w_rules_micro": micro(n1),
        "w_chars_micro": micro(n2),
        "w_bias_micro": micro(n3),
        "n_train": sums["s33"],
    }


def train_keep_weights(labeled_ds, lam: int = RIDGE_LAMBDA) -> dict[str, int]:
    """Distributed training: streaming sufficient-statistics fold + exact
    driver-side solve. The returned micro weights ARE the model."""
    return solve_weights(gram_sums(labeled_ds), lam=lam)


def trained_keep_from_features(
    f1: np.ndarray, f2: np.ndarray, weights: dict[str, int]
) -> np.ndarray:
    score = (
        weights["w_rules_micro"] * f1
        + weights["w_chars_micro"] * f2
        + weights["w_bias_micro"]
    )
    return score >= KEEP_NUM


def trained_keep(batch_like, weights: dict[str, int]) -> np.ndarray:
    """Vectorized int64 scorer over anything exposing the signal columns
    (pandas DataFrame or dict of numpy arrays): keep iff w·x ≥ 0.5 in
    micro-units. Shared by the standalone query and the qf_pipeline
    'trained' gate mode."""
    if isinstance(batch_like, pd.DataFrame):
        cols = {c: batch_like[c].to_numpy(np.int64) for c in FEATURE_COLS}
    else:
        cols = {c: np.asarray(batch_like[c], dtype=np.int64) for c in FEATURE_COLS}
    f1, f2 = rule_features(*(cols[c] for c in FEATURE_COLS))
    return trained_keep_from_features(f1, f2, weights)


def apply_trained_gate(labeled_ds, weights: dict[str, int]):
    """Per-turn trained decision over a Dataset carrying the signal
    columns; emits (conv_id, turn_idx, keep_trained) for EVERY turn
    (role-protection is the pipeline's job, not the scorer's)."""
    w = {
        k: int(weights[k])
        for k in ("w_rules_micro", "w_chars_micro", "w_bias_micro")
    }

    def score(batch: pa.Table) -> pa.Table:
        cols = {
            c: batch[c].combine_chunks().to_numpy(zero_copy_only=False)
            for c in FEATURE_COLS
        }
        keep = trained_keep(cols, w)
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "keep_trained": pa.array(keep, type=pa.bool_()),
            }
        )

    return labeled_ds.map_batches(score, batch_format="pyarrow")
