"""Semantic checks for the conversation-level gate and the duplicate-bigram
repetition signal (both oracle-equality-checked in the registry; these
assert the BEHAVIOR on planted inputs)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from scripts_ray import rules as R


def test_conv_gate_threshold_boundary():
    # survive iff DEN*n_keep >= NUM*n_total with NUM/DEN = 2/5
    for n_total, n_keep, expect in [(5, 2, True), (5, 1, False), (10, 4, True),
                                    (10, 3, False), (1, 0, False), (1, 1, True)]:
        assert (R.CONV_KEEP_DEN * n_keep >= R.CONV_KEEP_NUM * n_total) is expect


def test_conv_gate_turns_apply(ray_session):
    import ray.data as rd

    from scripts_ray.ops.hashagg import map_partitions_by_key

    # conv A: 1 of 4 kept (25% < 40% -> all dropped); conv B: 3 of 4 kept
    df = pd.DataFrame(
        {
            "conv_id": ["A"] * 4 + ["B"] * 4,
            "turn_idx": list(range(4)) * 2,
            "keep": [True, False, False, False, True, True, True, False],
        }
    )

    def apply_gate(part: pd.DataFrame) -> pd.DataFrame:
        kept = part["keep"].astype(np.int64)
        g = kept.groupby(part["conv_id"])
        ok = R.CONV_KEEP_DEN * g.transform("sum") >= R.CONV_KEEP_NUM * g.transform("count")
        return pd.DataFrame(
            {"conv_id": part["conv_id"], "turn_idx": part["turn_idx"],
             "keep_final": part["keep"] & ok}
        )

    out = (
        map_partitions_by_key(rd.from_pandas(df), "conv_id", apply_gate)
        .to_pandas()
        .set_index(["conv_id", "turn_idx"])["keep_final"]
    )
    assert not out.loc["A"].any()  # conversation below threshold: all out
    assert out.loc["B"].sum() == 3  # surviving conv keeps its per-turn bits


def test_dup_ngrams_detects_looping_text():
    from scripts_ray.tokens import bigram_pairs

    def dup_permille(text):
        rows, w1, w2 = bigram_pairs(pa.array([text]))
        total = len(rows)
        if total == 0:
            return 0
        pairs = {(a, b) for a, b in zip(w1, w2)}
        return int(np.floor(1000.0 * (total - len(pairs)) / total))

    assert dup_permille("spam spam spam spam spam") == 750  # 4 pairs, 1 distinct
    assert dup_permille("all tokens here are different") == 0
    assert dup_permille("one") == 0 and dup_permille("") == 0
