"""Hot-key stress for the keyed-exchange consumers (VERDICT r3 Next #9).

Order-dependent per-key transforms (conversation windows, user sessions)
cannot salt their key — a whole hot group must land in ONE partition task.
These tests push a 10⁶-row SINGLE key through the two exchange families
and assert exact results, pinning the documented partition-size ceiling:
the per-partition pandas kernel is vectorized, so a million-row group is
bounded by worker memory (rows × row width), not by per-row Python. The
escape hatches per stage are recorded in BASELINE.md (broadcast-window
flagship mode removes the full-row conv exchange entirely; associative
aggregates pre-combine per batch so a hot key arrives as one row per
upstream block).
"""

import numpy as np
import pandas as pd

N = 1_000_000


def _hot_conv() -> pd.DataFrame:
    """One 10⁶-turn conversation (role runs of deterministic varying
    length) + 1000 ten-turn decoys so the exchange has >1 group."""
    rng = np.random.default_rng(5)
    run_lens = rng.integers(1, 6, size=N)  # ~3M turns worth of runs, cut at N
    roles = np.repeat(
        np.array(["user", "assistant"], dtype=object)[
            np.arange(len(run_lens)) % 2
        ],
        run_lens,
    )[:N]
    hot = pd.DataFrame(
        {
            "conv_id": "hot",
            "turn_idx": np.arange(N, dtype=np.int64),
            "role": roles,
            "text": "t",
        }
    )
    decoys = pd.DataFrame(
        {
            "conv_id": np.repeat([f"c{i:04d}" for i in range(1000)], 10),
            "turn_idx": np.tile(np.arange(10, dtype=np.int64), 1000),
            "role": "user",
            "text": "t",
        }
    )
    return pd.concat([hot, decoys], ignore_index=True)


def test_million_turn_conversation_window_exchange(ray_session):
    """merge_runs over a 10⁶-turn conversation: the whole group lands in
    one partition (salting would break within-key order); result must
    equal the local pandas oracle exactly."""
    import ray.data as rd

    from scripts_ray.ops.hashagg import map_partitions_by_key
    from scripts_ray.ops.windows import merge_runs_part

    df = _hot_conv()
    out = (
        map_partitions_by_key(
            rd.from_pandas(df).repartition(16), "conv_id", merge_runs_part
        )
        .to_pandas()
        .sort_values(["conv_id", "run_idx"])
        .reset_index(drop=True)
    )
    exp = (
        merge_runs_part(df)
        .sort_values(["conv_id", "run_idx"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    assert (out["conv_id"].to_numpy() == exp["conv_id"].to_numpy()).all()
    assert (out["n_turns"].to_numpy() == exp["n_turns"].to_numpy()).all()
    # the hot conversation's run structure survived the exchange intact
    hot_runs = out.loc[out["conv_id"] == "hot", "n_turns"]
    assert hot_runs.sum() == N


def test_million_row_hot_user_aggregate(ray_session):
    """Associative aggregate over a 10⁶-row single user key: the per-batch
    partial IS the salt — the hot key arrives at its partition as one row
    per upstream block, so the exchange volume is block-count-bounded and
    the result exact."""
    import ray.data as rd

    from scripts_ray.ops.hashagg import hash_aggregate

    df = pd.DataFrame(
        {
            "user_id": np.where(
                np.arange(N) % 50 == 0, "cold", "hot"
            ),  # 2% decoy rows
            "value": np.arange(N, dtype=np.int64) % 7,
        }
    )
    out = (
        hash_aggregate(
            rd.from_pandas(df).repartition(16),
            keys="user_id",
            aggs={"n": ("value", "count"), "s": ("value", "sum")},
        )
        .to_pandas()
        .set_index("user_id")
    )
    exp = df.groupby("user_id")["value"].agg(["count", "sum"])
    assert int(out.loc["hot", "n"]) == int(exp.loc["hot", "count"])
    assert int(out.loc["hot", "s"]) == int(exp.loc["hot", "sum"])
    assert int(out.loc["cold", "n"]) == int(exp.loc["cold", "count"])
