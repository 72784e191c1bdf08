"""Two-level hash aggregation vs plain pandas groupby on seeded random
frames — exactness at high key cardinality, including keys that are never
co-resident in one batch."""

import numpy as np
import pandas as pd
import pytest

from scripts_ray.ops import hashagg


def _frame(seed: int, n: int, ngroups: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.integers(0, ngroups, n),
            "k2": rng.choice(["a", "b", "c"], n),
            "v": rng.integers(-1000, 1000, n),
        }
    )


@pytest.mark.parametrize("seed,n,ngroups", [(0, 5000, 1500), (1, 20000, 7000)])
def test_hash_aggregate_matches_pandas(ray_session, seed, n, ngroups):
    import ray.data as rd

    df = _frame(seed, n, ngroups)
    got = (
        hashagg.hash_aggregate(
            rd.from_pandas(df, override_num_blocks=7),
            keys=["k", "k2"],
            aggs={
                "n": ("v", "count"),
                "s": ("v", "sum"),
                "mn": ("v", "min"),
                "mx": ("v", "max"),
            },
            num_partitions=16,
        )
        .to_pandas()
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    exp = (
        df.groupby(["k", "k2"], sort=False)
        .agg(n=("v", "size"), s=("v", "sum"), mn=("v", "min"), mx=("v", "max"))
        .reset_index()
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ["k", "s", "mn", "mx"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()


def test_distinct_matches_pandas(ray_session):
    import ray.data as rd

    df = _frame(3, 8000, 500)
    got = (
        hashagg.distinct(rd.from_pandas(df, override_num_blocks=5), ["k", "k2"])
        .to_pandas()
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    exp = (
        df[["k", "k2"]]
        .drop_duplicates()
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    assert got.equals(exp)


def test_map_partitions_groups_complete(ray_session):
    """Every key's rows arrive in exactly one partition call."""
    import ray.data as rd

    df = _frame(5, 6000, 300)

    def check(part: pd.DataFrame) -> pd.DataFrame:
        out = part.groupby("k", sort=False).size().rename("n").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    got = (
        hashagg.map_partitions_by_key(
            rd.from_pandas(df, override_num_blocks=9), "k", check, num_partitions=8
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = df.groupby("k").size().rename("n").reset_index()
    # one output row per key proves no key straddled two partitions
    assert len(got) == len(exp)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()


def test_hash_join_empty_right_declared(ray_session):
    """A fully-filtered right side loses its schema; with declared
    empty_right_cols the join degrades gracefully for both modes."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.hashagg import hash_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]}))
    right = rd.from_pandas(pd.DataFrame({"k": [9], "b": [99]})).map_batches(
        lambda df: df[df["k"] < 0], batch_format="pandas"
    )
    out = hash_join(
        left, right, on="k", how="left", empty_right_cols=["b"]
    ).to_pandas()
    assert sorted(out.columns) == ["a", "b", "k"]
    assert len(out) == 3 and out["b"].isna().all()
    inner = hash_join(
        left, right, on="k", how="inner", empty_right_cols=["b"]
    ).to_pandas()
    assert len(inner) == 0


def test_hash_join_empty_left_declared(ray_session):
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.hashagg import hash_join

    left = rd.from_pandas(pd.DataFrame({"k": [1], "a": [10]})).map_batches(
        lambda df: df[df["k"] < 0], batch_format="pandas"
    )
    right = rd.from_pandas(pd.DataFrame({"k": [1, 2], "b": [7, 8]}))
    out = hash_join(
        left, right, on="k", how="inner", empty_left_cols=["k", "a"]
    ).to_pandas()
    assert len(out) == 0


def test_run_pair_indices_property():
    """run_pair_indices equals brute-force within-run pair enumeration for
    random run layouts (no Ray needed)."""
    import numpy as np

    from scripts_ray.ops.hashagg import run_pair_indices

    rng = np.random.RandomState(3)
    for _ in range(25):
        sizes = rng.randint(1, 7, size=rng.randint(1, 12))
        new = np.zeros(int(sizes.sum()), dtype=bool)
        new[np.concatenate([[0], np.cumsum(sizes)[:-1]])] = True
        ia, ib = run_pair_indices(new)
        got = set(zip(ia.tolist(), ib.tolist()))
        want = set()
        start = 0
        for m in sizes:
            for i in range(start, start + int(m)):
                for j in range(i + 1, start + int(m)):
                    want.add((i, j))
            start += int(m)
        assert got == want
