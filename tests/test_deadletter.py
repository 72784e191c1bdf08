"""Dead-letter routing: tag-and-fork partition semantics and poison-row
isolation for raising batch functions."""

import numpy as np
import pandas as pd

from scripts_ray.ops import deadletter


def test_split_partitions_input(ray_session):
    df = pd.DataFrame(
        {"k": np.arange(6, dtype=np.int64), "v": ["ok", "", "ok", "bad", "ok", ""]}
    )
    ds = ray_session.data.from_pandas(df)

    def reasons(batch: pd.DataFrame) -> pd.Series:
        r = np.select(
            [batch["v"].eq(""), batch["v"].eq("bad")],
            ["empty", "badness"],
            default=None,
        )
        return pd.Series(r, index=batch.index, dtype=object)

    good, dead = deadletter.split(ds, reasons)
    g, d = good.to_pandas(), dead.to_pandas()
    assert sorted(g["k"]) == [0, 2, 4]
    assert dict(zip(d["k"], d["reason"])) == {1: "empty", 3: "badness", 5: "empty"}
    assert set(g["k"]) | set(d["k"]) == set(df["k"])  # exact partition
    assert "_dl_reason" not in g.columns


def test_map_batches_dead_letter_poison_rows(ray_session):
    df = pd.DataFrame(
        {"k": np.arange(8, dtype=np.int64), "s": ["3", "1", "x", "7", "2", "?", "5", "9"]}
    )
    ds = ray_session.data.from_pandas(df).repartition(2)

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized int parse — raises on any non-numeric row
        return pd.DataFrame(
            {"k": batch["k"].to_numpy(), "n": batch["s"].astype(np.int64)}
        )

    good, dead = deadletter.map_batches_dead_letter(ds, parse, ["k"], stage="parse")
    g = good.to_pandas().sort_values("k").reset_index(drop=True)
    d = dead.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(d["k"]) == [2, 5]
    assert (d["stage"] == "parse").all()
    assert d["reason"].str.contains("ValueError").all()
    assert list(g["k"]) == [0, 1, 3, 4, 6, 7]
    assert list(g["n"]) == [3, 1, 7, 2, 5, 9]


def test_map_batches_dead_letter_clean_batches(ray_session):
    df = pd.DataFrame({"k": np.arange(5, dtype=np.int64), "s": list("12345")})
    ds = ray_session.data.from_pandas(df)

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": batch["k"].to_numpy(), "n": batch["s"].astype(np.int64)}
        )

    good, dead = deadletter.map_batches_dead_letter(ds, parse, ["k"])
    assert dead.count() == 0
    assert sorted(good.to_pandas()["n"]) == [1, 2, 3, 4, 5]


def test_dead_letter_docs_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    got = (
        queries.QUERIES["dead_letter_docs"](sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        duck.execute(sql_ops.DEAD_LETTER_DOCS_SQL)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got["doc_id"] = got["doc_id"].astype(np.int64)
    exp["doc_id"] = exp["doc_id"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)
