"""Connected-components duplicate clustering: unit graphs, the DuckDB
recursive-closure oracle, and keep-one-per-cluster semantics."""

import numpy as np
import pandas as pd

from scripts_ray.ops import cluster


def _cc(ray, pairs: list[tuple[int, int]], **kw) -> pd.DataFrame:
    ds = ray.data.from_pandas(
        pd.DataFrame(pairs, columns=["doc_a", "doc_b"]).astype(np.int64)
    )
    out = cluster.connected_components(ds, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_cc_clique_chain_and_pair(ray_session):
    # clique {1,2,3}, a 6-node path (min label must walk the diameter,
    # exercising >1 propagation round), and an isolated pair {100,101}
    pairs = [(1, 2), (2, 3), (1, 3)]
    pairs += [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15)]
    pairs += [(101, 100)]
    out = _cc(ray_session, pairs)
    expected = {1: 1, 2: 1, 3: 1}
    expected |= {n: 10 for n in range(10, 16)}
    expected |= {100: 100, 101: 100}
    assert dict(zip(out["doc_id"], out["cluster_id"])) == expected


def test_cc_duplicate_and_reversed_edges(ray_session):
    # the same pair repeated and reversed (as LSH multi-band collisions
    # produce) must not change the result
    out = _cc(ray_session, [(5, 4), (4, 5), (4, 5), (6, 5)])
    assert dict(zip(out["doc_id"], out["cluster_id"])) == {4: 4, 5: 4, 6: 4}


def test_cc_empty_pairs(ray_session):
    ds = ray_session.data.from_pandas(
        pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                      "doc_b": pd.Series(dtype=np.int64)})
    )
    out = cluster.connected_components(ds)
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "cluster_id"]


def test_cc_threshold_guard(ray_session):
    import pytest

    with pytest.raises(RuntimeError, match="local_threshold"):
        _cc(
            ray_session,
            [(10, 11), (11, 12), (12, 13), (13, 14)],
            local_threshold=0,
            max_levels=2,
        )


def test_cc_forced_contraction_levels(ray_session):
    # a 20-clique (190 edges) over local_threshold=60 forces at least one
    # contraction exchange before the local finish — the result must match
    # the single-task answer
    pairs = [(a, b) for a in range(1, 21) for b in range(a + 1, 21)]
    pairs += [(100, 101)]
    out = _cc(ray_session, pairs, local_threshold=60, num_partitions=4)
    expected = {n: 1 for n in range(1, 21)} | {100: 100, 101: 100}
    assert dict(zip(out["doc_id"], out["cluster_id"])) == expected


def test_keep_after_clustering(ray_session):
    labels = ray_session.data.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2, 3, 5, 6], "cluster_id": [1, 1, 1, 5, 5]}
        ).astype(np.int64)
    )
    ids = ray_session.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64)})
    )
    kept = cluster.keep_after_clustering(ids, labels).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 4, 5, 7, 8, 9]


def test_dup_clusters_matches_recursive_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    got = (
        queries.QUERIES["dup_clusters"](sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        duck.execute(sql_ops.DUP_CLUSTERS_SQL)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))


def test_dedup_keep_clustered_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    got = sorted(
        queries.QUERIES["dedup_keep_clustered"](sf_dir).to_pandas()["doc_id"]
    )
    exp = sorted(duck.execute(sql_ops.DEDUP_KEEP_CLUSTERED_SQL).df()["doc_id"])
    assert got == exp
