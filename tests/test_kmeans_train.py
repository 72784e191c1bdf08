"""Distributed Lloyd's training (retrieval.kmeans_train): equivalence with
a local single-process reference on the same data, objective monotonicity,
and consistency with the value-checked assignment step."""

import numpy as np
import pyarrow as pa
import pytest


def _local_lloyds(vecs, k, iters):
    """Single-process spherical k-means with the same init/tie/empty rules."""
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    c = n[:k].copy()
    objective = []
    for _ in range(iters):
        sims = n @ c.T
        best = np.argmax(sims, axis=1)
        objective.append(float(sims[np.arange(len(n)), best].mean()))
        new = c.copy()
        for j in range(k):
            m = best == j
            if m.any():
                new[j] = n[m].sum(axis=0) / m.sum()
        c = new / np.linalg.norm(new, axis=1, keepdims=True)
    return c, objective


@pytest.fixture(scope="module")
def emb_table():
    rng = np.random.default_rng(11)
    # 4 separated clusters + noise so Lloyd's has something to learn
    centers = rng.normal(size=(4, 16))
    vecs = np.repeat(centers, 100, axis=0) + 0.15 * rng.normal(size=(400, 16))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(400, dtype=np.int64)),
            "embedding": pa.array(list(vecs.astype(np.float64))),
        }
    )


def test_kmeans_train_matches_local_reference(ray_session, emb_table, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from scripts_ray.ops.retrieval import kmeans_train

    path = str(tmp_path / "emb.parquet")
    pq.write_table(emb_table, path)
    vecs = np.array(emb_table["embedding"].to_pylist())

    got_c, got_obj = kmeans_train(lambda: rd.read_parquet(path), k=4, iters=3)
    exp_c, exp_obj = _local_lloyds(vecs, k=4, iters=3)

    # distributed float sums differ from local only by summation order
    assert np.allclose(got_c, exp_c, atol=1e-9)
    assert np.allclose(got_obj, exp_obj, atol=1e-9)
    # spherical k-means objective (mean max-cosine) never decreases
    assert all(b >= a - 1e-12 for a, b in zip(got_obj, got_obj[1:]))


def test_trained_centroids_drive_the_checked_assignment(
    ray_session, emb_table, tmp_path
):
    import pyarrow.parquet as pq
    import ray.data as rd

    from scripts_ray.ops.retrieval import kmeans_assign, kmeans_train

    path = str(tmp_path / "emb2.parquet")
    pq.write_table(emb_table, path)

    c, _ = kmeans_train(lambda: rd.read_parquet(path), k=4, iters=2)
    out = kmeans_assign(
        rd.read_parquet(path), np.arange(4, dtype=np.int64), c
    ).to_pandas()
    assert len(out) == 400
    assert set(out["cluster"].unique()) <= {0, 1, 2, 3}
    # the planted structure is 4 blocks of 100; training must recover it
    blocks = out.sort_values("vec_id")["cluster"].to_numpy().reshape(4, 100)
    assert all(len(np.unique(b)) == 1 for b in blocks)
