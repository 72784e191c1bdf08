"""Iterative graph algorithms over corpus-derived link graphs.

Web curation is graph-shaped at the margins: PageRank-style centrality
over the crawl's link graph is a classic quality prior (the original
"which pages matter" signal), and the same BSP shape (join ranks to
edges, aggregate contributions by destination, reassign) carries any
fixed-point vertex program. The engine's iteration is the standard
distributed Pregel step — per iteration ONE distributed join on src and
ONE destination aggregate, both at edge cardinality, plus a doc-level
left join for dangling/teleport mass; the driver only holds the loop
counter, never the rank vector.

Determinism: all arithmetic is INTEGER (rank in micro-units, floor
division per edge BEFORE the sum, damping as (85 * s) // 100), so every
iteration is bit-reproducible in the DuckDB oracle's unrolled CTE chain —
the value check covers the full fixed-point computation, not a tolerance
band. Reference analog: the accuracy/version iteration loops of
/root/reference/src/accuracy_version_plot.py:18-31 generalized to a
vertex fixed point.

The fixture has no link column, so edges are PLANTED deterministically
(both engines, same rule): doc i links to (10i+1) mod N and (13i+2) mod N
— out-degree exactly 2; the non-invertible 10 (gcd(10, N) > 1 for the
fixture N) concentrates in-links on dst ≡ 1 (mod gcd) hub nodes, so the
rank distribution is genuinely non-uniform.
At deployment the edge map is replaced by the real link extractor and
out-degree comes from a per-src aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PR_ITERS = 4
PR_INIT = 1_000_000  # rank micro-units
PR_TELEPORT = 150_000  # 0.15 in micro-units
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_OUT_DEG = 2
PR_EDGE_MULS = ((10, 1), (13, 2))  # dst = (a*src + b) mod N


def pagerank(docs_ids_ds_fn, n_docs: int, iters: int = PR_ITERS,
             num_partitions: int = 16):
    """`iters` synchronous PageRank steps; emits (doc_id, rank_micro).

    Each superstep is exactly ONE exchange: the map stage SCATTERS every
    vertex's per-edge contribution (rank // out_degree) to its planted
    destinations plus one zero-mass anchor row per vertex (so nodes with
    no in-links survive with pure teleport mass), and a single
    destination-keyed hash aggregate folds them; reassignment is a pure
    map. The rank vector is materialized per superstep — the Pregel
    barrier; without it the lazy lineage nests each iteration's DAG
    inside the next. For a REAL (extracted, non-formulaic) edge table the
    scatter becomes a distributed `hash_join(ranks, edges, on='src')` —
    with `salted_join` when the link graph has hub-scale in-degree skew —
    at one extra exchange per superstep; the aggregate and barrier are
    identical.

    `docs_ids_ds_fn()` must return a fresh (doc_id) Dataset (seeds the
    rank vector). `num_partitions` sizes the superstep exchange — raise
    it with the cluster."""
    from .hashagg import hash_aggregate

    def seed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "rank_micro": np.full(len(batch), PR_INIT, dtype=np.int64),
            }
        )

    ranks = docs_ids_ds_fn().map_batches(seed, batch_format="pandas")

    def contribs(batch: pd.DataFrame) -> pd.DataFrame:
        did = batch["doc_id"].to_numpy(dtype=np.int64)
        give = batch["rank_micro"].to_numpy(dtype=np.int64) // PR_OUT_DEG
        frames = [
            pd.DataFrame({"doc_id": (a * did + b) % n_docs, "c": give})
            for a, b in PR_EDGE_MULS
        ]
        frames.append(
            pd.DataFrame({"doc_id": did, "c": np.zeros(len(did), np.int64)})
        )
        return pd.concat(frames, ignore_index=True)

    def reassign(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch["c"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "rank_micro": PR_TELEPORT + (PR_DAMP_NUM * c) // PR_DAMP_DEN,
            }
        )

    for _ in range(iters):
        sums = hash_aggregate(
            ranks.map_batches(contribs, batch_format="pandas"),
            keys=["doc_id"],
            aggs={"c": ("c", "sum")},
            num_partitions=num_partitions,
        )
        ranks = sums.map_batches(reassign, batch_format="pandas").materialize()

    return ranks


def triangle_counts(docs_ids_ds, n_docs: int, num_partitions: int = 16):
    """Per-vertex triangle counts over the planted link graph, treated as
    UNDIRECTED — the standard wedge-check MapReduce algorithm (Suri &
    Vassilvitskii 2011): a triangle a<b<c is found exactly once, as the
    wedge (b, c) generated at its MINIMUM vertex a that closes against
    the edge set.

    Stages, all bounded by edge/wedge cardinality: (1) scatter the two
    planted directed edges per doc to canonical (a<b) form and dedup
    distributively (the plants can collide with each other and with the
    reverse direction); the distinct edge table is materialized — it has
    two consumers (wedge source + close probe) and is graph-sized, not
    corpus-sized; (2) ONE exchange groups edges by their min endpoint and
    emits each neighbor pair as a wedge via the per-distinct-degree triu
    pass; (3) ONE distributed join closes wedges against edges; (4) each
    triangle explodes to its three vertices for the final count
    aggregate. Min-vertex orientation makes wedge volume Σ_a C(deg₊(a),2)
    — switch to DEGREE-ordered orientation (orient every edge toward the
    higher-degree endpoint) when a real link graph has hub skew; the
    stages are identical. Emits (doc_id, n_tri) for vertices in ≥ 1
    triangle."""
    from .hashagg import (
        distinct,
        hash_aggregate,
        hash_join,
        map_partitions_by_key,
        run_pair_indices,
    )

    def plant_edges(batch: pd.DataFrame) -> pd.DataFrame:
        did = batch["doc_id"].to_numpy(dtype=np.int64)
        frames = []
        for a, b in PR_EDGE_MULS:
            dst = (a * did + b) % n_docs
            keep = dst != did
            lo = np.minimum(did[keep], dst[keep])
            hi = np.maximum(did[keep], dst[keep])
            frames.append(pd.DataFrame({"a": lo, "b": hi}))
        return pd.concat(frames, ignore_index=True)

    edges = distinct(
        docs_ids_ds.map_batches(plant_edges, batch_format="pandas"),
        keys=["a", "b"],
        num_partitions=num_partitions,
    ).materialize()  # graph-sized; two consumers below

    empty = pd.DataFrame(
        {"apex": np.array([], dtype=np.int64),
         "b": np.array([], dtype=np.int64),
         "c": np.array([], dtype=np.int64)}
    )

    def wedge_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["a", "b"], kind="mergesort").reset_index(drop=True)
        if len(part) == 0:
            return empty
        a = part["a"].to_numpy()
        nb = part["b"].to_numpy()
        new = np.empty(len(part), dtype=bool)
        new[0] = True
        new[1:] = a[1:] != a[:-1]
        ia, ib = run_pair_indices(new)
        if len(ia) == 0:
            return empty
        return pd.DataFrame({"apex": a[ia], "b": nb[ia], "c": nb[ib]})

    wedges = map_partitions_by_key(
        edges, "a", wedge_part, num_partitions=num_partitions
    )
    closing = edges.map_batches(
        lambda t: t.rename(columns={"a": "b", "b": "c"}), batch_format="pandas"
    )
    tris = hash_join(
        wedges, closing, on=["b", "c"], how="inner",
        num_partitions=num_partitions,
    )

    def explode3(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate(
            [batch["apex"].to_numpy(dtype=np.int64),
             batch["b"].to_numpy(dtype=np.int64),
             batch["c"].to_numpy(dtype=np.int64)]
        )
        return pd.DataFrame({"doc_id": v, "one": np.ones(len(v), dtype=np.int64)})

    return hash_aggregate(
        tris.map_batches(explode3, batch_format="pandas"),
        keys=["doc_id"],
        aggs={"n_tri": ("one", "sum")},
        num_partitions=num_partitions,
    )
