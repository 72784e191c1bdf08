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


def _edges(docs_ids_ds, n_docs: int):
    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        src = batch["doc_id"].to_numpy(dtype=np.int64)
        outs = [
            pd.DataFrame({"src": src, "dst": (a * src + b) % n_docs})
            for a, b in PR_EDGE_MULS
        ]
        return pd.concat(outs, ignore_index=True)

    return docs_ids_ds.map_batches(emit, batch_format="pandas")


def pagerank(docs_ids_ds_fn, n_docs: int, iters: int = PR_ITERS,
             num_partitions: int = 16):
    """`iters` synchronous PageRank steps; emits (doc_id, rank_micro).

    `num_partitions` sizes every superstep exchange — raise it with the
    cluster (the default suits the test fixture; exchange count is fixed
    at 2 per superstep regardless).

    `docs_ids_ds_fn()` must return a fresh (doc_id) Dataset — it seeds the
    rank vector once and anchors the per-iteration left join (nodes with
    no in-links keep teleport mass). The edge Dataset is materialized ONCE
    (the "cache the graph" move every BSP engine makes: re-deriving edges
    per iteration would re-run the extractor `iters` times)."""
    from .hashagg import hash_aggregate, hash_join

    edges = _edges(docs_ids_ds_fn(), n_docs).materialize()

    def seed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "rank_micro": np.full(len(batch), PR_INIT, dtype=np.int64),
            }
        )

    ranks = docs_ids_ds_fn().map_batches(seed, batch_format="pandas")

    for _ in range(iters):
        def share(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "src": batch["doc_id"].to_numpy(dtype=np.int64),
                    "give": batch["rank_micro"].to_numpy(dtype=np.int64)
                    // PR_OUT_DEG,
                }
            )

        contrib = hash_join(
            edges,
            ranks.map_batches(share, batch_format="pandas"),
            on="src",
            how="inner",
            num_partitions=num_partitions,
        )
        sums = hash_aggregate(
            contrib, keys=["dst"], aggs={"c": ("give", "sum")},
            num_partitions=num_partitions,
        )

        def reassign(batch: pd.DataFrame) -> pd.DataFrame:
            c = batch["c"].fillna(0).to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                    "rank_micro": PR_TELEPORT
                    + (PR_DAMP_NUM * c) // PR_DAMP_DEN,
                }
            )

        # BSP superstep barrier: pin each iteration's rank vector. Without
        # it the lazy lineage nests one full iteration DAG inside the next
        # (and hash_join's schema probe re-executes the whole chain), so a
        # 4-iteration run pays far more than 4 supersteps. The rank vector
        # is the algorithm's state — materializing it per superstep into
        # the object store IS the Pregel design, and it spills if large.
        ranks = (
            hash_join(
                docs_ids_ds_fn(),
                sums,
                on="doc_id",
                right_on="dst",
                how="left",
                empty_right_cols=["c"],
                num_partitions=num_partitions,
            )
            .map_batches(reassign, batch_format="pandas")
            .materialize()
        )

    return ranks
