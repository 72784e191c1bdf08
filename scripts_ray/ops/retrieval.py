"""Full-text retrieval over the documents table: distributed BM25.

The training-data use case is corpus search/inspection ("which documents
score highest for these terms") and hard-negative mining. The plan is
two scan passes, both streaming:

1. **Stats pass** — one `map_batches` emits per-batch partials of the
   tiny global statistics BM25 needs: per-term document frequency (the
   query-term set is a constant broadcast, so the partial is |terms|
   rows per batch), total doc count and total token count. A driver-side
   fold of the |terms|-row frame yields (idf_t, avgdl, N) — constant
   size regardless of corpus size.
2. **Score pass** — rescan of the documents with the stats broadcast
   (`ray.put` once): per batch, vectorized tf per term, the BM25 score
   in integer micro-units (per-term `floor` BEFORE the sum, so the total
   is an order-independent integer sum and the DuckDB oracle can
   reproduce it bit-for-bit), local top-k, then a global
   `sort().limit(k)` over ≤ k rows per batch.

No stage materializes the corpus; the only non-map operation is the
final top-k over the per-batch candidate rows. Reference analog: the
KWIC search loop over every seg/note with a compiled keyword
(/root/reference/src/KWIC-iter-search.py:27-109) upgraded to ranked
retrieval.

Scoring: Okapi BM25 with k1=1.2, b=0.75 and the rational idf
(N - df + 0.5)/(df + 0.5) — log-free so the oracle avoids libm
last-ulp divergence; both engines evaluate the identical double
expression tree and floor to integer micro-units per (doc, term).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "window", "vector")
BM25_TOP_K = 10
RE_WORD = r"[a-zà-öø-ÿ]+"


def _term_counts(text_col: pa.ChunkedArray, terms: tuple[str, ...]):
    """(dl, tf_matrix): per-doc token count and per-doc tf for each query
    term, via ONE tokenize pass per batch (explode + np.isin), no Python
    row loop."""
    from ..tokens import explode

    rows, toks = explode(text_col.combine_chunks())
    n = len(text_col)
    dl = np.zeros(n, dtype=np.int64)
    np.add.at(dl, rows, 1)
    tf = np.zeros((n, len(terms)), dtype=np.int64)
    for j, t in enumerate(terms):
        hit = rows[toks == t]
        np.add.at(tf[:, j], hit, 1)
    return dl, tf


def bm25_stats(docs_ds, terms: tuple[str, ...] = BM25_TERMS) -> dict:
    """Pass 1: global (N, sum_dl, df per term) from per-batch partials."""

    def partial(batch: pa.Table) -> pa.Table:
        dl, tf = _term_counts(batch["text"], terms)
        return pa.table(
            {
                "term": pa.array(terms, type=pa.string()),
                "df": pa.array((tf > 0).sum(axis=0), type=pa.int64()),
                "n_docs": pa.array([len(dl)] * len(terms), type=pa.int64()),
                "sum_dl": pa.array([int(dl.sum())] * len(terms), type=pa.int64()),
            }
        )

    parts = docs_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("term", sort=True).agg(
        df=("df", "sum"), n_docs=("n_docs", "sum"), sum_dl=("sum_dl", "sum")
    )
    n_docs = int(agg["n_docs"].iloc[0])
    sum_dl = int(agg["sum_dl"].iloc[0])
    return {
        "terms": terms,
        "df": {t: int(agg.loc[t, "df"]) for t in terms},
        "n_docs": n_docs,
        "avgdl": sum_dl / n_docs,
    }


def bm25_search(
    docs_ds,
    stats: dict,
    terms: tuple[str, ...] = BM25_TERMS,
    k: int = BM25_TOP_K,
):
    """Pass 2: top-k documents by integer-micro BM25 score.

    Per-term score_micro = floor(1e6 * idf_t * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl))); doc score = integer sum over terms
    (order-independent). Docs with no query term are dropped (score 0
    would tie-flood the tail). Emits (rank, doc_id, score_micro)."""
    import ray

    ref = ray.put(stats)

    def score(batch: pa.Table) -> pd.DataFrame:
        st = ray.get(ref)
        n_docs, avgdl = st["n_docs"], st["avgdl"]
        dl, tf = _term_counts(batch["text"], st["terms"])
        total = np.zeros(len(dl), dtype=np.int64)
        dlf = dl.astype(np.float64)
        for j, t in enumerate(st["terms"]):
            df = st["df"][t]
            idf = (n_docs - df + 0.5) / (df + 0.5)
            tfj = tf[:, j].astype(np.float64)
            denom = tfj + BM25_K1 * (1.0 - BM25_B + BM25_B * dlf / avgdl)
            s = np.floor(1e6 * idf * (tfj * (BM25_K1 + 1.0)) / denom)
            total += s.astype(np.int64)  # tf=0 → numerator 0 → exact 0
        keep = total > 0
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
        sc = total[keep]
        # local top-k: only k candidate rows leave the batch
        order = np.lexsort((doc_id, -sc))[:k]
        return pd.DataFrame(
            {
                "doc_id": doc_id[order].astype(np.int64),
                "score_micro": sc[order],
            }
        )

    top = (
        docs_ds.map_batches(score, batch_format="pyarrow")
        .sort(["score_micro", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rank", "doc_id", "score_micro"]]


# ---- nearest-centroid clustering assignment (oracle-checked) ---------------

KMEANS_N_SEEDS = 8


def doc_tok_tf(batch: pa.Table) -> pd.DataFrame:
    """(doc_id, tok, tf) partials for one zero-copy Arrow batch — the
    shared per-doc term-frequency kernel of tfidf_terms and
    cluster_topics (one tokenize pass, C-kernel groupby combiner)."""
    from ..tokens import explode

    rows, toks = explode(batch["text"].combine_chunks())
    did = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    if len(toks) == 0:
        return pd.DataFrame(
            {"doc_id": np.array([], dtype=np.int64),
             "tok": np.array([], dtype=object),
             "tf": np.array([], dtype=np.int64)}
        )
    return (
        pd.DataFrame({"doc_id": did[rows].astype(np.int64), "tok": toks})
        .groupby(["doc_id", "tok"], sort=False)
        .size()
        .reset_index(name="tf")
    )


def kmeans_assign(emb_ds, seed_ids: np.ndarray, seeds: np.ndarray):
    """Embedding clustering assignment, value-checked: each vector is
    assigned to its most cosine-similar SEED centroid (the embeddings of
    vec_id < KMEANS_N_SEEDS — deterministic, data-derived, and exactly
    reproducible by the SQL oracle via list_cosine_similarity, unlike the
    iteratively-updated `similarity.train_centroids` whose float mean
    updates are summation-order-dependent). One broadcast of the
    (k, dim) seed matrix, one matmul per batch, argmax with
    lowest-centroid tie rule — the assignment step of Lloyd's algorithm
    as a streaming map, which is how full k-means runs at corpus scale
    (assign distributed per batch, centroid update as a tiny keyed
    aggregate per iteration). Emits (vec_id, cluster)."""
    import ray

    from .similarity import _unit_rows

    order = np.argsort(seed_ids)
    ref = ray.put((seed_ids[order].astype(np.int64),
                   _unit_rows(seeds[order])))

    def assign(batch: pa.Table) -> pd.DataFrame:
        from .similarity import _to_matrix, _unit_rows

        cids, cn = ray.get(ref)
        vecs = _to_matrix(batch["embedding"].combine_chunks())
        vn = _unit_rows(vecs)
        best = np.argmax(vn @ cn.T, axis=1)  # first (lowest cid) on ties
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "cluster": cids[best],
            }
        )

    return emb_ds.map_batches(assign, batch_format="pyarrow")


def kmeans_update(emb_ds, seed_ids: np.ndarray, seeds: np.ndarray):
    """The UPDATE step of distributed Lloyd's — the half `kmeans_assign`
    deliberately leaves to "a tiny keyed aggregate per iteration", now
    value-checked: per batch, assign vectors to their nearest seed (one
    matmul, same tie rule as kmeans_assign) and emit per-(cluster, dim)
    partial sums of the ×1024-quantized RAW embedding grid (power-of-two
    scale: float32→float64 then floor is exact in both engines) plus the
    per-cluster vector count. The partial is at most k × dim + k rows
    per batch — a constant-size mergeable sufficient statistic, so the
    exchange never scales with the corpus; the next-iteration centroid
    is sum_q / (PQ_QUANT · n_vecs) per dim, renormalized consumer-side
    (spherical k-means). Clusters with no member emit nothing, exactly
    as the SQL group-by drops them. Emits (cluster, dim, sum_q,
    n_vecs)."""
    import ray

    from .hashagg import hash_aggregate
    from .similarity import _pq_quantize, _to_matrix, _unit_rows

    order = np.argsort(seed_ids)
    ref = ray.put((seed_ids[order].astype(np.int64), _unit_rows(seeds[order])))

    def partial(batch: pa.Table) -> pd.DataFrame:
        cids, cn = ray.get(ref)
        vecs = _to_matrix(batch["embedding"].combine_chunks())
        best = np.argmax(_unit_rows(vecs) @ cn.T, axis=1)
        q = _pq_quantize(vecs)
        k, d = len(cids), q.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, best, q)
        counts = np.bincount(best, minlength=k)
        present = np.flatnonzero(counts)
        return pd.DataFrame(
            {
                "cluster": np.repeat(cids[present], d),
                "dim": np.tile(np.arange(d, dtype=np.int64), len(present)),
                "sum_q": sums[present].ravel(),
                "n_vecs": np.repeat(counts[present].astype(np.int64), d),
            }
        )

    return hash_aggregate(
        emb_ds.map_batches(partial, batch_format="pyarrow"),
        keys=["cluster", "dim"],
        aggs={"sum_q": ("sum_q", "sum"), "n_vecs": ("n_vecs", "sum")},
    )


# ---- DSIR-style importance selection ----------------------------------------

DSIR_BUCKETS = 64
DSIR_TARGET_SOURCE = "src0"
DSIR_SCALE = 1_000_000
DSIR_TOP_K = 100


def _token_buckets(text_col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, bucket) for every token: the hashed-feature map —
    winnow token hash (SQL-reproducible) % DSIR_BUCKETS."""
    from ..tokens import explode
    from .dedup import winnow_token_hashes

    rows, toks = explode(text_col.combine_chunks())
    return rows, winnow_token_hashes(toks) % DSIR_BUCKETS


def dsir_stats(docs_ds, target_source: str = DSIR_TARGET_SOURCE) -> np.ndarray:
    """Pass 1 of DSIR-style data selection (Xie et al. 2023,
    arXiv:2302.03169): hashed-unigram feature distributions of the TARGET
    domain slice vs the RAW corpus, folded driver-side (the partial is at
    most DSIR_BUCKETS rows per batch — constant, like the BM25 stats).

    Returns the per-bucket importance table v[b] = floor(SCALE ·
    p_target(b)/p_raw(b)) with add-one smoothing, computed in exact
    Python ints (the DuckDB oracle reproduces it in HUGEINT). Log-free
    rational weights — the same last-ulp-proof trade as the BM25 idf:
    per-token importance floors to an integer so the per-doc score is an
    order-independent integer sum on both engines."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        rows, b = _token_buckets(batch["text"])
        is_t = (
            pc.equal(batch["source"], target_source)
            .to_numpy(zero_copy_only=False)
            .astype(bool)[rows]
        )
        n_r = np.bincount(b, minlength=DSIR_BUCKETS)
        n_t = np.bincount(b[is_t], minlength=DSIR_BUCKETS)
        return pd.DataFrame(
            {
                "bucket": np.arange(DSIR_BUCKETS, dtype=np.int64),
                "n_t": n_t.astype(np.int64),
                "n_r": n_r.astype(np.int64),
            }
        )

    agg = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("bucket", sort=True)
        .sum()
    )
    n_t = agg["n_t"].to_numpy()
    n_r = agg["n_r"].to_numpy()
    T = int(n_t.sum()) + DSIR_BUCKETS
    R = int(n_r.sum()) + DSIR_BUCKETS
    # exact integer arithmetic (Python ints: SCALE·(n_t+1)·R overflows i64)
    v = [
        DSIR_SCALE * (int(n_t[b]) + 1) * R // ((int(n_r[b]) + 1) * T)
        for b in range(DSIR_BUCKETS)
    ]
    return np.array(v, dtype=np.int64)


def dsir_select(docs_ds, v: np.ndarray, k: int = DSIR_TOP_K):
    """Pass 2: per-doc importance score = floor(mean of v[bucket(token)])
    over the doc's tokens (integer micro units; the MEAN, not the sum, so
    the score measures per-token domain affinity rather than document
    length), global top-k by (score desc, doc_id). Zero-token docs are
    dropped (no evidence). The importance table is broadcast once;
    scoring is one vectorized gather+scatter-add per batch, local top-k
    per batch, tiny global sort — no stage sees more than k rows per
    batch after the map."""
    import ray

    ref = ray.put(v)

    def score(batch: pa.Table) -> pd.DataFrame:
        vv = ray.get(ref)
        rows, b = _token_buckets(batch["text"])
        total = np.zeros(len(batch), dtype=np.int64)
        np.add.at(total, rows, vv[b])
        cnt = np.bincount(rows, minlength=len(batch))
        keep = cnt > 0
        total = total[keep] // cnt[keep]
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
        order = np.lexsort((doc_id, -total))[:k]
        return pd.DataFrame(
            {
                "doc_id": doc_id[order].astype(np.int64),
                "dsir_micro": total[order],
            }
        )

    top = (
        docs_ds.map_batches(score, batch_format="pyarrow")
        .sort(["dsir_micro", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rank", "doc_id", "dsir_micro"]]


# ---- distributed Lloyd's k-means training ------------------------------------


def kmeans_train(emb_ds_fn, k: int = KMEANS_N_SEEDS, iters: int = 3):
    """Full spherical k-means TRAINING as a distributed iteration: per pass,
    the assignment step is the same broadcast-matmul map as kmeans_assign,
    and the centroid update is a CONSTANT-SIZE keyed aggregate — each batch
    emits (cluster, dim, partial_sum, n) long-form rows (k x dim per batch,
    independent of batch size), the driver folds the k x dim table and
    renormalizes. Nothing corpus-sized ever reaches the driver (contrast:
    the bounded-sample `similarity.train_centroids`, which trades passes
    for a one-shot sampled fit). `emb_ds_fn` is a factory because a lazy
    Dataset consumed once per iteration re-executes its upstream chain —
    the caller hands us a fresh read each pass (the read is the chain).

    Deterministic init: centroids = unit rows of vec_id < k (the pinned-
    seed convention shared with kmeans_assign / ann_ivf_fixed). Returns
    (centroids ndarray [k, dim], objective_per_iter list) where the
    objective is the mean max-cosine — non-decreasing for spherical
    k-means up to float summation noise.
    """
    from .hashagg import hash_aggregate
    from .similarity import _to_matrix, _unit_rows

    # init: the k pinned seed vectors (one tiny filtered read)
    first = emb_ds_fn().filter(expr=f"vec_id < {k}").to_pandas()
    first = first.sort_values("vec_id")
    cn = _unit_rows(_to_matrix(pa.array(first["embedding"].tolist())))
    assert cn.shape[0] == k, f"need {k} seed vectors, got {cn.shape[0]}"

    objective = []
    for _ in range(iters):
        centroids = cn  # rebound per pass; captured by value in the closure

        def partial(batch: pa.Table, _c=centroids) -> pd.DataFrame:
            vecs = _unit_rows(_to_matrix(batch["embedding"].combine_chunks()))
            sims = vecs @ _c.T
            best = np.argmax(sims, axis=1)
            d = _c.shape[1]
            # per-cluster vector sums + counts + sim sums, long form
            sums = np.zeros((_c.shape[0], d), dtype=np.float64)
            np.add.at(sums, best, vecs)
            n = np.bincount(best, minlength=_c.shape[0]).astype(np.int64)
            sim_sum = np.bincount(
                best, weights=sims[np.arange(len(best)), best],
                minlength=_c.shape[0],
            )
            cl = np.repeat(np.arange(_c.shape[0], dtype=np.int64), d)
            return pd.DataFrame(
                {
                    "cluster": cl,
                    "dim": np.tile(np.arange(d, dtype=np.int64), _c.shape[0]),
                    "s": sums.ravel(),
                    "n": np.repeat(n, d),
                    "sim": np.repeat(sim_sum, d),
                }
            )

        agg = hash_aggregate(
            emb_ds_fn().map_batches(partial, batch_format="pyarrow"),
            keys=["cluster", "dim"],
            aggs={"s": ("s", "sum"), "n": ("n", "sum"), "sim": ("sim", "sum")},
        ).to_pandas()  # k x dim rows — constant-size, driver-safe
        agg = agg.sort_values(["cluster", "dim"])
        d = agg["dim"].max() + 1
        sums = agg["s"].to_numpy().reshape(k, d)
        counts = agg["n"].to_numpy().reshape(k, d)[:, 0]
        total_sim = agg["sim"].to_numpy().reshape(k, d)[:, 0].sum()
        n_vecs = counts.sum()
        objective.append(float(total_sim / max(1, n_vecs)))
        # empty cluster keeps its old centroid; others -> renormalized mean
        nz = counts > 0
        new = cn.copy()
        new[nz] = sums[nz] / counts[nz, None]
        cn = _unit_rows(new)

    return cn, objective


# ---- TF-IDF top terms per document ------------------------------------------
TFIDF_TOP_K = 3
TFIDF_SCALE = 1_000_000


def tfidf_terms(docs_ds, k: int = TFIDF_TOP_K):
    """Top-k characteristic terms per document by tf·idf — the keyword
    extractor every corpus-exploration dashboard needs (BM25's cousin over
    the FULL vocabulary instead of a fixed query). idf is the log-free
    rational floor(1e6·N/df) (exact in float64 both engines, the BM25 idf
    trick), score = tf · idf_micro (integer product, order-independent).

    Plan: one (doc, tok) hash aggregate for tf; df and N derive from THAT
    table (token-level work never repeats); tf⋈df is a distributed join on
    tok (the vocabulary is unbounded at corpus scale — never broadcast);
    per-doc top-k via the grouped-top-k exchange. Emits
    (doc_id, rank, tok, score_micro)."""
    from .hashagg import hash_aggregate, hash_join
    from .quantiles import group_topk

    # Three consumers read tf (df aggregate, N count, join probe); Ray Data
    # re-executes a lazy chain once PER consumer, so pin the blocks once —
    # the one legitimate mid-pipeline materialize (the tokenize+aggregate
    # above must not run three times).
    tf = hash_aggregate(
        docs_ds.map_batches(doc_tok_tf, batch_format="pyarrow"),
        keys=["doc_id", "tok"],
        aggs={"tf": ("tf", "sum")},
    ).materialize()
    # df and N from the tf table: each (doc, tok) row counts once
    df = hash_aggregate(tf, keys=["tok"], aggs={"df": ("doc_id", "count")})
    n_docs = int(
        hash_aggregate(
            tf.map_batches(
                lambda b: b[["doc_id"]].drop_duplicates(), batch_format="pandas"
            ),
            keys=["doc_id"],
            aggs={"n": ("doc_id", "count")},
        ).count()
    )

    def idf(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["idf_micro"] = np.floor(
            TFIDF_SCALE * float(n_docs) / batch["df"].to_numpy(np.float64)
        ).astype(np.int64)
        return batch[["tok", "idf_micro"]]

    scored = hash_join(
        tf, df.map_batches(idf, batch_format="pandas"), on="tok", how="inner"
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64),
                "tok": batch["tok"],
                "tf": batch["tf"].to_numpy(np.int64),
                "score_micro": batch["tf"].to_numpy(np.int64)
                * batch["idf_micro"].to_numpy(np.int64),
            }
        )

    return group_topk(
        scored.map_batches(score, batch_format="pandas"),
        keys=["doc_id"],
        sort_col="score_micro",
        k=k,
        tie_cols=["tok"],
    )


# ---- pairwise source-distribution divergence ----------------------------------
def source_divergence(docs_ds):
    """Total-variation distance between every pair of per-source
    hashed-unigram token distributions — the data-mixture diagnostic
    ("how different are my sources?") behind reweighting decisions (cf.
    DSIR's importance weights, which use the same hashed feature space).

    Distributed work is ONE constant-size aggregate: per-batch
    (source, bucket) partials folded to sources × DSIR_BUCKETS rows; the
    driver computes the bounded sources² matrix with exact PYTHON-INT
    rationals (tv_micro = floor(1e6 · Σ_b |n_a·N_b − n_b·N_a| /
    (2·N_a·N_b)) — no float, no overflow at any corpus size), which the
    HUGEINT oracle reproduces bit-for-bit. Emits (src_a, src_b, tv_micro),
    src_a < src_b."""
    from .hashagg import hash_aggregate

    def partial(batch: pa.Table) -> pd.DataFrame:
        rows, b = _token_buckets(batch["text"])
        src = batch["source"].to_numpy(zero_copy_only=False)
        if len(rows) == 0:
            return pd.DataFrame(
                {"source": np.array([], dtype=object),
                 "bucket": np.array([], dtype=np.int64),
                 "n": np.array([], dtype=np.int64)}
            )
        return (
            pd.DataFrame({"source": src[rows], "bucket": b})
            .groupby(["source", "bucket"], sort=False)
            .size()
            .reset_index(name="n")
        )

    cnt = hash_aggregate(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        keys=["source", "bucket"],
        aggs={"n": ("n", "sum")},
    ).to_pandas()

    piv = cnt.pivot_table(index="bucket", columns="source", values="n",
                          aggfunc="sum", fill_value=0)
    sources = sorted(piv.columns)
    totals = {s: int(piv[s].sum()) for s in sources}
    rows = []
    for i, a in enumerate(sources):
        for bsrc in sources[i + 1:]:
            na, nb = piv[a].astype(object), piv[bsrc].astype(object)
            Na, Nb = totals[a], totals[bsrc]
            s_abs = int(sum(abs(int(x) * Nb - int(y) * Na)
                            for x, y in zip(na, nb)))
            rows.append(
                {"src_a": a, "src_b": bsrc,
                 "tv_micro": (1_000_000 * s_abs) // (2 * Na * Nb)}
            )
    out = pd.DataFrame(rows, columns=["src_a", "src_b", "tv_micro"])
    out["tv_micro"] = out["tv_micro"].astype(np.int64)
    return out


# ---- cluster topic terms (clustering x text composition) ----------------------
CLUSTER_TOP_K = 5


def cluster_topics(emb_ds, seed_ids, seeds, docs_ds, k: int = CLUSTER_TOP_K):
    """Top terms per embedding cluster — the corpus-exploration composition
    (what is each semantic cluster ABOUT?): pinned-seed k-means assignment
    joined to per-(doc, tok) term frequencies on vec_id = doc_id, folded
    to (cluster, tok) counts, grouped top-k. Every stage is an existing
    value-checked primitive; the join is distributed (doc cardinality both
    sides), the (cluster, tok) aggregate is bounded by k_clusters x vocab.
    Emits (cluster, rank, tok, n)."""
    from .hashagg import hash_aggregate, hash_join
    from .quantiles import group_topk

    assigned = kmeans_assign(emb_ds, seed_ids, seeds)
    joined = hash_join(
        docs_ds.map_batches(doc_tok_tf, batch_format="pyarrow"),
        assigned,
        on="doc_id",
        right_on="vec_id",
        how="inner",
    )
    counts = hash_aggregate(
        joined, keys=["cluster", "tok"], aggs={"n": ("tf", "sum")}
    )
    return group_topk(counts, keys=["cluster"], sort_col="n", k=k,
                      tie_cols=["tok"])


# ---- inverted index + phrase search -----------------------------------------
PHRASE = ("spark", "window")


def inverted_index(docs_ds, num_partitions: int = 64):
    """Materialize the positional-free inverted index: per token, its
    document frequency and the full postings list (sorted doc_ids,
    comma-joined so the artifact is a flat string column both engines
    and the SQL oracle render identically).

    Plan: per-batch (tok, doc_id) DISTINCT pairs (the combiner — a doc
    repeating a token a thousand times ships one pair), ONE exchange on
    tok, then per-partition sort + group-concat. Per-group work is
    bounded by the OUTPUT artifact (vocabulary-sized, like the BPE merge
    table), not the corpus. Skew note: a stopword's postings list is
    O(N_docs) in one group — at real corpus scale postings must be
    chunked per (tok, doc_id-range) into fixed-size segments (the
    standard index-shard layout); the single-string form here is the
    small-vocabulary exhibit. Emits (tok, df, postings)."""
    from ..tokens import explode
    from .hashagg import map_partitions_by_key

    def pairs(batch: pa.Table) -> pd.DataFrame:
        rows, toks = explode(batch["text"].combine_chunks())
        ids = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        out = pd.DataFrame({"tok": toks, "doc_id": ids[rows].astype(np.int64)})
        return out.drop_duplicates(ignore_index=True)

    def build(part: pd.DataFrame) -> pd.DataFrame:
        # cross-batch duplicates of one (tok, doc) pair collapse here
        part = part.drop_duplicates(["tok", "doc_id"]).sort_values(
            ["tok", "doc_id"], kind="mergesort"
        )
        part["doc_str"] = part["doc_id"].astype(str)
        g = part.groupby("tok", sort=False)
        out = g.agg(df=("doc_id", "size"), postings=("doc_str", ",".join))
        out["df"] = out["df"].astype(np.int64)
        return out.reset_index()

    return map_partitions_by_key(
        docs_ds.map_batches(pairs, batch_format="pyarrow"),
        keys="tok",
        fn=build,
        num_partitions=num_partitions,
    )


INDEX_SEG_RANGE = 64  # doc_ids per postings segment


def inverted_index_seg(docs_ds, seg_range: int = INDEX_SEG_RANGE,
                       num_partitions: int = 64):
    """The SCALE form of the inverted index: postings chunked per
    (tok, doc_id-range) fixed-size segment — the standard index-shard
    layout. The segment id (doc_id // seg_range) is computable MAP-SIDE,
    so the exchange key is (tok, seg_idx) and a stopword appearing in
    every document lands in N_docs/seg_range separate groups of at most
    seg_range entries each — no single group is ever corpus-sized
    (contrast `inverted_index`, the single-string small-vocabulary
    exhibit whose stopword group is O(N_docs)). Query-side, a reader
    scans the token's segments in seg_idx order (doc_id order is
    preserved across segments because segments partition the id space by
    range, not rank). Emits (tok, seg_idx, df_seg, postings_chunk)."""
    from ..tokens import explode
    from .hashagg import map_partitions_by_key

    def pairs(batch: pa.Table) -> pd.DataFrame:
        rows, toks = explode(batch["text"].combine_chunks())
        ids = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        d = ids[rows].astype(np.int64)
        out = pd.DataFrame(
            {"tok": toks, "seg_idx": d // seg_range, "doc_id": d}
        ).drop_duplicates(ignore_index=True)
        return out

    def build(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame(
                {
                    "tok": np.array([], dtype=object),
                    "seg_idx": np.array([], dtype=np.int64),
                    "df_seg": np.array([], dtype=np.int64),
                    "postings_chunk": np.array([], dtype=object),
                }
            )
        part = part.drop_duplicates(["tok", "seg_idx", "doc_id"]).sort_values(
            ["tok", "seg_idx", "doc_id"], kind="mergesort"
        )
        part["doc_str"] = part["doc_id"].astype(str)
        g = part.groupby(["tok", "seg_idx"], sort=False)
        out = g.agg(
            df_seg=("doc_id", "size"), postings_chunk=("doc_str", ",".join)
        ).reset_index()
        out["seg_idx"] = out["seg_idx"].astype(np.int64)
        out["df_seg"] = out["df_seg"].astype(np.int64)
        return out

    return map_partitions_by_key(
        docs_ds.map_batches(pairs, batch_format="pyarrow"),
        keys=["tok", "seg_idx"],
        fn=build,
        num_partitions=num_partitions,
    )


def phrase_search(docs_ds, phrase: tuple[str, ...] = PHRASE):
    """Exact phrase query: every (doc_id, pos) where the document's
    token stream contains `phrase` as consecutive tokens starting at
    0-based position `pos` (positions counted over non-empty tokens,
    the same filtered space as the SQL oracle's zipped unnest).

    Embarrassingly parallel — a phrase never crosses documents and a
    document never crosses batches, so this is one vectorized scan per
    batch with NO exchange: flat token array + parent row ids from the
    shared explode kernel, candidate start indices refined per phrase
    word by shifted equality (`toks[idx+j] == w_j` within the same
    parent). Contrast bm25/inverted_index, whose statistics are global.
    Emits (doc_id, pos)."""
    from ..tokens import explode

    w = [t.lower() for t in phrase]
    assert len(w) >= 1

    def scan(batch: pa.Table) -> pd.DataFrame:
        rows, toks = explode(batch["text"].combine_chunks())
        ids = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(toks)
        empty = pd.DataFrame(
            {"doc_id": np.array([], dtype=np.int64),
             "pos": np.array([], dtype=np.int64)}
        )
        if n == 0:
            return empty
        idx = np.flatnonzero(toks == w[0])
        for j, wj in enumerate(w[1:], start=1):
            idx = idx[idx + j < n]
            idx = idx[(toks[idx + j] == wj) & (rows[idx + j] == rows[idx])]
            if len(idx) == 0:
                return empty
        pos = idx - np.searchsorted(rows, rows[idx])  # 0-based within doc
        return pd.DataFrame(
            {"doc_id": ids[rows[idx]].astype(np.int64),
             "pos": pos.astype(np.int64)}
        )

    return docs_ds.map_batches(scan, batch_format="pyarrow")


# ---- distributed linear-model statistics ---------------------------------------
GRAM_FEATURES = ("n_chars", "n_tokens", "one")


def gram_matrix(docs_ds):
    """Exact XᵀX / Xᵀy sufficient statistics for a linear model over
    integer document features — the distributed-linear-algebra shape
    (Spark-MLlib-style normal equations): each batch emits its d×d+d
    partial in long form ((i, j, v) with j = d for the Xᵀy column), the
    merge is ONE constant-size hash aggregate, and the d×d solve happens
    wherever the statistics land — nothing row-scaled ever leaves the
    map stage, the same mergeable-partials contract as the sketches.
    Features: (n_chars, n_ws_tokens, intercept 1); target y =
    n_distinct-token count. All int64, bit-exact in the SQL oracle.
    Emits (i, j, v) for i ≤ j ≤ d (upper triangle + target column)."""
    from ..tokens import explode
    from .hashagg import hash_aggregate

    def partial(batch: pa.Table) -> pd.DataFrame:
        text = batch["text"].combine_chunks()
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        rows, toks = explode(text)
        n = len(text)
        n_tok = np.zeros(n, dtype=np.int64)
        np.add.at(n_tok, rows, 1)
        # distinct tokens per doc: sort-free via pandas C groupby-nunique
        if len(rows):
            y = (
                pd.DataFrame({"r": rows, "t": toks})
                .groupby("r", sort=False)["t"]
                .nunique()
            )
            n_dis = np.zeros(n, dtype=np.int64)
            n_dis[y.index.to_numpy()] = y.to_numpy()
        else:
            n_dis = np.zeros(n, dtype=np.int64)
        X = np.stack([n_chars, n_tok, np.ones(n, dtype=np.int64)], axis=1)
        d = X.shape[1]
        out_i, out_j, out_v = [], [], []
        for i in range(d):
            for j in range(i, d):
                out_i.append(i)
                out_j.append(j)
                out_v.append(int((X[:, i] * X[:, j]).sum()))
            out_i.append(i)
            out_j.append(d)  # target column
            out_v.append(int((X[:, i] * n_dis).sum()))
        return pd.DataFrame(
            {
                "i": np.array(out_i, dtype=np.int64),
                "j": np.array(out_j, dtype=np.int64),
                "v": np.array(out_v, dtype=np.int64),
            }
        )

    return hash_aggregate(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        keys=["i", "j"],
        aggs={"v": ("v", "sum")},
    )
