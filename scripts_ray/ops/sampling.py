"""Deterministic sampling (SURVEY §2.6 O5/O6).

Ray Data has no weighted/stratified sampling primitive; both are
implemented as seeded hash-threshold filters inside `map_batches`
(md5 of the stable row key — deterministic, order-independent, identical
in the DuckDB oracle), mirroring the reference's md5-seeded sampling
(/root/reference/src/sample_pages_new.py:144-156)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .dedup import _turn_key
from .textstats import md5_hex


TURN_KEY_MULT = 1_000_000  # turn_idx < 1e6 (matches the 6-digit zfill key)


def _turn_key_int(conv_id: pd.Series, turn_idx) -> np.ndarray:
    """Integer composite turn key: the numeric user id recovered from
    'conv-NNNNNN' times 1e6 plus turn_idx — injective (turn_idx is
    6-digit-bounded like the string key), computed with Arrow slice/cast
    kernels, and restated in SQL as
    CAST(substr(conv_id, 6) AS BIGINT) * 1000000 + turn_idx. This is the
    splitmix64-chain input that replaced per-row md5 in the Bernoulli
    sampling/uid family (stratified_sample and doc_stats.fingerprint keep
    md5 as the reference-parity exhibit,
    /root/reference/src/sample_pages_new.py:144-156)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_pandas(conv_id.astype(object))
    uid = pc.cast(pc.utf8_slice_codeunits(arr, 5, 2**30), pa.int64()).to_numpy()
    return uid * TURN_KEY_MULT + np.asarray(turn_idx, dtype=np.int64)


SAMPLE_RATE_PER_256 = 13  # ≈ 5.1%, mirrors the reference's '0d' hex bar


def sample_turns(ds, rate_per_256: int = SAMPLE_RATE_PER_256):
    """Bernoulli sample: keep rows whose splitmix64(turn key) lands below
    `rate_per_256`/256 — deterministic, order-independent, value-checked
    (the SQL oracle recomputes the identical mix chain)."""
    from .dedup import sql_mix64

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        z = sql_mix64(_turn_key_int(batch["conv_id"], batch["turn_idx"]))
        keep = z % np.uint64(256) < np.uint64(rate_per_256)
        return batch.loc[keep, ["conv_id", "turn_idx"]]

    return ds.map_batches(pick, batch_format="pandas")


def stratified_sample(ds, per_stratum: int = 3, stratum_col: str = "role"):
    """n-per-stratum sample: within each stratum take the `per_stratum`
    smallest md5 keys (deterministic rank order)."""

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["h"] = md5_hex(_turn_key(batch["conv_id"], batch["turn_idx"]).tolist())
        return batch[[stratum_col, "conv_id", "turn_idx", "h"]]

    def take(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "conv_id", "turn_idx"], kind="mergesort").head(
            per_stratum
        )
        return g[[stratum_col, "conv_id", "turn_idx"]]

    return (
        ds.map_batches(add_key, batch_format="pandas")
        .groupby(stratum_col)
        .map_groups(take, batch_format="pandas")
    )


def weighted_sample(ds, long_threshold: int = 200,
                    long_per_256: int = 64, short_per_256: int = 8):
    """Weighted Bernoulli sample (reference: page-count-weighted sampling,
    /root/reference/src/sample_pages_new.py:41-48): long turns are kept at
    ~25% (64/256), short ones at ~3% (8/256) — the splitmix64 turn key
    against a weight-dependent threshold, deterministic and
    order-independent."""
    from .dedup import sql_mix64

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        z = sql_mix64(_turn_key_int(batch["conv_id"], batch["turn_idx"]))
        thr = np.where(
            batch["text"].str.len().to_numpy() >= long_threshold,
            long_per_256,
            short_per_256,
        ).astype(np.uint64)
        return batch.loc[z % np.uint64(256) < thr, ["conv_id", "turn_idx"]]

    return ds.map_batches(pick, batch_format="pandas")


def turn_uids(ds):
    """Deterministic stable turn ids (reference: seeded content-derived
    uuids, /root/reference/src/cur-prot/add_uuid.py:33-36): the full
    64-bit splitmix64 of the composite (conv_id, turn_idx) key, emitted
    as a signed int64 both engines agree on bit for bit."""
    from .dedup import sql_mix64

    def uid(batch: pd.DataFrame) -> pd.DataFrame:
        z = sql_mix64(_turn_key_int(batch["conv_id"], batch["turn_idx"]))
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "uid": z.view(np.int64),
            }
        )

    return ds.map_batches(uid, batch_format="pandas")


def turn_ids_unique(ds):
    """Global id-uniqueness census (analog of the reference's uuid census,
    /root/reference/src/add_uuid.py:80-85): distributed count vs
    count-distinct (two-level hash distinct — id cardinality ≈ row count),
    returned as a single row."""
    import pandas as _pd

    from .hashagg import distinct

    def keys(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": _turn_key(batch["conv_id"], batch["turn_idx"])})

    ids = ds.map_batches(keys, batch_format="pandas")
    n_rows = ids.count()
    n_ids = distinct(ids, "id").count()
    return _pd.DataFrame({"n_rows": [np.int64(n_rows)], "n_ids": [np.int64(n_ids)]})


# ---- Mixture sampling to per-source token budgets --------------------------

MIX_TOKEN_BUDGET = 600  # tokens selected per source
MIX_HASH_MULT = 1000003
MIX_HASH_ADD = 12345
MIX_HASH_M = 2147483647  # 2^31 - 1


def mixture_sample(docs_ds, budget: int = MIX_TOKEN_BUDGET):
    """Domain-mixture sampling: deterministically select documents per
    source until each source's token budget is met — the data-mixture
    step of a pre-training pipeline (per-domain token quotas). Selection
    order is a seeded affine hash of doc_id (order-independent, no RNG
    state), and a document is taken while the tokens selected BEFORE it
    are under budget, so every source overshoots by less than one
    document. Per-doc token counts are local (one map_batches); the
    selection itself is one hash exchange on `source` whose partitions
    hold complete source groups — sources are bounded (domains, not
    documents), the same partitioning assumption as every other grouped
    scan here. Output: (source, doc_id, n_tok) of selected docs."""

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": batch["source"].to_numpy(),
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "n_tok": doc_token_counts(batch),
            }
        )

    return mixture_pick(
        docs_ds.map_batches(counts, batch_format="pandas"), budget
    )


def doc_token_counts(batch: pd.DataFrame) -> np.ndarray:
    """Per-row token counts (same tokenization as the SQL oracles'
    `_DOC_TOKS`) — the one kernel shared by mixture_sample and
    shard_pack so the two value-checked paths cannot drift."""
    import pyarrow as pa

    from ..tokens import explode

    rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
    return (
        np.bincount(rows, minlength=len(batch)).astype(np.int64)
        if len(toks)
        else np.zeros(len(batch), dtype=np.int64)
    )


def mixture_pick(per_doc_ds, budget: int = MIX_TOKEN_BUDGET):
    """The selection half of `mixture_sample`, over precomputed
    (source, doc_id, n_tok) rows — reused by pipelines that already carry
    token counts (e.g. the fused curation pipeline), so no text re-read
    is needed. One hash exchange on `source`."""
    from .hashagg import map_partitions_by_key

    def pick(part: pd.DataFrame) -> pd.DataFrame:
        d = part.copy()
        ids = d["doc_id"].to_numpy(dtype=np.int64)
        d["_h"] = ((ids % MIX_HASH_M) * MIX_HASH_MULT + MIX_HASH_ADD) % MIX_HASH_M
        d = d.sort_values(["source", "_h", "doc_id"], kind="mergesort")
        before = d.groupby("source", sort=False)["n_tok"].cumsum() - d["n_tok"]
        return d.loc[(before < budget).to_numpy(), ["source", "doc_id", "n_tok"]]

    return map_partitions_by_key(per_doc_ds, "source", pick)


# ---- Packing documents into ~fixed-token training shards -------------------

SHARD_TOKENS = 500  # target tokens per output shard
SHARD_BUCKETS = 8  # independent packing streams (parallelism/skew knob)


def shard_pack(docs_ds, shard_tokens: int = SHARD_TOKENS,
               n_buckets: int = SHARD_BUCKETS):
    """Assign each document to a training shard of ~`shard_tokens` tokens
    — the output-packing step that turns a curated corpus into
    fixed-size training files. Documents are split into `n_buckets`
    independent packing streams by doc_id (global order is NOT required
    for shard packing, so no global sort: each bucket packs its own
    deterministic affine-hash order and shard ids are namespaced per
    bucket). One exchange on the bucket id; `n_buckets` is the
    parallelism knob and should scale with the cluster. A document
    starts a new shard when the tokens packed before it in its bucket
    reach the next shard boundary — every shard except a bucket's last
    holds >= shard_tokens - (max doc) and < shard_tokens + (max doc)
    tokens. shard_id = local_seq * n_buckets + bucket: injective for ANY
    per-bucket shard count (a fixed per-bucket namespace width would
    collide once a bucket exceeds it — at 100 TB a bucket packs billions
    of shards). Output: (doc_id, n_tok, shard_id)."""
    from .hashagg import map_partitions_by_key

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tok": doc_token_counts(batch),
                "bucket": ids % n_buckets,
            }
        )

    per_doc = docs_ds.map_batches(counts, batch_format="pandas")

    def pack(part: pd.DataFrame) -> pd.DataFrame:
        d = part.copy()
        ids = d["doc_id"].to_numpy(dtype=np.int64)
        d["_h"] = ((ids % MIX_HASH_M) * MIX_HASH_MULT + MIX_HASH_ADD) % MIX_HASH_M
        d = d.sort_values(["bucket", "_h", "doc_id"], kind="mergesort")
        before = d.groupby("bucket", sort=False)["n_tok"].cumsum() - d["n_tok"]
        local = before.to_numpy() // shard_tokens
        d["shard_id"] = local * n_buckets + d["bucket"].to_numpy(dtype=np.int64)
        return d[["doc_id", "n_tok", "shard_id"]]

    return map_partitions_by_key(per_doc, "bucket", pack)


SPLIT_BUCKETS = 100
SPLIT_TRAIN_LT = 90  # [0,90) train
SPLIT_VAL_LT = 95    # [90,95) val, [95,100) test


def dataset_split(docs_ds):
    """Deterministic train/val/test assignment per document: bucket =
    splitmix64(doc_id) mod 100 → 90/5/5. A pure map — no exchange, no
    RNG, stable under re-runs and appends (a new document's split never
    depends on the rest of the corpus), which is what makes the split
    reproducible at 100 TB and across engine versions. Value-checked: the
    SQL oracle recomputes the identical mix chain."""
    import pandas as pd

    from .dedup import sql_mix64

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        b = (sql_mix64(ids) % np.uint64(SPLIT_BUCKETS)).astype(np.int64)
        split = np.where(
            b < SPLIT_TRAIN_LT, "train", np.where(b < SPLIT_VAL_LT, "val", "test")
        )
        return pd.DataFrame(
            {"doc_id": ids, "bucket": b, "split": split}
        )

    return docs_ds.map_batches(assign, batch_format="pandas")


# ---- version-diff QC sampling (reference diff-search) ------------------------
# Two corpus snapshots are derived DETERMINISTICALLY from `documents` so the
# diff is value-checkable: v2 is the table as-is; v1 lacks every
# doc_id % DIFF_ADD_MOD == 0 row (those are "added" in v2) and carried a
# different text for doc_id % DIFF_CHG_MOD == 0 rows (those are "changed").
DIFF_ADD_MOD = 11
DIFF_CHG_MOD = 7
DIFF_V1_SUFFIX = " v1"
DIFF_SALT = 41                         # seeded review-sample salt
DIFF_RATE_ADDED = 50                   # % of added rows sampled for review
DIFF_RATE_CHANGED = 25                 # % of changed rows sampled for review


def corpus_diff_sample(docs_fn):
    """Version-diff QC sampling (reference
    /root/reference/src/diff-sampling/diff-search.py:48-90: pull the rows
    that differ between two corpus versions and sample them for manual
    review): classify every v2 document as 'added' (no v1 row) or
    'changed' (v1 text differs), drop the unchanged bulk, then keep a
    seeded per-stratum hash-threshold sample — added rows reviewed at
    DIFF_RATE_ADDED %, changed at DIFF_RATE_CHANGED %.

    Scale shape: each snapshot side collapses to (doc_id, fp1, fp2)
    128-bit content fingerprints BEFORE the exchange, so the doc_id join
    never ships text; classification and the splitmix64-threshold sample
    are pure vectorized maps. `docs_fn` is a zero-arg factory returning a
    fresh documents Dataset per call — the two snapshot chains must be
    independent consumers (a shared lazy Dataset re-executes its upstream
    once per consumer)."""
    from .dedup import content_fingerprints, sql_mix64
    from .hashagg import hash_join

    def v1_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        keep = ids % DIFF_ADD_MOD != 0
        ids = ids[keep]
        text = batch["text"].to_numpy(dtype=object)[keep]
        chg = ids % DIFF_CHG_MOD == 0
        if chg.any():
            text = text.copy()
            text[chg] = np.char.add(text[chg].astype(str), DIFF_V1_SUFFIX)
        fp1, fp2 = content_fingerprints(pd.Series(text, dtype=object))
        return pd.DataFrame({"doc_id": ids, "v1_fp1": fp1, "v1_fp2": fp2})

    def v2_rows(batch: pd.DataFrame) -> pd.DataFrame:
        fp1, fp2 = content_fingerprints(batch["text"])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "source": batch["source"].to_numpy(dtype=object),
                "fp1": fp1,
                "fp2": fp2,
            }
        )

    joined = hash_join(
        docs_fn().map_batches(v2_rows, batch_format="pandas"),
        docs_fn().map_batches(v1_rows, batch_format="pandas"),
        on="doc_id",
        how="left",
    )

    def classify_sample(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        new = batch["v1_fp1"].isna().to_numpy()
        chg = ~new & (
            (batch["v1_fp1"].to_numpy() != batch["fp1"].to_numpy())
            | (batch["v1_fp2"].to_numpy() != batch["fp2"].to_numpy())
        )
        status = np.where(new, "added", np.where(chg, "changed", ""))
        z = sql_mix64(ids * 2 + DIFF_SALT) % np.uint64(100)
        rate = np.where(new, DIFF_RATE_ADDED, DIFF_RATE_CHANGED)
        keep = (new | chg) & (z < rate.astype(np.uint64))
        return pd.DataFrame(
            {
                "doc_id": ids[keep],
                "source": batch["source"].to_numpy(dtype=object)[keep],
                "status": status[keep],
            }
        )

    return joined.map_batches(classify_sample, batch_format="pandas")


SEQ_LEN = 128  # tokens per packed training sequence
SEQ_BUCKETS = 8


def seq_pack(docs_ds, seq_len: int = SEQ_LEN, n_buckets: int = SEQ_BUCKETS):
    """Pack the curated corpus into FIXED-LENGTH training sequences that
    cross document boundaries (GPT-style pretraining prep — the step after
    shard_pack's whole-doc shard assignment): inside each of `n_buckets`
    independent packing streams, documents are laid out in deterministic
    affine-hash order, each followed by one implicit EOD position, and the
    resulting token stream is cut every `seq_len` tokens. Emits one row
    per (sequence, document) SEGMENT: seq_id, doc_id, doc_start/doc_end
    (token slice within the document) and seq_off (where the slice lands
    in the sequence) — exactly what a loader needs to materialize input
    ids without ever shuffling text. One bucket exchange; the segment
    expansion is vectorized (repeat + segmented arange).
    seq_id = bucket-local index * n_buckets + bucket (injective for any
    per-bucket sequence count, as in shard_pack)."""
    from .hashagg import map_partitions_by_key

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tok": doc_token_counts(batch),
                "bucket": ids % n_buckets,
            }
        )

    def pack(part: pd.DataFrame) -> pd.DataFrame:
        cols = ["seq_id", "doc_id", "doc_start", "doc_end", "seq_off"]
        if len(part) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64) for c in cols})
        d = part.copy()
        ids = d["doc_id"].to_numpy(dtype=np.int64)
        d["_h"] = ((ids % MIX_HASH_M) * MIX_HASH_MULT + MIX_HASH_ADD) % MIX_HASH_M
        d = d.sort_values(["bucket", "_h", "doc_id"], kind="mergesort")
        n = d["n_tok"].to_numpy(dtype=np.int64)
        # global start of each doc in its bucket stream (+1 EOD per doc)
        g = (
            d.groupby("bucket", sort=False)["n_tok"]
            .transform(lambda s: (s + 1).cumsum())
            .to_numpy(dtype=np.int64)
            - (n + 1)
        )
        keep = n > 0
        d, n, g = d.loc[keep], n[keep], g[keep]
        s0 = g // seq_len
        s1 = (g + n - 1) // seq_len
        nseg = s1 - s0 + 1
        total = int(nseg.sum())
        rep = np.repeat(np.arange(len(d)), nseg)
        seg_cum = np.concatenate([[0], np.cumsum(nseg)[:-1]])
        s = np.repeat(s0, nseg) + (np.arange(total) - np.repeat(seg_cum, nseg))
        gr, nr = g[rep], n[rep]
        seg_start = np.maximum(gr, s * seq_len)
        seg_end = np.minimum(gr + nr, (s + 1) * seq_len)
        return pd.DataFrame(
            {
                "seq_id": s * n_buckets
                + d["bucket"].to_numpy(dtype=np.int64)[rep],
                "doc_id": d["doc_id"].to_numpy(dtype=np.int64)[rep],
                "doc_start": seg_start - gr,
                "doc_end": seg_end - gr,
                "seq_off": seg_start - s * seq_len,
            }
        )

    per_doc = docs_ds.map_batches(counts, batch_format="pandas")
    return map_partitions_by_key(per_doc, "bucket", pack)


CHUNK_LEN = 64    # tokens per retrieval chunk
CHUNK_STRIDE = 48  # window step; overlap = CHUNK_LEN - CHUNK_STRIDE


def chunk_docs(docs_ds, chunk_len: int = CHUNK_LEN, stride: int = CHUNK_STRIDE):
    """Overlapping fixed-token-window chunking — RAG / retrieval-index
    prep, the per-document complement of `seq_pack`'s cross-document
    packing: each document's token stream (the `_DOC_TOKS` convention)
    is cut into windows of `chunk_len` tokens starting every `stride`
    tokens, so consecutive chunks overlap by chunk_len - stride and the
    final window may run short. A PURE per-row map — chunk boundaries
    depend only on the row itself, so the stage streams with no exchange
    at any corpus scale. Window arithmetic is vectorized (repeat +
    segmented arange over the exploded token array); only the emitted
    chunk strings are assembled per OUTPUT row, a cost proportional to
    the output payload like any string materialization. Empty documents
    emit no chunks. Emits (doc_id, chunk_idx, tok_start, tok_end,
    chunk_text)."""
    import pyarrow as pa

    from ..tokens import explode

    if not (0 < stride <= chunk_len):
        raise ValueError(f"need 0 < stride <= chunk_len, got {stride}/{chunk_len}")

    def chunks(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        n = (
            np.bincount(rows, minlength=len(batch)).astype(np.int64)
            if len(toks)
            else np.zeros(len(batch), dtype=np.int64)
        )
        off = np.zeros(len(batch) + 1, dtype=np.int64)
        np.cumsum(n, out=off[1:])
        n_chunks = -(-n // stride)  # ceil(n/stride); 0 for empty docs
        total = int(n_chunks.sum())
        rep = np.repeat(np.arange(len(batch), dtype=np.int64), n_chunks)
        first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(first, n_chunks)
        s = within * stride
        e = np.minimum(s + chunk_len, n[rep])
        gs, ge = off[rep] + s, off[rep] + e
        return pd.DataFrame(
            {
                "doc_id": ids[rep],
                "chunk_idx": within,
                "tok_start": s,
                "tok_end": e,
                "chunk_text": [
                    " ".join(toks[a:b]) for a, b in zip(gs, ge)
                ],
            }
        )

    return docs_ds.map_batches(chunks, batch_format="pandas")


DOMAIN_CAP = 3  # max docs kept per source


def domain_cap(docs_ds, cap: int = DOMAIN_CAP, key_col: str = "source"):
    """Per-domain document cap — the web-crawl de-biasing gate (don't let
    one over-represented site dominate the mixture): keep at most `cap`
    docs per `key_col`, chosen as the smallest (splitmix64(doc_id),
    doc_id) keys. Deterministic and append-stable — a doc's rank key
    never changes, so re-runs and incremental loads keep the same
    survivors — and exactly restatable in SQL (row_number over the same
    chain). Per-batch local pruning cuts every batch to <= cap rows per
    source BEFORE the exchange (any row outside its batch-local top-cap
    can't be in the global top-cap), so the shuffle carries at most
    cap x sources-in-batch narrow (doc_id, source, z) rows per batch no
    matter the corpus size. Emits (doc_id, source)."""
    from .dedup import sql_mix64
    from .hashagg import map_partitions_by_key

    def top_cap(d: pd.DataFrame) -> pd.DataFrame:
        return (
            d.sort_values(["z", "doc_id"], kind="mergesort")
            .groupby(key_col, sort=False)
            .head(cap)
        )

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                key_col: batch[key_col],
            }
        )
        d["z"] = sql_mix64(d["doc_id"].to_numpy(dtype=np.int64))
        return top_cap(d)

    def final(part: pd.DataFrame) -> pd.DataFrame:
        return top_cap(part)[["doc_id", key_col]].reset_index(drop=True)

    return map_partitions_by_key(
        docs_ds.map_batches(prune, batch_format="pandas"), key_col, final
    )


QUOTA_TOTAL = 50


def quota_sample(docs_ds, k: int = QUOTA_TOTAL, stratum_col: str = "source"):
    """Proportional-allocation sample with an EXACT total: each stratum
    gets floor(k·n_s/N) rows plus largest-remainder top-ups (Hamilton
    apportionment, remainder ties broken by stratum name) so the quotas
    sum to exactly k — the allocation rule `stratified_sample`'s flat
    n-per-stratum cannot give. Within a stratum the quota rows are the
    smallest (splitmix64(doc_id), doc_id) keys: deterministic,
    order-independent, SQL-reproducible.

    Plan: one tiny stratum-count aggregate → driver apportionment
    (dimension-bounded) broadcast; then ONE exchange on the stratum with
    a per-batch head-quota combiner (a batch can contribute at most
    quota rows to a stratum's final quota-smallest set, so the exchange
    carries ≤ quota × batches rows per stratum). Emits (doc_id,
    stratum)."""
    import ray

    from .dedup import sql_mix64
    from .hashagg import hash_aggregate, map_partitions_by_key

    counts = hash_aggregate(
        docs_ds, keys=[stratum_col], aggs={"ns": ("doc_id", "count")}
    ).to_pandas().sort_values(stratum_col, kind="mergesort")
    ns = counts["ns"].to_numpy(dtype=np.int64)
    total = int(ns.sum())
    if total == 0:
        raise ValueError("quota_sample: empty input — no strata to apportion")
    base = (k * ns) // total
    rem = (k * ns) % total
    leftover = int(k - base.sum())
    order = np.lexsort((counts[stratum_col].to_numpy(), -rem))
    quota = base.copy()
    quota[order[:leftover]] += 1
    return _select_by_quota(
        docs_ds, stratum_col, dict(zip(counts[stratum_col], quota.astype(int)))
    )


def _select_by_quota(docs_ds, stratum_col: str, quotas: dict):
    """Shared quota selector (quota_sample / temp_sample): within each
    stratum keep its quota of smallest (splitmix64(doc_id), doc_id)
    keys. One broadcast of the dimension-bounded quota dict, a per-batch
    head-quota combiner (a batch contributes at most quota rows to a
    stratum's final quota-smallest set), ONE stratum exchange, and the
    same rule per partition. Emits (doc_id, stratum_col)."""
    import ray

    from .dedup import sql_mix64
    from .hashagg import map_partitions_by_key

    qref = ray.put(quotas)

    def head_quota(batch: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                stratum_col: batch[stratum_col],
                "h": sql_mix64(batch["doc_id"].to_numpy(dtype=np.int64)),
            }
        ).sort_values([stratum_col, "h", "doc_id"], kind="mergesort")
        rn = out.groupby(stratum_col, sort=False).cumcount().to_numpy()
        cap = out[stratum_col].map(q).fillna(0).to_numpy(dtype=np.int64)
        return out[rn < cap].reset_index(drop=True)

    def take(part: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        part = part.sort_values([stratum_col, "h", "doc_id"], kind="mergesort")
        rn = part.groupby(stratum_col, sort=False).cumcount().to_numpy()
        cap = part[stratum_col].map(q).fillna(0).to_numpy(dtype=np.int64)
        out = part[rn < cap]
        return out[["doc_id", stratum_col]].reset_index(drop=True)

    return map_partitions_by_key(
        docs_ds.map_batches(head_quota, batch_format="pandas"),
        stratum_col,
        take,
    )


def temp_sample(docs_ds, stratum_col: str = "source"):
    """Temperature-balanced source sampling — the multilingual-LM α=0.5
    convention (sample counts ∝ n_s^α flatten heavy sources so rare ones
    are not drowned; α=0.5 is the classic mBERT/XLM-R operating point):
    each stratum's quota is EXACTLY isqrt(n_s), integer square root with
    no libm on either side (math.isqrt here; floor(sqrt)+neighbor
    correction in the SQL oracle), survivors the quota smallest
    (splitmix64(doc_id), doc_id) keys. Same tiny count aggregate →
    broadcast quotas → one-exchange selection plan as quota_sample.
    Emits (doc_id, stratum_col)."""
    import math

    from .hashagg import hash_aggregate

    counts = hash_aggregate(
        docs_ds, keys=[stratum_col], aggs={"ns": ("doc_id", "count")}
    ).to_pandas()
    if len(counts) == 0:
        raise ValueError("temp_sample: empty input — no strata")
    quotas = {
        s: math.isqrt(int(n))
        for s, n in zip(counts[stratum_col], counts["ns"])
    }
    return _select_by_quota(docs_ds, stratum_col, quotas)


def corpus_upsert(docs_fn):
    """CDC compaction / upsert merge: older snapshot + delta → current
    snapshot, delta winning per key — the merge step every incremental
    corpus pipeline runs after `corpus_diff_sample`-style ingestion. The
    two inputs are derived from the fixture by the SAME deterministic
    v1/delta rule as corpus_diff_sample (v1 lacks the 'added' ids and
    carries the old text for 'changed' ids; the delta holds exactly the
    added+changed v2 rows), so the merged output must reconstruct the v2
    documents table BYTE-FOR-BYTE — the oracle is `SELECT doc_id, text
    FROM documents`, no re-derivation at all.

    Plan: both sides tagged with a version column in their map pass, ONE
    exchange on doc_id, per-partition keep-max-version (vectorized sort +
    first-per-key). Text crosses the exchange once per side — the same
    cost as any compaction; at real scale the delta side is the small
    one and v1 arrives already bucketed (checkpoint layout), making the
    exchange delta-proportional per bucket."""
    from .hashagg import map_partitions_by_key

    def v1_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        keep = ids % DIFF_ADD_MOD != 0
        ids = ids[keep]
        text = batch["text"].to_numpy(dtype=object)[keep]
        chg = ids % DIFF_CHG_MOD == 0
        if chg.any():
            text = text.copy()
            text[chg] = np.char.add(text[chg].astype(str), DIFF_V1_SUFFIX)
        return pd.DataFrame(
            {"doc_id": ids, "text": text, "v": np.int8(1)}
        )

    def delta_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        keep = (ids % DIFF_ADD_MOD == 0) | (ids % DIFF_CHG_MOD == 0)
        return pd.DataFrame(
            {
                "doc_id": ids[keep],
                "text": batch["text"].to_numpy(dtype=object)[keep],
                "v": np.int8(2),
            }
        )

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["doc_id", "v"], ascending=[True, False],
                                kind="mergesort")
        first = part.groupby("doc_id", sort=False).cumcount() == 0
        out = part.loc[first.to_numpy(), ["doc_id", "text"]]
        return out.reset_index(drop=True)

    both = docs_fn().map_batches(v1_rows, batch_format="pandas").union(
        docs_fn().map_batches(delta_rows, batch_format="pandas")
    )
    return map_partitions_by_key(both, "doc_id", merge_part)


LB_BATCH = 16  # docs per length-homogeneous loader batch


def length_batches(docs_ds, batch_rows: int = LB_BATCH):
    """Length-bucketed batch assignment — the data-loader prep that cuts
    padding waste (batch together docs of similar length so a batch pads
    to its own bucket's ceiling, not the corpus max): bucket =
    floor(log2(n_chars)) (the len_log2_hist integer rule), docs ordered
    within the bucket by (splitmix64(doc_id), doc_id) — deterministic
    shuffle within a bucket, so batches are length-homogeneous but not
    ordered by length — and batch_idx = rank // batch_rows. ONE bucket
    exchange carrying (doc_id, bucket, z); the rank is a vectorized
    per-partition cumcount. Emits (doc_id, bucket, batch_idx)."""
    from .dedup import sql_mix64
    from .hashagg import map_partitions_by_key

    boundaries = np.left_shift(np.int64(1), np.arange(1, 63, dtype=np.int64))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch["n_chars"].to_numpy(dtype=np.int64)
        if len(x) and x.min() <= 0:
            raise ValueError("n_chars must be positive for log2 buckets")
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "bucket": np.searchsorted(boundaries, x, side="right"),
                "z": sql_mix64(ids),
            }
        )

    def assign(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["bucket", "z", "doc_id"], kind="mergesort")
        rn = part.groupby("bucket", sort=False).cumcount().to_numpy()
        return pd.DataFrame(
            {
                "doc_id": part["doc_id"].to_numpy(dtype=np.int64),
                "bucket": part["bucket"].to_numpy(dtype=np.int64),
                "batch_idx": rn // batch_rows,
            }
        )

    return map_partitions_by_key(
        docs_ds.map_batches(project, batch_format="pandas"), "bucket", assign
    )


TRUNC_TOKENS = 96  # context-window budget for truncate_docs


def truncate_docs(docs_ds, max_tokens: int = TRUNC_TOKENS):
    """Token-boundary truncation — context-window prep (cut every doc to
    its first `max_tokens` tokens, never mid-token, and record what was
    cut so downstream token accounting stays honest). Pure per-row map,
    no exchange; tokenize once per batch, join back only the kept
    prefix. Emits (doc_id, n_tok_orig, truncated_text,
    was_truncated)."""
    import pyarrow as pa

    from ..tokens import explode

    def cut(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        n = (
            np.bincount(rows, minlength=len(batch)).astype(np.int64)
            if len(toks)
            else np.zeros(len(batch), dtype=np.int64)
        )
        off = np.zeros(len(batch) + 1, dtype=np.int64)
        np.cumsum(n, out=off[1:])
        keep = np.minimum(n, max_tokens)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tok_orig": n,
                "truncated_text": [
                    " ".join(toks[a:a + k])
                    for a, k in zip(off[:-1], keep)
                ],
                "was_truncated": n > max_tokens,
            }
        )

    return docs_ds.map_batches(cut, batch_format="pandas")
