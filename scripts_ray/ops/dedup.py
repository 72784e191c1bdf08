"""Deduplication family: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Exact dedup = content-hash column + two-level hash aggregation (the
shuffle moves (fingerprint, key) partials, never full texts). Near-dup at
test scale uses a broadcast token-set matrix (block-pairwise, the same
pattern as brute-force ANN); the scale path is MinHash-LSH (shingle →
minhash → band → bucket groupby), fully vectorized below with
deterministic fixed-seed permutations.

Reference analog: drop_duplicates / duplicate-id detection
(/root/reference/src/cur-prot/redetect.py:52,
/root/reference/src/ck-duplicate-uuids.py:13-48).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashagg import hash_aggregate
from .textstats import md5_hex


def _turn_key(conv_id: pd.Series, turn_idx: pd.Series) -> pd.Series:
    return conv_id + ":" + turn_idx.astype(str).str.zfill(6)


def dedup_exact(ds, text_col: str, key_cols: list[str], key_fn=None):
    """Group rows by content hash of `text_col`; per group keep the count and
    the minimum composite key (first-wins dedup). Key cardinality ≈ row
    count, so this uses the two-level hash aggregate, not the sort-based
    native groupby."""

    def add_fp(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["fp"] = md5_hex(batch[text_col].tolist())
        batch["key"] = key_fn(batch) if key_fn else batch[key_cols[0]]
        return batch[["fp", "key"]]

    return hash_aggregate(
        ds.map_batches(add_fp, batch_format="pandas"),
        keys="fp",
        aggs={"first_key": ("key", "min"), "n_dupes": ("key", "count")},
    )


def token_hashes(tokens: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit token hashes, vectorized (siphash with the fixed
    pandas hash key — stable across processes and runs)."""
    if len(tokens) == 0:
        return np.array([], dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object))


class MinHasher:
    """k permutations h_i(x) = (a_i*x + b_i) mod 2^64 over 64-bit token
    hashes, banded for LSH. Deterministic (fixed seed); all arithmetic is
    wraparound uint64 numpy — no Python bigints in the hot path."""

    def __init__(self, k: int = 64, bands: int = 16, seed: int = 12345):
        assert k % bands == 0
        rng = np.random.default_rng(seed)
        self.k, self.bands, self.rows = k, bands, k // bands
        self.a = rng.integers(1, 1 << 63, size=k, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=k, dtype=np.uint64)

    def signature(self, tok_hashes: np.ndarray) -> np.ndarray:
        if len(tok_hashes) == 0:
            return np.full(self.k, np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            perms = self.a[:, None] * tok_hashes[None, :] + self.b[:, None]
        return perms.min(axis=1)

    def signatures(self, rows: np.ndarray, toks: np.ndarray, n: int) -> np.ndarray:
        """(n, k) signature matrix for a whole batch in one vectorized pass.
        `rows` must be sorted ascending (explode order); rows with no tokens
        get the empty signature."""
        if len(toks) == 0:
            return np.full((n, self.k), np.iinfo(np.uint64).max, dtype=np.uint64)
        return self.signatures_from_hashes(rows, token_hashes(toks), n)

    def signatures_from_hashes(
        self, rows: np.ndarray, th: np.ndarray, n: int
    ) -> np.ndarray:
        sigs = np.full((n, self.k), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(th) == 0:
            return sigs
        with np.errstate(over="ignore"):
            perms = th[:, None] * self.a[None, :] + self.b[None, :]  # (t, k)
        present, starts = np.unique(rows, return_index=True)
        sigs[present] = np.minimum.reduceat(perms, starts, axis=0)
        return sigs

    def band_keys_matrix(self, sigs: np.ndarray) -> np.ndarray:
        """(n, bands) uint64 band-bucket keys: one siphash per band slice."""
        n = sigs.shape[0]
        out = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            sl = np.ascontiguousarray(sigs[:, b * self.rows : (b + 1) * self.rows])
            out[:, b] = pd.util.hash_array(sl.view(f"V{8 * self.rows}").ravel())
        return out


_SHINGLE_MULTS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def shingle_hashes(rows: np.ndarray, toks: np.ndarray, n: int = 3):
    """64-bit hashes of n-token shingles over the ORDERED token stream
    (rows must be explode order). A shingle is valid only when all n
    tokens fall in the same row. Vectorized wraparound mix of the n
    consecutive token hashes."""
    th = token_hashes(toks)
    L = len(th)
    if L < n:
        return np.array([], dtype=np.int64), np.array([], dtype=np.uint64)
    with np.errstate(over="ignore"):
        sh = th[: L - n + 1] * _SHINGLE_MULTS[0]
        for i in range(1, n):
            sh = sh ^ (th[i : L - n + 1 + i] * _SHINGLE_MULTS[i % len(_SHINGLE_MULTS)])
    valid = rows[: L - n + 1] == rows[n - 1 :]
    return rows[: L - n + 1][valid], sh[valid]


def minhash_candidates(docs_ds, hasher: MinHasher | None = None, shingle_n: int = 3):
    """MinHash-LSH near-dup candidates: per-doc n-token shingles → minhash
    signature → (band_id, band_hash, doc_id) rows → bucket groupby →
    intra-bucket pairs → two-level hash aggregate to dedup pairs colliding
    in several bands. `shingle_n=1` degrades to unigram token sets."""
    hasher = hasher or MinHasher()

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        from ..tokens import explode

        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        if shingle_n > 1:
            srows, sh = shingle_hashes(rows, toks, shingle_n)
            if len(sh):
                uniq = pd.DataFrame({"r": srows, "h": sh}).drop_duplicates()
                srows, sh = uniq["r"].to_numpy(), uniq["h"].to_numpy()
            sigs = hasher.signatures_from_hashes(srows, sh, len(batch))
        else:
            # unique tokens per row (set semantics for minhash)
            if len(toks):
                uniq = pd.DataFrame({"r": rows, "t": toks}).drop_duplicates()
                rows, toks = uniq["r"].to_numpy(), uniq["t"].to_numpy()
            sigs = hasher.signatures(rows, toks, len(batch))
        keys = hasher.band_keys_matrix(sigs)  # (n, bands)
        n, bands = keys.shape
        doc_ids = np.repeat(batch["doc_id"].to_numpy().astype(np.int64), bands)
        band_ids = np.tile(np.arange(bands, dtype=np.int64), n)
        return pd.DataFrame(
            {"band_id": band_ids, "band_hash": keys.ravel().astype(np.int64),
             "doc_id": doc_ids}
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_a": np.array([], dtype=np.int64),
                 "doc_b": np.array([], dtype=np.int64)}
            )
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    pairs = (
        docs_ds.map_batches(to_bands, batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # distinct pairs (a doc pair may collide in several bands) — pair
    # cardinality can approach n², so two-level hash aggregate only.
    return hash_aggregate(
        pairs, keys=["doc_a", "doc_b"], aggs={"n_bands": ("doc_a", "count")}
    )


def simhash_docs(docs_ds):
    """64-bit SimHash per document (token siphash bits, count-weighted),
    vectorized across the whole batch."""

    def sim(batch: pd.DataFrame) -> pd.DataFrame:
        from ..tokens import explode

        n = len(batch)
        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        out = np.zeros(n, dtype=np.uint64)
        if len(toks):
            hs = token_hashes(toks)  # (t,)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                np.int64
            )
            contrib = 2 * bits - 1  # each token occurrence weights ±1
            present, starts = np.unique(rows, return_index=True)
            acc = np.add.reduceat(contrib, starts, axis=0)  # (n_present, 64)
            weights = (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
            out[present] = weights.sum(axis=1, dtype=np.uint64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "simhash": [format(int(h), "016x") for h in out],
            }
        )

    return docs_ds.map_batches(sim, batch_format="pandas")


def simhash_candidates(docs_ds, bands: int = 4):
    """SimHash near-dup candidates via bit-band LSH: the 64-bit simhash is
    split into `bands` contiguous bit slices; documents sharing any slice
    value are candidates (Hamming distance ≤ 64 - 64/bands guaranteed ≥ one
    identical band by pigeonhole). Same bucket-groupby → intra-bucket pair
    → hash-aggregate shape as MinHash."""
    assert 64 % bands == 0
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sims = batch["simhash"].apply(lambda h: np.uint64(int(h, 16)))
        sims = sims.to_numpy(dtype=np.uint64)
        n = len(sims)
        band_ids = np.tile(np.arange(bands, dtype=np.int64), n)
        shifts = (np.arange(bands, dtype=np.uint64) * np.uint64(width))[None, :]
        keys = ((sims[:, None] >> shifts) & mask).ravel().astype(np.int64)
        return pd.DataFrame(
            {
                "band_id": band_ids,
                "band_hash": keys,
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), bands),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_a": np.array([], dtype=np.int64),
                 "doc_b": np.array([], dtype=np.int64)}
            )
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    pairs = (
        simhash_docs(docs_ds)
        .map_batches(to_bands, batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return hash_aggregate(
        pairs, keys=["doc_a", "doc_b"], aggs={"n_bands": ("doc_a", "count")}
    )


def jaccard_pairs(docs_ds, doc_table: pa.Table, threshold_num=2, threshold_den=1):
    """Token-set Jaccard near-dup pairs via broadcast set-matrix blocks:
    each batch's docs are compared against ALL docs (broadcast bool matrix,
    `ray.put` once) — integer intersection/union so the DuckDB oracle
    matches exactly. Emits (doc_a, doc_b, inter, uni) for
    threshold_num*inter >= uni (default Jaccard ≥ 0.5). Scale path: MinHash
    above."""
    import ray

    ref = ray.put(_token_matrix(doc_table))

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, vocab_index, mat = ray.get(ref)
        bm = _rows_to_matrix(batch["text"].tolist(), vocab_index, mat.shape[1])
        inter = bm @ mat.T  # (batch, all)
        sizes_b = bm.sum(axis=1)
        sizes_all = mat.sum(axis=1)
        uni = sizes_b[:, None] + sizes_all[None, :] - inter
        batch_ids = batch["doc_id"].to_numpy()
        keep = (threshold_num * inter >= threshold_den * uni) & (
            batch_ids[:, None] < all_ids[None, :]
        )
        bi, ai = np.nonzero(keep)
        return pd.DataFrame(
            {
                "doc_a": batch_ids[bi].astype(np.int64),
                "doc_b": all_ids[ai].astype(np.int64),
                "inter": inter[bi, ai].astype(np.int64),
                "uni": uni[bi, ai].astype(np.int64),
            }
        )

    return docs_ds.map_batches(pairs, batch_format="pandas")


def _token_matrix(doc_table: pa.Table):
    from ..tokens import explode

    ids = doc_table["doc_id"].to_numpy(zero_copy_only=False)
    rows, toks = explode(doc_table["text"].combine_chunks())
    vocab, tok_idx = np.unique(toks, return_inverse=True)
    mat = np.zeros((len(ids), len(vocab)), dtype=np.int64)
    mat[rows, tok_idx] = 1
    vocab_index = {t: i for i, t in enumerate(vocab.tolist())}
    return ids, vocab_index, mat


def _rows_to_matrix(texts: list[str], vocab_index: dict, width: int) -> np.ndarray:
    from ..tokens import explode

    rows, toks = explode(pa.array(texts, type=pa.string()))
    mat = np.zeros((len(texts), width), dtype=np.int64)
    for r, t in zip(rows, toks):
        j = vocab_index.get(t)
        if j is not None:
            mat[r, j] = 1
    return mat
