"""Deduplication family: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Exact dedup = content-hash column + hash groupby (one shuffle of small
keys, never of full texts). Near-dup at test scale uses a broadcast
token-set matrix (block-pairwise, the same pattern as brute-force ANN);
the documented scale path is MinHash-LSH (shingle → minhash → band →
bucket groupby), implemented below with deterministic md5-seeded
permutations.

Reference analog: drop_duplicates / duplicate-id detection
(/root/reference/src/cur-prot/redetect.py:52,
/root/reference/src/ck-duplicate-uuids.py:13-48).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..rules import normalize_whitespace
from .textstats import md5_hex

MERSENNE_P = (1 << 61) - 1


def _turn_key(conv_id: pd.Series, turn_idx: pd.Series) -> pd.Series:
    return conv_id + ":" + turn_idx.astype(str).str.zfill(6)


def dedup_exact(ds, text_col: str, key_cols: list[str], key_fn=None):
    """Group rows by content hash of `text_col`; per group keep the count and
    the minimum composite key (first-wins dedup)."""
    from ray.data.aggregate import Count, Min

    def add_fp(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["fp"] = md5_hex(batch[text_col].tolist())
        batch["key"] = (
            key_fn(batch) if key_fn else batch[key_cols[0]]
        )
        return batch[["fp", "key"]]

    return (
        ds.map_batches(add_fp, batch_format="pandas")
        .groupby("fp")
        .aggregate(Min("key", alias_name="first_key"), Count(alias_name="n_dupes"))
    )


def token_hashes(tokens: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hashes (md5 prefix) for an array of tokens."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            for t in tokens
        ],
        dtype=np.uint64,
    )


class MinHasher:
    """k permutations h_i(x) = (a_i*x + b_i) mod p over 64-bit token hashes,
    banded for LSH. Deterministic (fixed seed)."""

    def __init__(self, k: int = 64, bands: int = 16, seed: int = 12345):
        assert k % bands == 0
        rng = np.random.default_rng(seed)
        self.k, self.bands, self.rows = k, bands, k // bands
        self.a = rng.integers(1, MERSENNE_P, size=k, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE_P, size=k, dtype=np.uint64)

    def signature(self, tok_hashes: np.ndarray) -> np.ndarray:
        if len(tok_hashes) == 0:
            return np.full(self.k, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (k, n): permuted hash values, min over tokens
        x = tok_hashes.astype(object)[None, :]
        perms = (self.a.astype(object)[:, None] * x + self.b.astype(object)[:, None]) % MERSENNE_P
        return np.array([min(row) for row in perms], dtype=np.uint64)

    def band_keys(self, sig: np.ndarray) -> list[str]:
        return [
            hashlib.md5(sig[i * self.rows : (i + 1) * self.rows].tobytes()).hexdigest()
            for i in range(self.bands)
        ]


def minhash_candidates(docs_ds, hasher: MinHasher | None = None):
    """MinHash-LSH near-dup candidates: per-doc signature → (band_id,
    band_hash, doc_id) rows → bucket groupby → intra-bucket pairs."""
    hasher = hasher or MinHasher()

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        from ..tokens import explode

        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        out_doc, out_band, out_hash = [], [], []
        doc_ids = batch["doc_id"].to_numpy()
        for i, doc in enumerate(doc_ids):
            th = token_hashes(np.unique(toks[rows == i]))
            sig = hasher.signature(th)
            for b, key in enumerate(hasher.band_keys(sig)):
                out_doc.append(int(doc))
                out_band.append(b)
                out_hash.append(key)
        return pd.DataFrame(
            {"band_id": out_band, "band_hash": out_hash, "doc_id": out_doc}
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    pairs = (
        docs_ds.map_batches(to_bands, batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # distinct pairs (a doc pair may collide in several bands)
    from ray.data.aggregate import Count

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))


def simhash_docs(docs_ds):
    """64-bit SimHash per document (token md5 bits, count-weighted)."""

    def sim(batch: pd.DataFrame) -> pd.DataFrame:
        from ..tokens import explode

        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        out = []
        for i in range(len(batch)):
            t = toks[rows == i]
            if len(t) == 0:
                out.append("0" * 16)
                continue
            vals, cnts = np.unique(t, return_counts=True)
            hs = token_hashes(vals)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                np.int64
            )
            acc = ((2 * bits - 1) * cnts[:, None].astype(np.int64)).sum(axis=0)
            h = np.uint64(0)
            for j in range(64):
                if acc[j] > 0:
                    h |= np.uint64(1) << np.uint64(j)
            out.append(format(int(h), "016x"))
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "simhash": out})

    return docs_ds.map_batches(sim, batch_format="pandas")


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
