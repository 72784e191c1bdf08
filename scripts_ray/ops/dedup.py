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
import pyarrow.compute as pc

from .hashagg import hash_aggregate, map_partitions_by_key, run_pair_indices


def _turn_key(conv_id: pd.Series, turn_idx: pd.Series) -> pd.Series:
    return conv_id + ":" + turn_idx.astype(str).str.zfill(6)


_FP_KEY_2 = "fedcba9876543210"  # second independent siphash key (16 bytes)


def content_fingerprints(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """128-bit vectorized content fingerprint: two independent fixed-key
    siphash streams over the text column (no per-row Python in the hot
    path; combined collision odds ~2⁻¹²⁸ · n²)."""
    arr = values.to_numpy(dtype=object)
    return (
        pd.util.hash_array(arr).view(np.int64),
        pd.util.hash_array(arr, hash_key=_FP_KEY_2).view(np.int64),
    )


def dedup_exact(ds, text_col: str, key_cols: list[str], key_fn=None):
    """Group rows by 128-bit content fingerprint of `text_col`; per group
    keep the count and the minimum composite key (first-wins dedup). Key
    cardinality ≈ row count, so this uses the two-level hash aggregate, not
    the sort-based native groupby; the shuffle moves (fp, key) partials
    only. The fingerprint is internal — output is (first_key, n_dupes),
    matching the oracle's group-by-text restatement."""

    def add_fp(batch: pd.DataFrame) -> pd.DataFrame:
        fp1, fp2 = content_fingerprints(batch[text_col])
        return pd.DataFrame(
            {
                "fp1": fp1,
                "fp2": fp2,
                "key": key_fn(batch) if key_fn else batch[key_cols[0]],
            }
        )

    return hash_aggregate(
        ds.map_batches(add_fp, batch_format="pandas"),
        keys=["fp1", "fp2"],
        aggs={"first_key": ("key", "min"), "n_dupes": ("key", "count")},
    ).select_columns(["first_key", "n_dupes"])


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
        return self.signatures_from_hashes(
            np.zeros(len(tok_hashes), dtype=np.int64), tok_hashes, 1
        )[0]

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
        # Per-permutation loop with one reused (t,) scratch buffer instead
        # of the (t, k) perms matrix: this host charges ~0.5 ms/page for
        # freshly faulted memory (hypervisor free-page reporting), so a
        # ~100 MB fresh allocation per batch costs SECONDS; small reused
        # buffers amortize to nothing. Arithmetic runs on int64 views
        # (wraparound bits are identical to uint64); the unsigned min
        # ordering is preserved by XOR-flipping the sign bit before the
        # segmented min and flipping back after. Bit-exact with the old
        # matrix formulation (asserted in tests).
        sigs = np.full((n, self.k), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(th) == 0:
            return sigs
        present, starts = np.unique(rows, return_index=True)
        thi = th.view(np.int64)
        ai = self.a.view(np.int64).tolist()
        bi = self.b.view(np.int64).tolist()
        sign = np.int64(-0x8000000000000000)
        perm = np.empty(len(th), dtype=np.int64)
        with np.errstate(over="ignore"):
            for k in range(self.k):
                np.multiply(thi, ai[k], out=perm)
                np.add(perm, bi[k], out=perm)
                np.bitwise_xor(perm, sign, out=perm)
                m = np.minimum.reduceat(perm, starts)
                np.bitwise_xor(m, sign, out=m)
                sigs[present, k] = m.view(np.uint64)
        return sigs

    def band_keys_matrix(self, sigs: np.ndarray) -> np.ndarray:
        """(n, bands) band-bucket keys: modular combination of the band's
        signature rows under M = 2^31-1 — SQL-reproducible (the oracle
        recomputes the identical keys), collision odds ~2^-31 per pair per
        band, and any false bucket collision only ADDS a candidate pair,
        which downstream exact verification removes. Accumulation applies
        % M after every addition so uint64 never overflows."""
        assert self.rows <= len(BAND_MULTS)
        n = sigs.shape[0]
        M = np.uint64(WINNOW_M)
        out = np.empty((n, self.bands), dtype=np.uint64)
        acc = np.empty(n, dtype=np.uint64)
        term = np.empty(n, dtype=np.uint64)
        for b in range(self.bands):
            acc[:] = 0
            for r in range(self.rows):
                np.mod(sigs[:, b * self.rows + r], M, out=term)
                np.multiply(term, np.uint64(BAND_MULTS[r]), out=term)
                np.add(acc, term, out=acc)
                np.mod(acc, M, out=acc)
            out[:, b] = acc
        return out


def _expand_bucket_pairs_part(part: pd.DataFrame) -> pd.DataFrame:
    """Vectorized intra-bucket pair expansion over one hash partition of
    (band_id, band_hash, doc_id) rows holding COMPLETE buckets.

    One Python call per *partition* (constant count), never per bucket:
    rows are sorted by (band_id, band_hash, doc_id), bucket runs are found
    by vectorized change detection, and all (a < b) pairs of every bucket
    are emitted with one fancy-index + ``np.triu_indices`` pass per
    DISTINCT bucket size (few in practice). This replaces the native
    ``groupby(["band_id", "band_hash"]).map_groups`` whose per-group driver
    overhead (~ms/group at bucket cardinality ≈ docs × bands) is the
    documented scale cliff.

    Skew note: a bucket of m docs emits m(m-1)/2 pairs — hot buckets
    (boilerplate-identical docs) grow output quadratically. That is
    inherent to LSH candidate generation (the pairs ARE the output), but a
    partition must still fit a worker heap: raise ``num_partitions`` with
    corpus size, and pre-dedup exact duplicates before near-dup at scale.
    """
    part = part.drop_duplicates(["band_id", "band_hash", "doc_id"])
    part = part.sort_values(["band_id", "band_hash", "doc_id"], kind="mergesort")
    ids = part["doc_id"].to_numpy(dtype=np.int64)
    empty = pd.DataFrame(
        {"doc_a": np.array([], dtype=np.int64), "doc_b": np.array([], dtype=np.int64)}
    )
    if len(ids) == 0:
        return empty
    bid = part["band_id"].to_numpy()
    bh = part["band_hash"].to_numpy()
    new = np.empty(len(ids), dtype=bool)
    new[0] = True
    new[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
    ia, ib = run_pair_indices(new)
    if len(ia) == 0:
        return empty
    return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})


def band_pairs(bands_ds, num_partitions: int = 64):
    """(band_id, band_hash, doc_id) rows → distinct candidate doc pairs with
    the number of colliding bands. Bucket expansion runs on the two-level
    hash exchange (`map_partitions_by_key`), then a second hash aggregate
    dedups pairs that collide in several bands — both stages safe at
    unbounded bucket/pair cardinality."""
    pairs = map_partitions_by_key(
        bands_ds,
        ["band_id", "band_hash"],
        _expand_bucket_pairs_part,
        num_partitions=num_partitions,
    )
    return hash_aggregate(
        pairs, keys=["doc_a", "doc_b"], aggs={"n_bands": ("doc_a", "count")}
    )


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
        if shingle_n == 3:
            # SQL-reproducible 3-shingle fingerprints (same scheme as
            # winnowing) so the oracle can recompute signatures exactly
            srows, sh = winnow_shingle_fps(rows, toks)
            sh = sh.view(np.uint64)
            if len(sh):
                uniq = pd.DataFrame({"r": srows, "h": sh}).drop_duplicates()
                srows, sh = uniq["r"].to_numpy(), uniq["h"].to_numpy()
            sigs = hasher.signatures_from_hashes(srows, sh, len(batch))
        elif shingle_n > 1:
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

    return band_pairs(docs_ds.map_batches(to_bands, batch_format="pandas"))


SQLMIX_ADD = 0x9E3779B97F4A7C15
SQLMIX_M1 = 0xBF58476D1CE4E5B9
SQLMIX_M2 = 0x94D049BB133111EB


def sql_mix64(t: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants) over non-negative
    int64 inputs — full-avalanche 64-bit mixing that the SQL oracle
    reproduces exactly (sql_ops generates the identical chain in HUGEINT
    arithmetic: add/mulmod 2^64 + sign-bit-safe xorshift)."""
    z = t.astype(np.uint64)
    with np.errstate(over="ignore"):
        z += np.uint64(SQLMIX_ADD)
        z ^= z >> np.uint64(30)
        z *= np.uint64(SQLMIX_M1)
        z ^= z >> np.uint64(27)
        z *= np.uint64(SQLMIX_M2)
        z ^= z >> np.uint64(31)
    return z


def simhash_docs(docs_ds):
    """64-bit SimHash per document (count-weighted ±1 votes per token
    occurrence), vectorized across the whole batch. The token hash is
    sql_mix64(winnow_token_hashes(...)) — fully SQL-reproducible, so the
    DuckDB oracle (sql_ops.SIMHASH_DOCS_SQL) recomputes the identical
    simhash value per document, and the band-bucket candidate pairs
    (sql_ops.SIMHASH_PAIRS_SQL) are value-checked too."""

    def sim(batch: pd.DataFrame) -> pd.DataFrame:
        from ..tokens import explode

        n = len(batch)
        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        out = np.zeros(n, dtype=np.uint64)
        if len(toks):
            # per-bit loop with reused (t,) scratch instead of a (t, 64)
            # bit matrix — fresh large allocations stall on this host
            # (see signatures_from_hashes); identical results.
            hs = sql_mix64(winnow_token_hashes(toks)).view(np.int64)  # (t,)
            present, starts = np.unique(rows, return_index=True)
            bit = np.empty(len(hs), dtype=np.int64)
            acc_out = np.zeros(len(present), dtype=np.uint64)
            for j in range(64):
                np.right_shift(hs, j, out=bit)
                np.bitwise_and(bit, 1, out=bit)
                np.multiply(bit, 2, out=bit)
                np.subtract(bit, 1, out=bit)  # ±1 per occurrence
                acc = np.add.reduceat(bit, starts)
                np.bitwise_or(
                    acc_out,
                    (acc > 0).astype(np.uint64) << np.uint64(j),
                    out=acc_out,
                )
            out[present] = acc_out
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
    value are candidates. Pigeonhole guarantee: documents with Hamming
    distance < `bands` (i.e. ≤ 3 for bands=4) always share at least one
    identical band — that coverage invariant is what
    `simhash_band_coverage` oracle-checks. Same bucket-exchange →
    intra-bucket pair → hash-aggregate shape as MinHash."""
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

    return band_pairs(
        simhash_docs(docs_ds).map_batches(to_bands, batch_format="pandas")
    )


# Winnowing uses a hash the SQL oracle can recompute exactly (unlike the
# siphash streams elsewhere): token hash = sum of the first 8 codepoints
# weighted by falling powers of 131, plus the char length (max ~8.3e16,
# exact in int64 and in DuckDB BIGINT); shingle fp = modular combination
# of 3 consecutive token hashes under M = 2^31-1 (every intermediate fits
# uint64 on the numpy side and HUGEINT on the DuckDB side).
WINNOW_POWS = tuple(int(131**e) for e in range(7, -1, -1))
WINNOW_M = 2147483647  # 2^31 - 1
WINNOW_MULTS = (1000003, 998244353, 69069)
# per-row multipliers for MinHasher.band_keys_matrix (all < 2^31 so each
# (sig % M) * mult term stays < 2^62 in uint64); 16 entries cover every
# legal MinHasher config up to rows-per-band = 16 (e.g. k=64, bands=4)
BAND_MULTS = (
    1000003, 998244353, 69069, 1299721, 7772777, 65537, 1073741827, 179424673,
    15485863, 32452843, 49979687, 67867967, 86028121, 104395301, 122949823,
    141650939,
)
_WPOW = np.array(WINNOW_POWS, dtype=np.int64)


def winnow_token_hashes(toks: np.ndarray) -> np.ndarray:
    """SQL-reproducible per-token hash: codepoints of the first 8 chars
    dotted with WINNOW_POWS, plus the full char length. Vectorized via a
    fixed-width UCS4 view (no per-token Python)."""
    if len(toks) == 0:
        return np.array([], dtype=np.int64)
    codes = np.asarray(toks, dtype="U8").view(np.uint32).reshape(len(toks), 8)
    lens = pc.utf8_length(pa.array(toks, type=pa.string())).to_numpy(
        zero_copy_only=False
    )
    return codes.astype(np.int64) @ _WPOW + lens.astype(np.int64)


def winnow_shingle_fps(rows: np.ndarray, toks: np.ndarray):
    """(row, fp) for every 3-token shingle fully inside one row, with the
    modular SQL-reproducible combination of winnow_token_hashes."""
    th = winnow_token_hashes(toks)
    L = len(th)
    if L < 3:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    a = (th % WINNOW_M).astype(np.uint64)
    m0, m1, m2 = (np.uint64(m) for m in WINNOW_MULTS)
    fp = (a[: L - 2] * m0 + a[1 : L - 1] * m1 + a[2:] * m2) % np.uint64(WINNOW_M)
    valid = rows[: L - 2] == rows[2:]
    return rows[: L - 2][valid], fp[valid].astype(np.int64)


def winnow_fingerprints(docs_ds, window: int = 4):
    """Document fingerprinting by winnowing (the MOSS scheme): rolling
    hashes of token 3-grams, then the minimum hash of every sliding window
    of `window` consecutive shingles — guaranteeing any shared substring of
    ≥ window+2 tokens contributes at least one common fingerprint.
    Emits exploded (doc_id, fp) rows, deduplicated per doc. The hash is
    SQL-expressible (winnow_token_hashes/winnow_shingle_fps), so the
    DuckDB oracle (sql_ops.DOC_WINNOW_SQL) recomputes the identical
    fingerprint set; the containment invariant (exact duplicate docs share
    the exact fingerprint set) is additionally asserted in tests."""

    def winnow(batch: pd.DataFrame) -> pd.DataFrame:
        from ..tokens import explode

        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        srows, sh = winnow_shingle_fps(rows, toks)
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        out_ids, out_fps = [], []
        if len(sh):
            starts = np.searchsorted(srows, np.arange(len(batch)))
            ends = np.searchsorted(srows, np.arange(len(batch)), side="right")
            for i in range(len(batch)):
                h = sh[starts[i] : ends[i]]
                if len(h) == 0:
                    continue
                if len(h) <= window:
                    fps = np.unique(h.min(keepdims=True))
                else:
                    sw = np.lib.stride_tricks.sliding_window_view(h, window)
                    fps = np.unique(sw.min(axis=1))
                out_ids.append(np.full(len(fps), ids[i], dtype=np.int64))
                out_fps.append(fps)
        if not out_ids:
            return pd.DataFrame(
                {"doc_id": np.array([], dtype=np.int64),
                 "fp": np.array([], dtype=np.uint64).view(np.int64)}
            )
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(out_ids),
                "fp": np.concatenate(out_fps).view(np.int64),
            }
        )

    return docs_ds.map_batches(winnow, batch_format="pandas")


def doc_token_hash_sets(docs_ds, id_col: str = "doc_id"):
    """Per-document DISTINCT token-hash set, encoded as one binary blob of
    sorted uint64 siphashes per row (compact, join-friendly: a plain bytes
    column travels through the distributed hash join with no list-type
    edge cases). Columns: (`id_col`, th: binary, n_toks: int64)."""

    def enc(batch: pa.Table) -> pd.DataFrame:
        from ..tokens import explode

        n = len(batch)
        rows, toks = explode(batch["text"].combine_chunks())
        blobs = [b""] * n
        ns = np.zeros(n, dtype=np.int64)
        if len(toks):
            th = token_hashes(toks)
            order = np.lexsort((th, rows))
            r, h = rows[order], th[order]
            keep = np.empty(len(h), dtype=bool)
            keep[0] = True
            keep[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
            r, h = r[keep], h[keep]
            starts = np.searchsorted(r, np.arange(n))
            ends = np.searchsorted(r, np.arange(n), side="right")
            for i in range(n):
                seg = h[starts[i] : ends[i]]
                blobs[i] = seg.tobytes()
                ns[i] = len(seg)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
                "th": blobs,
                "n_toks": ns,
            }
        )

    return docs_ds.map_batches(enc, batch_format="pyarrow")


def doc_shingle_hash_sets(docs_ds, id_col: str = "doc_id"):
    """Per-document DISTINCT 3-token winnow-shingle fingerprint set in the
    same sorted-uint64-blob encoding as ``doc_token_hash_sets``, so
    ``verify_pairs_exact`` verifies SHINGLE Jaccard unchanged (the
    granularity production near-dup dedup actually uses — unigram token
    sets degenerate on small vocabularies). Columns: (`id_col`, th,
    n_toks)."""

    def enc(batch: pd.DataFrame) -> pd.DataFrame:
        from ..tokens import explode

        n = len(batch)
        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        srows, fps = winnow_shingle_fps(rows, toks)
        blobs = [b""] * n
        ns = np.zeros(n, dtype=np.int64)
        if len(fps):
            h = fps.astype(np.uint64)
            order = np.lexsort((h, srows))
            r, h = srows[order], h[order]
            keep = np.empty(len(h), dtype=bool)
            keep[0] = True
            keep[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
            r, h = r[keep], h[keep]
            starts = np.searchsorted(r, np.arange(n))
            ends = np.searchsorted(r, np.arange(n), side="right")
            for i in range(n):
                seg = h[starts[i] : ends[i]]
                blobs[i] = seg.tobytes()
                ns[i] = len(seg)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(dtype=np.int64),
                "th": blobs,
                "n_toks": ns,
            }
        )

    return docs_ds.map_batches(enc, batch_format="pandas")


def verify_pairs_exact(
    pairs_ds, toks_a_ds, toks_b_ds, threshold_num: int = 2, threshold_den: int = 1
):
    """Exact token-set Jaccard verification of candidate pairs — the
    standard LSH-then-verify production shape: the candidate pair list is
    joined (distributed hash join, both sides exchanged — no corpus-wide
    broadcast) against the per-doc token-hash sets for each end, then the
    intersection is computed per pair from the two sorted hash arrays.
    Emits (doc_a, doc_b, inter, uni) for threshold_num*inter >=
    threshold_den*uni. Token-hash intersections equal token-string
    intersections barring 64-bit siphash collisions (~n²/2⁶⁵ per doc pair).

    `toks_a_ds` / `toks_b_ds` are two instances of
    ``doc_token_hash_sets(...)`` (each side of the join consumes one).
    """
    from .hashagg import hash_join

    def rename(side: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.rename(
                columns={"doc_id": f"doc_{side}", "th": f"th_{side}",
                         "n_toks": f"n_{side}"}
            )

        return f

    joined = hash_join(
        hash_join(
            pairs_ds.select_columns(["doc_a", "doc_b"]),
            toks_a_ds.map_batches(rename("a"), batch_format="pandas"),
            on="doc_a",
        ),
        toks_b_ds.map_batches(rename("b"), batch_format="pandas"),
        on="doc_b",
    )

    def jac(batch: pd.DataFrame) -> pd.DataFrame:
        inter = np.fromiter(
            (
                len(
                    np.intersect1d(
                        np.frombuffer(a, dtype=np.uint64),
                        np.frombuffer(b, dtype=np.uint64),
                        assume_unique=True,
                    )
                )
                for a, b in zip(batch["th_a"], batch["th_b"])
            ),
            dtype=np.int64,
            count=len(batch),
        )
        uni = batch["n_a"].to_numpy(dtype=np.int64) + batch["n_b"].to_numpy(
            dtype=np.int64
        ) - inter
        out = pd.DataFrame(
            {
                "doc_a": batch["doc_a"].to_numpy(dtype=np.int64),
                "doc_b": batch["doc_b"].to_numpy(dtype=np.int64),
                "inter": inter,
                "uni": uni,
            }
        )
        return out.loc[threshold_num * out["inter"] >= threshold_den * out["uni"]]

    return joined.map_batches(jac, batch_format="pandas")


# High-recall hasher for the oracle-checked verified path: 2-row bands make
# a Jaccard≥0.5 pair miss all 64 bands with probability (1 - 0.5²)⁶⁴ ≈ 1e-8
# — deterministic on the fixed seed, validated against the exact oracle.
VERIFY_HASHER_KWARGS = dict(k=128, bands=64, seed=20240817)


def _popcount64(x: np.ndarray) -> np.ndarray:
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x)
    v = x.view(np.uint8).reshape(*x.shape, 8)
    return np.unpackbits(v, axis=-1).sum(axis=-1)


def simhash_band_coverage(docs_ds, candidates_ds, bands: int = 4):
    """Oracle-checkable LSH invariant (pigeonhole): every doc pair with
    Hamming(simhash) < `bands` MUST appear in the bit-band candidate set —
    a banding implementation bug (wrong slicing, lost bucket) breaks this
    deterministically. Returns one row (n_missed,); the oracle asserts
    n_missed = 0, the mathematically guaranteed value (the close-pair and
    candidate counts themselves are hash-valued and so not
    SQL-restatable — the invariant is).

    The all-pairs Hamming scan is the test-scale verifier twin (quadratic
    by design, like the exact-Jaccard oracle); the candidate set under
    check is the scale path."""
    sims = simhash_docs(docs_ds).to_pandas()
    ids = sims["doc_id"].to_numpy(dtype=np.int64)
    h = np.array([np.uint64(int(s, 16)) for s in sims["simhash"]], dtype=np.uint64)
    order = np.argsort(ids)
    ids, h = ids[order], h[order]
    xor = np.bitwise_xor.outer(h, h)
    close = _popcount64(xor) < bands
    ai, bi = np.nonzero(np.triu(close, k=1))
    close_pairs = set(zip(ids[ai].tolist(), ids[bi].tolist()))
    cand = candidates_ds.to_pandas()
    cand_pairs = set(
        zip(cand["doc_a"].astype(np.int64).tolist(),
            cand["doc_b"].astype(np.int64).tolist())
    )
    missed = close_pairs - cand_pairs
    return pa.table({"n_missed": pa.array([len(missed)], type=pa.int64())})


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


# ---- Corpus-frequent shingle boilerplate filter ----------------------------

BOILER_MIN_DOCS = 3  # absolute floor for "boilerplate" document frequency
BOILER_MIN_DF_PERMILLE = 6  # ...and at least this fraction of the corpus
BOILER_MAX_PERMILLE = 500  # drop docs with >= this fraction boilerplate


def doc_shingle_set(docs_ds):
    """Distinct (doc_id, fp) per document over the SQL-reproducible
    3-token winnow shingle fingerprints. A document's shingles all live in
    its own batch row, so within-doc dedup is local — no exchange."""

    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        from ..tokens import explode

        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        srows, fps = winnow_shingle_fps(rows, toks)
        if len(fps) == 0:
            return pd.DataFrame(
                {"doc_id": np.array([], dtype=np.int64),
                 "fp": np.array([], dtype=np.int64)}
            )
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"doc_id": ids[srows], "fp": fps}).drop_duplicates(
            ignore_index=True
        )

    return docs_ds.map_batches(emit, batch_format="pandas")


def curation_signals(
    texts, eval_fps_sorted: np.ndarray | None = None
) -> dict[str, np.ndarray]:
    """ONE explode + shingle pass returning every per-doc array the
    curation gates consume — the single source of truth shared by
    `textstats.doc_repetition`, `decontaminate` and the fused
    `curate_mix` pipeline (duplicated kernels drift: an early fused copy
    used the positional shingle count in the contamination ratio where
    the standalone gate uses the distinct count).

    Returns: n_tok (token positions), top_tok (modal token count),
    n_sh_pos (shingle positions), n_sh_dist (distinct shingles), n_hit
    (distinct shingles present in the sorted `eval_fps_sorted`; zeros
    when not supplied)."""
    from ..tokens import explode

    n = len(texts)
    rows, toks = explode(pa.array(list(texts), type=pa.string()))
    n_tok = (
        np.bincount(rows, minlength=n).astype(np.int64)
        if len(toks)
        else np.zeros(n, dtype=np.int64)
    )
    top_tok = np.zeros(n, dtype=np.int64)
    if len(toks):
        cnt = (
            pd.DataFrame({"r": rows, "t": toks})
            .groupby(["r", "t"], sort=False)
            .size()
        )
        m = cnt.groupby(level=0).max()
        top_tok[m.index.to_numpy()] = m.to_numpy()
    srows, fps = winnow_shingle_fps(rows, toks)
    n_sh_pos = np.zeros(n, dtype=np.int64)
    n_sh_dist = np.zeros(n, dtype=np.int64)
    n_hit = np.zeros(n, dtype=np.int64)
    if len(fps):
        n_sh_pos = np.bincount(srows, minlength=n).astype(np.int64)
        dd = pd.DataFrame({"r": srows, "f": fps}).drop_duplicates()
        r, f = dd["r"].to_numpy(), dd["f"].to_numpy()
        c = dd.groupby("r").size()
        n_sh_dist[c.index.to_numpy()] = c.to_numpy()
        if eval_fps_sorted is not None and len(eval_fps_sorted):
            pos = np.searchsorted(eval_fps_sorted, f)
            pos[pos >= len(eval_fps_sorted)] = len(eval_fps_sorted) - 1
            hit = eval_fps_sorted[pos] == f
            n_hit = np.bincount(r[hit], minlength=n).astype(np.int64)
    return {
        "n_tok": n_tok,
        "top_tok": top_tok,
        "n_sh_pos": n_sh_pos,
        "n_sh_dist": n_sh_dist,
        "n_hit": n_hit,
    }


def eval_shingle_fps(docs_ds, eval_mod: int = 97) -> np.ndarray:
    """Sorted distinct shingle fingerprints of the eval slice. The
    distinct runs IN-CLUSTER (two-level hash distinct on fp) so the
    driver receives one row per DISTINCT fingerprint — not one per
    (eval doc, shingle) pair, which at corpus scale multiplies the
    transfer by the docs-per-fp factor."""
    from .hashagg import distinct

    def is_eval(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["doc_id"] % eval_mod == 0]

    shv = doc_shingle_set(docs_ds.map_batches(is_eval, batch_format="pandas"))
    return np.sort(
        distinct(shv.select_columns(["fp"]), "fp").to_pandas()["fp"].to_numpy()
    )


def boilerplate_docs(
    docs_ds,
    min_docs: int = BOILER_MIN_DOCS,
    min_df_permille: int = BOILER_MIN_DF_PERMILLE,
    max_permille: int = BOILER_MAX_PERMILLE,
):
    """Corpus-level boilerplate filter (the line-dedup analog of CCNet /
    RefinedWeb-style curation, over shingles since this corpus has no line
    structure): a document's boilerplate fraction is the share of its
    DISTINCT 3-token shingles whose corpus document frequency reaches
    max(`min_docs`, ceil(`min_df_permille`/1000 of all docs)); docs at or
    above `max_permille` are flagged drop. The RELATIVE threshold is what
    scales: a fixed absolute count saturates as the corpus grows (at 10x
    docs every common phrase trips it and the gate drops everything),
    while a df ratio keeps "boilerplate" meaning "unusually widespread".
    The absolute floor keeps tiny test corpora from flagging every
    singleton. Reference analog: corpus-frequency-driven curation
    (/root/reference/src/mk-wf-dict.py:17-42 builds the corpus-frequency
    dict; the reference filters on per-doc shares downstream).

    Fully distributed — no broadcast of the frequent set (its cardinality
    is corpus-dependent and unbounded at 100 TB). ONE shingle-scale
    exchange: rows are hash-partitioned by fp and each partition — which
    holds COMPLETE fp-groups — computes document frequency and filters to
    frequent-shingle hit rows in the same pass (folding the aggregate and
    the membership join that a naive plan would run as two more
    exchanges; a lazy shingle stream consumed by several downstream
    exchanges also re-executes per consumer, which made the first version
    of this operator ~10x slower). Per-doc totals need no exchange at
    all (a doc's shingles are local to its batch row), and the remaining
    aggregate + left join move only document-cardinality rows. Output:
    one row per document (docs with < 3 tokens have n_sh = 0, keep = 1)."""
    from .hashagg import hash_join, map_partitions_by_key

    # total doc count: parquet metadata / block counts only, no data read
    n_total = docs_ds.count()
    df_floor = max(min_docs, (min_df_permille * n_total + 999) // 1000)

    def freq_hits_part(part: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct (doc_id, fp), so group size == document freq
        n_docs = part.groupby("fp", sort=False)["doc_id"].transform("size")
        return part.loc[n_docs.to_numpy() >= df_floor, ["doc_id"]]

    hits = map_partitions_by_key(doc_shingle_set(docs_ds), "fp", freq_hits_part)
    n_freq = hash_aggregate(
        hits, keys="doc_id", aggs={"n_freq": ("doc_id", "count")}
    )

    def totals(batch: pd.DataFrame) -> pd.DataFrame:
        from ..tokens import explode

        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        srows, fps = winnow_shingle_fps(rows, toks)
        n_sh = np.zeros(len(batch), dtype=np.int64)
        if len(fps):
            dd = pd.DataFrame({"r": srows, "f": fps}).drop_duplicates()
            n_sh = np.bincount(dd["r"].to_numpy(), minlength=len(batch)).astype(
                np.int64
            )
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64), "n_sh": n_sh}
        )

    n_tot = docs_ds.map_batches(totals, batch_format="pandas")
    out = hash_join(
        n_tot, n_freq, on="doc_id", how="left", empty_right_cols=["n_freq"]
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        n_sh = batch["n_sh"].fillna(0).to_numpy(dtype=np.int64)
        nf = batch["n_freq"].fillna(0).to_numpy(dtype=np.int64)
        pm = np.zeros(len(batch), dtype=np.int64)
        nz = n_sh > 0
        pm[nz] = (1000 * nf[nz]) // n_sh[nz]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "n_sh": n_sh,
                "n_freq": nf,
                "boiler_permille": pm,
                "keep": (pm < max_permille).astype(np.int64),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


# ---- Benchmark decontamination ---------------------------------------------

CONTAM_EVAL_MOD = 97  # eval-set stand-in: docs with doc_id % mod == 0
CONTAM_MIN_HITS = 3  # contaminated at >= this many shared shingles...
CONTAM_MIN_PERMILLE = 50  # ...covering >= this fraction of the doc's shingles


def decontaminate(
    docs_ds,
    eval_mod: int = CONTAM_EVAL_MOD,
    min_hits: int = CONTAM_MIN_HITS,
    min_permille: int = CONTAM_MIN_PERMILLE,
):
    """Benchmark decontamination: flag training documents whose 3-token
    shingle sets overlap an evaluation suite — the standard pre-training
    hygiene step (n-gram overlap decontamination). The eval set here is
    the deterministic slice doc_id % `eval_mod` == 0, standing in for a
    benchmark suite. The verdict needs BOTH an absolute hit floor
    (`min_hits` shared shingles — one shared phrase is chance) and a
    relative one (`min_permille` of the doc's own shingles — as the eval
    suite grows with the corpus, any long document accumulates a few
    absolute hits by brute coverage, so an absolute-only rule degrades to
    flagging everything at scale).

    Unlike `boilerplate_docs` (whose frequent-shingle set is unbounded),
    an eval suite is small by construction, so the BROADCAST pattern is
    correct: its distinct shingle fingerprints are collected once on the
    driver, shipped once via ``ray.put``, and every batch resolves
    membership with a sorted-array ``searchsorted`` — no shuffle at all
    on the (huge) training side. Output: one row per NON-eval document
    with overlap tallies and the contaminated verdict."""
    import ray

    ref = ray.put(eval_shingle_fps(docs_ds, eval_mod))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        fps_sorted = ray.get(ref)
        batch = batch[batch["doc_id"] % eval_mod != 0]
        sig = curation_signals(batch["text"].tolist(), fps_sorted)
        n_sh, n_hit = sig["n_sh_dist"], sig["n_hit"]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "n_sh": n_sh,
                "n_hit": n_hit,
                "contaminated": (
                    (n_hit >= min_hits)
                    & (1000 * n_hit >= min_permille * n_sh)
                    & (n_sh > 0)
                ).astype(np.int64),
            }
        )

    return docs_ds.map_batches(score, batch_format="pandas")


# ---- cross-document repeated-substring spans (exact substring dedup) --------

DUPSPAN_W = 3  # tokens per shingle; windows merge while coverage is gap-free


def _batch_shingles(batch):
    """(shingle_row_index, fp) for every 3-token shingle of the batch's
    text column — the shared emission kernel of dup_spans / span_cut /
    source_overlap (one copy, so the winnow chain and the SQL CTE cannot
    drift per operator)."""
    from ..tokens import explode

    rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
    return winnow_shingle_fps(rows, toks)


def _emit_shingle_positions(batch: pd.DataFrame) -> pd.DataFrame:
    """(fp, doc_id, pos) per shingle; pos is the 0-based token position
    within its document via the idx - searchsorted derivation. Shared by
    dup_spans and span_cut."""
    srows, fps = _batch_shingles(batch)
    if len(srows) == 0:
        return pd.DataFrame(
            {"fp": np.array([], dtype=np.int64),
             "doc_id": np.array([], dtype=np.int64),
             "pos": np.array([], dtype=np.int64)}
        )
    ids = batch["doc_id"].to_numpy(dtype=np.int64)
    idx = np.arange(len(srows), dtype=np.int64)
    pos = idx - np.searchsorted(srows, srows)  # 0-based within doc
    return pd.DataFrame({"fp": fps, "doc_id": ids[srows], "pos": pos})


def _covered_positions(part: pd.DataFrame) -> pd.DataFrame:
    """The shared >=2-DISTINCT-document rule: keep (doc_id, pos) rows whose
    fingerprint occurs in at least two documents of the fp partition."""
    df = part.groupby("fp")["doc_id"].nunique()
    hot = df.index[df.to_numpy() >= 2]
    keep = part[part["fp"].isin(hot)]
    return keep[["doc_id", "pos"]].reset_index(drop=True)


def dup_spans(docs_ds, num_partitions: int = 64):
    """Exact substring dedup in the 'Deduplicating Training Data Makes
    Language Models Better' (Lee et al., 2022) style, at 3-token shingle
    granularity: every shingle occurring in >= 2 DISTINCT documents marks
    its 3-token window as duplicated text; per document, gap-free unions
    of marked windows merge into maximal spans — the concrete
    [span_start, span_end) token ranges a training pipeline would cut.

    Plan: one map emits (fp, doc_id, pos) per shingle (the
    SQL-reproducible winnow chain, so the oracle recomputes every
    fingerprint); exchange 1 on fp computes distinct-doc frequency per
    fingerprint IN the same pass that emits the covered (doc_id, pos)
    rows (no unbounded frequent-set broadcast — the boilerplate_docs
    lesson); exchange 2 on doc_id merges positions into islands with a
    vectorized diff scan. Only narrow integer rows cross either exchange;
    text never leaves the first map."""
    from .hashagg import map_partitions_by_key

    def spans_part(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame(
                {"doc_id": np.array([], dtype=np.int64),
                 "span_start": np.array([], dtype=np.int64),
                 "span_end": np.array([], dtype=np.int64)}
            )
        part = part.sort_values(["doc_id", "pos"], kind="mergesort")
        d = part["doc_id"].to_numpy(dtype=np.int64)
        p = part["pos"].to_numpy(dtype=np.int64)
        brk = np.ones(len(p), dtype=bool)
        brk[1:] = (d[1:] != d[:-1]) | (p[1:] - p[:-1] > DUPSPAN_W)
        starts = np.nonzero(brk)[0]
        ends = np.append(starts[1:], len(p)) - 1
        return pd.DataFrame(
            {
                "doc_id": d[starts],
                "span_start": p[starts],
                "span_end": p[ends] + DUPSPAN_W,
            }
        )

    covered = map_partitions_by_key(
        docs_ds.map_batches(_emit_shingle_positions, batch_format="pandas"),
        "fp",
        _covered_positions,
        num_partitions=num_partitions,
    )
    return map_partitions_by_key(
        covered, "doc_id", spans_part, num_partitions=num_partitions
    )


# ---- cross-source overlap matrix --------------------------------------------


def source_overlap(docs_ds, num_partitions: int = 64):
    """Source-level contamination matrix: for every pair of sources, the
    number of DISTINCT 3-token shingle fingerprints both contain — the
    corpus-curation view of "which feeds copy from each other" (the
    source-granular analog of `decontaminate`). Per batch: (fp, source)
    pairs deduplicated locally; one fp exchange; per partition a
    vectorized per-fingerprint source-pair expansion (sorted uniques →
    triu indices per run, the `band_pairs` shape — no per-group Python);
    a final bounded hash aggregate over sources² keys. Only (int64 fp,
    dictionary source) rows cross the exchange."""
    from .hashagg import hash_aggregate, map_partitions_by_key

    def emit(batch: pd.DataFrame) -> pd.DataFrame:
        srows, fps = _batch_shingles(batch)
        src = batch["source"].to_numpy(dtype=object)
        out = pd.DataFrame({"fp": fps, "source": src[srows]})
        return out.drop_duplicates(ignore_index=True)

    def pairs_part(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame(
                {"src_a": pd.Series([], dtype=object),
                 "src_b": pd.Series([], dtype=object),
                 "n": np.array([], dtype=np.int64)}
            )
        uniq_src, codes = np.unique(part["source"].to_numpy(dtype=object),
                                    return_inverse=True)
        fp = part["fp"].to_numpy(dtype=np.int64)
        order = np.lexsort((codes, fp))
        fp, codes = fp[order], codes[order]
        keep = np.ones(len(fp), dtype=bool)  # drop cross-batch dup (fp, src)
        keep[1:] = (fp[1:] != fp[:-1]) | (codes[1:] != codes[:-1])
        fp, codes = fp[keep], codes[keep]
        new = np.ones(len(fp), dtype=bool)
        new[1:] = fp[1:] != fp[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(fp))
        out_a, out_b = [], []
        for m in np.unique(ends - starts):
            if m < 2:
                continue
            runs = starts[(ends - starts) == m]
            block = codes[runs[:, None] + np.arange(m)[None, :]]
            ai, bi = np.triu_indices(m, k=1)
            out_a.append(block[:, ai].ravel())
            out_b.append(block[:, bi].ravel())
        if not out_a:
            return pd.DataFrame(
                {"src_a": pd.Series([], dtype=object),
                 "src_b": pd.Series([], dtype=object),
                 "n": np.array([], dtype=np.int64)}
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        out = (
            pd.DataFrame({"src_a": uniq_src[a], "src_b": uniq_src[b]})
            .groupby(["src_a", "src_b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return out

    per_part = map_partitions_by_key(
        docs_ds.map_batches(emit, batch_format="pandas"),
        "fp",
        pairs_part,
        num_partitions=num_partitions,
    )
    return hash_aggregate(
        per_part, keys=["src_a", "src_b"], aggs={"n_shared": ("n", "sum")}
    )


def span_cut(docs_ds_fn, num_partitions: int = 64):
    """Apply the `dup_spans` detection: emit every document with its
    cross-document duplicated windows REMOVED — (doc_id, kept_text,
    n_kept, n_cut), where kept_text is the normalized token stream (the
    shingle tokenizer's space: lowercased letter runs) minus all tokens
    covered by a shared 3-token shingle. The cut side of the Lee-et-al
    exact substring dedup.

    Plan: the covered (doc_id, pos) rows come off the same fp exchange as
    dup_spans; a doc_id exchange packs each doc's positions into ONE
    bytes blob (so the following join carries one row per doc, never
    text × positions); a distributed hash join re-unites blobs with
    text — the one full-text exchange this operator fundamentally needs,
    since coverage is a global property — and the cut itself is a pure
    vectorized map. `docs_ds_fn()` returns a fresh documents Dataset
    (consumed twice: shingle emission + join left side)."""
    from .hashagg import hash_join, map_partitions_by_key

    def pack_part(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame(
                {"doc_id": np.array([], dtype=np.int64), "pos_blob": []}
            )
        part = part.sort_values(["doc_id", "pos"], kind="mergesort")
        d = part["doc_id"].to_numpy(dtype=np.int64)
        p = part["pos"].to_numpy(dtype=np.int64)
        new = np.ones(len(d), dtype=bool)
        new[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(d))
        return pd.DataFrame(
            {
                "doc_id": d[starts],
                "pos_blob": [p[s:e].tobytes() for s, e in zip(starts, ends)],
            }
        )

    covered = map_partitions_by_key(
        docs_ds_fn().map_batches(_emit_shingle_positions, batch_format="pandas"),
        "fp",
        _covered_positions,
        num_partitions=num_partitions,
    )
    blobs = map_partitions_by_key(
        covered, "doc_id", pack_part, num_partitions=num_partitions
    )
    joined = hash_join(
        docs_ds_fn(),
        blobs,
        on="doc_id",
        how="left",
        num_partitions=num_partitions,
        empty_right_cols=["pos_blob"],
    )

    def cut(batch: pd.DataFrame) -> pd.DataFrame:
        from ..tokens import explode

        texts = batch["text"].astype(object).tolist()
        rows, toks = explode(pa.array(texts, type=pa.string()))
        n = len(batch)
        counts = np.zeros(n, dtype=np.int64)
        np.add.at(counts, rows, 1)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        keep = np.ones(len(toks), dtype=bool)
        n_cut = np.zeros(n, dtype=np.int64)
        blobs_col = batch["pos_blob"].tolist()
        for i, blob in enumerate(blobs_col):
            if not isinstance(blob, (bytes, bytearray)):  # None / NA / NaN
                continue
            p = np.frombuffer(blob, dtype=np.int64)
            m = np.zeros(counts[i], dtype=bool)
            for off in range(DUPSPAN_W):  # windows are DUPSPAN_W tokens wide
                m[np.minimum(p + off, counts[i] - 1)] = True
            keep[offsets[i] : offsets[i + 1]] = ~m
            n_cut[i] = int(m.sum())
        kept_rows = rows[keep]
        kept_toks = toks[keep]
        agg = (
            pd.Series(kept_toks)
            .groupby(kept_rows)
            .agg(" ".join)
            .reindex(range(n), fill_value="")
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "kept_text": agg.to_numpy(dtype=object),
                "n_kept": counts - n_cut,
                "n_cut": n_cut,
            }
        )

    return joined.map_batches(cut, batch_format="pandas")


# ---- corpus-level exact line dedup (RefinedWeb / CCNet line dedup) ----------
# The web-curation staple the span-level ops don't cover: an exact duplicate
# LINE (boilerplate header/footer, nav text, cookie banner) is removed from
# every document except its first occurrence corpus-wide (first = lowest
# (doc_id, line_idx)). Reference analog: the whitespace-canonicalized
# text-equality comparisons of /root/reference/src/cur-prot/dollar_sign_replace.py:26
# applied at corpus scope. The fixture has no newlines, so line structure is
# DERIVED deterministically (both engines, same rule): line 0 = a planted
# boilerplate header (doc_id % 5), then the whitespace tokens in chunks of
# LINE_TOKENS, then a planted footer (doc_id % 7) — giving real cross-doc
# duplicate lines over unique bodies.
LINE_TOKENS = 12
LINE_HEADERS = tuple(
    f"copyright h{i} all rights reserved by the publisher" for i in range(5)
)
LINE_FOOTERS = tuple(
    f"subscribe f{i} to our newsletter for daily updates" for i in range(7)
)
_LINE_PACK = 1_000_000  # line_idx < this; pack = doc_id * _LINE_PACK + line_idx


def _derive_lines(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, line_idx, line, n_lines) per derived line — vectorized:
    Arrow regex split, segmented-arange chunk offsets, and one C-level
    `binary_join` to materialize line strings (no per-line Python)."""
    from ..rules import RE_WHITESPACE

    n = len(batch)
    did = batch["doc_id"].to_numpy(dtype=np.int64)
    text = pa.array(batch["text"].astype(object), type=pa.string())
    lists = pc.split_pattern_regex(text, pattern=RE_WHITESPACE)
    flat = pc.list_flatten(lists)
    rows_all = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "")
    flat_k = flat.filter(nonempty)
    rows = rows_all[nonempty.to_numpy(zero_copy_only=False)]

    c = np.bincount(rows, minlength=n).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(c)[:-1]])
    nbody = (c + LINE_TOKENS - 1) // LINE_TOKENS
    total = int(nbody.sum())
    rep_row = np.repeat(np.arange(n), nbody)
    line_cum = np.concatenate([[0], np.cumsum(nbody)[:-1]])
    within = np.arange(total, dtype=np.int64) - np.repeat(line_cum, nbody)
    line_starts = starts[rep_row] + LINE_TOKENS * within
    offsets = np.append(line_starts, len(rows)).astype(np.int32)
    body_lines = pc.binary_join(
        pa.ListArray.from_arrays(offsets, flat_k.combine_chunks()
                                 if isinstance(flat_k, pa.ChunkedArray)
                                 else flat_k),
        " ",
    ).to_pandas()

    n_lines = nbody + 2
    hdr = np.array(LINE_HEADERS, dtype=object)[did % len(LINE_HEADERS)]
    ftr = np.array(LINE_FOOTERS, dtype=object)[did % len(LINE_FOOTERS)]
    return pd.concat(
        [
            pd.DataFrame(
                {"doc_id": did, "line_idx": np.int64(0), "line": hdr,
                 "n_lines": n_lines}
            ),
            pd.DataFrame(
                {"doc_id": did[rep_row], "line_idx": within + 1,
                 "line": body_lines, "n_lines": n_lines[rep_row]}
            ),
            pd.DataFrame(
                {"doc_id": did, "line_idx": nbody + 1, "line": ftr,
                 "n_lines": n_lines}
            ),
        ],
        ignore_index=True,
    )


def line_dedup(docs_ds, num_partitions: int = 64):
    """Corpus-wide exact line dedup: keep each distinct line's first
    occurrence, reassemble per-doc deduplicated text. Emits (doc_id,
    n_lines, n_kept, text_dedup).

    Plan: derive lines (pure map) → 128-bit content fingerprint → ONE fp
    exchange where each partition holds complete fingerprint groups and a
    C-kernel groupby-idxmin picks the winner → ONE doc_id exchange to
    reassemble surviving lines in order. Both exchanges carry each line's
    text exactly once — the floor for any exact line dedup (CCNet pays the
    same); all other columns are narrow ints."""
    from .hashagg import map_partitions_by_key

    def add_fp(batch: pd.DataFrame) -> pd.DataFrame:
        lines = _derive_lines(batch)
        fp1, fp2 = content_fingerprints(lines["line"])
        return lines.assign(fp1=fp1, fp2=fp2)

    def keep_first(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame(
                {
                    "doc_id": np.array([], dtype=np.int64),
                    "line_idx": np.array([], dtype=np.int64),
                    "line": np.array([], dtype=object),
                    "n_lines": np.array([], dtype=np.int64),
                }
            )
        line_idx = part["line_idx"].to_numpy()
        if line_idx.max() >= _LINE_PACK:
            raise ValueError(
                f"line_idx {line_idx.max()} >= _LINE_PACK {_LINE_PACK}: "
                "packed first-occurrence order would diverge from the "
                "(doc_id, line_idx) oracle order — raise _LINE_PACK"
            )
        pack = part["doc_id"].to_numpy() * _LINE_PACK + line_idx
        idx = (
            part.assign(_pack=pack)
            .groupby(["fp1", "fp2"], sort=False)["_pack"]
            .idxmin()
        )
        return part.loc[idx, ["doc_id", "line_idx", "line", "n_lines"]]

    def assemble(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame(
                {
                    "doc_id": np.array([], dtype=np.int64),
                    "n_lines": np.array([], dtype=np.int64),
                    "n_kept": np.array([], dtype=np.int64),
                    "text_dedup": np.array([], dtype=object),
                }
            )
        part = part.sort_values(["doc_id", "line_idx"], kind="mergesort")
        g = part.groupby("doc_id", sort=False)
        out = pd.DataFrame(
            {
                "n_lines": g["n_lines"].first(),
                "n_kept": g.size().astype(np.int64),
                "text_dedup": g["line"].agg("\n".join),
            }
        ).reset_index()
        return out[["doc_id", "n_lines", "n_kept", "text_dedup"]]

    survivors = map_partitions_by_key(
        docs_ds.map_batches(add_fp, batch_format="pandas"),
        ["fp1", "fp2"],
        keep_first,
        num_partitions=num_partitions,
    )
    return map_partitions_by_key(
        survivors, "doc_id", assemble, num_partitions=num_partitions
    )


# ---- whole-conversation exact dedup -------------------------------------------

CONV_DUP_MOD = 3  # every 3rd conversation gets a planted '-dup' replica


def plant_conv_dups(transcripts_ds):
    """Planted-artifact stage (the plant_gopher/plant_pii convention):
    replicate every CONV_DUP_MOD-th conversation's turn rows under
    `conv_id || '-dup'` so the dedup path below has known collisions to
    find — the fixture's 15/150 conversations are all genuinely
    distinct. A pure per-batch map: a turn row's replica depends only on
    the row itself."""

    def dup(batch: pd.DataFrame) -> pd.DataFrame:
        uid = batch["conv_id"].str.slice(5).astype(np.int64)
        sel = batch[uid % CONV_DUP_MOD == 0].copy()
        sel["conv_id"] = sel["conv_id"] + "-dup"
        return pd.concat([batch, sel], ignore_index=True)

    return transcripts_ds.map_batches(dup, batch_format="pandas")


def conv_dedup(transcripts_ds):
    """Whole-conversation exact dedup — the chat-corpus counterpart of
    doc-level `dedup_docs` (two sessions that replayed the identical
    exchange should train once): fingerprint = md5 of the turn_idx-ordered
    'role|text' stream (one md5 per CONVERSATION, bounded by conv count;
    DuckDB byte-parity via string_agg ORDER BY), then first-wins on the
    fingerprint with the observed multiplicity. Two exchanges, both
    narrow: the conv_id exchange carries turn rows exactly once (the same
    atomic-conversation contract as every window op), the fp exchange one
    row per conversation. Emits (fp, conv_id, n_dupes) for survivors."""
    from ..ops.textstats import md5_hex
    from .hashagg import hash_aggregate, map_partitions_by_key

    def fp_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        line = part["role"].astype(str) + "|" + part["text"].astype(str)
        blob = (
            pd.DataFrame({"conv_id": part["conv_id"], "line": line})
            .groupby("conv_id", sort=False)["line"]
            .agg("\x1f".join)
        )
        return pd.DataFrame(
            {"conv_id": blob.index.to_numpy(dtype=object),
             "fp": md5_hex(blob.tolist())}
        )

    fps = map_partitions_by_key(transcripts_ds, "conv_id", fp_part)
    return hash_aggregate(
        fps,
        keys=["fp"],
        aggs={"conv_id": ("conv_id", "min"), "n_dupes": ("conv_id", "count")},
    )


def dup_rate_by_source(docs_ds):
    """Duplicate-rate report per source (where is the crawl dirtiest —
    the triage view that decides which source gets the aggressive dedup
    budget): exact distinct-content counts per source via the SAME
    128-bit content fingerprints as dedup_docs (their oracle pins the
    fp ≡ normalized-text equivalence). One (source, fp) exchange at
    distinct-content cardinality — the first-level combiner already
    collapses within-batch repeats — then a bounded per-source fold.
    Emits (source, n_docs, n_distinct, dup_permille)."""
    from ..rules import normalize_whitespace
    from .hashagg import hash_aggregate

    def add_fp(batch: pa.Table) -> pd.DataFrame:
        norm = normalize_whitespace(batch["text"].combine_chunks())
        fp1, fp2 = content_fingerprints(pd.Series(norm.to_pandas()))
        return pd.DataFrame(
            {
                "source": batch["source"].to_numpy(zero_copy_only=False),
                "fp1": fp1,
                "fp2": fp2,
            }
        )

    per_fp = hash_aggregate(
        docs_ds.map_batches(add_fp, batch_format="pyarrow"),
        keys=["source", "fp1", "fp2"],
        aggs={"n": ("fp1", "count")},
    )
    per_src = hash_aggregate(
        per_fp,
        keys=["source"],
        aggs={"n_docs": ("n", "sum"), "n_distinct": ("n", "count")},
    )

    def rate(batch: pd.DataFrame) -> pd.DataFrame:
        nd = batch["n_docs"].to_numpy(dtype=np.int64)
        nu = batch["n_distinct"].to_numpy(dtype=np.int64)
        batch["dup_permille"] = (1000 * (nd - nu)) // nd
        return batch

    return per_src.map_batches(rate, batch_format="pandas")
