"""Mergeable distributed sketches (SURVEY §2.5 extension).

HyperLogLog register sketch for approximate count-distinct: the classic
mergeable-aggregate pattern — each batch folds its keys into a tiny
register array, the shuffle moves only (register, rho) partials, and the
merge is a register-wise max. The whole sketch is DETERMINISTIC (the
splitmix64 mix `dedup.sql_mix64`, no RNG), so unlike typical sketches
the REGISTERS themselves are value-checked against a DuckDB oracle that
recomputes the identical hash chain (sql_ops.HLL_USERS_SQL); the
cardinality estimate derived from them is tested against the exact
distinct count in pytest.

At 100 TB this is the cheap first pass where an exact two-level distinct
(`hashagg.distinct`) is overkill: the shuffle payload is O(m) per batch
(m = 2^p registers, bytes not gigabytes) and merging across any number
of partitions or runs is associative.

Reference analog: corpus census counting (distinct speakers/ids,
/root/reference/src/stats-dashboard/generate-markdown.py:173-196) where
an approximate, mergeable answer suffices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .dedup import sql_mix64
from .hashagg import hash_aggregate

HLL_P = 6  # 2^6 = 64 registers; standard error ~1.04/sqrt(64) = 13%


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (no float log2 —
    boundary values like 2^53+1 round wrong in double precision)."""
    v = v.copy()
    bl = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        v[big] >>= np.uint64(s)
    return bl + (v > 0).astype(np.int64)


def _reg_rho(keys: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register, rho) per key — the one derivation shared by the global
    and grouped sketches (and mirrored by both SQL oracles): register =
    low p bits of the mixed key, rho = leading-zero count of the
    remaining 64-p bits + 1."""
    z = sql_mix64(keys)
    reg = (z % np.uint64(1 << p)).astype(np.int64)
    rem = z >> np.uint64(p)
    rho = (64 - p + 1) - _bit_length(rem)
    return reg, rho


def hll_registers(ds, key_col: str, p: int = HLL_P):
    """(register, rho_max) rows of the HLL sketch of `key_col`. Register
    index = low p bits of the mixed key; rho = leading-zero count of the
    remaining 64-p bits + 1. Only touched registers are emitted (matching
    the SQL oracle's GROUP BY over observed rows)."""
    m = 1 << p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        reg, rho = _reg_rho(batch[key_col].to_numpy(dtype=np.int64), p)
        arr = np.zeros(m, dtype=np.int64)
        np.maximum.at(arr, reg, rho)
        touched = np.unique(reg)
        return pd.DataFrame({"register": touched, "rho": arr[touched]})

    parts = ds.map_batches(partial, batch_format="pandas")
    return hash_aggregate(
        parts, keys="register", aggs={"rho_max": ("rho", "max")}
    )


def hll_estimate(registers: pd.DataFrame, p: int = HLL_P) -> float:
    """Cardinality estimate from (register, rho_max) rows — the standard
    HLL harmonic mean with the small-range linear-counting correction.
    Driver-side float math over 2^p rows; NOT part of the value-checked
    surface (the registers are)."""
    m = 1 << p
    rho = np.zeros(m, dtype=np.int64)
    rho[registers["register"].to_numpy(dtype=np.int64)] = (
        registers["rho_max"].to_numpy(dtype=np.int64)
    )
    alpha = 0.709 if m == 64 else 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -rho))
    zeros = int((rho == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


# ---- count-min sketch (heavy-hitter counts) --------------------------------

CMS_D = 4    # hash rows
CMS_W = 512  # counters per row


def cms_registers(docs_ds):
    """Count-min sketch of the documents' token stream: a (CMS_D × CMS_W)
    counter matrix, emitted as (row, col, n) rows for every touched
    counter. Same mergeable-aggregate shape as the HLL sketch — each batch
    folds its tokens into at most D×W partial counters, the shuffle moves
    partials, the merge is a counter-wise SUM (vs HLL's max).

    Deterministic end to end: token id = the SQL-reproducible winnowing
    token hash mod WINNOW_M, row-d column = splitmix64(token_id*CMS_D + d)
    mod CMS_W — so the COUNTERS are value-checked against a DuckDB oracle
    (sql_ops.CMS_WORDS_SQL) that recomputes the identical chain. The
    point-estimate property (min over rows ≥ true count, bounded above)
    is asserted in pytest against exact word_freq counts.

    At 100 TB: the estimate answers "how frequent is token X" without the
    unbounded-cardinality exact aggregate — D×W×8 bytes of state per
    stream regardless of vocabulary size, mergeable across runs.
    """
    import pyarrow as pa

    from .dedup import WINNOW_M, winnow_token_hashes

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from ..tokens import explode

        _, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        if len(toks) == 0:
            return pd.DataFrame(
                {
                    "row": pd.Series([], dtype=np.int64),
                    "col": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        tid = winnow_token_hashes(toks) % WINNOW_M
        flat = np.zeros(CMS_D * CMS_W, dtype=np.int64)
        for d in range(CMS_D):
            z = sql_mix64(tid * CMS_D + d)
            col = (z % np.uint64(CMS_W)).astype(np.int64)
            np.add.at(flat, d * CMS_W + col, 1)
        touched = np.flatnonzero(flat)
        return pd.DataFrame(
            {
                "row": touched // CMS_W,
                "col": touched % CMS_W,
                "n": flat[touched],
            }
        )

    parts = docs_ds.map_batches(partial, batch_format="pandas")
    return hash_aggregate(parts, keys=["row", "col"], aggs={"n": ("n", "sum")})


def cms_point_estimate(registers: pd.DataFrame, words) -> dict[str, int]:
    """min-over-rows point estimates for the given words from (row, col, n)
    register rows. Driver-side; the registers are the checked surface."""
    import pyarrow as pa

    from .dedup import WINNOW_M, winnow_token_hashes

    mat = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    mat[registers["row"].to_numpy(dtype=np.int64),
        registers["col"].to_numpy(dtype=np.int64)] = (
        registers["n"].to_numpy(dtype=np.int64)
    )
    toks = np.asarray(list(words), dtype=object)
    tid = winnow_token_hashes(toks) % WINNOW_M
    out = {}
    for i, w in enumerate(words):
        ests = []
        for d in range(CMS_D):
            z = sql_mix64(np.array([tid[i] * CMS_D + d], dtype=np.int64))
            ests.append(mat[d, int(z[0] % np.uint64(CMS_W))])
        out[w] = int(min(ests))
    return out


def hll_registers_grouped(ds, key_col: str, group_col: str, p: int = HLL_P):
    """Grouped HLL: one (group, register, rho_max) sketch PER KEY of
    `group_col` — the keyed form of the mergeable aggregate (approximate
    COUNT(DISTINCT key) GROUP BY group). Per batch the partial is at most
    groups-in-batch × 2^p rows; the exchange and merge are the same
    two-level hash aggregate with a register-wise max. Same deterministic
    splitmix64 chain as the global sketch, so the grouped registers are
    value-checked in SQL too."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        reg, rho = _reg_rho(batch[key_col].to_numpy(dtype=np.int64), p)
        df = pd.DataFrame(
            {group_col: batch[group_col].to_numpy(dtype=object),
             "register": reg, "rho": rho}
        )
        return (
            df.groupby([group_col, "register"], sort=False)["rho"]
            .max()
            .reset_index()
        )

    parts = ds.map_batches(partial, batch_format="pandas")
    return hash_aggregate(
        parts, keys=[group_col, "register"], aggs={"rho_max": ("rho", "max")}
    )


# ---- Bloom filter ------------------------------------------------------------

BLOOM_M = 1 << 14  # bits
BLOOM_K = 4  # double-hashed probes per key


def _bloom_positions(h: np.ndarray) -> np.ndarray:
    """(n, BLOOM_K) bit positions per key: standard double hashing
    pos_i = (g1 + i·g2) mod M with (g1, g2) from one splitmix64 mix of the
    SQL-parity hash — all uint64-exact, reproduced in HUGEINT by the
    oracle."""
    M = np.uint64(BLOOM_M)
    z = sql_mix64(h)
    g1 = z % M
    g2 = (z >> np.uint64(17)) % M
    return np.stack(
        [(g1 + np.uint64(i) * g2) % M for i in range(BLOOM_K)], axis=1
    )


def bloom_vocab_bits(ds, text_col: str = "text"):
    """Bloom filter over the corpus VOCABULARY — the third mergeable
    sketch (with HLL and count-min): the compact membership pre-filter a
    cross-shard dedup or OOV check BROADCASTS instead of shipping the full
    key set. Per batch: BLOOM_K double-hashed bit positions per distinct
    token; the partial is the batch's distinct bit set (at most BLOOM_M
    rows, bytes not gigabytes) and the merge is the two-level distinct —
    set-OR is order-independent, so the BITS themselves are value-checked
    in SQL. False-positive rate ≈ (1 - e^{-kn/m})^k for n distinct keys."""
    import pyarrow as pa

    from ..tokens import explode
    from .dedup import winnow_token_hashes
    from .hashagg import distinct

    def partial(batch: pa.Table) -> pd.DataFrame:
        _, toks = explode(batch[text_col].combine_chunks())
        if len(toks) == 0:
            return pd.DataFrame({"bit_idx": np.array([], dtype=np.int64)})
        h = np.unique(winnow_token_hashes(toks))
        bits = np.unique(_bloom_positions(h))
        return pd.DataFrame({"bit_idx": bits.astype(np.int64)})

    return distinct(ds.map_batches(partial, batch_format="pyarrow"), "bit_idx")


def bloom_lookup(bit_set) -> np.ndarray:
    """Dense BLOOM_M boolean array from a bit-index set — build it ONCE per
    broadcast filter and reuse across probe batches (the filter is
    immutable; rebuilding + sorting it per probe call is O(|bits| log
    |bits| + M) wasted per batch). Accepts any int iterable; a boolean
    ndarray passes through unchanged."""
    if isinstance(bit_set, np.ndarray) and bit_set.dtype == bool:
        return bit_set
    lookup = np.zeros(BLOOM_M, dtype=bool)
    lookup[np.fromiter(bit_set, dtype=np.int64, count=len(bit_set))] = True
    return lookup


def bloom_contains(bit_set, tokens: np.ndarray) -> np.ndarray:
    """Membership probe against a Bloom filter (the broadcast-side use):
    True where ALL k probe bits are set. No false negatives by
    construction; false positives at the documented rate. Pass the
    `bloom_lookup` array (not the raw set) when probing repeatedly."""
    from .dedup import winnow_token_hashes

    pos = _bloom_positions(winnow_token_hashes(np.asarray(tokens, dtype=object)))
    return bloom_lookup(bit_set)[pos.astype(np.int64)].all(axis=1)


def cms_registers_grouped(docs_ds, group_col: str = "source"):
    """Grouped count-min: one (group, row, col, n) counter set PER KEY of
    `group_col` — the keyed form of cms_registers (as hll_registers_grouped
    is for HLL): approximate per-group token-frequency state. The partial
    is at most groups-in-batch × D × W rows; the merge is a counter-wise
    SUM via the two-level hash aggregate. Same deterministic splitmix64
    chain, so the grouped counters are value-checked in SQL."""
    import pyarrow as pa

    from .dedup import WINNOW_M, winnow_token_hashes

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from ..tokens import explode

        rows_idx, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        if len(toks) == 0:
            return pd.DataFrame(
                {
                    group_col: pd.Series([], dtype=object),
                    "row": pd.Series([], dtype=np.int64),
                    "col": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        grp = batch[group_col].to_numpy(dtype=object)[rows_idx]
        tid = winnow_token_hashes(toks) % WINNOW_M
        frames = []
        for d in range(CMS_D):
            z = sql_mix64(tid * CMS_D + d)
            col = (z % np.uint64(CMS_W)).astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {group_col: grp, "row": np.int64(d), "col": col}
                )
            )
        df = pd.concat(frames, ignore_index=True)
        return (
            df.groupby([group_col, "row", "col"], sort=False)
            .size()
            .reset_index(name="n")
        )

    parts = docs_ds.map_batches(partial, batch_format="pandas")
    return hash_aggregate(
        parts, keys=[group_col, "row", "col"], aggs={"n": ("n", "sum")}
    )


def bloom_semi_join(probe_ds, build_ds_fn, probe_key: str, build_key: str,
                    num_partitions: int = 64):
    """Semi join with BLOOM-FILTER PUSHDOWN — the join-pruning pattern a
    100 TB fact⋈fact semi join needs: instead of exchanging every probe
    row, broadcast a BLOOM_M-bit filter of the build keys and drop
    non-matching probe rows MAP-SIDE before the shuffle; an exact
    distributed semi join over the survivors removes the false positives
    (false negatives are impossible by construction, so the result is
    row-identical to a plain semi join — and value-checked as such; the
    bloom is pure pruning and needs no oracle of its own).

    The filter costs BLOOM_M bits regardless of build cardinality (the
    mergeable-partial shape: per-batch distinct bit sets, two-level
    distinct fold, ≤ 16 Ki rows to the driver). `build_ds_fn` is a
    factory — the build side is consumed twice (bit partials + exact
    join) and a lazy Dataset re-executes per consumer; handing a fresh
    pruned read per pass is the engine's standard answer. Key bits come
    from the shared `_bloom_positions` kernel (splitmix64 finalizer +
    double hashing)."""
    import ray

    from .hashagg import distinct, hash_join

    def key_bits(batch: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(batch[build_key].to_numpy(dtype=np.int64))
        if len(k) == 0:
            return pd.DataFrame({"bit_idx": np.array([], dtype=np.int64)})
        bits = np.unique(_bloom_positions(k.astype(np.uint64)))
        return pd.DataFrame({"bit_idx": bits.astype(np.int64)})

    bits = distinct(
        build_ds_fn().map_batches(key_bits, batch_format="pandas"), "bit_idx"
    ).to_pandas()["bit_idx"].to_numpy()
    lookup_ref = ray.put(bloom_lookup(bits))

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        k = batch[probe_key].to_numpy(dtype=np.int64)
        pos = _bloom_positions(k.astype(np.uint64)).astype(np.int64)
        return batch[lookup[pos].all(axis=1)]

    survivors = probe_ds.map_batches(prune, batch_format="pandas")
    return hash_join(
        survivors,
        build_ds_fn(),
        on=probe_key,
        right_on=build_key,
        how="semi",
        num_partitions=num_partitions,
    )
