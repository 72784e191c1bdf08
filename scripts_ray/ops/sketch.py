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


def hll_registers(ds, key_col: str, p: int = HLL_P):
    """(register, rho_max) rows of the HLL sketch of `key_col`. Register
    index = low p bits of the mixed key; rho = leading-zero count of the
    remaining 64-p bits + 1. Only touched registers are emitted (matching
    the SQL oracle's GROUP BY over observed rows)."""
    m = 1 << p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keys = batch[key_col].to_numpy(dtype=np.int64)
        z = sql_mix64(keys)
        reg = (z % np.uint64(m)).astype(np.int64)
        rem = z >> np.uint64(p)
        rho = (64 - p + 1) - _bit_length(rem)
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
