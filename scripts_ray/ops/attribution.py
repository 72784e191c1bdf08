"""Speaker/role attribution: broadcast interval join with fallback cascade.

The engine analog of the reference's fuzzy person matcher + redetect stage:
candidates are filtered by a validity interval and matched through an
ordered fallback chain, with unmatched rows emitted as 'unknown'
(/root/reference/src/fuzzy_matching.py:58-107 — year-interval filter at
:84-89, chamber fallback at :94-97; /root/reference/src/cur-prot/redetect.py:22-52).

Execution shape: the dimension side (orders per customer, deduped to the
max order key per (custkey, orderdate)) is packed into three sorted numpy
arrays and broadcast ONCE via ``ray.put``; every batch resolves its probes
with a single vectorized ``searchsorted`` against the combined
(custkey, date) key — no per-row Python, no shuffle of the fact table.

Semantics (deterministic, oracle-checkable in SQL):
- probe key: user u = int(conv_id[5:]); primary custkey = 701*u + 1 if that
  exists in `customer`, else fallback custkey = u % n_customers + 1
  (the cascade);
- interval probe: the latest order of that customer with
  date(ts) - MAX_AGE_DAYS <= o_orderdate <= date(ts) attributes the turn
  (asof semantics with a validity window; ties on date resolved to the max
  o_orderkey);
- no qualifying order in the window → match_type 'unknown' (the unknowns
  side output).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_DAY_NS = 86_400_000_000_000
PRIMARY_STRIDE = 701
MAX_AGE_DAYS = 9000


def build_order_index(sf_dir: str):
    """Pack the orders dim into broadcastable sorted arrays:
    (combined custkey*2^32+day key, day, max orderkey per (cust, day),
    n_customers, max custkey)."""
    import pyarrow.parquet as pq

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    n_cust = cust.num_rows
    max_ck = int(cust["c_custkey"].to_numpy(zero_copy_only=False).max())

    days = (
        orders["o_orderdate"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        // _DAY_NS
    )
    g = (
        pd.DataFrame(
            {
                "ck": orders["o_custkey"].to_numpy().astype(np.int64),
                "day": days,
                "key": orders["o_orderkey"].to_numpy().astype(np.int64),
            }
        )
        .groupby(["ck", "day"], sort=True)["key"]
        .max()
        .reset_index()
    )
    comb = (g["ck"].to_numpy() << np.int64(32)) | g["day"].to_numpy()
    return comb, g["day"].to_numpy(), g["key"].to_numpy(), n_cust, max_ck


def attribute_turns(turns_ds, index_ref, cascade: tuple[str, ...] = ("primary", "fallback")):
    """Vectorized asof attribution of every turn against the broadcast
    order index (see module docstring for the cascade semantics).

    `cascade` is the ordered matcher ladder (§2.9, reference
    /root/reference/src/fuzzy_matching.py:75-76): strategies are tried in
    the given order and the first APPLICABLE one supplies the probe key.
    'primary' applies only when its derived custkey exists in the dim
    table; 'fallback' always applies — so reordering or truncating the
    ladder observably changes match_type assignment."""
    import ray

    for s in cascade:
        if s not in ("primary", "fallback"):
            raise ValueError(f"unknown cascade strategy: {s!r}")

    def probe(batch: pa.Table) -> pa.Table:
        comb, dim_day, dim_key, n_cust, max_ck = ray.get(index_ref)
        import pyarrow.compute as pc

        u = (
            pc.cast(
                pc.utf8_slice_codeunits(batch["conv_id"].combine_chunks(), 5),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
        )
        ck = np.full(len(u), -1, dtype=np.int64)
        chosen = np.full(len(u), "", dtype=object)
        for strat in cascade:
            open_ = chosen == ""
            if strat == "primary":
                cand = PRIMARY_STRIDE * u + 1
                ok = open_ & (cand <= max_ck)
            else:
                cand = u % n_cust + 1
                ok = open_
            ck = np.where(ok, cand, ck)
            chosen[ok] = strat
        is_primary = chosen == "primary"
        d = (
            batch["ts"].combine_chunks().cast(pa.timestamp("ns")).to_numpy()
            .astype(np.int64)
            // _DAY_NS
        )
        pos = np.searchsorted(comb, (ck << np.int64(32)) | d, side="right") - 1
        safe = np.clip(pos, 0, None)
        hit = (
            (pos >= 0)
            & ((comb[safe] >> np.int64(32)) == ck)
            & (d - dim_day[safe] <= MAX_AGE_DAYS)
        )
        match_type = np.where(hit, np.where(is_primary, "primary", "fallback"), "unknown")
        order_key = np.where(hit, dim_key[safe], -1)
        days_since = d - dim_day[safe]
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "custkey": pa.array(ck, type=pa.int64()),
                "match_type": pa.array(match_type.astype(object), type=pa.string()),
                "order_key": pa.array(order_key, type=pa.int64()),
                "days_since": pa.array(days_since, type=pa.int64(), mask=~hit),
            }
        )

    return turns_ds.map_batches(probe, batch_format="pyarrow")


# ---- timestamp repair via broadcast correction table (M5/M6) ---------------
# Reference: docDate rewrite keyed by protocol id from a corrections CSV
# (/root/reference/src/replace_dates.py:19-46) / JSON
# (/root/reference/src/update_dates_from_json.py:45-77).

TS_FIX_MOD = 7
TS_FIX_REM = 3
TS_FIX_SPAN = 97
_TS_FIX_USER_RANGE = 10_000


def build_ts_corrections() -> pd.DataFrame:
    """Deterministic corrections table keyed by conv_id: every user with
    u % TS_FIX_MOD == TS_FIX_REM gets the canonical timestamp
    2024-06-01 + (u % TS_FIX_SPAN) days. Stand-in for the reference's
    curated corrections CSV; the same formula is restated by the DuckDB
    oracle so the broadcast-join machinery is what gets verified."""
    u = np.arange(_TS_FIX_USER_RANGE, dtype=np.int64)
    u = u[u % TS_FIX_MOD == TS_FIX_REM]
    ts = np.datetime64("2024-06-01T00:00:00", "us") + (u % TS_FIX_SPAN).astype(
        "timedelta64[D]"
    ).astype("timedelta64[us]")
    return pd.DataFrame({"conv_id": [f"conv-{x:06d}" for x in u], "ts_fix": ts})


def repair_ts(turns_ds, fix_ref):
    """Broadcast left-join of the corrections table (``ray.put`` once, a
    pandas map per batch): corrected rows take the table's timestamp,
    others keep their own — SQL ``COALESCE(fix.ts_fix, t.ts)``."""
    import ray

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        fix = ray.get(fix_ref)
        m = batch["conv_id"].map(fix)
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "ts_fixed": m.where(m.notna(), batch["ts"]),
                "repaired": m.notna(),
            }
        )

    return turns_ds.map_batches(apply, batch_format="pandas")


def unknown_turns(attributed_ds):
    """The unknowns side output (reference: unknowns.csv,
    /root/reference/src/cur-prot/redetect.py:49-52)."""
    return attributed_ds.filter(
        expr="match_type == 'unknown'"
    ).select_columns(["conv_id", "turn_idx", "custkey"])
