"""Exact distributed quantiles and per-group top-k.

Both operators avoid a global sort: the wide data is reduced to a compact
keyed intermediate with the two-level hash exchange, then finalized
per group inside one partition task.

- `group_quantiles`: exact quantiles of an INTEGER-valued column via a
  distributed histogram — per-batch (keys, value) counts → hash aggregate
  → re-exchange on the group keys → per-group cumsum + exact-rank pick.
  The shuffle moves only the histogram (groups × distinct values), never
  rows; at 100 TB a bounded-cardinality value column (lengths, counts,
  scores in permille) keeps the histogram tiny regardless of row count.
  Rank semantics are DuckDB's `quantile_disc`: value at 1-based rank
  max(1, ceil(q·n)) with EXACT rational arithmetic — quantiles are passed
  as integer permille so ceil(n·q_pm / 1000) is computed in int64, free of
  the float-ceil hazard (0.9 × 10 → 9.000000000000002).

- `group_topk`: top-k rows per group by (sort_col desc, tie asc) — the
  grouped analog of sort+limit (SURVEY O4). One exchange on the group
  keys, then a single vectorized lexsort + cumcount head(k) per partition.

Reference parity: the reference computes per-group percentile/top tables
in pandas inside single-process report scripts
(/root/reference/src/stats-dashboard/mp-coverage.py:23-41 and the word
frequency scripts at /root/reference/src/wordfreq/); here they are
streaming operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .hashagg import hash_aggregate, map_partitions_by_key


def group_quantiles(
    ds,
    value_col: str,
    keys: list[str],
    quantiles_permille: list[int],
    prefix: str = "p",
):
    """One row per group: `{prefix}{q}` columns hold the exact
    `quantile_disc(value, q/1000)` of the int-valued `value_col`."""
    qs = list(quantiles_permille)

    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby(keys + [value_col], sort=False, observed=True)
            .size()
            .reset_index(name="n")
        )
        return out

    hist = hash_aggregate(
        ds.map_batches(hist_partial, batch_format="pandas"),
        keys=keys + [value_col],
        aggs={"n": ("n", "sum")},
    )

    def finalize(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(keys + [value_col], kind="mergesort").reset_index(
            drop=True
        )
        vals = part[value_col].to_numpy()
        cnts = part["n"].to_numpy(dtype=np.int64)
        # group-change detection across all key columns
        new = np.ones(len(part), dtype=bool)
        if len(part) > 1:
            change = np.zeros(len(part) - 1, dtype=bool)
            for c in keys:
                col = part[c].to_numpy()
                change |= col[1:] != col[:-1]
            new[1:] = change
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(part))
        rows = []
        for s, e in zip(starts, ends):
            c = np.cumsum(cnts[s:e])
            n = int(c[-1])
            rec = {k: part.at[s, k] for k in keys}
            for q in qs:
                rank = max(1, -((-n * q) // 1000))  # exact ceil(n*q/1000)
                idx = int(np.searchsorted(c, rank, side="left"))
                rec[f"{prefix}{q}"] = vals[s + idx]
            rows.append(rec)
        return pd.DataFrame(rows, columns=keys + [f"{prefix}{q}" for q in qs])

    return map_partitions_by_key(hist, keys, finalize)


def group_topk(ds, keys: list[str], sort_col: str, k: int, tie_cols: list[str]):
    """Top-k rows per group by (`sort_col` desc, `tie_cols` asc), with a
    1-based `rank` column — grouped sort+limit without a global sort.

    Skew: a hot group would otherwise ship ALL its rows to one partition;
    the per-batch pre-prune below is top-k's combiner (each batch's
    non-top-k rows can never reach the final top-k), bounding the exchange
    at k rows per (group, batch) — the same role salting plays for
    non-combining shuffles."""

    def head_k(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(
            keys + [sort_col] + tie_cols,
            ascending=[True] * len(keys) + [False] + [True] * len(tie_cols),
            kind="mergesort",
        ).reset_index(drop=True)
        rank = part.groupby(keys, sort=False, observed=True).cumcount() + 1
        out = part.assign(rank=rank.astype(np.int64))
        return out[out["rank"] <= k].reset_index(drop=True)

    pruned = ds.map_batches(
        lambda b: head_k(b).drop(columns=["rank"]), batch_format="pandas"
    )
    return map_partitions_by_key(pruned, keys, head_k)


QUALITY_DECILES_PM = [100, 200, 300, 400, 500, 600, 700, 800, 900]


def quality_buckets(docs_ds, value_col: str = "n_chars"):
    """Curriculum/quality bucketing: assign every document its global
    decile bucket of `value_col` (0..9), the standard precursor to
    quality-stratified mixing and curriculum ordering. Pass 1 reuses the
    exact distributed histogram (`group_quantiles` with a constant key —
    the shuffle moves the value histogram, never rows) to produce the 9
    decile boundaries; pass 2 is a pure map with the tiny boundary vector
    broadcast: bucket = #(boundaries <= value), which matches the SQL
    `quantile_disc` oracle exactly (no ntile row-order ambiguity)."""

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(_g=np.int64(0))

    brow = (
        group_quantiles(
            docs_ds.map_batches(tag, batch_format="pandas"),
            value_col,
            ["_g"],
            QUALITY_DECILES_PM,
        )
        .to_pandas()
        .iloc[0]
    )
    bounds = np.array(
        [brow[f"p{q}"] for q in QUALITY_DECILES_PM], dtype=np.int64
    )

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(dtype=np.int64)
        bucket = (v[:, None] >= bounds[None, :]).sum(axis=1)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                value_col: v,
                "bucket": bucket.astype(np.int64),
            }
        )

    return docs_ds.map_batches(bucketize, batch_format="pandas")


MAD_K = 3


def robust_outliers(docs_ds, value_col: str = "n_chars", key: str = "source",
                    k_mad: int = MAD_K):
    """Robust per-group outlier detection: flag rows whose value deviates
    from the group MEDIAN by more than `k_mad`× the group's MAD (median
    absolute deviation) — the standard-deviation-free outlier rule that
    heavy-tailed web-corpus lengths need (a z-score is itself dragged by
    the outliers it is supposed to find; the median/MAD pair is not, and
    stays in exact integer arithmetic — no sqrt, no float, oracle-exact).

    Two distributed-histogram passes (both reuse `group_quantiles`, so
    each shuffle moves only a (group, value, count) histogram): group
    medians, then group MADs over the broadcast-median deviations. The
    per-group statistics are dimension-bounded and broadcast; the corpus
    is never exchanged — each pass re-executes the pruned parquet read,
    which is the documented trade for keeping the corpus out of the
    object store (the read IS the chain). Emits flagged rows only:
    (doc_id, group, value, med, mad)."""
    import ray

    med_df = group_quantiles(docs_ds, value_col, [key], [500], prefix="m").to_pandas()
    med_ref = ray.put(dict(zip(med_df[key], med_df["m500"].astype(np.int64))))

    def dev(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(med_ref)
        med = batch[key].map(m).to_numpy(dtype=np.int64)
        v = batch[value_col].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                key: batch[key],
                value_col: v,
                "med": med,
                "ad": np.abs(v - med),
            }
        )

    def dev_ds():
        return docs_ds.map_batches(dev, batch_format="pandas")

    mad_df = group_quantiles(dev_ds(), "ad", [key], [500], prefix="q").to_pandas()
    mad_ref = ray.put(dict(zip(mad_df[key], mad_df["q500"].astype(np.int64))))

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        mm = ray.get(mad_ref)
        mad = batch[key].map(mm).to_numpy(dtype=np.int64)
        hit = batch["ad"].to_numpy() > k_mad * mad
        out = batch.loc[hit, ["doc_id", key, value_col, "med"]].reset_index(
            drop=True
        )
        out["mad"] = mad[hit]
        return out

    return dev_ds().map_batches(flag, batch_format="pandas")


def group_rank(ds, keys: list[str], value_col: str):
    """SQL RANK()/DENSE_RANK() OVER (PARTITION BY keys ORDER BY value) —
    the per-row ranking window functions (group_topk gives row_number;
    this completes the ranking family). One exchange on the group keys,
    then pandas' C-kernel groupby rank per partition (method='min' is
    SQL RANK, 'dense' is DENSE_RANK). Same partitioning contract as the
    window family: one group fits one partition."""

    def rank_part(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(keys, sort=False, observed=True)[value_col]
        part = part.assign(
            rnk=g.rank(method="min").astype(np.int64),
            dense_rnk=g.rank(method="dense").astype(np.int64),
        )
        return part.reset_index(drop=True)

    return map_partitions_by_key(ds, keys, rank_part)


def global_row_number(ds, value_col: str, id_col: str):
    """Global ROW_NUMBER() OVER (ORDER BY value, id) WITHOUT a global
    row sort — the "assign every row its position in the total order"
    primitive (sequence ids, curriculum order, deterministic sharding).

    Pass 1 reuses the distributed histogram: per-value counts (the
    shuffle moves (value, count), never rows), cumulated driver-side
    into per-value BASE offsets — bounded by the number of DISTINCT
    values, the same contract as group_quantiles. Pass 2 exchanges rows
    by value (ties of one value co-locate), sorts each value-run by id,
    and emits base + within-run position. Rows move through exactly ONE
    exchange; the total order is never held in one place. Emits the
    input columns + `rn` (1-based)."""
    import ray

    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby([value_col], sort=False, observed=True)
            .size()
            .reset_index(name="n")
        )

    hist = hash_aggregate(
        ds.map_batches(hist_partial, batch_format="pandas"),
        keys=[value_col],
        aggs={"n": ("n", "sum")},
    ).to_pandas()
    hist = hist.sort_values(value_col, kind="mergesort").reset_index(drop=True)
    base = np.concatenate([[0], np.cumsum(hist["n"].to_numpy(dtype=np.int64))[:-1]])
    ref = ray.put(
        (hist[value_col].to_numpy(), base)
    )

    def number_part(part: pd.DataFrame) -> pd.DataFrame:
        vals, offs = ray.get(ref)
        part = part.sort_values([value_col, id_col], kind="mergesort").reset_index(
            drop=True
        )
        v = part[value_col].to_numpy()
        pos = part.groupby(value_col, sort=False, observed=True).cumcount().to_numpy()
        b = offs[np.searchsorted(vals, v)]
        return part.assign(rn=(b + pos + 1).astype(np.int64))

    return map_partitions_by_key(ds, [value_col], number_part)


def len_log2_hist(docs_ds, value_col: str = "n_chars"):
    """Power-of-two histogram of a positive integer column — the corpus
    profiling view (how are document lengths distributed across orders
    of magnitude) with EXACT integer bucketing on both engines, no libm:
    bucket = floor(log2(x)) computed as searchsorted against the 2^k
    boundary table here and as binary-digit count minus one in the SQL
    oracle. Per-batch count partials into one bounded (<= 63 buckets)
    aggregate; bucket bounds attached in a trailing map. Fails loudly on
    non-positive values (log2 undefined; a silent clamp would desync the
    two engines). Emits (bucket, lo, hi, n_docs)."""
    from .hashagg import hash_aggregate

    boundaries = np.left_shift(np.int64(1), np.arange(1, 63, dtype=np.int64))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch[value_col].to_numpy(dtype=np.int64)
        if len(x) and x.min() <= 0:
            raise ValueError(f"{value_col} must be positive for log2 buckets")
        b = np.searchsorted(boundaries, x, side="right")
        return (
            pd.DataFrame({"bucket": b})
            .groupby("bucket", sort=False)
            .size()
            .reset_index(name="n_docs")
        )

    agg = hash_aggregate(
        docs_ds.map_batches(partial, batch_format="pandas"),
        keys=["bucket"],
        aggs={"n_docs": ("n_docs", "sum")},
    )

    def bounds(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch["bucket"].to_numpy(dtype=np.int64)
        batch["lo"] = np.left_shift(np.int64(1), b)
        batch["hi"] = np.left_shift(np.int64(1), b + 1) - 1
        return batch[["bucket", "lo", "hi", "n_docs"]]

    return agg.map_batches(bounds, batch_format="pandas")


def activity_gini(events_ds):
    """Exact Gini coefficient of per-user activity — the skew audit that
    decides whether sampling/salting is needed (G≈0: uniform users;
    G→1: a few users own the stream). No global sort and no per-row
    ranks: Gini over counts folds EXACTLY from the count histogram —
    for each distinct activity level x with c users at base rank b, the
    rank-weighted sum contributes x·(c·b + c·(c+1)/2) — so the plan is
    the user-count aggregate, the (x → c) histogram aggregate (bounded
    by distinct activity levels), and a Python-int driver fold
    (HUGEINT-exact in the SQL twin; rank-tie order provably cancels).
    gini_micro = floor(1e6·(2·Σr·x − (n+1)·Σx) / (n·Σx)). Emits one row
    (n_users, total_events, gini_micro)."""
    from .hashagg import hash_aggregate

    per_user = hash_aggregate(
        events_ds, keys=["user_id"], aggs={"x": ("user_id", "count")}
    )
    hist = hash_aggregate(
        per_user, keys=["x"], aggs={"c": ("x", "count")}
    ).to_pandas().sort_values("x", kind="mergesort")

    n = srx = sx = 0
    for x, c in zip(hist["x"], hist["c"]):
        x, c = int(x), int(c)
        srx += x * (c * n + c * (c + 1) // 2)
        sx += x * c
        n += c
    if sx == 0:
        raise ValueError("activity_gini: no events")
    gini = (1_000_000 * (2 * srx - (n + 1) * sx)) // (n * sx)
    return pd.DataFrame(
        {
            "n_users": [np.int64(n)],
            "total_events": [np.int64(sx)],
            "gini_micro": [np.int64(gini)],
        }
    )
