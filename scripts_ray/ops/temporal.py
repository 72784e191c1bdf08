"""Temporal joins over the events stream: as-of join, range join, hopping
windows (beyond-reference additions per the build brief).

Ray Data has no as-of / range-join primitive; both are expressed on the
engine's standard one-exchange pattern: hash-partition by the equi-key
(`user_id`), then a vectorized per-partition probe (`pd.merge_asof` /
cumulative-count searchsorted) over the co-partitioned build side. Both
sides of each join come from the SAME events read, so the probe and
build rows are tagged in one map pass and travel through ONE exchange —
no second shuffle, no broadcast of an unbounded side.

Partitioning assumption (documented per the brief): all events of one
user fit in one partition. Users are spread uniformly by siphash;
per-user history is bounded (the same atomic-unit rule as conv_id for
the window family).

Reference analog: the validity-interval probe of fuzzy attribution
(/root/reference/src/fuzzy_matching.py:84-89) generalizes here to
stream-by-stream shapes the reference never needed — its interval side
was always a broadcast dimension table (J3), whereas both sides of
these joins scale with the stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .hashagg import hash_aggregate, map_partitions_by_key

ASOF_PROBE_TYPE = "purchase"
ASOF_BUILD_TYPE = "view"
RANGE_PROBE_TYPE = "purchase"
RANGE_BUILD_TYPE = "click"
RANGE_DAYS = 7
HOP_MINUTES = 5
HOP_WINDOW_MINUTES = 10  # window = 2 hops: every event lands in exactly 2


def asof_join_events(events_ds):
    """For every purchase event: the most recent view event of the same
    user at or before the purchase (`ASOF LEFT JOIN` semantics).

    Determinism under ties: the build side is pre-aggregated to one row
    per (user_id, ts) — max(value) — so "the latest view" is unique even
    when several views share a timestamp (DuckDB's ASOF join would pick
    an arbitrary row among exact-ts ties otherwise).
    """

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["event_type"].isin([ASOF_PROBE_TYPE, ASOF_BUILD_TYPE])
        out = batch.loc[keep, ["event_id", "user_id", "ts", "event_type", "value"]]
        return out

    def asof_part(part: pd.DataFrame) -> pd.DataFrame:
        probe = part[part["event_type"] == ASOF_PROBE_TYPE]
        build = part[part["event_type"] == ASOF_BUILD_TYPE]
        probe = pd.DataFrame(
            {
                "event_id": probe["event_id"].astype(np.int64),
                "user_id": probe["user_id"].astype(np.int64),
                "ts": probe["ts"],
            }
        )
        if len(probe) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "view_ts": pd.Series([], dtype="datetime64[us]"),
                    "view_value": pd.Series([], dtype=np.float64),
                }
            )
        # unique build key per (user, ts): max(value) among exact-ts ties
        build = (
            build.groupby(["user_id", "ts"], as_index=False)["value"]
            .max()
            .rename(columns={"value": "view_value"})
        )
        build["user_id"] = build["user_id"].astype(np.int64)
        build["view_ts"] = build["ts"]
        probe = probe.sort_values(["ts", "event_id"], kind="mergesort")
        build = build.sort_values("ts", kind="mergesort")
        out = pd.merge_asof(
            probe,
            build,
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        return out[["event_id", "user_id", "ts", "view_ts", "view_value"]]

    return map_partitions_by_key(
        events_ds.map_batches(project, batch_format="pandas"),
        keys="user_id",
        fn=asof_part,
    )


def range_join_events(events_ds):
    """For every purchase event: how many clicks the same user made in the
    preceding `RANGE_DAYS` days (`c.ts > p.ts - 7d AND c.ts <= p.ts`) —
    a stream-by-stream range join.

    Per partition the count is two `merge_asof` probes against the
    build side's cumulative click count: n = cum(<= ts) - cum(< ts-7d).
    O((P+B) log B) per partition, no per-row Python.
    """
    lo_offset = pd.Timedelta(days=RANGE_DAYS)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["event_type"].isin([RANGE_PROBE_TYPE, RANGE_BUILD_TYPE])
        return batch.loc[keep, ["event_id", "user_id", "ts", "event_type"]]

    def range_part(part: pd.DataFrame) -> pd.DataFrame:
        probe = part[part["event_type"] == RANGE_PROBE_TYPE]
        build = part[part["event_type"] == RANGE_BUILD_TYPE]
        probe = pd.DataFrame(
            {
                "event_id": probe["event_id"].astype(np.int64),
                "user_id": probe["user_id"].astype(np.int64),
                "ts": probe["ts"],
            }
        )
        if len(probe) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "n_clicks_7d": pd.Series([], dtype=np.int64),
                }
            )
        # cumulative click count per user; one row per (user, ts) with the
        # count at that ts inclusive (ties collapse to the running max)
        build = build.sort_values(["user_id", "ts"], kind="mergesort").reset_index(
            drop=True
        )
        build = pd.DataFrame(
            {
                "user_id": build["user_id"].astype(np.int64),
                "ts": build["ts"],  # keep original datetime unit (ns vs us)
                "cum": build.groupby("user_id").cumcount() + 1,
            }
        ).groupby(["user_id", "ts"], as_index=False)["cum"].max()

        build = build.sort_values("ts", kind="mergesort")
        probe_hi = probe.sort_values(["ts", "event_id"], kind="mergesort")
        hi = pd.merge_asof(
            probe_hi, build, on="ts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )["cum"].fillna(0).to_numpy()
        # Timedelta arithmetic upcasts datetime64[us] to [ns]; cast back so
        # merge_asof sees identical key dtypes on both sides
        probe_lo = probe_hi.assign(
            ts=(probe_hi["ts"] - lo_offset).astype(probe_hi["ts"].dtype)
        )
        lo = pd.merge_asof(
            probe_lo, build, on="ts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )["cum"].fillna(0).to_numpy()
        out = probe_hi.copy()
        out["n_clicks_7d"] = (hi - lo).astype(np.int64)
        return out[["event_id", "user_id", "ts", "n_clicks_7d"]]

    return map_partitions_by_key(
        events_ds.map_batches(project, batch_format="pandas"),
        keys="user_id",
        fn=range_part,
    )


ROLL_WINDOW_ROWS = 5  # current row + 4 preceding


def rolling_agg(events_ds, window: int = ROLL_WINDOW_ROWS):
    """Per-user moving-window aggregate over the ordered event stream —
    the SQL ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW`` frame
    (a windowed aggregate Ray Data has no primitive for): for every
    event, the rolling sum of `value` and the row count over the last
    `window` events of the SAME user, ordered by (ts, event_id).

    One exchange on user_id, then a single vectorized per-partition
    pass: sort by (user_id, ts, event_id), per-user cumulative sum,
    rolling value = cumsum - cumsum shifted by `window` WITHIN the user
    (numpy gather against per-user row offsets — no pandas .rolling per
    group, no per-row Python). Values are floored to integer micro-units
    first so the rolling sum is exact int64 arithmetic, bit-reproducible
    by the SQL window oracle regardless of summation order.

    Scale: the exchange carries (event_id, user_id, ts, v_micro) only;
    per-user history must fit a partition (same atomic-unit rule as the
    conv_id window family). Emits (event_id, user_id, ts,
    roll_sum_micro, n_win)."""

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype(np.int64),
                "user_id": batch["user_id"].astype(np.int64),
                "ts": batch["ts"],
                "v_micro": np.floor(
                    batch["value"].to_numpy(dtype=np.float64) * 1_000_000.0
                ).astype(np.int64),
            }
        )

    def roll_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        v = part["v_micro"].to_numpy()
        cum = np.cumsum(v)
        # index of each user's first row, broadcast back to its rows
        uid = part["user_id"].to_numpy()
        new_user = np.empty(len(part), dtype=bool)
        if len(part):
            new_user[0] = True
            new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        first_idx = starts[np.cumsum(new_user) - 1]  # per row: user's start
        pos_in_user = np.arange(len(part)) - first_idx
        n_win = np.minimum(pos_in_user + 1, window).astype(np.int64)
        # frame start index (inclusive); sum = cum[i] - cum[start-1]
        lo = np.arange(len(part)) - n_win + 1
        base = np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        return pd.DataFrame(
            {
                "event_id": part["event_id"],
                "user_id": part["user_id"],
                "ts": part["ts"],
                "roll_sum_micro": (cum - base).astype(np.int64),
                "n_win": n_win,
            }
        )

    return map_partitions_by_key(
        events_ds.map_batches(project, batch_format="pandas"),
        keys="user_id",
        fn=roll_part,
    )


def hopping_windows(events_ds):
    """Hopping-window aggregate: 10-minute windows every 5 minutes, so each
    event is replicated into exactly window/hop = 2 windows. Replication
    happens in the map pass (row expansion before the exchange); the
    aggregate is the standard two-level hash agg over (event_type,
    win_start) — the replication factor, not the window length, is what
    costs at scale.
    """
    hop = f"{HOP_MINUTES}min"
    back = pd.Timedelta(minutes=HOP_MINUTES)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        base = batch["ts"].dt.floor(hop)
        a = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "win_start": base,
                "value": batch["value"],
            }
        )
        b = a.assign(win_start=(base - back).astype(base.dtype))
        return pd.concat([a, b], ignore_index=True)

    return hash_aggregate(
        events_ds.map_batches(explode, batch_format="pandas"),
        keys=["event_type", "win_start"],
        aggs={
            "n": ("value", "count"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        },
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def event_funnel(events_ds, steps: tuple[str, ...] = FUNNEL_STEPS):
    """Ordered funnel progression per user — the sequential-pattern query
    (view → click-after-that-view → purchase-after-that-click) that
    windowless aggregates cannot express: `reached` = how many funnel
    steps the user completed in strict timestamp order, each step
    anchored at the EARLIEST completion of the previous one (min-ts
    chaining, the standard product-analytics semantics; strict `>`
    between steps).

    One exchange on user_id carrying (user_id, ts, event_type) for the
    step types only; per partition the chain is len(steps) vectorized
    groupby-min passes — no per-user Python. Emits (user_id, reached)
    for every user appearing in any step event."""

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["event_type"].isin(list(steps))
        return batch.loc[keep, ["user_id", "ts", "event_type"]]

    def funnel_part(part: pd.DataFrame) -> pd.DataFrame:
        users = pd.Series(
            np.sort(part["user_id"].unique()), name="user_id"
        )
        reached = pd.Series(np.zeros(len(users), dtype=np.int64),
                            index=users.to_numpy())
        # anchor per user: ts of the previous step's earliest completion
        anchor = pd.Series(pd.NaT, index=reached.index, dtype=part["ts"].dtype)
        for i, step in enumerate(steps):
            ev = part[part["event_type"] == step]
            if i > 0:
                # only events strictly after the user's current anchor
                a = ev["user_id"].map(anchor)
                ev = ev[a.notna().to_numpy() & (ev["ts"].to_numpy() > a.to_numpy())]
            t = ev.groupby("user_id")["ts"].min()
            done = reached.index.isin(t.index)
            reached[done & (reached.to_numpy() == i)] = i + 1
            nxt = pd.Series(pd.NaT, index=reached.index, dtype=part["ts"].dtype)
            nxt[t.index] = t.to_numpy()
            anchor = nxt
        return pd.DataFrame(
            {"user_id": reached.index.to_numpy().astype(np.int64),
             "reached": reached.to_numpy()}
        )

    return map_partitions_by_key(
        events_ds.map_batches(project, batch_format="pandas"),
        keys="user_id",
        fn=funnel_part,
    )


def hopping_distinct_users(events_ds):
    """Exact DISTINCT-user count per hopping window (10-minute windows
    every 5 minutes) — the windowed count-distinct that `hopping_windows`'
    additive aggregates can't give: distinctness is not mergeable, so the
    plan is window replication in the map pass (exactly window/hop = 2
    rows per event, same as hopping_windows), then the two-level
    distributed DISTINCT on (win_start, user_id), then a count aggregate
    whose input is already distinct — two bounded exchanges, never a
    per-window user set in one task's memory. (The mergeable-sketch
    alternative at 100 TB is hll_registers grouped by win_start — same
    map, constant-size partials; this operator is the exact twin.)
    Emits (win_start, n_users)."""
    from .hashagg import distinct

    hop = f"{HOP_MINUTES}min"
    back = pd.Timedelta(minutes=HOP_MINUTES)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        base = batch["ts"].dt.floor(hop)
        a = pd.DataFrame(
            {"user_id": batch["user_id"].astype(np.int64), "win_start": base}
        )
        b = a.assign(win_start=(base - back).astype(base.dtype))
        return pd.concat([a, b], ignore_index=True)

    pairs = distinct(
        events_ds.map_batches(explode, batch_format="pandas"),
        keys=["win_start", "user_id"],
    )
    return hash_aggregate(
        pairs,
        keys=["win_start"],
        aggs={"n_users": ("user_id", "count")},
    )


def value_deltas(events_ds):
    """Per-user consecutive-event difference — LAG arithmetic (`value -
    lag(value) OVER (PARTITION BY user ORDER BY ts, event_id)`): the
    rate-of-change signal per event stream. Values floored to integer
    micro-units first, so deltas are exact integers; the first event of
    each user carries NaN, matching the SQL window's NULL rendered as a
    DOUBLE (the engine⇄oracle null convention the asof join established).
    One exchange on user_id, then one vectorized shift per partition.
    Emits (event_id, user_id, ts, delta_micro)."""

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype(np.int64),
                "user_id": batch["user_id"].astype(np.int64),
                "ts": batch["ts"],
                "v_micro": np.floor(
                    batch["value"].to_numpy(dtype=np.float64) * 1_000_000.0
                ).astype(np.int64),
            }
        )

    def delta_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        v = part["v_micro"].to_numpy()
        uid = part["user_id"].to_numpy()
        delta = np.empty(len(part), dtype=np.float64)
        if len(part):
            delta[0] = np.nan
            delta[1:] = np.where(
                uid[1:] == uid[:-1], (v[1:] - v[:-1]).astype(np.float64), np.nan
            )
        return pd.DataFrame(
            {
                "event_id": part["event_id"],
                "user_id": part["user_id"],
                "ts": part["ts"],
                "delta_micro": delta,
            }
        )

    return map_partitions_by_key(
        events_ds.map_batches(project, batch_format="pandas"),
        keys="user_id",
        fn=delta_part,
    )


def window_anomalies(events_ds, k_mad: int = 3):
    """Streaming rate-anomaly detection: flag hopping windows whose event
    COUNT deviates from the median window count by more than `k_mad`×MAD
    — the robust spike/outage detector, composed entirely from
    value-checked primitives (hopping replication map → count aggregate →
    the same integer median/MAD rule as `robust_outliers`, here over the
    window-count distribution via one constant-key histogram exchange
    each; window counts are time-range-bounded, never corpus-bounded).
    Emits flagged windows only: (win_start, n, med, mad)."""
    from .quantiles import group_quantiles

    hop = f"{HOP_MINUTES}min"
    back = pd.Timedelta(minutes=HOP_MINUTES)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        base = batch["ts"].dt.floor(hop)
        a = pd.DataFrame({"win_start": base})
        b = a.assign(win_start=(base - back).astype(base.dtype))
        return pd.concat([a, b], ignore_index=True)

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        # the count column is named wn, NOT n: group_quantiles' histogram
        # partial emits its own "n" count column and a value column that
        # shadows it would collide
        return batch.groupby("win_start", sort=False).size().reset_index(name="wn")

    counts = hash_aggregate(
        events_ds.map_batches(explode, batch_format="pandas").map_batches(
            count_partial, batch_format="pandas"
        ),
        keys=["win_start"],
        aggs={"wn": ("wn", "sum")},
    ).materialize()  # window-bounded artifact; three consumers below

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(_g=np.int64(0))

    med_df = group_quantiles(
        counts.map_batches(tag, batch_format="pandas"), "wn", ["_g"], [500]
    ).to_pandas()
    if len(med_df) == 0:
        raise ValueError("window_anomalies: empty event stream — no windows")
    med = int(med_df["p500"].iloc[0])

    def dev(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(
            _g=np.int64(0),
            ad=np.abs(batch["wn"].to_numpy(dtype=np.int64) - med),
        )

    mad = int(
        group_quantiles(
            counts.map_batches(dev, batch_format="pandas"), "ad", ["_g"], [500]
        ).to_pandas()["p500"].iloc[0]
    )

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["wn"].to_numpy(dtype=np.int64)
        hit = np.abs(n - med) > k_mad * mad
        out = batch.loc[hit, ["win_start"]].reset_index(drop=True)
        out["n"] = n[hit]
        out["med"] = np.int64(med)
        out["mad"] = np.int64(mad)
        return out

    return counts.map_batches(flag, batch_format="pandas")


DECAY_REF_DATE = "2024-02-01"  # fixture events end 2024-01-30


def decayed_user_value(events_ds, ref_date: str = DECAY_REF_DATE):
    """Recency-weighted per-user value: Σ value·2^(−age_days) with a
    half-life of one day — the time-decay prior every freshness-aware
    ranking/quality signal needs, kept EXACT by power-of-two decay on
    integer micro-units: decayed = v_micro // 2^age (floor division).
    Values must be non-negative (asserted loudly): DuckDB's `//`
    truncates toward zero while numpy floors, so a negative value would
    silently diverge between the engines instead of erroring.
    Pure map + one two-level aggregate; the reference date is a pinned
    constant, so no global max-ts pass. Emits (user_id, decayed_micro,
    n_events)."""
    ref = np.datetime64(ref_date)

    def decay(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.floor(
            batch["value"].to_numpy(dtype=np.float64) * 1_000_000.0
        ).astype(np.int64)
        assert (v >= 0).all(), "decayed_user_value requires non-negative values"
        age = (
            (ref - batch["ts"].to_numpy().astype("datetime64[D]"))
            / np.timedelta64(1, "D")
        ).astype(np.int64)
        age = np.clip(age, 0, 62)
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype(np.int64),
                "d": v // (np.int64(1) << age),
                "one": np.ones(len(batch), dtype=np.int64),
            }
        )

    return hash_aggregate(
        events_ds.map_batches(decay, batch_format="pandas"),
        keys=["user_id"],
        aggs={"decayed_micro": ("d", "sum"), "n_events": ("one", "sum")},
    )


GRID_YEAR, GRID_MONTH, GRID_DAYS = 2024, 1, 31


def dense_event_grid(events_ds):
    """Zero-filled dense report: event counts per (event_type, day) over
    the FULL January-2024 calendar grid — reporting needs the zeros
    (a missing day must read 0, not vanish), which no groupby alone
    produces. The distributed part is the usual two-level count
    aggregate (bounded by types × days); the grid fill is a driver-side
    cross product of the pinned calendar with the aggregate's own
    distinct types — dimension-sized, like every other report fold.
    Emits (event_type, day, n) for every grid cell."""

    def day_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "day": batch["ts"].dt.day.astype(np.int64),
            }
        ).groupby(["event_type", "day"], sort=False).size().reset_index(name="n")

    counts = hash_aggregate(
        events_ds.map_batches(day_partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"n": ("n", "sum")},
    ).to_pandas()

    types = sorted(counts["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [types, range(1, GRID_DAYS + 1)], names=["event_type", "day"]
    ).to_frame(index=False)
    grid["day"] = grid["day"].astype(np.int64)
    out = grid.merge(counts, on=["event_type", "day"], how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    return out


def cohort_retention(events_ds):
    """Cohort retention matrix — the standard activation analysis (users
    bucketed by first-active day; how many are still active `age` days
    later): per-user first-day needs each user's rows together, so ONE
    user_id exchange of pre-deduplicated (user, day) pairs (the per-batch
    drop_duplicates is the combiner — a user's many same-day events ship
    once); inside the partition the per-user min and the cell emission
    are vectorized, and the (cohort_day, age_days) cells fold through the
    bounded second aggregate (days² cells). Day key = calendar
    day-of-month over the fixture's pinned single-month window
    (dense_event_grid's convention). Emits (cohort_day, age_days,
    n_users)."""
    from .hashagg import hash_aggregate, map_partitions_by_key

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype(np.int64),
                "day": batch["ts"].dt.day.astype(np.int64),
            }
        ).drop_duplicates()

    def cells(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates()
        first = part.groupby("user_id", sort=False)["day"].transform("min")
        return (
            pd.DataFrame(
                {
                    "cohort_day": first.to_numpy(dtype=np.int64),
                    "age_days": (part["day"] - first).to_numpy(dtype=np.int64),
                }
            )
            .groupby(["cohort_day", "age_days"], sort=False)
            .size()
            .reset_index(name="n_users")
        )

    per_part = map_partitions_by_key(
        events_ds.map_batches(project, batch_format="pandas"),
        "user_id",
        cells,
    )
    return hash_aggregate(
        per_part,
        keys=["cohort_day", "age_days"],
        aggs={"n_users": ("n_users", "sum")},
    )


WINSOR_LO_PM = 10   # clamp below the 1st percentile
WINSOR_HI_PM = 990  # and above the 99th


def winsorize_values(events_ds_fn, lo_pm: int = WINSOR_LO_PM,
                     hi_pm: int = WINSOR_HI_PM):
    """Per-type winsorization — the feature-cleaning staple (clamp a
    heavy-tailed metric to its [p1, p99] band so one glitch row cannot
    dominate a model's loss): values in exact integer micro units
    (floor(value·1e6), the rolling_agg convention), per-type bounds from
    the exact distributed quantile histogram (type cardinality is
    bounded), bounds broadcast once, then a pure clamp map on the
    second pass over the factory. Two column-pruned reads by design
    (the len_outliers pattern). Emits (event_id, event_type,
    value_micro, clamped_micro)."""
    import ray

    from .quantiles import group_quantiles

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype(np.int64),
                "event_type": batch["event_type"],
                "value_micro": np.floor(
                    batch["value"].to_numpy(dtype=np.float64) * 1_000_000.0
                ).astype(np.int64),
            }
        )

    bounds = group_quantiles(
        events_ds_fn().map_batches(project, batch_format="pandas"),
        value_col="value_micro",
        keys=["event_type"],
        quantiles_permille=[lo_pm, hi_pm],
    ).to_pandas()
    bref = ray.put(
        {
            t: (int(lo), int(hi))
            for t, lo, hi in zip(
                bounds["event_type"],
                bounds[f"p{lo_pm}"],
                bounds[f"p{hi_pm}"],
            )
        }
    )

    def clamp(batch: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bref)
        d = project(batch)
        lo = d["event_type"].map(lambda t: b[t][0]).to_numpy(dtype=np.int64)
        hi = d["event_type"].map(lambda t: b[t][1]).to_numpy(dtype=np.int64)
        d["clamped_micro"] = np.minimum(
            np.maximum(d["value_micro"].to_numpy(dtype=np.int64), lo), hi
        )
        return d

    return events_ds_fn().map_batches(clamp, batch_format="pandas")


LATEST_K = 3


def latest_events(events_ds, k: int = LATEST_K):
    """Latest-N per user — the feature-store freshness view (a model's
    online features are the user's most recent interactions): grouped
    top-k by recency with the combiner prune (each batch ships at most
    k rows per user to the exchange). Emits (user_id, ts, event_id,
    rank) with rank 1 = most recent, ties to the lower event_id."""
    from .quantiles import group_topk

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype(np.int64),
                "ts": batch["ts"],
                "event_id": batch["event_id"].astype(np.int64),
            }
        )

    return group_topk(
        events_ds.map_batches(project, batch_format="pandas"),
        keys=["user_id"],
        sort_col="ts",
        k=k,
        tie_cols=["event_id"],
    )


def event_heatmap(events_ds):
    """Weekly activity heatmap — (ISO day-of-week × hour) event counts,
    the load-profile view every event pipeline ships: a pure two-level
    count aggregate bounded by 7 × 24 cells. Day convention pinned to
    ISO (1 = Monday … 7 = Sunday) so pandas (dayofweek+1) and DuckDB
    (isodow) agree exactly. Emits (isodow, hour, n)."""
    from .hashagg import hash_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "isodow": (batch["ts"].dt.dayofweek + 1).astype(np.int64),
                    "hour": batch["ts"].dt.hour.astype(np.int64),
                }
            )
            .groupby(["isodow", "hour"], sort=False)
            .size()
            .reset_index(name="n")
        )

    return hash_aggregate(
        events_ds.map_batches(partial, batch_format="pandas"),
        keys=["isodow", "hour"],
        aggs={"n": ("n", "sum")},
    )
