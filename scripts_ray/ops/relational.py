"""Relational operators: partial-then-final aggregation, broadcast joins,
top-k (SURVEY §2.4–§2.6).

Pattern: combine inside `map_batches` (one row per key per batch), then a
small `groupby().aggregate()` over the partials — the shuffle moves
pre-aggregated rows, not the raw table.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def event_agg(events_ds):
    """Per (event_type, day): count, min(value), max(value). Day cardinality
    grows with the stream's time range → two-level hash aggregate."""
    from .hashagg import hash_aggregate

    def add_day(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(day=batch["ts"].dt.date)

    return hash_aggregate(
        events_ds.map_batches(add_day, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={
            "n": ("event_id", "count"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        },
    )


def top_users(events_ds, k: int = 10):
    from .hashagg import hash_aggregate

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["user_id"]].astype(np.int64)

    return (
        hash_aggregate(
            events_ds.map_batches(project, batch_format="pandas"),
            keys="user_id",
            aggs={"n": ("user_id", "count")},
        )
        .sort(["n", "user_id"], descending=[True, False])
        .limit(k)
    )


def orders_by_segment(orders_ds, sf_dir: str):
    """Broadcast equi-join (small dimension side shipped once via ray.put)
    + partial aggregation — the map-side join pattern of SURVEY §2.4 J5/J8."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    lookup_ref = ray.put(
        dict(
            zip(
                cust["c_custkey"].to_pylist(),
                cust["c_mktsegment"].to_pylist(),
            )
        )
    )
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        batch = batch.assign(segment=batch["o_custkey"].map(lookup))
        out = (
            batch.groupby("segment", sort=False)
            .agg(n_orders=("o_orderkey", "size"),
                 min_price=("o_totalprice", "min"),
                 max_price=("o_totalprice", "max"))
            .reset_index()
        )
        out["n_orders"] = out["n_orders"].astype(np.int64)
        return out

    return (
        orders_ds.map_batches(partial, batch_format="pandas")
        .groupby("segment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Min("min_price", alias_name="min_price"),
            Max("max_price", alias_name="max_price"),
        )
    )


def q1_counts(lineitem_ds):
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(qty=batch["l_quantity"].astype(np.int64))
        out = (
            batch.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(sum_qty=("qty", "sum"), n=("qty", "size"))
            .reset_index()
        )
        out["sum_qty"] = out["sum_qty"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return out

    return (
        lineitem_ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("n", alias_name="n"))
    )


TUMBLE_MINUTES = 10


def event_windows(events_ds):
    """Tumbling-window aggregate over the events stream: epoch-aligned
    10-minute windows per event_type (the fixed-window counterpart of the
    gap-based sessionize). Two-level hash aggregate — window-key
    cardinality scales with the stream."""
    from .hashagg import hash_aggregate

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "win_start": batch["ts"].dt.floor(f"{TUMBLE_MINUTES}min"),
                "value": batch["value"],
            }
        )

    return hash_aggregate(
        events_ds.map_batches(project, batch_format="pandas"),
        keys=["event_type", "win_start"],
        aggs={
            "n": ("value", "count"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        },
    )


def q3_shipping(orders_ds, lineitem_ds, sf_dir: str, segment: str = "BUILDING",
                k: int = 10):
    """TPC-H-Q3-shaped composition: dimension-filter broadcast into the
    fact stream, then a distributed fact-by-fact shuffle join, then a
    two-level aggregate and top-k — the canonical mixed join plan
    (broadcast where one side is dimension-sized, exchange where both
    sides scale).

    Revenue is summed in integer cents (floor) so the Ray and SQL sides
    agree bit-for-bit regardless of summation order.
    """
    import pyarrow.parquet as pq
    import ray

    from .hashagg import hash_aggregate, hash_join

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(
        pc.equal(cust["c_mktsegment"], segment)
    )["c_custkey"].to_numpy(zero_copy_only=False)
    keys_ref = ray.put(np.sort(keys))

    def probe_orders(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        idx = np.searchsorted(ks, batch["o_custkey"].to_numpy())
        idx = np.minimum(idx, len(ks) - 1)
        hit = ks[idx] == batch["o_custkey"].to_numpy()
        return batch.loc[hit, ["o_orderkey", "o_orderdate"]]

    def line_revenue(batch: pd.DataFrame) -> pd.DataFrame:
        ext = batch["l_extendedprice"].to_numpy()
        disc = batch["l_discount"].to_numpy()
        return pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].astype(np.int64),
                "rev_cents": np.floor(ext * (1 - disc) * 100).astype(np.int64),
            }
        )

    joined = hash_join(
        lineitem_ds.map_batches(line_revenue, batch_format="pandas"),
        orders_ds.map_batches(probe_orders, batch_format="pandas"),
        on="o_orderkey",
        how="inner",
    )
    agg = hash_aggregate(
        joined,
        keys=["o_orderkey", "o_orderdate"],
        aggs={"revenue_cents": ("rev_cents", "sum")},
    )
    return agg.sort(
        ["revenue_cents", "o_orderkey"], descending=[True, False]
    ).limit(k)


RE_PROP_K = r'"k":\s*(?P<k>-?\d+)'


def json_props(events_ds):
    """Semi-structured property extraction: pull the integer field `k` out
    of the `props` JSON-string column, row-level — the flatten step every
    event pipeline runs before it can aggregate on a property.

    The fixture's props shape ({"k": <int>}) extracts with ONE Arrow RE2
    `extract_regex` kernel per batch (zero-copy, no Python JSON loop);
    for arbitrary nested JSON swap the kernel for a real columnar parser
    (pyarrow.json / simdjson) inside the same map — the plan (pure map,
    no exchange) is unchanged. Oracle = DuckDB `json_extract` on the same
    column, so the value check proves the regex IS a faithful JSON reader
    for this shape. Emits (event_id, k)."""
    import pyarrow.compute as pc

    def extract(batch: pa.Table) -> pa.Table:
        hit = pc.extract_regex(batch["props"].combine_chunks(), RE_PROP_K)
        k = pc.cast(pc.struct_field(hit, "k"), pa.int64())
        return pa.table({"event_id": batch["event_id"], "k": k})

    return events_ds.map_batches(extract, batch_format="pyarrow")


#: Broadcast-vs-shuffle plan threshold for the Q5 star join, in KEYS on
#: the dimension side (~64 MB of packed (int64 key, int8 nation) at the
#: default — well inside a worker heap). The decision reads parquet
#: METADATA row counts only, never data: under the limit the dim is
#: sorted + ``ray.put`` once and probed map-side (zero exchanges for
#: that edge); over it — customer/supplier scale WITH the fact data in
#: the TPC-H shape, so any 100-TB run exceeds this — the edge routes
#: through the distributed ``hash_join``. Same hybrid rule as a
#: production engine's broadcast-join threshold (e.g. Spark AQE).
Q5_BROADCAST_KEY_LIMIT = 4_000_000


def q5_local_supply(orders_ds, lineitem_ds, customer_ds, supplier_ds,
                    sf_dir: str, region: str = "AFRICA", year: int = 1995,
                    broadcast_limit: int = Q5_BROADCAST_KEY_LIMIT):
    """TPC-H-Q5-shaped composition — revenue by nation where customer and
    supplier share the nation, within one region and order year: the
    5-dimension star join plan. The genuinely fixed-size dimensions
    (region 5 rows, nation 25 rows) are always driver-read and
    closure-captured. Customer and supplier are SIZE-ROUTED per
    ``broadcast_limit`` (metadata row count, no data read): small → one
    ``ray.put`` of the region-pruned sorted key/nation arrays probed
    map-side with an equality-checked ``searchsorted`` (a dangling key is
    DROPPED — inner semantics — never mis-attributed); large → the distributed
    ``hash_join`` (the q13_custdist plan). The fact⋈fact orderkey edge
    is always a distributed join, then the two-level nation aggregate.
    Revenue in floor-integer cents, bit-equal to the SQL oracle.
    Emits (n_name, n_orders_rows, rev_cents)."""
    import pyarrow.parquet as pq
    import ray

    from .hashagg import hash_aggregate, hash_join

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"]
    in_region = np.sort(
        nation.loc[nation["n_regionkey"].isin(rkey), "n_nationkey"]
        .to_numpy(dtype=np.int64)
    )
    lo = np.datetime64(f"{year}-01-01")
    hi = np.datetime64(f"{year + 1}-01-01")

    def o_filter(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["o_orderdate"].to_numpy()
        out = batch.loc[(d >= lo) & (d < hi), ["o_orderkey", "o_custkey"]]
        return out.astype(np.int64)

    def c_filter(batch: pd.DataFrame) -> pd.DataFrame:
        # in-region prune BEFORE the exchange (25-entry key set, closure)
        nat = batch["c_nationkey"].to_numpy(dtype=np.int64)
        keep = np.isin(nat, in_region)
        return pd.DataFrame(
            {
                "c_custkey": batch["c_custkey"].to_numpy(np.int64)[keep],
                "c_nation": nat[keep],
            }
        )

    def s_filter(batch: pd.DataFrame) -> pd.DataFrame:
        nat = batch["s_nationkey"].to_numpy(dtype=np.int64)
        keep = np.isin(nat, in_region)
        return pd.DataFrame(
            {
                "s_suppkey": batch["s_suppkey"].to_numpy(np.int64)[keep],
                "s_nation": nat[keep],
            }
        )

    def l_project(batch: pd.DataFrame) -> pd.DataFrame:
        ext = batch["l_extendedprice"].to_numpy()
        disc = batch["l_discount"].to_numpy()
        return pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].astype(np.int64),
                "l_suppkey": batch["l_suppkey"].astype(np.int64),
                "rev_cents": np.floor(ext * (1 - disc) * 100).astype(np.int64),
            }
        )

    def _broadcast_dim(table: str, key_col: str, nat_col: str):
        """Region-pruned (sorted keys, nations) arrays in ONE object ref."""
        t = pq.read_table(f"{sf_dir}/{table}.parquet",
                          columns=[key_col, nat_col])
        ks = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nats = t[nat_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(nats, in_region)
        order = np.argsort(ks[keep], kind="stable")
        return ray.put((ks[keep][order], nats[keep][order]))

    def _probe(dim_ref, key_col: str, nat_out: str, inner_semantics: str):
        """Map-side inner probe: equality-checked searchsorted gather."""
        def probe(batch: pd.DataFrame) -> pd.DataFrame:
            ks, nats = ray.get(dim_ref)
            want = batch[key_col].to_numpy()
            idx = np.minimum(np.searchsorted(ks, want), len(ks) - 1)
            hit = (ks[idx] == want) if len(ks) else np.zeros(len(want), bool)
            out = batch.loc[hit].drop(columns=[key_col])
            out[nat_out] = nats[idx[hit]]
            return out
        probe.__name__ = f"probe_{inner_semantics}"
        return probe

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    n_supp = pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows

    orders_f = orders_ds.map_batches(o_filter, batch_format="pandas")
    if n_cust <= broadcast_limit:
        cust_ref = _broadcast_dim("customer", "c_custkey", "c_nationkey")
        ord_cust = orders_f.map_batches(
            _probe(cust_ref, "o_custkey", "c_nation", "customer"),
            batch_format="pandas",
        )
    else:
        ord_cust = hash_join(
            orders_f,
            customer_ds.map_batches(c_filter, batch_format="pandas"),
            on="o_custkey",
            right_on="c_custkey",
            how="inner",
        ).map_batches(
            lambda b: b[["o_orderkey", "c_nation"]], batch_format="pandas"
        )

    line_f = lineitem_ds.map_batches(l_project, batch_format="pandas")
    if n_supp <= broadcast_limit:
        supp_ref = _broadcast_dim("supplier", "s_suppkey", "s_nationkey")
        line_supp = line_f.map_batches(
            _probe(supp_ref, "l_suppkey", "s_nation", "supplier"),
            batch_format="pandas",
        )
    else:
        line_supp = hash_join(
            line_f,
            supplier_ds.map_batches(s_filter, batch_format="pandas"),
            on="l_suppkey",
            right_on="s_suppkey",
            how="inner",
        ).map_batches(
            lambda b: b[["o_orderkey", "s_nation", "rev_cents"]],
            batch_format="pandas",
        )

    joined = hash_join(line_supp, ord_cust, on="o_orderkey", how="inner")

    def local_only(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[batch["s_nation"].to_numpy() == batch["c_nation"].to_numpy()]
        return out[["c_nation", "rev_cents"]]

    agg = hash_aggregate(
        joined.map_batches(local_only, batch_format="pandas"),
        keys=["c_nation"],
        aggs={"n": ("rev_cents", "count"), "rev_cents": ("rev_cents", "sum")},
    )

    def name_nations(batch: pd.DataFrame) -> pd.DataFrame:
        names = dict(zip(nation["n_nationkey"], nation["n_name"]))
        return pd.DataFrame(
            {
                "n_name": batch["c_nation"].map(names),
                "n": batch["n"].astype(np.int64),
                "rev_cents": batch["rev_cents"].astype(np.int64),
            }
        )

    return agg.map_batches(name_nations, batch_format="pandas")


def footer_stats(sf_dir: str, table: str = "documents", key: str = "doc_id"):
    """Zone-map exhibit: global (n_rows, min, max) of a key column read
    from Parquet FOOTER metadata only — no data page is ever decoded
    (the row-group statistics ARE the answer). This is the predicate the
    engine's pruned reads rely on; surfacing it as an operator makes the
    contract testable: the oracle computes the same three numbers the
    slow way (full scan), and the value check proves the footers tell
    the truth. A multi-file corpus maps this per file via
    `ray.data.from_items(paths)` with the same per-row-group fold; the
    fixture is one file, so the fold is driver-side and O(row groups)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata
    idx = next(
        i for i in range(md.num_columns)
        if md.row_group(0).column(i).path_in_schema == key
    )
    mins, maxs, rows = [], [], 0
    for rg in range(md.num_row_groups):
        col = md.row_group(rg).column(idx)
        st = col.statistics
        assert st is not None and st.has_min_max, "footer lacks statistics"
        mins.append(st.min)
        maxs.append(st.max)
        rows += md.row_group(rg).num_rows
    return pd.DataFrame(
        {
            "n_rows": np.array([rows], dtype=np.int64),
            "min_key": np.array([min(mins)], dtype=np.int64),
            "max_key": np.array([max(maxs)], dtype=np.int64),
        }
    )


EVENT_TYPES = ("click", "view", "signup", "purchase", "error")


def user_type_matrix(events_ds, types: tuple[str, ...] = EVENT_TYPES):
    """One-pass pivot: per-user event counts, one column per (fixed,
    schema-declared) event type plus the total — conditional aggregation.
    Contrast with click_purchase_matrix's k-way outer join: indicator
    partials fold into ONE hash aggregate, so the plan costs a single
    exchange however many pivot columns there are (linear in k, the
    scalable pivot). Emits (user_id, n_<type>..., n_total)."""
    from .hashagg import hash_aggregate

    cols = [f"n_{t}" for t in types]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = {"user_id": batch["user_id"].to_numpy(dtype=np.int64)}
        et = batch["event_type"].to_numpy(dtype=object)
        for t, c in zip(types, cols):
            d[c] = (et == t).astype(np.int64)
        d["n_total"] = np.ones(len(et), dtype=np.int64)
        return (
            pd.DataFrame(d).groupby("user_id", sort=False).sum().reset_index()
        )

    return hash_aggregate(
        events_ds.map_batches(partial, batch_format="pandas"),
        keys=["user_id"],
        aggs={c: (c, "sum") for c in cols + ["n_total"]},
    )


PROFILE_COLUMNS = ("doc_id", "lang", "n_chars", "source", "text")


def column_profile(docs_ds_fn, columns: tuple[str, ...] = PROFILE_COLUMNS):
    """Per-column profiling report — the first query every new corpus
    gets (cardinality and null share drive partitioning-key and
    dictionary-encoding choices): for each column, the exact distinct
    count (two-level hash distinct — cardinality may approach row count,
    so the exchange is mandatory) and the null count. One independent
    column-pruned read per column via the factory (`docs_ds_fn(col)`
    returns a Dataset of just that column — the N-consumer re-execution
    contract made explicit and cheap: each pass reads ONLY its column's
    pages). Output is dimension-sized. Emits (column, n_rows, n_distinct,
    n_null) sorted by column name."""
    from .hashagg import distinct

    rows = []
    for col in columns:
        ds = docs_ds_fn(col)
        n_rows = ds.count()
        n_groups = distinct(ds, col).count()
        n_null = ds.filter(lambda r, c=col: r[c] is None).count()
        # SQL count(DISTINCT col) ignores NULLs; the engine's distinct()
        # keeps the null group — subtract it so both sides agree on
        # columns that contain nulls.
        n_distinct = n_groups - (1 if n_null > 0 else 0)
        rows.append((col, np.int64(n_rows), np.int64(n_distinct),
                     np.int64(n_null)))
    return pd.DataFrame(
        rows, columns=["column", "n_rows", "n_distinct", "n_null"]
    ).sort_values("column", kind="mergesort").reset_index(drop=True)


BJOIN_BUCKETS = 8


def bucket_join_events(events_ds_fn, work_dir: str,
                       n_buckets: int = BJOIN_BUCKETS):
    """Storage-co-partitioned join — the shuffle-free join a warehouse
    buys by bucketing BOTH tables on the same key at write time (the
    'pick ONE partitioning key and reuse it across stages' discipline at
    the storage layer): facts (event_id, user_id, value_micro) and the
    derived user dimension (user_id, n_total) are each written to
    user_id % n_buckets bucket files; the join then runs as n_buckets
    INDEPENDENT bucket-local merges — no exchange at join time, and a
    failed bucket can be re-joined alone (the checkpoint-layout
    resumability contract). The bucket key is a plain modulo so the SQL
    oracle is trivially the unbucketed join (bucketing is a physical
    layout choice, invisible to the result). At test scale each bucket's
    dim side loads into its map task; at real scale the same layout
    feeds a per-bucket sorted merge. Emits (event_id, user_id,
    value_micro, n_total)."""
    import shutil

    import pyarrow.parquet as pq_
    import ray.data as rd

    from .hashagg import hash_aggregate

    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(f"{work_dir}/facts", exist_ok=True)
    os.makedirs(f"{work_dir}/dim", exist_ok=True)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype(np.int64),
                "user_id": batch["user_id"].astype(np.int64),
                "value_micro": np.floor(
                    batch["value"].to_numpy(dtype=np.float64) * 1_000_000.0
                ).astype(np.int64),
                "_b": batch["user_id"].astype(np.int64) % n_buckets,
            }
        )

    # write both sides bucketed on the SAME key expression
    facts = events_ds_fn().map_batches(project, batch_format="pandas")
    facts.write_parquet(f"{work_dir}/facts", partition_cols=["_b"])
    dim = hash_aggregate(
        events_ds_fn().map_batches(
            lambda b: pd.DataFrame(
                {"user_id": b["user_id"].astype(np.int64)}
            ),
            batch_format="pandas",
        ),
        keys=["user_id"],
        aggs={"n_total": ("user_id", "count")},
    )

    def tag_dim(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_b"] = batch["user_id"].to_numpy(dtype=np.int64) % n_buckets
        return batch

    dim.map_batches(tag_dim, batch_format="pandas").write_parquet(
        f"{work_dir}/dim", partition_cols=["_b"]
    )

    # join = n_buckets independent bucket-local merges, no exchange.
    # An EMPTY bucket writes no hive partition directory at all — skip
    # absent fact buckets (and degrade an absent dim bucket to an empty
    # typed frame) instead of letting read_parquet raise FileNotFoundError.
    empty_dim = pd.DataFrame(
        {
            "user_id": np.array([], dtype=np.int64),
            "n_total": np.array([], dtype=np.int64),
        }
    )
    parts = []
    for b in range(n_buckets):
        if not os.path.isdir(f"{work_dir}/facts/_b={b}"):
            continue
        dim_b = (
            pq_.read_table(
                f"{work_dir}/dim/_b={b}", columns=["user_id", "n_total"]
            ).to_pandas()
            if os.path.isdir(f"{work_dir}/dim/_b={b}")
            else empty_dim
        )

        def merge(batch: pd.DataFrame, dim_b=dim_b) -> pd.DataFrame:
            out = batch.merge(dim_b, on="user_id", how="inner")
            return out[["event_id", "user_id", "value_micro", "n_total"]]

        parts.append(
            rd.read_parquet(
                f"{work_dir}/facts/_b={b}",
                columns=["event_id", "user_id", "value_micro"],
            ).map_batches(merge, batch_format="pandas")
        )
    if not parts:
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": np.array([], dtype=np.int64),
                    "user_id": np.array([], dtype=np.int64),
                    "value_micro": np.array([], dtype=np.int64),
                    "n_total": np.array([], dtype=np.int64),
                }
            )
        )
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out


Q13_EXCLUDE_PRIORITY = "1-URGENT"


def q13_custdist(customer_ds, orders_ds,
                 exclude_priority: str = Q13_EXCLUDE_PRIORITY):
    """TPC-H Q13 shape — the customer order-count distribution including
    ZERO-order customers (the query that punishes engines without a real
    outer join: the zeros only exist on the left-join miss side).
    Plan: filtered per-customer order counts (two-level aggregate) →
    distributed LEFT join against the customer key column → miss side
    coalesced to zero → the bounded (c_count → custdist) histogram.
    Emits (c_count, custdist)."""
    from .hashagg import hash_aggregate, hash_join

    def o_partial(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch[batch["o_orderpriority"] != exclude_priority]
        return (
            pd.DataFrame({"o_custkey": keep["o_custkey"].astype(np.int64)})
            .groupby("o_custkey", sort=False)
            .size()
            .reset_index(name="n")
        )

    counts = hash_aggregate(
        orders_ds.map_batches(o_partial, batch_format="pandas"),
        keys=["o_custkey"],
        aggs={"n": ("n", "sum")},
    )
    joined = hash_join(
        customer_ds.map_batches(
            lambda b: pd.DataFrame(
                {"c_custkey": b["c_custkey"].astype(np.int64)}
            ),
            batch_format="pandas",
        ),
        counts,
        on="c_custkey",
        right_on="o_custkey",
        how="left",
    )

    def c_partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch["n"].fillna(0).astype(np.int64)
        return (
            pd.DataFrame({"c_count": c})
            .groupby("c_count", sort=False)
            .size()
            .reset_index(name="custdist")
        )

    return hash_aggregate(
        joined.map_batches(c_partial, batch_format="pandas"),
        keys=["c_count"],
        aggs={"custdist": ("custdist", "sum")},
    )
