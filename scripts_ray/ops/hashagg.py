"""Two-level hash aggregation — the engine's scalable groupby.

Ray's native ``groupby().aggregate()`` is sort-based with per-group driver
overhead (~ms/group), which collapses at high key cardinality (dedup
fingerprints, vocabulary counts, candidate pairs: millions of groups).
The pattern here is the classic combiner shuffle instead:

1. **partial**: inside ``map_batches``, a vectorized pandas groupby
   collapses each batch to one row per key — the shuffle then moves
   pre-aggregated rows, never the raw table;
2. **partition**: each partial row gets a deterministic partition id
   ``hash(key) % num_partitions`` (siphash via
   ``pd.util.hash_pandas_object``, fixed key — stable across processes);
3. **final**: ``groupby("_part").map_groups`` sees ``num_partitions``
   groups only (constant, independent of key cardinality) and finishes
   each partition with one vectorized pandas groupby.

All keys of one group land in exactly one partition, so results are exact.
``num_partitions`` bounds the per-task working set: at 100 TB scale raise
it so (distinct keys / num_partitions) × row width fits a worker heap.

Skew strategy (north rule "salting for hot keys"), by operator class:

- **Associative aggregates** (this module): the per-batch partial IS the
  salt — a key hot in raw rows arrives at its partition as at most one
  row per upstream block, so no explicit salt column is ever needed.
- **Monotone reductions** (top-k): per-batch pre-prune bounds a hot
  group's shuffle volume at k rows per block (`quantiles.group_topk`).
- **Order-dependent per-key transforms** (conversation windows): salting
  would break within-key ordering by construction; the mitigation is the
  flagship's broadcast-window mode (`pipelines.quality_filter
  mode="broadcast"`), which removes the full-row exchange entirely, and
  the hash exchange path is validated against a 2000-turn heavy-tail
  conversation in tests/test_skew.py.
- **Inherent quadratic hot spots** (LSH band buckets): output volume is
  the skew (m-doc bucket → m(m-1)/2 pairs); `dedup.band_pairs` documents
  the pre-dedup + partition-count controls.

Reference analog: the per-batch partial counting the reference does before
its global tallies (/root/reference/src/mk-wf-dict.py:38-42,
/root/reference/src/stats-dashboard/generate-markdown.py:103-156).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

DEFAULT_PARTITIONS = 64


def _tune_shuffle() -> None:
    """Default every exchange to Ray's push-based shuffle (Exoshuffle,
    Luan et al., the pipelined map→merge→reduce shuffle): on this engine's
    narrow int-keyed exchanges it measured 18.9 s vs 22.7 s sort-based for
    the minhash candidate pipeline at 24 CPUs (the exchange is barrier/
    scheduling-bound, not bandwidth-bound, and push-based overlaps the
    merge with the map). Escape hatch: GRAFT_SORT_SHUFFLE=1 restores the
    default sort-based plan. Set on the module every exchange routes
    through, so bench, driver and tests all agree."""
    if os.environ.get("GRAFT_SORT_SHUFFLE") == "1":
        return
    from ray.data import DataContext

    DataContext.get_current().use_push_based_shuffle = True


_tune_shuffle()

# aggregation: how -> (partial pandas agg, final pandas agg)
_HOWS = {
    "sum": ("sum", "sum"),
    "count": ("size", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def _part_ids(df: pd.DataFrame, keys: list[str], num_partitions: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(df[keys], index=False)  # deterministic siphash
    return (h % np.uint64(num_partitions)).astype(np.int64).to_numpy()


def hash_aggregate(
    ds,
    keys: str | list[str],
    aggs: dict[str, tuple[str, str]],
    num_partitions: int = DEFAULT_PARTITIONS,
):
    """Exact distributed groupby-aggregate safe at any key cardinality.

    ``aggs`` maps output column -> (input column, how) with how in
    {"sum", "count", "min", "max"}. Returns a Dataset with columns
    ``keys + list(aggs)``.

    NOTE: ``"count"`` has COUNT(*) semantics — it counts rows per group
    (pandas ``size``) and IGNORES the named input column, including its
    nulls. For SQL ``COUNT(col)`` over a nullable column, filter nulls
    first or sum an ``is-not-null`` int column.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    for how in (h for _, h in aggs.values()):
        if how not in _HOWS:
            raise ValueError(f"unsupported agg: {how}")

    partial_spec = {
        out: (col, _HOWS[how][0]) for out, (col, how) in aggs.items()
    }
    final_spec = {out: (out, _HOWS[how][1]) for out, (_, how) in aggs.items()}
    count_cols = [out for out, (_, how) in aggs.items() if how == "count"]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby(keys, sort=False, dropna=False)
            .agg(**partial_spec)
            .reset_index()
        )
        for c in count_cols:
            out[c] = out[c].astype(np.int64)
        out["_part"] = _part_ids(out, keys, num_partitions)
        return out

    def final(part: pd.DataFrame) -> pd.DataFrame:
        out = (
            part.groupby(keys, sort=False, dropna=False)
            .agg(**final_spec)
            .reset_index()
        )
        for c in count_cols:
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_part")
        .map_groups(final, batch_format="pandas")
    )


def map_partitions_by_key(
    ds,
    keys: str | list[str],
    fn,
    num_partitions: int = DEFAULT_PARTITIONS,
):
    """Hash-partition rows by `keys` and apply `fn` once per partition.

    `fn` receives a pandas DataFrame holding COMPLETE key-groups (all rows
    of a key land in exactly one partition) and is expected to do its
    per-group work vectorized (`df.groupby(keys)` + transform/agg). This
    replaces ``groupby(key).map_groups(per_group_fn)`` — one Python call
    per *partition* (constant count) instead of per *group* (unbounded
    cardinality), and the all-to-all exchange sorts by a small int64
    partition id instead of the raw key.

    Skew note: a partition must fit in a worker heap. Groups are spread
    uniformly by siphash; raise `num_partitions` with data size. A single
    giant key-group still lands in one partition — per the north rule, a
    conversation is the atomic unit of ordering and must fit.
    """
    import pyarrow as pa

    keys = [keys] if isinstance(keys, str) else list(keys)

    def tag(batch: pa.Table) -> pa.Table:
        # arrow-native: hash only the key column(s), never convert the
        # full batch to pandas before the exchange
        if len(keys) == 1:
            arr = batch[keys[0]].combine_chunks().to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(arr)
        else:
            h = pd.util.hash_pandas_object(
                batch.select(keys).to_pandas(), index=False
            ).to_numpy()
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("_part", pa.array(part))

    return finalize_partitions(
        ds.map_batches(tag, batch_format="pyarrow"), fn
    )


def part_column(key_arr: np.ndarray, num_partitions: int = DEFAULT_PARTITIONS):
    """Deterministic partition ids for a key array (siphash, fixed key) —
    for producers that tag inside an existing stage to save a map pass."""
    h = pd.util.hash_array(key_arr)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def finalize_partitions(tagged_ds, fn):
    """Exchange a `_part`-tagged Dataset and run `fn` once per partition."""

    def run(part: pd.DataFrame) -> pd.DataFrame:
        # reset_index: concatenated batches carry duplicate index labels,
        # which would corrupt index-aligned assign/transform inside fn
        return fn(part.drop(columns=["_part"]).reset_index(drop=True))

    return tagged_ds.groupby("_part").map_groups(run, batch_format="pandas")


def hash_join(
    left_ds,
    right_ds,
    on: str | list[str],
    right_on: str | list[str] | None = None,
    how: str = "inner",
    num_partitions: int = DEFAULT_PARTITIONS,
    empty_right_cols: list[str] | None = None,
    empty_left_cols: list[str] | None = None,
):
    """Distributed hash join on the same two-level exchange (Ray 2.49's
    native ``Dataset.join`` relies on the hash-shuffle backend that hangs
    in local mode). `how`: 'inner' | 'left' | 'outer' | 'semi' | 'anti' —
    semi/anti emit left columns only (membership tested per partition with
    right keys deduplicated, so duplicate right keys never multiply rows);
    'outer' is a full outer join (unmatched rows of BOTH sides survive
    with the other side's columns null). Both sides are tagged with the same deterministic key
    partition id and a side marker, unioned, exchanged once, and merged
    per partition with a vectorized pandas merge. Use ONLY when both sides
    are large — a dimension-sized right side should be broadcast
    (``ray.put`` + map-side lookup) instead of shuffled.

    `empty_right_cols` / `empty_left_cols`: a FULLY-FILTERED Ray Dataset
    drops its blocks and with them its schema (``schema()`` is None),
    which a caller whose side can legitimately come up empty (e.g. "no
    corpus-frequent shingles", "every doc gated out") must anticipate:
    pass that side's column names and the join degrades gracefully — an
    empty right under 'left' appends its columns as nulls, any other
    empty side yields a typed empty result."""
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"unsupported join type: {how!r}")

    lschema = left_ds.schema(fetch_if_missing=True)
    if lschema is None:
        if empty_left_cols is None:
            raise ValueError(
                "hash_join: left side is empty and lost its schema; pass "
                "empty_left_cols=[...] if an empty left side is expected"
            )
        # empty left: inner/left/semi/anti are all empty — emit a typed
        # empty frame per right block so downstream keeps the column set;
        # outer keeps every right row with null left columns
        rcols_hint = empty_right_cols or []

        def empty_out(batch: pd.DataFrame) -> pd.DataFrame:
            cols = list(
                dict.fromkeys(
                    list(empty_left_cols) + list(batch.columns) + list(rcols_hint)
                )
            )
            out = batch.convert_dtypes().reindex(columns=cols)
            return out if how == "outer" else out.head(0)

        return right_ds.map_batches(empty_out, batch_format="pandas")
    left_cols = lschema.names
    rschema = right_ds.schema(fetch_if_missing=True)
    if rschema is None:
        if empty_right_cols is None:
            raise ValueError(
                "hash_join: right side is empty and lost its schema; pass "
                "empty_right_cols=[...] if an empty right side is expected"
            )

        if how == "anti":
            return left_ds  # nothing to exclude

        def pad(batch: pd.DataFrame) -> pd.DataFrame:
            if how == "semi":
                return batch.head(0)
            # dedupe against existing columns — the key columns appear in
            # BOTH the left batch and an empty_right_cols hint, and a
            # duplicated column name poisons every downstream block op
            cols = list(
                dict.fromkeys(list(batch.columns) + list(empty_right_cols))
            )
            out = batch.convert_dtypes().reindex(columns=cols)
            return out if how in ("left", "outer") else out.head(0)

        return left_ds.map_batches(pad, batch_format="pandas")
    right_cols = rschema.names
    # the tagged union collapses same-named columns, so non-key columns
    # must be disjoint (rename before joining) and the internal tag
    # columns must be free
    shared = (set(left_cols) & set(right_cols)) - set(on) - set(right_on)
    if shared:
        raise ValueError(
            f"hash_join: non-key columns shared by both sides {sorted(shared)}; "
            "rename one side before joining"
        )
    reserved = {"_part", "_side"} & set(left_cols + right_cols)
    if reserved:
        raise ValueError(f"hash_join: reserved column names in input {sorted(reserved)}")
    all_cols = list(dict.fromkeys(left_cols + right_cols))

    def tag_side(keys: list[str], side: int):
        def tag(batch: pd.DataFrame) -> pd.DataFrame:
            # nullable dtypes: the union pads each side with the other's
            # columns as NA, which must not coerce ints to floats
            out = batch.convert_dtypes().reindex(columns=all_cols)
            out["_part"] = _part_ids(batch, keys, num_partitions)
            out["_side"] = np.int8(side)
            return out

        return tag

    unioned = left_ds.map_batches(tag_side(on, 0), batch_format="pandas").union(
        right_ds.map_batches(tag_side(right_on, 1), batch_format="pandas")
    )

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        part = part.reset_index(drop=True)
        left = part.loc[part["_side"] == 0, left_cols]
        right = part.loc[part["_side"] == 1, right_cols]
        if how in ("semi", "anti"):
            rk = right[right_on].drop_duplicates()
            rk.columns = on
            m = left.merge(rk, how="left", on=on, indicator=True)
            want = "both" if how == "semi" else "left_only"
            return m.loc[m["_merge"] == want, left_cols]
        return left.merge(right, how=how, left_on=on, right_on=right_on)

    return (
        unioned.groupby("_part")
        .map_groups(merge, batch_format="pandas")
    )


def distinct(ds, keys: str | list[str], num_partitions: int = DEFAULT_PARTITIONS):
    """Distributed DISTINCT over `keys` (per-batch dedup, then per-partition
    dedup — same two-level shape as hash_aggregate)."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[keys].drop_duplicates()
        out = out.assign(_part=_part_ids(out, keys, num_partitions))
        return out

    def final(part: pd.DataFrame) -> pd.DataFrame:
        return part[keys].drop_duplicates()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_part")
        .map_groups(final, batch_format="pandas")
    )


def salted_join(
    left_ds,
    right_ds,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    hot_keys=(),
    salt: int = 8,
    num_partitions: int = DEFAULT_PARTITIONS,
):
    """Skew-aware hash join: rows whose join key is in `hot_keys` are
    salted into `salt` sub-keys on the probe (left) side and REPLICATED
    `salt`× on the build (right) side, so a hot key's rows spread over
    `salt` partitions instead of landing on one straggler — the standard
    treatment for the heavy-hitter keys every web corpus has (one domain,
    one template, one bot user). The result is row-identical to
    `hash_join` for 'inner' | 'left' | 'semi' | 'anti'; 'outer' is
    rejected (a replicated unmatched build row would surface `salt`
    times). Which salt a probe row draws is irrelevant to the result
    (each salt bucket holds a full copy of the build rows for that key),
    so the salt assignment needs no determinism.

    `hot_keys` is a SMALL driver-known set (from a prior heavy-hitter
    sketch — e.g. cms_registers — or domain knowledge), broadcast by
    closure capture; never a corpus-sized structure."""
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"salted_join: unsupported join type {how!r}")
    rkey = right_on or on
    hot = frozenset(hot_keys)

    def salt_probe(batch: pd.DataFrame) -> pd.DataFrame:
        s = np.where(
            batch[on].isin(hot),
            np.arange(len(batch), dtype=np.int64) % salt,
            0,
        )
        return batch.assign(_jsalt=s.astype(np.int64))

    def salt_build(batch: pd.DataFrame) -> pd.DataFrame:
        ishot = batch[rkey].isin(hot).to_numpy()
        cold = batch.loc[~ishot].assign(_jsalt=np.int64(0))
        hotr = batch.loc[ishot]
        if len(hotr) == 0:
            return cold
        rep = hotr.loc[hotr.index.repeat(salt)].assign(
            _jsalt=np.tile(np.arange(salt, dtype=np.int64), len(hotr))
        )
        return pd.concat([cold, rep], ignore_index=True)

    joined = hash_join(
        left_ds.map_batches(salt_probe, batch_format="pandas"),
        right_ds.map_batches(salt_build, batch_format="pandas"),
        on=[on, "_jsalt"],
        right_on=[rkey, "_jsalt"],
        how=how,
        num_partitions=num_partitions,
    )

    def drop_salt(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop(columns=["_jsalt"])

    return joined.map_batches(drop_salt, batch_format="pandas")


def run_pair_indices(new: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    """All within-run (i < j) index pairs of a run-sorted array, given its
    run-boundary mask (`new[i]` True where row i starts a new run): the
    shared vectorized kernel behind intra-bucket LSH pair expansion,
    similarity-join blocking, and wedge generation — one fancy-index +
    ``np.triu_indices`` pass per DISTINCT run size, never per run.
    Returns (ia, ib) row-index arrays (possibly empty)."""
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, len(new)))
    out_a, out_b = [], []
    for m in np.unique(sizes):
        if m < 2:
            continue
        s = starts[sizes == m]
        mat = s[:, None] + np.arange(m)[None, :]
        r, c = np.triu_indices(m, k=1)
        out_a.append(mat[:, r].ravel())
        out_b.append(mat[:, c].ravel())
    if not out_a:
        e = np.array([], dtype=np.int64)
        return e, e.copy()
    return np.concatenate(out_a), np.concatenate(out_b)
