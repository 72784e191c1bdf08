"""The flagship quality-filter pipeline as a streaming Ray Data DAG.

    transcripts
      → scrub        (stateless map_batches, zero-copy Arrow, RE2 kernels)
      → score        (actor pool: unigram model + stopword sets loaded once
                      per actor; token signals, langid, ppl — the stateful
                      analog of the reference's model stages
                      /root/reference/src/cur-prot/reclassify.py:84-116)
      → gate         (stateless map_batches; integer decision logic)
      → ordered pass (groupby(conv_id) + in-group sort(turn_idx):
                      pre-system demotion, stable emit — the reference's
                      ordered document scans, split_into_sections.py:96-108)

No stage materializes the dataset; the one all-to-all exchange is the
final groupby on conv_id (hash partitioning — a conversation never
straddles groups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import gate as gate_mod
from .rules import scrub_text
from .tokens import UnigramScores, token_signals

SIGNAL_COLS = ["n_chars", "n_symbols", "n_tokens", "n_distinct", "n_sv", "n_en"]


def scrub_batch(batch: pa.Table) -> pa.Table:
    from .faults import maybe_fail_once

    maybe_fail_once()  # no-op unless a retry test armed the fault marker
    return batch.append_column(
        "scrubbed_text", scrub_text(batch["text"].combine_chunks())
    )


class Scorer:
    """Actor-pool stage: model state built ONCE per actor in __init__.

    `counts_ref` is a `ray.put` handle to the unigram count dict (broadcast
    once, not re-shipped per batch)."""

    def __init__(self, counts_ref):
        import ray

        counts = ray.get(counts_ref) if not isinstance(counts_ref, dict) else counts_ref
        self.model = UnigramScores(counts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .faults import maybe_fail_once

        maybe_fail_once()  # no-op unless a retry test armed the fault marker
        sig = token_signals(batch["scrubbed_text"].combine_chunks(), self.model)
        lang = gate_mod.detect_lang(sig["n_sv"], sig["n_en"])
        ppl = gate_mod.ppl_score(
            sig["tok_score_sum"], sig["n_tokens"], self.model.drop_score
        )
        for c in SIGNAL_COLS:
            batch = batch.append_column(c, pa.array(sig[c], type=pa.int64()))
        batch = batch.append_column("lang", pa.array(lang, type=pa.string()))
        batch = batch.append_column("ppl_score", pa.array(ppl, type=pa.int64()))
        return batch


def gate_batch(batch: pa.Table, protected_roles=None) -> pa.Table:
    from .schema import PROTECTED_ROLES

    cols = {c: batch[c].to_numpy(zero_copy_only=False) for c in SIGNAL_COLS}
    keep, reason = gate_mod.decide(
        role=batch["role"].to_numpy(zero_copy_only=False),
        lang=batch["lang"].to_numpy(zero_copy_only=False),
        ppl=batch["ppl_score"].to_numpy(zero_copy_only=False),
        n_chars=cols["n_chars"],
        n_symbols=cols["n_symbols"],
        n_tokens=cols["n_tokens"],
        n_distinct=cols["n_distinct"],
        protected_roles=(
            PROTECTED_ROLES if protected_roles is None else protected_roles
        ),
    )
    batch = batch.append_column("keep", pa.array(keep, type=pa.bool_()))
    batch = batch.append_column("drop_reason", pa.array(reason, type=pa.string()))
    return batch


def gate_batch_trained(batch: pa.Table, trained_weights: dict) -> pa.Table:
    """Pluggable-classifier gate (§2 ML3): the per-turn keep decision comes
    from the DISTRIBUTED-TRAINED linear model (ops.train) instead of the
    rule cascade; protected roles are still never re-labeled (the
    reference's exclude list, reclassify.py:114). Dropped turns carry
    drop_reason='model' — the analog of the reference classifier's
    note-vs-utterance verdict."""
    from .ops.train import FEATURE_COLS, trained_keep
    from .schema import PROTECTED_ROLES

    protected = np.isin(
        batch["role"].to_numpy(zero_copy_only=False), list(PROTECTED_ROLES)
    )
    model_keep = trained_keep(
        {c: batch[c].to_numpy(zero_copy_only=False) for c in FEATURE_COLS},
        trained_weights,
    )
    keep = protected | model_keep
    reason = np.where(keep, None, "model")
    batch = batch.append_column("keep", pa.array(keep, type=pa.bool_()))
    batch = batch.append_column(
        "drop_reason", pa.array(reason, type=pa.string())
    )
    return batch


OUT_COLS = [
    "conv_id",
    "turn_idx",
    "role",
    "scrubbed_text",
    "lang",
    "ppl_score",
    "keep",
    "drop_reason",
]


def ordered_pass(part: pd.DataFrame) -> pd.DataFrame:
    """Conversation-ordered finalize over a whole hash partition: demote
    assistant turns preceding the first `system` turn of their conversation
    (vectorized across all conversations in the partition — the same
    semantics as gate.demote_pre_system per group)."""
    part = part.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    sys_turn = part["turn_idx"].where(part["role"].eq("system"))
    first_sys = sys_turn.groupby(part["conv_id"]).transform("min")
    demote = (
        part["turn_idx"].lt(first_sys)  # NaN (no system turn) compares False
        & part["role"].eq("assistant")
        & part["keep"]
    )
    part.loc[demote, "keep"] = False
    part.loc[demote, "drop_reason"] = "pre_system"
    return part[OUT_COLS]


class ScrubScoreGate(Scorer):
    """Fused per-turn stage for the flagship DAG: scrub → score → gate →
    partition-tag in one actor call. Model state loads once per actor
    (inherited __init__); fusing the stateless neighbours into the same
    call avoids shipping intermediate columns through the object store, and
    the output is projected so the exchange never moves the raw text or
    signal columns."""

    def __init__(self, counts_ref, num_partitions: int = 64, trained_weights=None):
        super().__init__(counts_ref)
        self.num_partitions = num_partitions
        self.trained_weights = trained_weights

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ops.hashagg import part_column

        scored = super().__call__(scrub_batch(batch))
        gated = (
            gate_batch(scored)
            if self.trained_weights is None
            else gate_batch_trained(scored, self.trained_weights)
        )
        out = gated.select(OUT_COLS)
        part = part_column(
            out["conv_id"].combine_chunks().to_numpy(zero_copy_only=False),
            self.num_partitions,
        )
        return out.append_column("_part", pa.array(part))


def ordered_pass_arrow(part: pa.Table) -> pa.Table:
    """Arrow-native ordered finalize over a whole hash partition: same
    semantics as `ordered_pass` without a pandas round-trip. conv_id is
    dictionary-encoded once (C); per-conversation first-system turns are
    computed with np.minimum.at over the int32 codes; the stable
    (conv_id, turn_idx) emit order is one integer lexsort + one take."""
    import pyarrow.compute as pc

    codes_arr = pc.dictionary_encode(part["conv_id"].combine_chunks())
    codes = codes_arr.indices.to_numpy(zero_copy_only=False)
    n_convs = len(codes_arr.dictionary)
    turn = part["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
    role = part["role"].combine_chunks()
    keep = part["keep"].combine_chunks().to_numpy(zero_copy_only=False)

    is_sys = pc.equal(role, "system").to_numpy(zero_copy_only=False)
    first_sys = np.full(n_convs, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first_sys, codes[is_sys], turn[is_sys].astype(np.int64))
    is_asst = pc.equal(role, "assistant").to_numpy(zero_copy_only=False)
    demote = (turn < first_sys[codes]) & is_asst & keep

    new_keep = keep & ~demote
    reason = part["drop_reason"].combine_chunks()
    reason = pc.if_else(pa.array(demote), pa.scalar("pre_system"), reason)

    out = part.set_column(
        part.schema.get_field_index("keep"), "keep", pa.array(new_keep)
    ).set_column(part.schema.get_field_index("drop_reason"), "drop_reason", reason)
    order = np.lexsort((turn, codes))
    return out.select(OUT_COLS).take(pa.array(order))


def conv_first_sys(ds) -> pd.Series:
    """Pre-pass for the broadcast-window flagship variant: per-conversation
    index of the first `system` turn, computed from a COLUMN-PRUNED scan
    (conv_id, turn_idx, role only — the text never moves) through the
    two-level hash aggregate. Output is one row per conversation — the
    only state the ordered pass needs."""
    from .ops.hashagg import hash_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch.loc[batch["role"].eq("system"), ["conv_id", "turn_idx"]]
        return m.rename(columns={"turn_idx": "first_sys"})

    agg = hash_aggregate(
        ds.select_columns(["conv_id", "turn_idx", "role"]).map_batches(
            partial, batch_format="pandas"
        ),
        keys="conv_id",
        aggs={"first_sys": ("first_sys", "min")},
    ).to_pandas()
    return pd.Series(
        agg["first_sys"].to_numpy(dtype=np.int64),
        index=agg["conv_id"].to_numpy(),
    )


def conv_first_sys_from_files(path: str, cpu_limit: int | None = None) -> pd.Series:
    """Fast pre-pass over an on-disk shard directory: a pyarrow dataset
    scan of ONLY (conv_id, turn_idx) with a role=='system' predicate
    (column + predicate pushdown at the parquet reader, arrow's internal
    thread pool — no Ray tasks), then one pandas groupby-min. Only the
    system-turn rows ever materialize, so the driver-side work stays a
    small fraction of the corpus.

    This is the small/medium-corpus fast path; `conv_first_sys` (the
    Dataset two-level aggregate) is the general path when the filtered
    projection no longer fits one process. `cpu_limit` caps arrow's thread
    pool so scaling measurements at a reduced CPU budget stay honest."""
    import pyarrow as _pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    if cpu_limit is not None:
        _pa.set_cpu_count(cpu_limit)
    t = pads.dataset(path, format="parquet").to_table(
        columns=["conv_id", "turn_idx"], filter=pc.field("role") == "system"
    )
    if t.num_rows == 0:
        return pd.Series(dtype=np.int64)
    df = t.to_pandas()
    return df.groupby("conv_id", sort=False)["turn_idx"].min().astype(np.int64)


class ScrubScoreGateDemote(Scorer):
    """Fully fused flagship stage for the broadcast-window mode: scrub →
    score → gate → pre-system demotion in ONE actor call, using the
    broadcast per-conv `first_sys` map instead of a full-row exchange.
    The heavy text column never crosses the object store a second time.

    NOTE: the constructor takes ONE ``ray.put`` handle bundling
    (counts, first_sys). Passing two separate ObjectRefs as actor
    constructor args stalls Ray 2.49's actor pool indefinitely at high
    concurrency (observed at 24 actors / 32 CPUs; cf. ray#53727's
    constructor-args-in-object-store caveat) — bundle, don't multiply."""

    def __init__(self, bundle_ref):
        import ray

        bundle = (
            ray.get(bundle_ref) if not isinstance(bundle_ref, tuple) else bundle_ref
        )
        counts, fs = bundle[:2]
        self.trained_weights = bundle[2] if len(bundle) > 2 else None
        super().__init__(counts)
        self.first_sys = fs

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        scored = super().__call__(scrub_batch(batch))
        gated = (
            gate_batch(scored)
            if self.trained_weights is None
            else gate_batch_trained(scored, self.trained_weights)
        )
        out = gated.select(OUT_COLS)
        conv = out["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        fs = self.first_sys.reindex(conv).to_numpy(dtype=np.float64)  # NaN: no system turn
        turn = out["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = out["keep"].combine_chunks().to_numpy(zero_copy_only=False)
        is_asst = pc.equal(out["role"].combine_chunks(), "assistant").to_numpy(
            zero_copy_only=False
        )
        demote = keep & is_asst & (turn < fs)  # NaN compares False
        new_keep = keep & ~demote
        reason = pc.if_else(
            pa.array(demote),
            pa.scalar("pre_system"),
            out["drop_reason"].combine_chunks(),
        )
        out = out.set_column(
            out.schema.get_field_index("keep"), "keep", pa.array(new_keep)
        )
        return out.set_column(
            out.schema.get_field_index("drop_reason"), "drop_reason", reason
        )


def quality_filter(
    ds,
    counts_ref,
    *,
    score_concurrency=(1, 4),
    batch_size=4096,
    num_partitions=64,
    mode="exchange",
    first_sys_ref=None,
    trained_weights=None,
):
    """Compose the flagship DAG over a transcripts Dataset.

    mode="exchange" (default, fully general): one all-to-all hash exchange
    on conv_id feeds the ordered finalize — works at ANY conversation
    cardinality; the text column crosses the object store once.

    mode="broadcast": two-pass window — a column-pruned pre-pass aggregates
    the per-conv ordered state (first_sys, one row per conversation), which
    is broadcast into a fully fused per-batch stage; NO full-row exchange.
    Output rows are identical (equivalence pytest); only their order and
    file layout differ (per-input-shard instead of per-conv-bucket).
    Applicable while the conv-level state fits worker memory (~10⁸ convs);
    beyond that, fall back to exchange mode or shard the lookup."""
    if mode == "broadcast":
        import ray

        first_sys = (
            conv_first_sys(ds)
            if first_sys_ref is None
            else (ray.get(first_sys_ref) if not isinstance(first_sys_ref, pd.Series)
                  else first_sys_ref)
        )
        counts = ray.get(counts_ref) if not isinstance(counts_ref, dict) else counts_ref
        # ONE bundled broadcast ref (see ScrubScoreGateDemote note)
        bundle_ref = ray.put((counts, first_sys, trained_weights))
        return ds.map_batches(
            ScrubScoreGateDemote,
            fn_constructor_args=(bundle_ref,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=score_concurrency,
            num_cpus=1,
        )
    if mode != "exchange":
        raise ValueError(f"unknown mode: {mode!r}")

    scored = ds.map_batches(
        ScrubScoreGate,
        fn_constructor_args=(counts_ref, num_partitions, trained_weights),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=score_concurrency,
        num_cpus=1,
    )

    def run(part: pa.Table) -> pa.Table:
        return ordered_pass_arrow(part.drop_columns(["_part"]))

    return scored.groupby("_part").map_groups(run, batch_format="pyarrow")


def run_stages(ds, stage_names, counts_ref, *, num_partitions=64):
    """Declared stage chaining — the engine analog of the reference's
    ordered stage list (/root/reference/src/cur-prot/post-pipeline.py:4-16,
    135-146): a pipeline is an ordered list of NAMED stages applied to one
    Dataset. Stages compose lazily; nothing materializes between them."""
    from .ops.hashagg import map_partitions_by_key

    registry = {
        "scrub": lambda d: d.map_batches(scrub_batch, batch_format="pyarrow"),
        "score": lambda d: d.map_batches(
            Scorer,
            fn_constructor_args=(counts_ref,),
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=(1, 4),
            num_cpus=1,
        ),
        "gate": lambda d: d.map_batches(gate_batch, batch_format="pyarrow"),
        "ordered": lambda d: map_partitions_by_key(
            d, "conv_id", ordered_pass, num_partitions=num_partitions
        ),
    }
    for name in stage_names:
        if name not in registry:
            raise KeyError(f"unknown stage: {name!r} (have {sorted(registry)})")
        ds = registry[name](ds)
    return ds


def build_model_counts(sf_dir: str) -> dict[str, int]:
    """Unigram counts from the `documents` table (the 'pretrained' LM corpus,
    analog of the fastText embedding corpus the reference loads,
    /root/reference/src/build_classifier.py:116-118). Documents is the small
    side — read directly; at 100 TB scale this table is still dimension-sized
    and would be refreshed offline like the reference's wikidata dims."""
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].combine_chunks()
    from .tokens import explode

    _, toks = explode(texts)
    vals, cnts = np.unique(toks, return_counts=True)
    return dict(zip(vals.tolist(), cnts.tolist()))
