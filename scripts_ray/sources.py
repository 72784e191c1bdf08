"""Transcript sources.

Two deterministic ways to obtain the canonical transcripts table:

1. `derive_transcripts_*` — a pure function of the driver-provided
   `events` × `documents` Parquet tables: every event becomes one turn,
   with text drawn from `documents` by ``event_id % n_docs`` and a noise
   decoration selected by ``event_id % 13``. The same derivation is
   expressed as a DuckDB CTE in `scripts_ray.sql`, which is what makes the
   whole pipeline oracle-checkable end-to-end.

2. `synth_transcripts` — a seeded generator with a skewed
   conversation-length distribution (most convs 5–50 turns, heavy tail),
   used for skew/resume tests and for bench-scale amplification.

The noise variants plant exactly the corruption shapes the reference's
repair stages target ($ for § OCR damage
/root/reference/src/cur-prot/dollar_sign_replace.py:79-80, soft hyphens
:44-47, split ALLCAPS names /root/reference/src/cur-prot/fix_capitalized_dashes.py:19)
plus quality-filter triggers (PII, repetition, non-target language,
short/symbol-heavy turns).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .rules import SOFT_HYPHEN

N_NOISE_VARIANTS = 13

SV_INJECT = "och att det som en är på för med av inte den "
REP_INJECT = "spam " * 60
SYMBOL_SOUP = "#$%&*@! ###"

ROLE_BY_EVENT_TYPE = {
    "click": "user",
    "view": "assistant",
    "signup": "system",
    "purchase": "tool",
    "error": "moderator",
}


def inject_noise(event_id: pa.Array, text: pa.Array) -> pa.Array:
    """Decorate `text` deterministically by ``event_id % 13`` (vectorized)."""
    k = pa.array(
        event_id.to_numpy(zero_copy_only=False) % N_NOISE_VARIANTS, type=pa.int32()
    )
    n = len(text)

    def const(s: str) -> pa.Array:
        return pa.array([s] * n, type=pa.string())

    def prefix(p: str) -> pa.Array:
        return pc.binary_join_element_wise(const(p), text, "")

    eid_str = pc.cast(event_id, pa.string())
    email_txt = pc.binary_join_element_wise(
        const("kontakta user"), eid_str, const("@example.com nu "), text, ""
    )
    double_space = pc.replace_substring(text, pattern=" ", replacement="  ")

    variants = [
        prefix("$ 4 om $ "),                      # 0: starts-with-$ OCR shape
        prefix("8 14. "),                          # 1: `8 NN.` OCR shape
        prefix("12 $ "),                           # 2: `NN $` OCR shape
        prefix("hyphen" + SOFT_HYPHEN + "ated "),  # 3: soft hyphen
        prefix("ANDERS- SON sade: "),              # 4: split ALLCAPS name
        email_txt,                                 # 5: PII email
        prefix("ring +46 70 123 45 67 "),          # 6: PII phone
        const("ok"),                               # 7: too short
        const(SYMBOL_SOUP),                        # 8: symbol-heavy
        prefix(REP_INJECT),                        # 9: repetition
        prefix(SV_INJECT),                         # 10: Swedish marker turn
        double_space,                              # 11: whitespace damage
        text,                                      # 12: clean
    ]
    out = variants[-1]
    for i in range(N_NOISE_VARIANTS - 1, -1, -1):
        out = pc.if_else(pc.equal(k, i), variants[i], out)
    return out


def _event_columns(events: pa.Table, doc_texts: pa.Array) -> pa.Table:
    """Attach conv_id / role / text / tool to raw event rows (no turn_idx yet).

    `doc_texts` is the full documents text column (small side, broadcast)."""
    event_id = events["event_id"].combine_chunks()
    user_id = events["user_id"].combine_chunks()
    event_type = events["event_type"].combine_chunks()

    n_docs = len(doc_texts)
    doc_idx = pa.array(
        event_id.to_numpy(zero_copy_only=False) % n_docs, type=pa.int64()
    )
    base_text = pc.take(doc_texts, doc_idx)
    text = inject_noise(event_id, base_text)

    uid_str = pc.utf8_lpad(pc.cast(user_id, pa.string()), 6, "0")
    conv_id = pc.binary_join_element_wise(
        pa.array(["conv-"] * len(events), type=pa.string()), uid_str, ""
    )

    role = pa.array(
        pd.Series(event_type.to_pandas()).map(ROLE_BY_EVENT_TYPE).to_numpy(),
        type=pa.string(),
    )
    tool = pc.if_else(
        pc.equal(event_type, "purchase"),
        pa.array(["checkout"] * len(events), type=pa.string()),
        pa.array([None] * len(events), type=pa.string()),
    )
    return pa.table(
        {
            "conv_id": conv_id,
            "event_id": event_id,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": events["ts"].combine_chunks(),
        }
    )


def load_doc_texts(sf_dir: str) -> pa.Array:
    """Documents text column — the small broadcast side of the derivation."""
    return (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .sort_by("doc_id")["text"]
        .combine_chunks()
    )


def derive_transcripts_table(sf_dir: str) -> pa.Table:
    """Single-process derivation (oracle/test path): full table in memory."""
    events = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    tbl = _event_columns(events, load_doc_texts(sf_dir))
    df = tbl.to_pandas()
    df = df.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
    df["turn_idx"] = df.groupby("conv_id").cumcount().astype("int32")
    df = df.drop(columns=["event_id"])
    return pa.Table.from_pandas(
        df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]],
        preserve_index=False,
    ).cast(
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("role", pa.string()),
                ("text", pa.string()),
                ("tool", pa.string()),
                ("ts", pa.timestamp("us")),
            ]
        )
    )


def derive_transcripts_ds(sf_dir: str):
    """Ray Data derivation: streaming read of `events`, documents broadcast
    once via ``ray.put``, per-batch column attach, then one hash-partition
    exchange on conv_id to assign `turn_idx` by (ts, event_id) rank —
    vectorized per partition, not per conversation.

    This is the engine's analog of the reference's corpus reader + sorted
    processing order (/root/reference/src/cur-prot/redetect.py:35-37)."""
    import ray
    import ray.data as rd

    from .ops.hashagg import map_partitions_by_key

    doc_ref = ray.put(load_doc_texts(sf_dir))

    def attach(batch: pa.Table) -> pa.Table:
        return _event_columns(batch, ray.get(doc_ref))

    def rank(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
        part["turn_idx"] = (
            part.groupby("conv_id", sort=False).cumcount().astype(np.int32)
        )
        return part[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]

    return map_partitions_by_key(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        ).map_batches(attach, batch_format="pyarrow"),
        "conv_id",
        rank,
    )


# --------------------------------------------------------------------------
# Seeded synthetic generator (skewed conv lengths; FIXTURES.md F1 shape)
# --------------------------------------------------------------------------

_SYNTH_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch line sort "
    "window the a stream group big vector filter data column join small customer "
    "query order spark"
).split()


def synth_transcripts(
    n_convs: int = 50,
    seed: int = 7,
    max_tail_turns: int = 2000,
    replicate: int = 1,
) -> pa.Table:
    """Deterministic skewed transcript table. Most conversations have 5–50
    turns; ~2% form a heavy tail up to `max_tail_turns` (north-rule skew).
    `replicate` repeats the corpus under distinct conv_ids (bench scaling)."""
    rng = np.random.default_rng(seed)
    lengths = rng.integers(5, 51, size=n_convs)
    tail = rng.random(n_convs) < 0.02
    lengths[tail] = rng.integers(200, max_tail_turns + 1, size=int(tail.sum()))

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    role_cycle = ["user", "assistant", "system", "tool", "moderator"]
    counter = 0
    for rep in range(replicate):
        for c in range(n_convs):
            cid = f"synth-{rep:03d}-{c:06d}"
            n = int(lengths[c])
            words = rng.choice(_SYNTH_VOCAB, size=(n, 12))
            for t in range(n):
                base = " ".join(words[t])
                conv_ids.append(cid)
                turn_idxs.append(t)
                roles.append(role_cycle[(c + t) % len(role_cycle)])
                texts.append(base)
                tools.append("checkout" if role_cycle[(c + t) % 5] == "tool" else None)
                tss.append(base_ts + np.timedelta64(counter, "s"))
                counter += 1
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    noisy = inject_noise(tbl["event_id"].combine_chunks(), tbl["text"].combine_chunks())
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idxs, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": noisy,
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(tss, type=pa.timestamp("us")),
        }
    )


# ---- JSONL source (S4) -----------------------------------------------------


def documents_jsonl_path(sf_dir: str) -> str:
    """Materialize the documents table as sharded JSONL once (cached under
    /tmp, atomic rename). The JSON reader analog of the reference's
    line-delimited document inputs (/root/reference/src: JSON page/doc
    readers); at scale the shards would live in object storage and
    `read_json` streams them exactly like Parquet."""
    import os

    import ray.data as rd

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/docs_jsonl_{tag}"
    if not os.path.exists(path):
        tmp = path + ".tmp"
        (
            rd.read_parquet(f"{sf_dir}/documents.parquet")
            .repartition(8)
            .write_json(tmp)
        )
        os.rename(tmp, path)
    return path


def read_documents_jsonl(sf_dir: str):
    """Streaming JSONL read of the documents corpus (S4). Returns a Dataset
    schema-identical to the Parquet read, so every documents operator can
    run over either source."""
    import ray.data as rd

    return rd.read_json(documents_jsonl_path(sf_dir))


# ---- CSV source (S3/S7 read side) -------------------------------------------


def documents_csv_path(sf_dir: str) -> str:
    """Materialize the documents table as sharded CSV once (cached under
    /tmp, atomic rename) — the CSV twin of `documents_jsonl_path`, standing
    in for the reference's CSV inputs (metadata tables, segmentation
    side-channel frames, /root/reference/src/cur-prot/resegment.py:38)."""
    import os

    import ray.data as rd

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/docs_csv_{tag}"
    if not os.path.exists(path):
        tmp = path + ".tmp"
        (
            rd.read_parquet(f"{sf_dir}/documents.parquet")
            .repartition(8)
            .write_csv(tmp)
        )
        os.rename(tmp, path)
    return path


def read_documents_csv(sf_dir: str):
    """Streaming CSV read of the documents corpus, schema-identical to the
    Parquet read (S7's df.to_csv/read_csv pairs re-expressed as a proper
    sharded source)."""
    import ray.data as rd

    return rd.read_csv(documents_csv_path(sf_dir))
