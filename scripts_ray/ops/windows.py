"""Ordered / window transforms over conversations (the shuffle-heavy core).

All operators here require per-conversation ordering. Execution shape:
ONE hash-partition exchange on `conv_id` (`hashagg.map_partitions_by_key`),
then each partition — holding complete conversations — is processed by a
single vectorized pandas pass (groupby transform / shift / cumsum /
ffill, all C kernels). No per-conversation Python calls, no per-group
scheduling overhead; a conversation never straddles partitions
(SURVEY.md §2.8).

Every function below takes a whole PARTITION DataFrame, not one group.

Reference semantics:
- merge_runs        — fold runs of consecutive same-role turns
                      (/root/reference/src/merge_utterances.py:10-24)
- next_after_system — lag-1 tagging of the turn after an intro
                      (/root/reference/src/cur-prot/resegment.py:1-3,63)
- pre_system_flags  — prefix scan before the first intro
                      (/root/reference/src/cur-prot/split_into_sections.py:96-108)
- tool_ffill        — page-state carry / forward fill
                      (/root/reference/src/KWIC-iter-search.py:86-109)
- conv_stats        — per-document min/max date + counts
                      (/root/reference/src/date_accuracy_estimate.py:25-34)
- sessionize        — gap-based session windows over the events stream
- role_valid        — interval-validity probe against dated role windows
                      (/root/reference/src/fuzzy_matching.py:84-89)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SESSION_GAP_MINUTES = 30
ROLE_VALID_DAYS = 7


def _conv_sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"], kind="mergesort")


def merge_runs_part(df: pd.DataFrame) -> pd.DataFrame:
    df = _conv_sorted(df)
    new_run = df["conv_id"].ne(df["conv_id"].shift()) | df["role"].ne(
        df["role"].shift()
    )
    rid = new_run.cumsum()
    out = (
        df.groupby(rid, sort=False)
        .agg(
            conv_id=("conv_id", "first"),
            role=("role", "first"),
            n_turns=("turn_idx", "size"),
            text=("text", " ".join),
        )
        .reset_index(drop=True)
    )
    out["run_idx"] = out.groupby("conv_id", sort=False).cumcount().astype(np.int64)
    out["n_turns"] = out["n_turns"].astype(np.int64)
    return out[["conv_id", "run_idx", "role", "n_turns", "text"]]


def next_after_system_part(df: pd.DataFrame) -> pd.DataFrame:
    df = _conv_sorted(df)
    prev_sys = df["role"].shift().eq("system") & df["conv_id"].eq(
        df["conv_id"].shift()
    )
    return df.loc[prev_sys, ["conv_id", "turn_idx", "role"]]


def pre_system_flags_part(df: pd.DataFrame) -> pd.DataFrame:
    sys_turn = df["turn_idx"].where(df["role"].eq("system"))
    first_sys = sys_turn.groupby(df["conv_id"]).transform("min")
    flag = df["turn_idx"] < first_sys  # NaN (no system turn) compares False
    return df.assign(pre_system=flag)[["conv_id", "turn_idx", "pre_system"]]


def tool_ffill_part(df: pd.DataFrame) -> pd.DataFrame:
    df = _conv_sorted(df)
    filled = df.groupby("conv_id", sort=False)["tool"].ffill()
    df = df.assign(tool_active=filled.where(filled.notna(), None))
    return df[["conv_id", "turn_idx", "tool_active"]]


def conv_stats_part(df: pd.DataFrame) -> pd.DataFrame:
    out = (
        df.groupby("conv_id", sort=False)
        .agg(
            n_turns=("turn_idx", "size"),
            ts_min=("ts", "min"),
            ts_max=("ts", "max"),
            n_roles=("role", "nunique"),
        )
        .reset_index()
    )
    out["n_turns"] = out["n_turns"].astype(np.int64)
    out["n_roles"] = out["n_roles"].astype(np.int64)
    return out[["conv_id", "n_turns", "ts_min", "ts_max", "n_roles"]]


def sessionize_part(df: pd.DataFrame) -> pd.DataFrame:
    """Session windows per user over the raw events stream: a gap of more
    than SESSION_GAP_MINUTES starts a new session."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    new_user = df["user_id"].ne(df["user_id"].shift())
    gap = df["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MINUTES)
    sid = (new_user | gap).cumsum()
    out = (
        df.groupby(sid, sort=False)
        .agg(
            user_id=("user_id", "first"),
            n_events=("event_id", "size"),
            ts_min=("ts", "min"),
            ts_max=("ts", "max"),
        )
        .reset_index(drop=True)
    )
    out["session_idx"] = out.groupby("user_id", sort=False).cumcount().astype(
        np.int64
    )
    out["n_events"] = out["n_events"].astype(np.int64)
    return out[["user_id", "session_idx", "n_events", "ts_min", "ts_max"]]


def sectionize_part(df: pd.DataFrame) -> pd.DataFrame:
    """Section splitting on the `§` marker (reference: an element starting
    with § in its first 4 chars opens a new div,
    /root/reference/src/cur-prot/split_into_sections.py:49-93): running
    count of marker turns per conversation, vectorized cumsum."""
    df = _conv_sorted(df)
    marker = df["scrubbed_text"].str[:4].str.contains("§", regex=False)
    sec = marker.groupby(df["conv_id"], sort=False).cumsum()
    return df.assign(section_idx=sec.astype(np.int64))[
        ["conv_id", "turn_idx", "section_idx"]
    ]


def system_pairs_part(df: pd.DataFrame) -> pd.DataFrame:
    """Consecutive-pair extraction: every `system` turn paired with the
    immediately following turn of the same conversation (reference: intro +
    next-element pairs for NSP scoring,
    /root/reference/src/classify_join_intros.py:32-57)."""
    df = _conv_sorted(df)
    same_conv = df["conv_id"].eq(df["conv_id"].shift(-1))
    out = df.assign(
        next_role=df["role"].shift(-1),
        next_text=df["text"].shift(-1),
    ).loc[df["role"].eq("system") & same_conv]
    return out[["conv_id", "turn_idx", "next_role", "next_text"]]


def kwic_tool_part(df: pd.DataFrame, pattern: str = None) -> pd.DataFrame:
    """KWIC over turns with carried state (reference: keyword-in-context
    emitting the current page attribute forwarded across elements,
    /root/reference/src/KWIC-iter-search.py:86-109): each match window is
    emitted with the tool active at that turn (forward-filled per
    conversation)."""
    from ..sql_ops import KWIC_PATTERN

    pattern = pattern or KWIC_PATTERN
    df = _conv_sorted(df)
    filled = df.groupby("conv_id", sort=False)["tool"].ffill()
    df = df.assign(tool_active=filled.where(filled.notna(), None))
    hits = df["text"].str.findall(pattern)
    out = df[["conv_id", "turn_idx", "tool_active"]].assign(context=hits).explode(
        "context"
    )
    return out.dropna(subset=["context"]).reset_index(drop=True)


def conv_document_part(df: pd.DataFrame) -> pd.DataFrame:
    """Document reconstruction: all turns of a conversation concatenated in
    turn order (the engine's analog of re-serializing a protocol,
    /root/reference/src/merge_utterances.py:28-37)."""
    df = _conv_sorted(df)
    out = (
        df.groupby("conv_id", sort=False)
        .agg(n_turns=("turn_idx", "size"), document=("text", " ".join))
        .reset_index()
    )
    out["n_turns"] = out["n_turns"].astype(np.int64)
    return out[["conv_id", "n_turns", "document"]]


def first_last_flags_part(df: pd.DataFrame) -> pd.DataFrame:
    """First/last-in-group flags (reference: delete `prev` on the first and
    `next` on the last utterance of each div,
    /root/reference/src/cur-prot/split_into_sections.py:28-46,111-117)."""
    df = _conv_sorted(df)
    first = df["conv_id"].ne(df["conv_id"].shift())
    last = df["conv_id"].ne(df["conv_id"].shift(-1))
    return df.assign(is_first=first, is_last=last)[
        ["conv_id", "turn_idx", "is_first", "is_last"]
    ]


# ML4 "model" strategy: deterministic NSP-style linear pair scorer. The
# weights/threshold are shared with the SQL oracle (sql_ops generates the
# CASE expression from these same constants), so the decision function is
# value-checked end-to-end. merge requires cur=system AND next=assistant
# (70 of the 80 threshold) plus at least one textual continuation cue.
NSP_WEIGHTS = {
    "cur_system": 40,
    "next_assistant": 30,
    "hyphen_end": 20,
    "short_next": 10,
}
NSP_THRESHOLD = 80
NSP_SHORT_LEN = 120


def merge_intro_pairs_part(df: pd.DataFrame, strategy: str = "rule") -> pd.DataFrame:
    """Pair-merge rewrite (reference: predicted intro pairs merged with
    hyphen-aware concatenation and the second element deleted,
    /root/reference/src/classify_join_intros.py:127-165): every `system`
    turn immediately followed by an `assistant` turn absorbs that turn's
    text — no space when the first text ends with '-', else space-joined —
    and the absorbed row is dropped. Row-count-changing ordered rewrite;
    pairs are disjoint because the absorbed row is never a `system` turn.

    `strategy` is the ML4 classifier slot (reference: the NSP model decides
    which pairs merge, /root/reference/src/classify_join_intros.py:76-122 —
    here a pluggable predicate over the lead-window):
    - "rule"   — merge system→assistant pairs (default, oracle-checked)
    - "model"  — NSP-style linear pair scorer over the same lead-window
      (deterministic stand-in for the reference's next-sentence-prediction
      model: fixed NSP_WEIGHTS over shape features, merge iff score ≥
      NSP_THRESHOLD; SQL-restated from the same constants, oracle-checked)
    - "never"  — no merges (identity rewrite)
    A learned model plugs in as another branch producing the same boolean
    `absorbs` vector from (text, next_text)."""
    df = _conv_sorted(df)
    same_next = df["conv_id"].eq(df["conv_id"].shift(-1))
    if strategy == "rule":
        absorbs = (
            df["role"].eq("system") & df["role"].shift(-1).eq("assistant") & same_next
        )
    elif strategy == "model":
        score = (
            NSP_WEIGHTS["cur_system"] * df["role"].eq("system").astype(int)
            + NSP_WEIGHTS["next_assistant"]
            * df["role"].shift(-1).eq("assistant").astype(int)
            + NSP_WEIGHTS["hyphen_end"] * df["text"].str.endswith("-").astype(int)
            + NSP_WEIGHTS["short_next"]
            * (df["text"].shift(-1).str.len() < NSP_SHORT_LEN)
            .fillna(False)
            .astype(int)
        )
        absorbs = (score >= NSP_THRESHOLD) & same_next
    elif strategy == "never":
        absorbs = pd.Series(False, index=df.index)
    else:
        raise ValueError(f"unknown merge strategy: {strategy!r}")
    absorbed = absorbs.shift(1, fill_value=False)
    next_text = df["text"].shift(-1)
    joiner = np.where(df["text"].str.endswith("-"), "", " ")
    merged = np.where(
        absorbs, df["text"] + pd.Series(joiner, index=df.index) + next_text, df["text"]
    )
    out = df.assign(text=merged).loc[~absorbed]
    return out[["conv_id", "turn_idx", "role", "text"]]


TOC_MARKER_PREFIX = "12 $"


def toc_extract_part(df: pd.DataFrame) -> pd.DataFrame:
    """ToC delimiter — the ordered RANGE-MOVE rewrite (reference: scan the
    document for the ToC marker literal, then move every element from the
    page-break preceding the match to the document end into a new typed
    section div, /root/reference/src/ToC/delimit-ToC_2014--.py:25-98).

    Graft semantics: marker = first turn whose raw text starts with the
    '12 $' OCR shape; boundary = the last tool-bearing turn at or before
    the marker (the page-break analog), conversation start if none. All
    turns from the boundary to conversation end are re-homed into section
    'toc' and renumbered from 0; preceding turns stay 'body' with their own
    ordinals — rows change home and ordinal, not just a label. Vectorized:
    two grouped transforms + one grouped cumcount, no per-conv Python."""
    df = _conv_sorted(df)
    marker = df["text"].str.startswith(TOC_MARKER_PREFIX)
    first_marker = (
        df["turn_idx"].where(marker).groupby(df["conv_id"]).transform("min")
    )
    pb = df["turn_idx"].where(df["tool"].notna() & (df["turn_idx"] <= first_marker))
    boundary = pb.groupby(df["conv_id"]).transform("max")
    in_toc = first_marker.notna() & (df["turn_idx"] >= boundary.fillna(0))
    section = pd.Series(np.where(in_toc, "toc", "body"), index=df.index)
    sec_idx = df.groupby([df["conv_id"], section], sort=False).cumcount()
    return pd.DataFrame(
        {
            "conv_id": df["conv_id"],
            "turn_idx": df["turn_idx"],
            "section": section,
            "sec_idx": sec_idx.astype(np.int64),
        }
    )


def modal_role_part(df: pd.DataFrame) -> pd.DataFrame:
    """Group-mode with tie-drop (reference: most-frequent page per element,
    ambiguous rows removed entirely via drop_duplicates(keep=False),
    /root/reference/src/add_modern_pagenumbers.py:119-125): the most
    frequent role per conversation; conversations whose maximum is tied
    are dropped."""
    c = (
        df.groupby(["conv_id", "role"], sort=False)
        .size()
        .rename("n")
        .reset_index()
    )
    mx = c.groupby("conv_id", sort=False)["n"].transform("max")
    top = c.loc[c["n"] == mx]
    uniq = top[top.groupby("conv_id", sort=False)["n"].transform("size").eq(1)]
    out = uniq.rename(columns={"role": "modal_role"})
    out = out.assign(n=out["n"].astype(np.int64))
    return out[["conv_id", "modal_role", "n"]]


def role_valid_part(df: pd.DataFrame, valid_days: int = ROLE_VALID_DAYS) -> pd.DataFrame:
    """A turn is 'valid' if some `system` turn of the same conversation
    opened a validity window [s_ts, s_ts + valid_days] covering its ts.
    Vectorized as: sort by (conv, ts) with system turns first among ties,
    forward-fill the latest system ts, compare the gap."""
    df = df.assign(_nonsys=df["role"].ne("system"))
    df = df.sort_values(["conv_id", "ts", "_nonsys"], kind="mergesort")
    sys_ts = df["ts"].where(df["role"].eq("system"))
    last_sys = sys_ts.groupby(df["conv_id"]).ffill()
    valid = (df["ts"] - last_sys) <= pd.Timedelta(days=valid_days)  # NaT → False
    return df.assign(role_valid=valid)[["conv_id", "turn_idx", "role_valid"]]


def conv_render_part(part: pd.DataFrame) -> pd.DataFrame:
    """Ordered group-concat exporter: one text blob per conversation,
    turns joined in turn_idx order as 'role: text' lines — the render
    step that ships a conversation to annotation/inspection tools. Runs
    on the standard conv_id exchange; the per-group string join is
    bounded by the OUTPUT artifact (the rendered transcript), the same
    contract as the inverted index's postings concat."""
    part = part.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    line = part["role"].astype(str) + ": " + part["text"].astype(str)
    return (
        pd.DataFrame({"conv_id": part["conv_id"], "line": line})
        .groupby("conv_id", sort=False)["line"]
        .agg("\n".join)
        .reset_index(name="rendered")
    )


def conv_balance(trans_ds):
    """Dialogue balance report — the SFT-curation view (is a conversation
    assistant-dominated, user-dominated, or balanced): per conversation
    the user/assistant turn counts and character masses, and the
    assistant share of ALL characters in integer permille. No window
    needed, so this takes the combiner path rather than the conv
    exchange: per-batch indicator partials → ONE hash aggregate at conv
    cardinality → a trailing permille map. Emits (conv_id, n_user,
    n_assistant, user_chars, assistant_chars, assistant_permille)."""
    from .hashagg import hash_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        role = batch["role"].to_numpy(dtype=object)
        chars = batch["text"].str.len().to_numpy(dtype=np.int64)
        d = pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "n_user": (role == "user").astype(np.int64),
                "n_assistant": (role == "assistant").astype(np.int64),
                "user_chars": np.where(role == "user", chars, 0),
                "assistant_chars": np.where(role == "assistant", chars, 0),
                "total_chars": chars,
            }
        )
        return d.groupby("conv_id", sort=False).sum().reset_index()

    agg = hash_aggregate(
        trans_ds.map_batches(partial, batch_format="pandas"),
        keys=["conv_id"],
        aggs={
            c: (c, "sum")
            for c in ("n_user", "n_assistant", "user_chars",
                      "assistant_chars", "total_chars")
        },
    )

    def share(batch: pd.DataFrame) -> pd.DataFrame:
        # zero-char convention PINNED in both engines: a conversation
        # whose turns are all empty strings scores permille 0 (the
        # alternation_part n_pairs=0 convention), mirrored by the SQL
        # twin's CASE WHEN total = 0.
        tot = batch["total_chars"].to_numpy(dtype=np.int64)
        ac = batch["assistant_chars"].to_numpy(dtype=np.int64)
        batch["assistant_permille"] = np.where(
            tot > 0, (1000 * ac) // np.maximum(tot, 1), 0
        ).astype(np.int64)
        return batch.drop(columns=["total_chars"])

    return agg.map_batches(share, batch_format="pandas")


def alternation_part(part: pd.DataFrame) -> pd.DataFrame:
    """Role-alternation score per conversation — the dialogue-shape
    signal (healthy chat alternates speakers; long same-role runs mark
    transcription glitches or monologues): over the turn_idx-ordered
    stream, the share of adjacent pairs that switch roles, integer
    permille. Runs on the standard conv exchange; the pair scan is one
    vectorized shift compare. Single-turn conversations score 0 over 0
    pairs (permille 0 by convention, matching the SQL CASE)."""
    part = part.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    same = (part["conv_id"] == part["conv_id"].shift()).to_numpy()
    alt = (part["role"].to_numpy(dtype=object)
           != part["role"].shift().to_numpy(dtype=object))
    d = pd.DataFrame(
        {
            "conv_id": part["conv_id"],
            "n_pairs": same.astype(np.int64),
            "n_alternating": (same & alt).astype(np.int64),
        }
    )
    g = d.groupby("conv_id", sort=False).sum().reset_index()
    np_ = g["n_pairs"].to_numpy(dtype=np.int64)
    na = g["n_alternating"].to_numpy(dtype=np.int64)
    g["alternation_permille"] = np.where(np_ > 0, (1000 * na) // np.maximum(np_, 1), 0)
    return g
