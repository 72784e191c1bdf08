"""Ordered / window transforms over conversations (the shuffle-heavy core).

All operators here require per-conversation ordering: one
`groupby(conv_id)` hash shuffle, then an in-group sort on `turn_idx` —
the engine's single ordering guarantee (SURVEY.md §2.8). Each grouped
function is pandas-vectorized; a conversation never straddles groups.

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
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SESSION_GAP_MINUTES = 30


def _sorted(g: pd.DataFrame) -> pd.DataFrame:
    return g.sort_values("turn_idx", kind="mergesort")


def merge_runs_group(g: pd.DataFrame) -> pd.DataFrame:
    g = _sorted(g)
    boundary = g["role"].ne(g["role"].shift()).to_numpy()
    run_idx = np.cumsum(boundary) - 1
    g = g.assign(run_idx=run_idx.astype(np.int64))
    out = (
        g.groupby("run_idx", sort=True)
        .agg(
            conv_id=("conv_id", "first"),
            role=("role", "first"),
            n_turns=("turn_idx", "size"),
            text=("text", " ".join),
        )
        .reset_index()
    )
    out["n_turns"] = out["n_turns"].astype(np.int64)
    return out[["conv_id", "run_idx", "role", "n_turns", "text"]]


def next_after_system_group(g: pd.DataFrame) -> pd.DataFrame:
    g = _sorted(g)
    prev_sys = g["role"].shift().eq("system")
    return g.loc[prev_sys, ["conv_id", "turn_idx", "role"]]


def pre_system_flags_group(g: pd.DataFrame) -> pd.DataFrame:
    g = _sorted(g)
    sys_turns = g.loc[g["role"] == "system", "turn_idx"]
    if len(sys_turns):
        flag = g["turn_idx"].to_numpy() < sys_turns.min()
    else:
        flag = np.zeros(len(g), dtype=bool)
    return g.assign(pre_system=flag)[["conv_id", "turn_idx", "pre_system"]]


def tool_ffill_group(g: pd.DataFrame) -> pd.DataFrame:
    g = _sorted(g)
    g = g.assign(tool_active=g["tool"].ffill())
    return g[["conv_id", "turn_idx", "tool_active"]]


def conv_stats_group(g: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "n_turns": np.array([len(g)], dtype=np.int64),
            "ts_min": [g["ts"].min()],
            "ts_max": [g["ts"].max()],
            "n_roles": np.array([g["role"].nunique()], dtype=np.int64),
        }
    )


def sessionize_group(g: pd.DataFrame) -> pd.DataFrame:
    """Session windows per user over the raw events stream: a gap of more
    than SESSION_GAP_MINUTES starts a new session."""
    g = g.sort_values(["ts", "event_id"], kind="mergesort")
    gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MINUTES)
    sess = gap.cumsum().astype(np.int64)
    g = g.assign(session_idx=sess)
    out = (
        g.groupby("session_idx", sort=True)
        .agg(
            user_id=("user_id", "first"),
            n_events=("event_id", "size"),
            ts_min=("ts", "min"),
            ts_max=("ts", "max"),
        )
        .reset_index()
    )
    out["n_events"] = out["n_events"].astype(np.int64)
    return out[["user_id", "session_idx", "n_events", "ts_min", "ts_max"]]


def role_valid_group(g: pd.DataFrame, valid_days: int = 7) -> pd.DataFrame:
    """Interval-validity probe (broadcast-join analog of the reference's
    dated person tables, /root/reference/src/fuzzy_matching.py:84-89):
    a turn is 'valid' if some `system` turn of the same conversation
    opened a validity window [s_ts, s_ts + valid_days] covering its ts.
    Sorted-array + searchsorted interval probe."""
    starts = np.sort(g.loc[g["role"] == "system", "ts"].to_numpy())
    ts = g["ts"].to_numpy()
    if len(starts) == 0:
        valid = np.zeros(len(g), dtype=bool)
    else:
        # most recent window start at or before ts
        idx = np.searchsorted(starts, ts, side="right") - 1
        prev_start = starts[np.clip(idx, 0, None)]
        window = np.timedelta64(valid_days, "D")
        valid = (idx >= 0) & (ts - prev_start <= window)
    return g.assign(role_valid=valid)[["conv_id", "turn_idx", "role_valid"]]
