"""The keep/drop gate — pure vectorized decision logic.

Combines heuristic signals, language ID, and the unigram log-odds score
into (keep, drop_reason), with protected roles never re-labeled
(/root/reference/src/cur-prot/reclassify.py:45-52,114). Shared verbatim by
the Ray stage and the single-process oracle.
"""

from __future__ import annotations

import numpy as np

from .rules import (
    MAX_CHARS,
    MIN_CHARS,
    PRIOR_MILLINATS,
    REP_DEN,
    REP_MIN_TOKENS,
    REP_NUM,
    SYMBOL_DEN,
    SYMBOL_NUM,
)
from .schema import PROTECTED_ROLES

ALLOWED_LANGS = ("en", "sv")


def detect_lang(n_sv: np.ndarray, n_en: np.ndarray) -> np.ndarray:
    """Stopword-majority language ID: 'sv' / 'en' / 'und'."""
    out = np.full(len(n_sv), "und", dtype=object)
    out[n_sv > n_en] = "sv"
    out[n_en > n_sv] = "en"
    return out


def ppl_score(tok_score_sum: np.ndarray, n_tokens: np.ndarray, drop_score: int) -> np.ndarray:
    """Milli-nat keep-vs-drop log-odds: Σ(score_keep(w) − score_drop) + prior."""
    return (tok_score_sum - n_tokens * drop_score + PRIOR_MILLINATS).astype(np.int64)


def decide(
    role: np.ndarray,
    lang: np.ndarray,
    ppl: np.ndarray,
    n_chars: np.ndarray,
    n_symbols: np.ndarray,
    n_tokens: np.ndarray,
    n_distinct: np.ndarray,
    protected_roles=PROTECTED_ROLES,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-turn decision (before the conversation-level ordered pass).

    Priority: protected-role keep > empty > too_short > too_long >
    symbol_ratio > repetition > lang > ppl > keep.

    `protected_roles` is the §2.9 exclusion-list config surface (reference:
    reclassify's exclude=["date","speaker"],
    /root/reference/src/cur-prot/reclassify.py:114); the default matches
    the SQL oracle."""
    protected = np.isin(role, list(protected_roles))
    conds = [
        n_chars == 0,
        n_chars < MIN_CHARS,
        n_chars > MAX_CHARS,
        SYMBOL_NUM * n_symbols > SYMBOL_DEN * n_chars,
        (n_tokens >= REP_MIN_TOKENS) & (REP_NUM * n_distinct < REP_DEN * n_tokens),
        ~np.isin(lang, ALLOWED_LANGS),
        ppl <= 0,
    ]
    reasons = ["empty", "too_short", "too_long", "symbol_ratio", "repetition", "lang", "ppl"]
    reason = np.select(conds, reasons, default=None)
    reason[protected] = None
    keep = np.array([r is None for r in reason], dtype=bool)
    return keep, reason


def demote_pre_system(
    turn_idx: np.ndarray, role: np.ndarray, keep: np.ndarray, reason: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Conversation-level ordered pass (one conversation per call, sorted by
    turn_idx): assistant turns before the first `system` turn are demoted —
    the analog of re-labeling utterances before the first speaker intro
    (/root/reference/src/cur-prot/split_into_sections.py:96-108)."""
    sys_idx = turn_idx[role == "system"]
    if len(sys_idx) == 0:
        return keep, reason
    first_sys = sys_idx.min()
    demote = (turn_idx < first_sys) & (role == "assistant") & keep
    keep = keep.copy()
    reason = reason.copy()
    keep[demote] = False
    reason[demote] = "pre_system"
    return keep, reason
