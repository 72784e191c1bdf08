"""Vectorized text-repair / scrub rules over Arrow string arrays.

Every rule is a pure function ``pa.Array -> pa.Array`` built from
`pyarrow.compute` kernels (RE2 regex engine). The DuckDB oracle SQL in
`scripts_ray.sql` uses the *same* RE2 patterns, so Ray output and oracle
output agree byte-for-byte by construction.

Rule semantics mirror the reference's OCR/text-repair stages:

- dollar-sign OCR repair   — /root/reference/src/cur-prot/dollar_sign_replace.py:21-41,79-80
- soft-hyphen join         — /root/reference/src/cur-prot/dollar_sign_replace.py:44-61
- capitalized-dash join    — /root/reference/src/cur-prot/fix_capitalized_dashes.py:18-19,33-38
- whitespace normalization — `" ".join(text.split())` call sites, e.g.
                             /root/reference/src/sample_paragraphs.py:81
- PII scrub (email/phone)  — engine extension (graft requirement), regex bank pattern
                             as in /root/reference/src/fuzzy_matching.py:38-43
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

SOFT_HYPHEN = "­"

# RE2 patterns (no backtracking-only constructs). Kept as single source of
# truth: scripts_ray.sql interpolates these into the oracle SQL.
RE_DOLLAR_SECTION = r"^8 [0-9]{1,2}\."  # `8 14.` → leading 8 is an OCR'd §
RE_DOLLAR_NUM = r"^([0-9]{1,2} ?)\$"  # `12 $` → the $ is an OCR'd §
RE_SOFT_HYPHEN = " ?" + SOFT_HYPHEN + " ?"
RE_CAPS_DASH = r"([A-ZÀ-Þ]{2,10})- ([A-ZÀ-Þ]{2,10})"
RE_WHITESPACE = r"[ \t\r\n\f\v]+"
RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
RE_PHONE = r"\+?[0-9][0-9 ()-]{6,}[0-9]"
# Tokenizer: split on runs of non-letters after lowercasing (Latin-1 letters).
RE_TOKEN_SEP = r"[^a-zà-öø-ÿ]+"
RE_SYMBOL = r"[^A-Za-zÀ-ÖØ-öø-ÿ0-9 ]"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def repair_dollar_signs(arr: pa.Array) -> pa.Array:
    """Conditional $→§ OCR repair (three mutually-exclusive shapes)."""
    starts_dollar = pc.starts_with(arr, pattern="$")
    m_section = pc.match_substring_regex(arr, RE_DOLLAR_SECTION)
    m_num = pc.match_substring_regex(arr, RE_DOLLAR_NUM)

    all_repl = pc.replace_substring(arr, pattern="$", replacement="§")
    sect_repl = pc.binary_join_element_wise(
        pa.array(["§"] * len(arr)), pc.utf8_slice_codeunits(arr, 1), ""
    )
    num_repl = pc.replace_substring_regex(
        arr, pattern=RE_DOLLAR_NUM, replacement=r"\1§", max_replacements=1
    )
    out = pc.if_else(
        starts_dollar,
        all_repl,
        pc.if_else(m_section, sect_repl, pc.if_else(m_num, num_repl, arr)),
    )
    return out


def join_soft_hyphens(arr: pa.Array) -> pa.Array:
    return pc.replace_substring_regex(arr, pattern=RE_SOFT_HYPHEN, replacement="")


def join_caps_dashes(arr: pa.Array) -> pa.Array:
    return pc.replace_substring_regex(arr, pattern=RE_CAPS_DASH, replacement=r"\1\2")


def normalize_whitespace(arr: pa.Array) -> pa.Array:
    collapsed = pc.replace_substring_regex(arr, pattern=RE_WHITESPACE, replacement=" ")
    return pc.utf8_trim(collapsed, characters=" ")


def scrub_pii(arr: pa.Array) -> pa.Array:
    arr = pc.replace_substring_regex(arr, pattern=RE_EMAIL, replacement=EMAIL_TOKEN)
    arr = pc.replace_substring_regex(arr, pattern=RE_PHONE, replacement=PHONE_TOKEN)
    return arr


def scrub_text(arr: pa.Array) -> pa.Array:
    """The full scrub chain, in pipeline order."""
    arr = repair_dollar_signs(arr)
    arr = join_soft_hyphens(arr)
    arr = join_caps_dashes(arr)
    arr = normalize_whitespace(arr)
    arr = scrub_pii(arr)
    return arr


# ----- heuristic-signal thresholds (integers; gate uses integer comparisons) --
MIN_CHARS = 5  # scrubbed length below this → too_short
MAX_CHARS = 8000  # above this → too_long
# symbol_ratio > 0.3  ⇔  10 * n_symbols > 3 * n_chars
SYMBOL_NUM, SYMBOL_DEN = 10, 3
# repetition: n_tokens >= REP_MIN_TOKENS and distinct/total < 0.3
REP_MIN_TOKENS = 20
REP_NUM, REP_DEN = 10, 3
# conversation-level gate (per-document quality gating analog, reference:
# whole-protocol rejection in validate.py): a conversation survives when
# keep-fraction >= CONV_KEEP_NUM/CONV_KEEP_DEN  ⇔  DEN*n_keep >= NUM*n_total
CONV_KEEP_NUM, CONV_KEEP_DEN = 2, 5

# Swedish / English marker stopwords for the language-ID heuristic
# (fastText-langid analog of /root/reference/src/classify_intros.py, scored
# per token; exact-membership counting so SQL list_contains(...) matches).
SV_STOPWORDS = (
    "och", "att", "det", "som", "en", "är", "på", "för", "med", "av",
    "inte", "den", "till", "om",
)
EN_STOPWORDS = (
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as",
)

# Toxicity marker lexicon (engine extension; placeholder word list — the
# mechanism is a broadcastable lexicon lookup, swap the list for a real one).
TOX_MARKERS = ("spam", "slow")

# keep/drop prior — the analog of the reference's log([0.8, 0.2]) class prior
# (/root/reference/src/cur-prot/reclassify.py:23); stored in floored
# milli-nats so all arithmetic is integer. floor(1000*ln(0.8/0.2)) = 1386.
PRIOR_MILLINATS = 1386
