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


# ----- encoding normalization (north-star item) -------------------------------
# Mojibake repair table (ftfy-core analog): the UTF-8 byte pair of a
# Latin-1-range char, mis-decoded as Latin-1, becomes U+00C3 plus one
# continuation char (for uppercase targets that second char is a C1
# control — written as escapes). SINGLE SOURCE OF TRUTH for both the
# Arrow replace chain and the SQL oracle's replace chain, applied in
# table order (second chars are all distinct: no prefix collisions).
MOJIBAKE_MAP = (
    ("Ã¤", "ä"),  # a-umlaut
    ("Ã¥", "å"),  # a-ring
    ("Ã¶", "ö"),  # o-umlaut
    ("Ã©", "é"),  # e-acute
    ("Ã", "Ä"),  # A-umlaut
    ("Ã", "Å"),  # A-ring
    ("Ã", "Ö"),  # O-umlaut
)


# Deterministic plants for the encoding queries (documents fixture is
# ASCII): the mojibake plants are the REAL latin-1 misdecodes of Swedish
# suffixes, derived — not typed — so they stay consistent with the map.
MOJI_PLANT_A = " så är det".encode("utf-8").decode("latin-1")
MOJI_PLANT_B = " först Är Över".encode("utf-8").decode("latin-1")
NFC_PLANT = " färdig över"  # decomposed ä/ö (a/o + U+0308)
NFC_CLEAN = " klar"


def repair_mojibake(arr: pa.Array) -> pa.Array:
    """Fixed-table double-encoding repair: plain (non-regex) substring
    replaces in MOJIBAKE_MAP order."""
    for bad, good in MOJIBAKE_MAP:
        arr = pc.replace_substring(arr, pattern=bad, replacement=good)
    return arr


def nfc_normalize(arr: pa.Array) -> pa.Array:
    """Unicode NFC canonical composition, checked against DuckDB's own
    nfc_normalize — a genuine cross-engine semantic check.

    pyarrow 16.1's pc.utf8_normalize is NOT usable here: every form
    (including NFC) returns DECOMPOSED output (observed: composed 'ä' in,
    'a'+U+0308 out under form='NFC'), so composition runs through
    unicodedata instead — but only for rows containing non-ASCII bytes
    (an ASCII string is NFC-invariant by definition), keeping the common
    web-text path a vectorized regex prefilter with zero per-row Python."""
    import unicodedata as ud

    import numpy as np

    mask = pc.match_substring_regex(arr, "[^\\x00-\\x7f]").to_numpy(
        zero_copy_only=False
    )
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return arr
    out = arr.to_numpy(zero_copy_only=False).copy()
    out[idx] = [ud.normalize("NFC", s) for s in out[idx]]
    return pa.array(out, type=pa.string())
