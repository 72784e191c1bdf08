"""Oracle SQL for the extended operator inventory (SURVEY.md §2).

Same contract as `scripts_ray.sql`: each statement is the independent
DuckDB re-statement of a Ray operator, over the driver's pre-registered
views, with column names matching the Ray implementation exactly and all
comparison-sensitive numerics kept integral.
"""

from __future__ import annotations

from . import rules as R
from .sql import SCRUBBED_CTE, TRANSCRIPTS_CTE, _with

_TURN_KEY = "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 6, '0')"
_DOC_TOKS = f"list_filter(string_split_regex(lower(text), '{R.RE_TOKEN_SEP}'), x -> x <> '')"
_WS_TOKS = f"list_filter(string_split_regex(text, '{R.RE_WHITESPACE}'), x -> x <> '')"
_NORM = f"trim(regexp_replace(text, '{R.RE_WHITESPACE}', ' ', 'g'), ' ')"
_SV_LIST = "[" + ", ".join(f"'{w}'" for w in R.SV_STOPWORDS) + "]"
_EN_LIST = "[" + ", ".join(f"'{w}'" for w in R.EN_STOPWORDS) + "]"
KWIC_KEYWORD = "spark"
KWIC_PATTERN = ".{0,30}" + KWIC_KEYWORD + ".{0,30}"

_TOX_LIST = "[" + ", ".join(f"'{w}'" for w in R.TOX_MARKERS) + "]"
_SCRUB_TOKS = (
    f"list_filter(string_split_regex(lower(scrubbed_text), '{R.RE_TOKEN_SEP}'),"
    " x -> x <> '')"
)

QF_TOXICITY_SQL = (
    _with(TRANSCRIPTS_CTE, SCRUBBED_CTE)
    + f"""
SELECT conv_id, turn_idx,
  CAST(length(list_filter({_SCRUB_TOKS}, x -> list_contains({_TOX_LIST}, x)))
       AS BIGINT) AS n_tox,
  length(list_filter({_SCRUB_TOKS}, x -> list_contains({_TOX_LIST}, x))) > 0 AS toxic
FROM scrubbed
"""
)

# ---- ordered / window transforms over conversations (SURVEY §2.8) ----------

MERGE_RUNS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
, lagged AS (
  SELECT t.*, lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM transcripts t
),
runs AS (
  SELECT l.*,
    CAST(sum(CASE WHEN prev_role IS NULL OR prev_role <> role THEN 1 ELSE 0 END)
         OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS UNBOUNDED PRECEDING) - 1
         AS BIGINT) AS run_idx
  FROM lagged l
)
SELECT conv_id, run_idx, min(role) AS role,
       CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(text, ' ' ORDER BY turn_idx) AS text
FROM runs GROUP BY conv_id, run_idx
"""
)

NEXT_AFTER_SYSTEM_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
SELECT conv_id, turn_idx, role FROM (
  SELECT conv_id, turn_idx, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM transcripts
) WHERE prev_role = 'system'
"""
)

PRE_SYSTEM_FLAGS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
SELECT conv_id, turn_idx, COALESCE(turn_idx < first_sys, FALSE) AS pre_system
FROM (
  SELECT conv_id, turn_idx,
         min(CASE WHEN role = 'system' THEN turn_idx END) OVER (PARTITION BY conv_id) AS first_sys
  FROM transcripts
)
"""
)

TOOL_FFILL_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
SELECT conv_id, turn_idx,
  last_value(tool IGNORE NULLS) OVER (
    PARTITION BY conv_id ORDER BY turn_idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tool_active
FROM transcripts
"""
)

CONV_STATS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
       min(ts) AS ts_min, max(ts) AS ts_max,
       CAST(count(DISTINCT role) AS BIGINT) AS n_roles
FROM transcripts GROUP BY conv_id
"""
)

SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT event_id, user_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
),
sess AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT CAST(user_id AS BIGINT) AS user_id, session_idx,
       CAST(count(*) AS BIGINT) AS n_events, min(ts) AS ts_min, max(ts) AS ts_max
FROM sess GROUP BY user_id, session_idx
"""

ROLE_VALID_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
, sysw AS (SELECT conv_id, ts AS s_ts FROM transcripts WHERE role = 'system')
SELECT t.conv_id, t.turn_idx,
  EXISTS (SELECT 1 FROM sysw w
          WHERE w.conv_id = t.conv_id
            AND t.ts >= w.s_ts AND t.ts <= w.s_ts + INTERVAL 7 DAY) AS role_valid
FROM transcripts t
"""
)

SECTIONIZE_SQL = (
    _with(TRANSCRIPTS_CTE, SCRUBBED_CTE)
    + """
SELECT conv_id, turn_idx,
  CAST(sum(CASE WHEN strpos(substr(scrubbed_text, 1, 4), '§') > 0 THEN 1 ELSE 0 END)
       OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS UNBOUNDED PRECEDING)
       AS BIGINT) AS section_idx
FROM scrubbed
"""
)

SYSTEM_PAIRS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
SELECT conv_id, turn_idx, next_role, next_text FROM (
  SELECT conv_id, turn_idx, role,
         lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_role,
         lead(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_text
  FROM transcripts
) WHERE role = 'system' AND next_role IS NOT NULL
"""
)

KWIC_TURNS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
, carried AS (
  SELECT conv_id, turn_idx, text,
    last_value(tool IGNORE NULLS) OVER (
      PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tool_active
  FROM transcripts
)
SELECT conv_id, turn_idx, tool_active,
       unnest(regexp_extract_all(text, '{pat}')) AS context
FROM carried
""".replace("{pat}", KWIC_PATTERN)
)

CONV_DOCUMENTS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(text, ' ' ORDER BY turn_idx) AS document
FROM transcripts GROUP BY conv_id
"""
)

CORPUS_STATS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + rf"""
SELECT CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(length({_WS_TOKS})) AS BIGINT) AS n_words,
  CAST(sum(CASE WHEN role = 'system' THEN 1 ELSE 0 END) AS BIGINT) AS n_sys,
  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM transcripts
"""
)

FIRST_LAST_FLAGS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
SELECT conv_id, turn_idx,
  turn_idx = min(turn_idx) OVER (PARTITION BY conv_id) AS is_first,
  turn_idx = max(turn_idx) OVER (PARTITION BY conv_id) AS is_last
FROM transcripts
"""
)

DOCS_BY_SOURCE_SQL = """
SELECT source, lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
  CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY 1, 2
"""

MERGE_INTRO_PAIRS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
, l AS (
  SELECT conv_id, turn_idx, role, text,
         lead(role) OVER w AS next_role,
         lead(text) OVER w AS next_text,
         lag(role)  OVER w AS prev_role
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, turn_idx, role,
  CASE WHEN role = 'system' AND next_role = 'assistant'
       THEN text || (CASE WHEN text LIKE '%-' THEN '' ELSE ' ' END) || next_text
       ELSE text END AS text
FROM l
WHERE NOT (role = 'assistant' AND COALESCE(prev_role, '') = 'system')
"""
)

# ML4 model strategy: the NSP-style linear scorer restated from the SAME
# constants the Ray side uses (ops.windows.NSP_*), so the merge decision
# function is value-checked, not just the rewrite plumbing.
from .ops.windows import NSP_SHORT_LEN, NSP_THRESHOLD, NSP_WEIGHTS  # noqa: E402

_NSP_SCORE = (
    f"({NSP_WEIGHTS['cur_system']} * CASE WHEN role = 'system' THEN 1 ELSE 0 END"
    f" + {NSP_WEIGHTS['next_assistant']} * CASE WHEN next_role = 'assistant'"
    " THEN 1 ELSE 0 END"
    f" + {NSP_WEIGHTS['hyphen_end']} * CASE WHEN text LIKE '%-' THEN 1 ELSE 0 END"
    f" + {NSP_WEIGHTS['short_next']} * CASE WHEN length(next_text) < {NSP_SHORT_LEN}"
    " THEN 1 ELSE 0 END)"
)

MERGE_INTRO_MODEL_SQL = (
    _with(TRANSCRIPTS_CTE)
    + f"""
, l AS (
  SELECT conv_id, turn_idx, role, text,
         lead(role) OVER w AS next_role,
         lead(text) OVER w AS next_text
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
s AS (
  SELECT *,
         CASE WHEN next_role IS NOT NULL
              AND {_NSP_SCORE} >= {NSP_THRESHOLD}
              THEN 1 ELSE 0 END AS absorbs
  FROM l
),
a AS (
  SELECT *, COALESCE(lag(absorbs) OVER (PARTITION BY conv_id ORDER BY turn_idx), 0)
            AS absorbed
  FROM s
)
SELECT conv_id, turn_idx, role,
  CASE WHEN absorbs = 1
       THEN text || (CASE WHEN text LIKE '%-' THEN '' ELSE ' ' END) || next_text
       ELSE text END AS text
FROM a
WHERE absorbed = 0
"""
)

MODAL_ROLE_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
, c AS (
  SELECT conv_id, role, CAST(count(*) AS BIGINT) AS n
  FROM transcripts GROUP BY 1, 2
),
m AS (
  SELECT c.*, max(n) OVER (PARTITION BY conv_id) AS mx FROM c
),
top AS (SELECT * FROM m WHERE n = mx)
SELECT conv_id, role AS modal_role, n FROM top
WHERE conv_id IN (SELECT conv_id FROM top GROUP BY conv_id HAVING count(*) = 1)
"""
)

# ---- attribution: broadcast interval (asof) join + cascade (SURVEY §2.4) ---

TURN_ATTRIBUTION_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
, nc AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(max(c_custkey) AS BIGINT) AS mx
         FROM customer),
probe AS (
  SELECT t.conv_id, t.turn_idx, CAST(t.ts AS DATE) AS d,
    CASE WHEN CAST(substr(t.conv_id, 6) AS BIGINT) * 701 + 1 <= nc.mx
         THEN CAST(substr(t.conv_id, 6) AS BIGINT) * 701 + 1
         ELSE CAST(substr(t.conv_id, 6) AS BIGINT) % nc.n + 1 END AS custkey,
    CASE WHEN CAST(substr(t.conv_id, 6) AS BIGINT) * 701 + 1 <= nc.mx
         THEN 'primary' ELSE 'fallback' END AS probe_type
  FROM transcripts t CROSS JOIN nc
),
best AS (
  SELECT p.*,
    (SELECT max(o.o_orderdate) FROM orders o
     WHERE o.o_custkey = p.custkey AND o.o_orderdate <= p.d
       AND o.o_orderdate >= p.d - INTERVAL 9000 DAY) AS bd
  FROM probe p
)
SELECT conv_id, turn_idx, custkey,
  CASE WHEN bd IS NULL THEN 'unknown' ELSE probe_type END AS match_type,
  CAST(COALESCE(
    (SELECT max(o2.o_orderkey) FROM orders o2
     WHERE o2.o_custkey = best.custkey AND o2.o_orderdate = best.bd), -1)
    AS BIGINT) AS order_key,
  CAST(date_diff('day', bd, d) AS BIGINT) AS days_since
FROM best
"""
)

UNKNOWN_TURNS_SQL = (
    TURN_ATTRIBUTION_SQL.replace(
        """SELECT conv_id, turn_idx, custkey,
  CASE WHEN bd IS NULL THEN 'unknown' ELSE probe_type END AS match_type,
  CAST(COALESCE(
    (SELECT max(o2.o_orderkey) FROM orders o2
     WHERE o2.o_custkey = best.custkey AND o2.o_orderdate = best.bd), -1)
    AS BIGINT) AS order_key,
  CAST(date_diff('day', bd, d) AS BIGINT) AS days_since
FROM best""",
        "SELECT conv_id, turn_idx, custkey FROM best WHERE bd IS NULL",
    )
)

# ---- timestamp repair via broadcast corrections (M5/M6) --------------------

from .ops.attribution import TS_FIX_MOD, TS_FIX_REM, TS_FIX_SPAN  # noqa: E402

TS_REPAIR_SQL = (
    _with(TRANSCRIPTS_CTE)
    + f"""
, fix AS (
  SELECT 'conv-' || lpad(CAST(i AS VARCHAR), 6, '0') AS conv_id,
         TIMESTAMP '2024-06-01' + (CAST(i AS BIGINT) % {TS_FIX_SPAN}) * INTERVAL 1 DAY AS ts_fix
  FROM range(0, 10000) t(i)
  WHERE i % {TS_FIX_MOD} = {TS_FIX_REM}
)
SELECT t.conv_id, t.turn_idx,
       COALESCE(f.ts_fix, t.ts) AS ts_fixed,
       f.conv_id IS NOT NULL AS repaired
FROM transcripts t LEFT JOIN fix f ON f.conv_id = t.conv_id
"""
)

# ---- ToC ordered range-move rewrite (M18/W10) ------------------------------

TOC_EXTRACT_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
, m AS (
  SELECT t.*,
    min(CASE WHEN t.text LIKE '12 $%' THEN t.turn_idx END)
      OVER (PARTITION BY conv_id) AS first_marker
  FROM transcripts t
),
b AS (
  SELECT m.*,
    max(CASE WHEN tool IS NOT NULL AND turn_idx <= first_marker THEN turn_idx END)
      OVER (PARTITION BY conv_id) AS boundary
  FROM m
),
lab AS (
  SELECT conv_id, turn_idx,
    CASE WHEN first_marker IS NOT NULL AND turn_idx >= COALESCE(boundary, 0)
         THEN 'toc' ELSE 'body' END AS section
  FROM b
)
SELECT conv_id, turn_idx, section,
  CAST(row_number() OVER (PARTITION BY conv_id, section ORDER BY turn_idx) - 1
       AS BIGINT) AS sec_idx
FROM lab
"""
)

# ---- denylist stage (D6) ---------------------------------------------------
# The oracle restates the RULE that generated the default denylist; the
# engine consumes the materialized list (broadcast membership).

from .config import DENY_USER_MOD, DENY_USER_REM  # noqa: E402

DENYLIST_SQL = (
    _with(TRANSCRIPTS_CTE)
    + f"""
SELECT conv_id, turn_idx, role FROM transcripts
WHERE CAST(substr(conv_id, 6) AS BIGINT) % {DENY_USER_MOD} <> {DENY_USER_REM}
"""
)

# ---- seeded shuffle (O8) ---------------------------------------------------
# Row CONTENT is what the oracle can check (the permutation itself is
# engine-internal); determinism of the same-seed permutation is asserted by
# tests/test_ops.py.

SEEDED_SHUFFLE_SQL = (
    _with(TRANSCRIPTS_CTE)
    + "\nSELECT conv_id, turn_idx FROM transcripts"
)

# ---- sketch-family invariants ----------------------------------------------
# simhash itself is hash-valued (not SQL-restatable); what IS restatable is
# the pigeonhole guarantee: pairs with Hamming < bands always share a band,
# so the candidate set misses exactly 0 of them.

SIMHASH_COVERAGE_SQL = "SELECT CAST(0 AS BIGINT) AS n_missed"

# A9: match-reason distribution over the attribution cascade output.
MATCH_REASONS_SQL = f"""
WITH att AS ({TURN_ATTRIBUTION_SQL})
SELECT match_type, CAST(count(*) AS BIGINT) AS n FROM att GROUP BY match_type
"""

# A7: interval membership → count-distinct at a probe instant.
ACTIVE_CONVS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
SELECT CAST(count(DISTINCT conv_id) AS BIGINT) AS n_active
FROM transcripts
WHERE role = 'system'
  AND ts > TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 7 DAY
  AND ts <= TIMESTAMP '2024-01-15 00:00:00'
"""
)

# M12: intro-structure regex field extraction (RE2 on both engines).
_RE_INTRO_SQL = "^([A-ZÀ-Þ]{2,}) sade: (.*)$"

INTRO_FIELDS_SQL = (
    _with(TRANSCRIPTS_CTE, SCRUBBED_CTE)
    + f"""
SELECT conv_id, turn_idx,
  regexp_extract(scrubbed_text, '{_RE_INTRO_SQL}', 1) AS speaker,
  regexp_extract(scrubbed_text, '{_RE_INTRO_SQL}', 2) AS speech
FROM scrubbed
WHERE regexp_matches(scrubbed_text, '{_RE_INTRO_SQL}')
"""
)

# ---- QC accuracy aggregate (SURVEY §2.5 A4) --------------------------------
# Keep-rate per role with the Beta-posterior mean in integer permille — the
# analog of the reference's correct/incorrect tallies with Beta(c+1, i+1)
# credible intervals (/root/reference/src/segmentation_accuracy_estimate.py:108-124).

from .sql import _FULL_STACK as _QF_STACK  # noqa: E402

QC_KEEP_BY_ROLE_SQL = (
    _QF_STACK
    + """
SELECT role,
  CAST(count(*) AS BIGINT) AS n_total,
  CAST(sum(CASE WHEN drop_reason IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
  CAST(floor(1000.0 * sum(CASE WHEN drop_reason IS NULL THEN 1 ELSE 0 END)
             / count(*)) AS BIGINT) AS keep_permille,
  CAST(floor(1000.0 * (sum(CASE WHEN drop_reason IS NULL THEN 1 ELSE 0 END) + 1)
             / (count(*) + 2)) AS BIGINT) AS post_mean_permille
FROM final GROUP BY role
"""
)

# A4 full form + A10: 90% Beta credible interval per role (normal
# approximation of Beta(n_keep+1, n_drop+1) quantiles — deterministic
# double math identical on both engines, standing in for the reference's
# scipy beta.ppf /root/reference/src/segmentation_accuracy_estimate.py:108-111)
# and the ±10% / ±20% coverage-tolerance rule
# (/root/reference/src/stats-dashboard/mp-coverage.py:33-41) stated in exact
# integer cross-multiplication against the global keep rate.

QC_KEEP_CI_SQL = (
    _QF_STACK
    + """
, per_role AS (
  SELECT role,
    CAST(count(*) AS BIGINT) AS n_total,
    CAST(sum(CASE WHEN drop_reason IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
  FROM final GROUP BY role
),
tot AS (
  SELECT CAST(sum(n_total) AS BIGINT) AS g_total,
         CAST(sum(n_keep) AS BIGINT) AS g_keep
  FROM per_role
)
SELECT role, n_total, n_keep,
  CAST(floor(1000.0 * ((n_keep + 1.0) / (n_total + 2.0)
       - 1.645 * sqrt((n_keep + 1.0) * (n_total - n_keep + 1.0)
                      / ((n_total + 2.0) * (n_total + 2.0) * (n_total + 3.0)))))
       AS BIGINT) AS ci_lo_permille,
  CAST(floor(1000.0 * ((n_keep + 1.0) / (n_total + 2.0)
       + 1.645 * sqrt((n_keep + 1.0) * (n_total - n_keep + 1.0)
                      / ((n_total + 2.0) * (n_total + 2.0) * (n_total + 3.0)))))
       AS BIGINT) AS ci_hi_permille,
  CASE WHEN 10 * abs(n_keep * g_total - g_keep * n_total) <= g_keep * n_total
       THEN 'pass'
       WHEN 10 * abs(n_keep * g_total - g_keep * n_total) <= 2 * g_keep * n_total
       THEN 'almost'
       ELSE 'fail' END AS coverage
FROM per_role CROSS JOIN tot
"""
)

# ---- identity / dedup / sampling (SURVEY §2.6, §2.7) -----------------------

TURN_IDS_UNIQUE_SQL = (
    _with(TRANSCRIPTS_CTE)
    + f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT {_TURN_KEY}) AS BIGINT) AS n_ids
FROM transcripts
"""
)

# Dedup groups are keyed by content; the oracle groups by the text itself
# while the engine groups by a 128-bit vectorized content hash (two
# independent siphash streams) — the grouping is equivalent barring a
# 2⁻¹²⁸-scale collision, and no per-row Python md5 runs in the hot path.
DEDUP_TURNS_SQL = (
    _with(TRANSCRIPTS_CTE, SCRUBBED_CTE)
    + f"""
SELECT min({_TURN_KEY}) AS first_key,
       CAST(count(*) AS BIGINT) AS n_dupes
FROM scrubbed GROUP BY scrubbed_text
"""
)

DEDUP_DOCS_SQL = f"""
WITH n AS (SELECT doc_id, {_NORM} AS norm FROM documents)
SELECT CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(count(*) AS BIGINT) AS n_dupes
FROM n GROUP BY norm
"""

# SAMPLE_TURNS_SQL / WEIGHTED_SAMPLE_SQL / TURN_UIDS_SQL are defined at the
# end of this module: their keys moved from per-row md5 to the splitmix64
# chain, whose SQL generators (_xorshift/_mulmod) are declared further down.
# STRATIFIED_SAMPLE_SQL and DOC_STATS_SQL keep md5 as the reference-parity
# exhibit (/root/reference/src/sample_pages_new.py:144-156).

STRATIFIED_SAMPLE_SQL = (
    _with(TRANSCRIPTS_CTE)
    + f"""
SELECT role, conv_id, turn_idx FROM (
  SELECT role, conv_id, turn_idx,
         row_number() OVER (PARTITION BY role ORDER BY md5({_TURN_KEY}), conv_id, turn_idx) AS rn
  FROM transcripts
) WHERE rn <= 3
"""
)

# ---- text analysis over `documents` (SURVEY §2.2, §2.5) --------------------

WORD_FREQ_SQL = f"""
SELECT tok AS token, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest({_DOC_TOKS}) AS tok FROM documents)
GROUP BY tok ORDER BY cnt DESC, token LIMIT 100
"""

KWIC_SQL = f"""
SELECT doc_id, unnest(regexp_extract_all(text, '{KWIC_PATTERN}')) AS context
FROM documents
"""


def _bpe_fixed_encode_expr() -> str:
    """BPE encoding as a rank-ordered replace() chain over '<sym>'-wrapped
    characters (see ops/bpe.py BPE_PINNED_MERGES for the soundness
    argument); piece count = number of '<' boundary markers left."""
    from .ops.bpe import BPE_PINNED_MERGES

    expr = "regexp_replace(tok, '(.)', '<\\1>', 'g')"
    for a, b in BPE_PINNED_MERGES:
        expr = f"replace({expr}, '<{a}><{b}>', '<{a}{b}>')"
    return expr


BPE_BUDGETS_FIXED_SQL = f"""
WITH enc AS (
  SELECT doc_id,
         {_bpe_fixed_encode_expr()} AS s
  FROM (SELECT doc_id, unnest({_DOC_TOKS}) AS tok FROM documents)
)
SELECT d.doc_id,
       CAST(COALESCE(sum(length(e.s) - length(replace(e.s, '<', ''))), 0)
            AS BIGINT) AS n_bpe
FROM documents d LEFT JOIN enc e USING (doc_id)
GROUP BY d.doc_id
"""

# Config-driven KWIC bank: one SELECT per DEFAULT bank pattern (generated
# from the same config constant the engine reads).
from .config import DEFAULT_KWIC_BANK as _KWIC_BANK  # noqa: E402

KWIC_BANK_SQL = "\nUNION ALL\n".join(
    f"SELECT doc_id, '{name}' AS pattern_name, "
    f"unnest(regexp_extract_all(text, '{pat}')) AS context FROM documents"
    for name, pat in _KWIC_BANK
)

DOC_STATS_SQL = f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(length({_WS_TOKS}) AS BIGINT) AS n_ws_tokens,
  CAST(length({_DOC_TOKS}) AS BIGINT) AS n_tokens,
  md5({_NORM}) AS fingerprint
FROM documents
"""

LANG_DOCS_SQL = f"""
WITH t AS (SELECT doc_id, {_DOC_TOKS} AS toks FROM documents),
c AS (
  SELECT doc_id,
    CAST(length(list_filter(toks, x -> list_contains({_SV_LIST}, x))) AS BIGINT) AS n_sv,
    CAST(length(list_filter(toks, x -> list_contains({_EN_LIST}, x))) AS BIGINT) AS n_en
  FROM t
)
SELECT doc_id,
  CASE WHEN n_sv > n_en THEN 'sv' WHEN n_en > n_sv THEN 'en' ELSE 'und' END AS lang
FROM c
"""

QUALITY_DOCS_SQL = f"""
WITH t AS (SELECT doc_id, {_DOC_TOKS} AS toks FROM documents)
SELECT doc_id,
  CAST(length(toks) AS BIGINT) AS n_tokens,
  CAST(length(list_distinct(toks)) AS BIGINT) AS n_distinct,
  CAST(length(list_filter(toks, x -> list_contains({_EN_LIST}, x))) AS BIGINT) AS n_stop,
  CASE WHEN length(toks) = 0 THEN NULL
       ELSE CAST(floor(100.0 * length(list_distinct(toks)) / length(toks)) AS BIGINT)
  END AS diversity_pct
FROM t
"""

NEAR_DUP_JACCARD_SQL = f"""
WITH tk AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest({_DOC_TOKS}) AS tok FROM documents)
),
counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
  FROM tk a JOIN tk b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       inter, ca.n + cb.n - inter AS uni
FROM pairs
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE 2 * inter >= ca.n + cb.n - inter
"""

# Incremental LSH delivery dedup (state/lsh_index.py): corpus v1 = even
# doc_ids ingested into the persistent band index; the delivery = odd
# doc_ids probes it. The oracle is the all-pairs CROSS-corpus exact
# Jaccard — equality proves full candidate recall from the persisted
# buckets plus exact verification against the stored blobs.
INCR_LSH_PAIRS_SQL = f"""
WITH tk AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest({_DOC_TOKS}) AS tok FROM documents)
),
counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY doc_id),
pairs AS (
  SELECT b.doc_id AS doc_new, a.doc_id AS doc_old, CAST(count(*) AS BIGINT) AS inter
  FROM tk a JOIN tk b ON a.tok = b.tok
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
  GROUP BY 1, 2
)
SELECT CAST(doc_new AS BIGINT) AS doc_new, CAST(doc_old AS BIGINT) AS doc_old,
       inter, cn.n + co.n - inter AS uni
FROM pairs
JOIN counts cn ON cn.doc_id = doc_new
JOIN counts co ON co.doc_id = doc_old
WHERE 2 * inter >= cn.n + co.n - inter
"""

INCR_LSH_KEEP_SQL = f"""
WITH tk AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest({_DOC_TOKS}) AS tok FROM documents)
),
counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY doc_id),
pairs AS (
  SELECT b.doc_id AS doc_new, a.doc_id AS doc_old, CAST(count(*) AS BIGINT) AS inter
  FROM tk a JOIN tk b ON a.tok = b.tok
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
  GROUP BY 1, 2
),
dups AS (
  SELECT DISTINCT doc_new
  FROM pairs
  JOIN counts cn ON cn.doc_id = doc_new
  JOIN counts co ON co.doc_id = doc_old
  WHERE 2 * inter >= cn.n + co.n - inter
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id
FROM documents d
WHERE d.doc_id % 2 = 1 AND d.doc_id NOT IN (SELECT doc_new FROM dups)
ORDER BY doc_id
"""

# Duplicate clustering: connected components of the Jaccard≥0.5 pair graph
# via recursive transitive closure (cluster id = min reachable doc_id),
# then keep-one-per-cluster. The engine side runs the SCALE pipeline
# (MinHash-LSH candidates → exact verify → distributed min-label
# propagation); equality to this closed-form SQL proves the whole chain.
_JACCARD_EDGES_CTE = f"""
tk AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest({_DOC_TOKS}) AS tok FROM documents)
),
counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY doc_id),
jp AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
  FROM tk a JOIN tk b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jpairs AS (
  SELECT doc_a, doc_b
  FROM jp
  JOIN counts ca ON ca.doc_id = doc_a
  JOIN counts cb ON cb.doc_id = doc_b
  WHERE 2 * inter >= ca.n + cb.n - inter
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jpairs
  UNION SELECT doc_b, doc_a FROM jpairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, re.r FROM reach re JOIN edges e ON e.src = re.node
)"""

DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_JACCARD_EDGES_CTE}
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""

DEDUP_KEEP_CLUSTERED_SQL = f"""
WITH RECURSIVE {_JACCARD_EDGES_CTE},
labels AS (SELECT node, min(r) AS root FROM reach GROUP BY node)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id
FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM labels WHERE node <> root)
"""

# Token counting (whitespace + BPE-ish pretokenizer) — same RE2 patterns.
from .ops.textstats import RE_BPE as _RE_BPE  # noqa: E402

TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
  CAST(length({_WS_TOKS}) AS BIGINT) AS n_ws_tokens,
  CAST(length(regexp_extract_all(text, '{_RE_BPE}')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""

# Tumbling 10-minute windows per event type.
EVENT_WINDOWS_SQL = """
SELECT event_type, time_bucket(INTERVAL 10 MINUTE, ts) AS win_start,
       CAST(count(*) AS BIGINT) AS n,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2
"""

# M19 validate/reject: same rules as textstats.validate_docs.
VALIDATE_DOCS_SQL = """
SELECT doc_id,
  CASE WHEN length(text) < 50 THEN 'too_short'
       WHEN substr(text, length(text), 1) NOT IN ('.', '!', '?') THEN 'unterminated'
  END AS reject_reason,
  CASE WHEN length(text) < 50 THEN FALSE
       WHEN substr(text, length(text), 1) NOT IN ('.', '!', '?') THEN FALSE
       ELSE TRUE END AS valid
FROM documents
"""

# Dead-letter side table: same M19 rules, reject side only.
DEAD_LETTER_DOCS_SQL = """
SELECT doc_id,
  CASE WHEN length(text) < 50 THEN 'too_short' ELSE 'unterminated' END AS reason
FROM documents
WHERE length(text) < 50 OR substr(text, length(text), 1) NOT IN ('.', '!', '?')
"""

BINARY_META_SQL = """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks
FROM documents
"""

# ---- similarity search over `embeddings` -----------------------------------

ANN_COSINE_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q, embeddings e WHERE e.vec_id <> q.query_id
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS neighbor_id
FROM s QUALIFY rank <= 5
"""

# Pinned coarse quantizer shared by ANN_IVF_FIXED_SQL and SEMDEDUP_SQL:
# centroids = embeddings with vec_id < 16 (vec_id order == matrix row ==
# cid on the Ray side), every vector assigned to its nearest list
# (cosine, ties to the lower cid). One definition so the two oracles can
# never disagree about cluster membership.
_FIXED_QUANT_CTE = """c AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 16
),
va AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid
           ) AS rn
    FROM embeddings e, c
  ) WHERE rn = 1
)"""

# IVF at the approximate operating point: each query exact-scans only its
# 4 nearest lists. Mirrors ops/similarity.ann_ivf with load_fixed_centroids.
ANN_IVF_FIXED_SQL = f"""
WITH {_FIXED_QUANT_CTE},
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
qp AS (
  SELECT query_id, cid FROM (
    SELECT q.query_id, c.cid,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cid
           ) AS rn
    FROM q, c
  ) WHERE rn <= 4
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q
  JOIN qp USING (query_id)
  JOIN va ON va.cid = qp.cid
  JOIN embeddings e ON e.vec_id = va.vec_id
  WHERE e.vec_id <> q.query_id
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id)
            AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS neighbor_id
FROM s QUALIFY rank <= 5
"""

# SemDeDup (cluster-then-prune): same pinned quantizer as ANN_IVF_FIXED_SQL
# (shared _FIXED_QUANT_CTE); drop b when a lower-id a in the same cluster
# has floor(100*cos) >= 40, witness = the lowest such a. Mirrors
# ops/similarity.semdedup_prune.
SEMDEDUP_SQL = f"""
WITH {_FIXED_QUANT_CTE},
p AS (
  SELECT b.vec_id AS vec_id, a.vec_id AS witness_id, a.cid AS cluster,
         CAST(floor(100.0 * list_cosine_similarity(ea.embedding, eb.embedding))
              AS BIGINT) AS sim_centipct,
         row_number() OVER (PARTITION BY b.vec_id ORDER BY a.vec_id) AS rn
  FROM va a
  JOIN va b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE floor(100.0 * list_cosine_similarity(ea.embedding, eb.embedding)) >= 40
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(witness_id AS BIGINT) AS witness_id,
       CAST(cluster AS BIGINT) AS cluster,
       sim_centipct
FROM p WHERE rn = 1
"""

NEAR_DUP_EMBEDDING_SQL = """
SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b,
       CAST(floor(100.0 * list_cosine_similarity(a.embedding, b.embedding))
            AS BIGINT) AS sim_centipct
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE floor(100.0 * list_cosine_similarity(a.embedding, b.embedding)) >= 40
"""

# Multimodal plumbing oracles: the decode kernel is the documented
# deterministic fake (ops/multimodal._fake_decode), so its geometry is
# restatable in SQL over the payload byte length.
IMAGE_DECODE_SQL = """
SELECT doc_id AS item_id,
  CAST(64 + octet_length(encode(text)) % 193 AS BIGINT) AS width,
  CAST(64 + (octet_length(encode(text)) // 7) % 129 AS BIGINT) AS height
FROM documents
"""

FRAME_SAMPLE_SQL = """
SELECT doc_id AS item_id,
  CAST(unnest(range(0, greatest(1, octet_length(encode(text)) // 256), 4))
       AS BIGINT) AS frame_idx
FROM documents
"""

# Audio-analog overlapping framing: n_chunks = 1 + floor(max(0, n-128)/64),
# chunk i covers [i*64, min(n, i*64+128)). Mirrors ops/multimodal.AudioChunker.
AUDIO_CHUNKS_SQL = """
WITH p AS (SELECT doc_id AS item_id, octet_length(encode(text)) AS n FROM documents),
g AS (
  SELECT item_id, n,
         unnest(range(0, 1 + CAST(greatest(n - 128, 0) // 64 AS BIGINT))) AS chunk_idx
  FROM p
)
SELECT CAST(item_id AS BIGINT) AS item_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * 64 AS BIGINT) AS start_byte,
       CAST(least(n, chunk_idx * 64 + 128) AS BIGINT) AS end_byte
FROM g
"""

# ---- relational aggregates / joins / top-k (SURVEY §2.4-§2.6) --------------

EVENT_AGG_SQL = """
SELECT event_type, CAST(ts AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2
"""

TOP_USERS_SQL = """
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1 ORDER BY n DESC, user_id LIMIT 10
"""

ORDERS_BY_SEGMENT_SQL = """
SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_orders,
       min(o.o_totalprice) AS min_price, max(o.o_totalprice) AS max_price
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY 1
"""

ORDERS_JOIN_DIST_SQL = """
SELECT o.o_orderkey, o.o_totalprice, c.c_mktsegment
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
"""

Q1_COUNTS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY 1, 2
"""


# ---- winnowing fingerprints (MOSS) -----------------------------------------
# Exact SQL restatement of ops.dedup.winnow_fingerprints: the token hash
# (first-8-codepoint polynomial + length) and the modular 3-shingle
# combination are generated from the SAME constants the Ray side uses
# (ops.dedup.WINNOW_*), so the fingerprint sets match value-for-value.

from .ops.dedup import WINNOW_M, WINNOW_MULTS, WINNOW_POWS  # noqa: E402

_WINNOW_TH = (
    " + ".join(
        f"CASE WHEN length(tok) >= {j + 1}"
        f" THEN CAST(unicode(substr(tok, {j + 1}, 1)) AS BIGINT) * {WINNOW_POWS[j]}"
        " ELSE 0 END"
        for j in range(8)
    )
    + " + length(tok)"
)

# shared shingle-fingerprint chain (documents → (doc_id, p, fp) per
# 3-token shingle) — used by DOC_WINNOW_SQL and NEAR_DUP_MINHASH_SQL
_WINNOW_SHV_CTE = f"""toks AS (
  SELECT doc_id, unnest({_DOC_TOKS}) AS tok,
         generate_subscripts({_DOC_TOKS}, 1) AS p
  FROM documents
),
th AS (SELECT doc_id, p, {_WINNOW_TH} AS h FROM toks),
sh AS (
  SELECT doc_id, p,
    (   (h % {WINNOW_M})::HUGEINT * {WINNOW_MULTS[0]}
      + ((lead(h, 1) OVER w) % {WINNOW_M})::HUGEINT * {WINNOW_MULTS[1]}
      + ((lead(h, 2) OVER w) % {WINNOW_M})::HUGEINT * {WINNOW_MULTS[2]}
    ) % {WINNOW_M} AS fp
  FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY p)
),
shv AS (SELECT doc_id, p, CAST(fp AS BIGINT) AS fp FROM sh WHERE fp IS NOT NULL)"""

DOC_WINNOW_SQL = f"""
WITH {_WINNOW_SHV_CTE},
win AS (
  SELECT doc_id,
         min(fp) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp,
         row_number() OVER (PARTITION BY doc_id ORDER BY p) AS rn,
         count(*) OVER (PARTITION BY doc_id) AS n_sh
  FROM shv
)
SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id, fp
FROM win WHERE rn >= least(n_sh, 4)
"""


# ---- exact distributed quantiles + grouped top-k ---------------------------

DOC_LEN_QUANTILES_SQL = """
SELECT source,
       CAST(quantile_disc(n_chars, 0.500) AS BIGINT) AS p500,
       CAST(quantile_disc(n_chars, 0.900) AS BIGINT) AS p900,
       CAST(quantile_disc(n_chars, 0.990) AS BIGINT) AS p990
FROM documents GROUP BY source
"""

TOP_TERMS_PER_SOURCE_SQL = f"""
WITH tc AS (
  SELECT source, tok AS term, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT source, unnest({_DOC_TOKS}) AS tok FROM documents)
  GROUP BY 1, 2
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY n DESC, term)
                 AS BIGINT) AS rank
  FROM tc
)
SELECT source, term, n, rank FROM r WHERE rank <= 5
"""


# ---- SQL-reproducible SimHash (value-checked sketch) -----------------------
# The simhash token hash is sql_mix64(winnow_token_hashes(tok)): the
# splitmix64 chain below is generated in HUGEINT arithmetic (add / mulmod
# 2^64, xorshift via sign-bit-safe BIGINT xor) from the SAME constants the
# numpy kernel uses, so per-document simhash values — and the bit-band
# candidate pairs derived from them — are value-checked, not just
# invariant-checked.

from .ops.dedup import SQLMIX_ADD, SQLMIX_M1, SQLMIX_M2  # noqa: E402

_TWO64 = 18446744073709551616
_TWO63 = 9223372036854775808


def _sx(u: str) -> str:
    """unsigned HUGEINT expr -> bit-identical signed BIGINT expr"""
    return (
        f"CAST(({u}) - (CASE WHEN ({u}) >= {_TWO63} THEN {_TWO64}::HUGEINT"
        " ELSE 0::HUGEINT END) AS BIGINT)"
    )


def _ux(s: str) -> str:
    """signed BIGINT expr -> bit-identical unsigned HUGEINT expr"""
    return (
        f"(CAST(({s}) AS HUGEINT) + (CASE WHEN ({s}) < 0 THEN {_TWO64}::HUGEINT"
        " ELSE 0::HUGEINT END))"
    )


def _xorshift(col: str, k: int) -> str:
    return _ux(f"xor({_sx(col)}, {_sx(f'(({col}) >> {k})')})")


def _mulmod(col: str, m: int) -> str:
    """(col * m) mod 2^64 without overflowing HUGEINT: 32-bit lo/hi split."""
    return (
        f"((((({col}) % 4294967296) * {m}) % {_TWO64}::HUGEINT"
        f" + (((({col}) >> 32) * {m}) % 4294967296) * 4294967296)"
        f" % {_TWO64}::HUGEINT)"
    )


_SIMHASH_BITS = ", ".join(
    f"SUM(CASE WHEN ((z >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS s{j}"
    for j in range(64)
)
_SIMHASH_VAL = " + ".join(
    f"CASE WHEN s{j} > 0 THEN {1 << j}::HUGEINT ELSE 0::HUGEINT END"
    for j in range(64)
)

# shared CTE chain: documents -> per-token mixed hash -> per-doc simhash v
_SIMHASH_CTE = f"""
toks AS (
  SELECT doc_id, unnest({_DOC_TOKS}) AS tok FROM documents
),
h0 AS (SELECT doc_id, {_WINNOW_TH} AS h FROM toks),
s0 AS (SELECT doc_id, (CAST(h AS HUGEINT) + {SQLMIX_ADD}) % {_TWO64}::HUGEINT AS z FROM h0),
s1 AS (SELECT doc_id, {_xorshift('z', 30)} AS z FROM s0),
s2 AS (SELECT doc_id, {_mulmod('z', SQLMIX_M1)} AS z FROM s1),
s3 AS (SELECT doc_id, {_xorshift('z', 27)} AS z FROM s2),
s4 AS (SELECT doc_id, {_mulmod('z', SQLMIX_M2)} AS z FROM s3),
s5 AS (SELECT doc_id, {_xorshift('z', 31)} AS z FROM s4),
bits AS (SELECT doc_id, {_SIMHASH_BITS} FROM s5 GROUP BY doc_id),
simv AS (
  SELECT d.doc_id, COALESCE(({_SIMHASH_VAL}), 0::HUGEINT) AS v
  FROM documents d LEFT JOIN bits ON d.doc_id = bits.doc_id
)
"""

SIMHASH_DOCS_SQL = f"""
WITH {_SIMHASH_CTE}
SELECT CAST(doc_id AS BIGINT) AS doc_id, printf('%016x', {_sx('v')}) AS simhash
FROM simv
"""

SIMHASH_PAIRS_SQL = f"""
WITH {_SIMHASH_CTE},
bandk AS (
  SELECT doc_id, j AS band_id,
         CAST((v >> (j * 16)) & 65535 AS BIGINT) AS band_hash
  FROM simv, (SELECT unnest([0, 1, 2, 3]) AS j)
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(count(*) AS BIGINT) AS n_bands
FROM bandk a JOIN bandk b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# ---- SQL-reproducible MinHash-LSH candidates (value-checked) ---------------
# near_dup_minhash's default operating point (3-token shingles, k=64,
# bands=16, seed=12345) is restated exactly: shingle fingerprints come
# from the shared winnow chain, the 64 permutation constants are read
# from the SAME seeded MinHasher the engine uses, signature minima are
# unsigned (HUGEINT in [0, 2^64)), and band-bucket keys are the modular
# combination from dedup.BAND_MULTS. Any candidate-pair difference —
# one permutation constant, one min, one band key — fails the hash check.

from .ops.dedup import BAND_MULTS, MinHasher  # noqa: E402

_MH = MinHasher()  # default seed/k/bands — must match q_near_dup_minhash
_MH_A = _MH.a.tolist()
_MH_B = _MH.b.tolist()

_MINHASH_SIGS = ", ".join(
    # fp < 2^31 so fp*a + b < 2^94: fits HUGEINT without the lo/hi split
    f"MIN((CAST(fp AS HUGEINT) * {_MH_A[k]} + {_MH_B[k]})"
    f" % {_TWO64}::HUGEINT) AS s{k}"
    for k in range(_MH.k)
)

# docs with < 3 tokens have NO shingles: LEFT JOIN + COALESCE to the empty
# signature (2^64-1 per slot), matching the numpy initializer exactly
_MINHASH_COALESCE = ", ".join(
    f"COALESCE(sigp.s{k}, {_TWO64 - 1}::HUGEINT) AS s{k}" for k in range(_MH.k)
)


def _mh_band_key(b: int) -> str:
    terms = " + ".join(
        f"(s{b * _MH.rows + r} % {WINNOW_M}) * {BAND_MULTS[r]}"
        for r in range(_MH.rows)
    )
    return f"CAST(({terms}) % {WINNOW_M} AS BIGINT)"


_MH_BANDS = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band_id, {_mh_band_key(b)} AS band_hash FROM sig"
    for b in range(_MH.bands)
)

NEAR_DUP_MINHASH_SQL = f"""
WITH {_WINNOW_SHV_CTE},
shd AS (SELECT DISTINCT doc_id, fp FROM shv),
sigp AS (SELECT doc_id, {_MINHASH_SIGS} FROM shd GROUP BY doc_id),
sig AS (
  SELECT d.doc_id, {_MINHASH_COALESCE}
  FROM documents d LEFT JOIN sigp ON d.doc_id = sigp.doc_id
),
bandk AS (
{_MH_BANDS}
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(count(*) AS BIGINT) AS n_bands
FROM bandk a JOIN bandk b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# ---- Corpus-frequent shingle boilerplate filter ----------------------------
# Restates ops.dedup.boilerplate_docs exactly: distinct winnow 3-shingle
# fingerprints per doc, corpus document-frequency per fingerprint, per-doc
# boilerplate share in floor-division integer permille.

from .ops.dedup import (  # noqa: E402
    BOILER_MAX_PERMILLE,
    BOILER_MIN_DF_PERMILLE,
    BOILER_MIN_DOCS,
)

BOILERPLATE_DOCS_SQL = f"""
WITH {_WINNOW_SHV_CTE},
shd AS (SELECT DISTINCT doc_id, fp FROM shv),
freq AS (SELECT fp FROM shd GROUP BY fp
         HAVING count(*) >= greatest({BOILER_MIN_DOCS},
           ({BOILER_MIN_DF_PERMILLE} * (SELECT count(*) FROM documents)
            + 999) // 1000)),
per AS (
  SELECT doc_id, count(*) AS n_sh,
         count(*) FILTER (WHERE fp IN (SELECT fp FROM freq)) AS n_freq
  FROM shd GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(p.n_sh, 0) AS BIGINT) AS n_sh,
       CAST(COALESCE(p.n_freq, 0) AS BIGINT) AS n_freq,
       CAST(COALESCE((1000 * p.n_freq) // p.n_sh, 0) AS BIGINT)
         AS boiler_permille,
       CAST(CASE WHEN COALESCE((1000 * p.n_freq) // p.n_sh, 0)
                      < {BOILER_MAX_PERMILLE}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents d LEFT JOIN per p USING (doc_id)
"""


# ---- Within-doc repetition signals (Gopher-style) --------------------------

from .ops.textstats import (  # noqa: E402
    REP_SHINGLE_MAX_PERMILLE,
    TOP_TOKEN_MAX_PERMILLE,
)

DOC_REPETITION_SQL = f"""
WITH {_WINNOW_SHV_CTE},
tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
tt AS (SELECT doc_id, sum(c) AS n_tok, max(c) AS top FROM tc GROUP BY doc_id),
sd AS (SELECT doc_id, count(*) AS n_sh, count(DISTINCT fp) AS n_dist
       FROM shv GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(t.n_tok, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE((1000 * t.top) // t.n_tok, 0) AS BIGINT)
         AS top_tok_permille,
       CAST(COALESCE((1000 * (s.n_sh - s.n_dist)) // s.n_sh, 0) AS BIGINT)
         AS dup_shingle_permille,
       CAST(CASE WHEN COALESCE((1000 * (s.n_sh - s.n_dist)) // s.n_sh, 0)
                      < {REP_SHINGLE_MAX_PERMILLE}
                  AND COALESCE((1000 * t.top) // t.n_tok, 0)
                      < {TOP_TOKEN_MAX_PERMILLE}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents d
LEFT JOIN tt t USING (doc_id)
LEFT JOIN sd s USING (doc_id)
"""


# ---- Benchmark decontamination ---------------------------------------------

from .ops.dedup import (  # noqa: E402
    CONTAM_EVAL_MOD,
    CONTAM_MIN_HITS,
    CONTAM_MIN_PERMILLE,
)

DECONTAMINATE_SQL = f"""
WITH {_WINNOW_SHV_CTE},
shd AS (SELECT DISTINCT doc_id, fp FROM shv),
ev AS (SELECT DISTINCT fp FROM shd WHERE doc_id % {CONTAM_EVAL_MOD} = 0),
per AS (
  SELECT doc_id, count(*) AS n_sh,
         count(*) FILTER (WHERE fp IN (SELECT fp FROM ev)) AS n_hit
  FROM shd WHERE doc_id % {CONTAM_EVAL_MOD} <> 0 GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(p.n_sh, 0) AS BIGINT) AS n_sh,
       CAST(COALESCE(p.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(CASE WHEN COALESCE(p.n_hit, 0) >= {CONTAM_MIN_HITS}
                  AND 1000 * COALESCE(p.n_hit, 0)
                      >= {CONTAM_MIN_PERMILLE} * COALESCE(p.n_sh, 0)
                  AND COALESCE(p.n_sh, 0) > 0
            THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM documents d LEFT JOIN per p USING (doc_id)
WHERE d.doc_id % {CONTAM_EVAL_MOD} <> 0
"""


# ---- Mixture sampling to per-source token budgets --------------------------

from .ops.sampling import (  # noqa: E402
    MIX_HASH_ADD,
    MIX_HASH_M,
    MIX_HASH_MULT,
    MIX_TOKEN_BUDGET,
)

MIXTURE_SAMPLE_SQL = f"""
WITH tt AS (
  SELECT source, doc_id, len({_DOC_TOKS}) AS n_tok FROM documents
),
sel AS (
  SELECT source, doc_id, n_tok,
         sum(n_tok) OVER (
           PARTITION BY source
           ORDER BY ((doc_id % {MIX_HASH_M}) * {MIX_HASH_MULT}
                     + {MIX_HASH_ADD}) % {MIX_HASH_M}, doc_id
         ) AS cum
  FROM tt
)
SELECT source, CAST(doc_id AS BIGINT) AS doc_id, CAST(n_tok AS BIGINT) AS n_tok
FROM sel WHERE cum - n_tok < {MIX_TOKEN_BUDGET}
"""


# ---- End-to-end curation pipeline: gates -> decontaminate -> mixture -------
# Composition of the three curation oracles (nested-CTE scoped, so their
# internal chains don't collide) feeding the mixture-sampling window.

CURATE_MIX_SQL = f"""
WITH rep AS ({DOC_REPETITION_SQL}),
boil AS ({BOILERPLATE_DOCS_SQL}),
cont AS ({DECONTAMINATE_SQL}),
keepset AS (
  SELECT r.doc_id FROM rep r
  JOIN boil b USING (doc_id) JOIN cont c USING (doc_id)
  WHERE r.keep = 1 AND b.keep = 1 AND c.contaminated = 0
),
tt AS (
  SELECT d.source, d.doc_id, len({_DOC_TOKS}) AS n_tok
  FROM documents d JOIN keepset USING (doc_id)
),
sel AS (
  SELECT source, doc_id, n_tok,
         sum(n_tok) OVER (
           PARTITION BY source
           ORDER BY ((doc_id % {MIX_HASH_M}) * {MIX_HASH_MULT}
                     + {MIX_HASH_ADD}) % {MIX_HASH_M}, doc_id
         ) AS cum
  FROM tt
)
SELECT source, CAST(doc_id AS BIGINT) AS doc_id, CAST(n_tok AS BIGINT) AS n_tok
FROM sel WHERE cum - n_tok < {MIX_TOKEN_BUDGET}
"""


# ---- Value-checked hyperplane LSH buckets ----------------------------------
# Restates ops.similarity.lsh_buckets at the testdata operating point
# (dim = 64, n_planes = 8, seed = 99): the SAME quantized plane matrix is
# inlined as a VALUES table, vectors quantize identically
# (floor(v * 2^20) is exact in double), and the projection is an integer
# sum — order-independent, so the bucket codes match bit-for-bit.

from .ops.similarity import LSH_Q_SCALE, _plane_int_matrix  # noqa: E402

_LSH_DIM = 64  # testdata embeddings dim (oracle pinned; engine is generic)
_LSH_PLANES = _plane_int_matrix(_LSH_DIM, 8, 99)
_LSH_VALS = ", ".join(
    f"({i + 1}, {j}, {int(_LSH_PLANES[i, j])})"
    for i in range(_LSH_DIM)
    for j in range(8)
)

LSH_BUCKETS_SQL = f"""
WITH e AS (
  SELECT vec_id,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {LSH_Q_SCALE})
              AS BIGINT) AS qv,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
p (i, j, s) AS (VALUES {_LSH_VALS}),
proj AS (
  SELECT e.vec_id, p.j, sum(p.s * e.qv) AS dot
  FROM e JOIN p USING (i) GROUP BY 1, 2
)
SELECT CAST(sum(CASE WHEN dot >= 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket,
       CAST(vec_id AS BIGINT) AS vec_id
FROM proj GROUP BY vec_id
"""


# ---- Training-shard packing ------------------------------------------------

from .ops.sampling import SHARD_BUCKETS, SHARD_TOKENS  # noqa: E402

SHARD_PACK_SQL = f"""
WITH tt AS (
  SELECT doc_id, len({_DOC_TOKS}) AS n_tok,
         doc_id % {SHARD_BUCKETS} AS bucket
  FROM documents
),
sel AS (
  SELECT doc_id, n_tok, bucket,
         sum(n_tok) OVER (
           PARTITION BY bucket
           ORDER BY ((doc_id % {MIX_HASH_M}) * {MIX_HASH_MULT}
                     + {MIX_HASH_ADD}) % {MIX_HASH_M}, doc_id
         ) AS cum
  FROM tt
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(((cum - n_tok) // {SHARD_TOKENS}) * {SHARD_BUCKETS} + bucket
            AS BIGINT) AS shard_id
FROM sel
"""


# ---- HyperLogLog register sketch (value-checked) ---------------------------
# The sketch is deterministic (splitmix64), so the REGISTERS are a full
# value check: the oracle recomputes the identical mix chain in HUGEINT
# arithmetic and derives each register's max leading-zero rank. p = 6.

HLL_USERS_SQL = f"""
WITH s0 AS (SELECT (CAST(user_id AS HUGEINT) + {SQLMIX_ADD})
                   % {_TWO64}::HUGEINT AS z FROM events),
s1 AS (SELECT {_xorshift('z', 30)} AS z FROM s0),
s2 AS (SELECT {_mulmod('z', SQLMIX_M1)} AS z FROM s1),
s3 AS (SELECT {_xorshift('z', 27)} AS z FROM s2),
s4 AS (SELECT {_mulmod('z', SQLMIX_M2)} AS z FROM s3),
s5 AS (SELECT {_xorshift('z', 31)} AS z FROM s4),
hm AS (SELECT CAST(z % 64 AS BIGINT) AS register,
              CAST(z // 64 AS BIGINT) AS rem FROM s5)
SELECT register,
       CAST(max(59 - CASE WHEN rem = 0 THEN 0 ELSE length(bin(rem)) END)
            AS BIGINT) AS rho_max
FROM hm GROUP BY register
"""


# ---- temporal joins over the events stream (ops/temporal.py) ---------------
# As-of join: DuckDB's native ASOF LEFT JOIN vs the Ray merge_asof probe.
# The build side is pre-aggregated to one row per (user_id, ts) on BOTH
# engines so exact-timestamp ties resolve identically.

ASOF_EVENTS_SQL = """
WITH views AS (
  SELECT user_id, ts, max(value) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       p.ts, v.ts AS view_ts, v.view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
"""

RANGE_JOIN_EVENTS_SQL = """
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(p.user_id AS BIGINT) AS user_id, p.ts,
       CAST(count(c.event_id) AS BIGINT) AS n_clicks_7d
FROM events p LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts > p.ts - INTERVAL 7 DAY AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY 1, 2, 3
"""

HOPPING_WINDOWS_SQL = """
WITH h AS (
  SELECT event_type, value, time_bucket(INTERVAL 5 MINUTE, ts) AS b FROM events
),
x AS (
  SELECT event_type, value, b AS win_start FROM h
  UNION ALL
  SELECT event_type, value, b - INTERVAL 5 MINUTE AS win_start FROM h
)
SELECT event_type, win_start, CAST(count(*) AS BIGINT) AS n,
       min(value) AS min_value, max(value) AS max_value
FROM x GROUP BY 1, 2
"""

ROLLING_EVENTS_SQL = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id, ts,
       CAST(sum(v) OVER w AS BIGINT) AS roll_sum_micro,
       CAST(count(*) OVER w AS BIGINT) AS n_win
FROM (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 1000000.0) AS BIGINT) AS v
  FROM events
)
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
)
"""


# ---- fragment-to-page alignment (ops/align.py, M17 analog) -----------------
# Page side: every sliding 5-token window of every document; element side:
# non-overlapping 5-token chunks of every turn. Unique-hit filter, then
# modal vote per turn with ties dropped — identical to ops.align.

PAGE_ALIGN_SQL = (
    _with(TRANSCRIPTS_CTE)
    + f"""
, ttok AS (
  SELECT conv_id, turn_idx, unnest(toks) AS tok,
         generate_subscripts(toks, 1) AS p
  FROM (SELECT conv_id, turn_idx, string_split(text, ' ') AS toks
        FROM transcripts)
),
tth AS (SELECT conv_id, turn_idx, p, ({_WINNOW_TH}) % 2147483647 AS h FROM ttok),
tfp AS (
  SELECT conv_id, turn_idx, p,
    (
      (h::HUGEINT * 1000003) % 2147483647
    + ((lead(h, 1) OVER w)::HUGEINT * 998244353) % 2147483647
    + ((lead(h, 2) OVER w)::HUGEINT * 69069) % 2147483647
    + ((lead(h, 3) OVER w)::HUGEINT * 2654435761) % 2147483647
    + ((lead(h, 4) OVER w)::HUGEINT * 998244853) % 2147483647
    ) % 2147483647 AS frag
  FROM tth WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY p)
),
tfrag AS (
  SELECT conv_id, turn_idx, CAST(frag AS BIGINT) AS frag
  FROM tfp WHERE frag IS NOT NULL AND (p - 1) % 5 = 0
),
dtok AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS p
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
dth AS (SELECT doc_id, p, ({_WINNOW_TH}) % 2147483647 AS h FROM dtok),
dfp AS (
  SELECT doc_id,
    (
      (h::HUGEINT * 1000003) % 2147483647
    + ((lead(h, 1) OVER w)::HUGEINT * 998244353) % 2147483647
    + ((lead(h, 2) OVER w)::HUGEINT * 69069) % 2147483647
    + ((lead(h, 3) OVER w)::HUGEINT * 2654435761) % 2147483647
    + ((lead(h, 4) OVER w)::HUGEINT * 998244853) % 2147483647
    ) % 2147483647 AS frag
  FROM dth WINDOW w AS (PARTITION BY doc_id ORDER BY p)
),
dfrag AS (
  SELECT DISTINCT doc_id, CAST(frag AS BIGINT) AS frag
  FROM dfp WHERE frag IS NOT NULL
),
uniq AS (
  SELECT frag, max(doc_id) AS doc_id FROM dfrag
  GROUP BY frag HAVING count(*) = 1
),
votes AS (
  SELECT t.conv_id, t.turn_idx, u.doc_id, count(*) AS n
  FROM tfrag t JOIN uniq u USING (frag) GROUP BY 1, 2, 3
),
best AS (
  SELECT conv_id, turn_idx, doc_id, n,
         max(n) OVER (PARTITION BY conv_id, turn_idx) AS mx
  FROM votes
),
top AS (SELECT * FROM best WHERE n = mx),
solo AS (
  SELECT conv_id, turn_idx FROM top GROUP BY 1, 2 HAVING count(*) = 1
)
SELECT t.conv_id, t.turn_idx, CAST(t.doc_id AS BIGINT) AS page_doc,
       CAST(t.n AS BIGINT) AS n_votes
FROM top t JOIN solo s USING (conv_id, turn_idx)
"""
)


# ---- TPC-H-Q3-shaped mixed join plan (ops/relational.py) -------------------
# Revenue floored to integer cents on both engines: identical IEEE-double
# expression order, then floor, then integer sum — summation-order-proof.

Q3_SHIPPING_SQL = """
WITH r AS (
  SELECT l.l_orderkey AS o_orderkey, o.o_orderdate,
         CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment = 'BUILDING'
  GROUP BY 1, 2
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderdate, revenue_cents
FROM r ORDER BY revenue_cents DESC, o_orderkey LIMIT 10
"""


# ---- count-min sketch registers (ops/sketch.py, value-checked) --------------
# Token id = winnowing token hash mod WINNOW_M (same chain as DOC_WINNOW);
# row-d column = splitmix64(tid*CMS_D + d) mod CMS_W, recomputed here in
# HUGEINT arithmetic — every counter in the D×W matrix is value-checked.

from .ops.sketch import CMS_D, CMS_W  # noqa: E402

CMS_WORDS_SQL = f"""
WITH toks AS (SELECT unnest({_DOC_TOKS}) AS tok FROM documents),
tid AS (SELECT ({_WINNOW_TH}) % {WINNOW_M} AS t FROM toks),
x AS (
  SELECT d.d AS row, t * {CMS_D} + d.d AS x0
  FROM tid, (VALUES (0), (1), (2), (3)) AS d(d)
),
s0 AS (SELECT row, (CAST(x0 AS HUGEINT) + {SQLMIX_ADD}) % {_TWO64}::HUGEINT AS z FROM x),
s1 AS (SELECT row, {_xorshift('z', 30)} AS z FROM s0),
s2 AS (SELECT row, {_mulmod('z', SQLMIX_M1)} AS z FROM s1),
s3 AS (SELECT row, {_xorshift('z', 27)} AS z FROM s2),
s4 AS (SELECT row, {_mulmod('z', SQLMIX_M2)} AS z FROM s3),
s5 AS (SELECT row, {_xorshift('z', 31)} AS z FROM s4)
SELECT CAST(row AS BIGINT) AS row, CAST(z % {CMS_W} AS BIGINT) AS col,
       CAST(count(*) AS BIGINT) AS n
FROM s5 GROUP BY 1, 2
"""


# Grouped count-min: the CMS chain with the source key threaded through.
# Mirrors ops/sketch.cms_registers_grouped.
CMS_BY_SOURCE_SQL = f"""
WITH toks AS (SELECT source, unnest({_DOC_TOKS}) AS tok FROM documents),
tid AS (SELECT source, ({_WINNOW_TH}) % {WINNOW_M} AS t FROM toks),
x AS (
  SELECT source, d.d AS row, t * {CMS_D} + d.d AS x0
  FROM tid, (VALUES (0), (1), (2), (3)) AS d(d)
),
s0 AS (SELECT source, row,
              (CAST(x0 AS HUGEINT) + {SQLMIX_ADD}) % {_TWO64}::HUGEINT AS z
       FROM x),
s1 AS (SELECT source, row, {_xorshift('z', 30)} AS z FROM s0),
s2 AS (SELECT source, row, {_mulmod('z', SQLMIX_M1)} AS z FROM s1),
s3 AS (SELECT source, row, {_xorshift('z', 27)} AS z FROM s2),
s4 AS (SELECT source, row, {_mulmod('z', SQLMIX_M2)} AS z FROM s3),
s5 AS (SELECT source, row, {_xorshift('z', 31)} AS z FROM s4)
SELECT source, CAST(row AS BIGINT) AS row, CAST(z % {CMS_W} AS BIGINT) AS col,
       CAST(count(*) AS BIGINT) AS n
FROM s5 GROUP BY 1, 2, 3
"""


# ---- S10 validate-then-compile (ops/textstats.bib_compile) ------------------

BIB_COMPILE_SQL = """
SELECT doc_id,
       '@doc{' || CAST(doc_id AS VARCHAR) || ', source={' || source ||
       '}, nchars=' || CAST(n_chars AS VARCHAR) || '}' AS entry
FROM documents
WHERE length(text) >= 50
ORDER BY doc_id
"""


# ---- image resize geometry (ops/multimodal.ImageResizer) --------------------

IMAGE_RESIZE_SQL = """
WITH dec AS (
  SELECT doc_id AS item_id,
    CAST(64 + octet_length(encode(text)) % 193 AS BIGINT) AS width,
    CAST(64 + (octet_length(encode(text)) // 7) % 129 AS BIGINT) AS height
  FROM documents
),
s AS (
  SELECT *, CASE WHEN greatest(width, height) <= 224 THEN 1000
                 ELSE 224 * 1000 // greatest(width, height) END AS scale_permille
  FROM dec
)
SELECT item_id, CAST(width * scale_permille // 1000 AS BIGINT) AS out_w,
       CAST(height * scale_permille // 1000 AS BIGINT) AS out_h,
       CAST(scale_permille AS BIGINT) AS scale_permille
FROM s
"""


# ---- distributed anti join (hashagg.hash_join how='anti') -------------------

ORDERS_NO_LINEITEM_SQL = """
SELECT o.o_orderkey, o.o_totalprice
FROM orders o ANTI JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


# ---- distributed full outer join (hashagg.hash_join how='outer') ------------

CLICK_PURCHASE_MATRIX_SQL = """
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
),
p AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT CAST(coalesce(c.user_id, p.user_id) AS BIGINT) AS user_id,
       CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks,
       CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases
FROM c FULL OUTER JOIN p ON p.user_id = c.user_id
"""


# ---- train/val/test split assignment (ops/sampling.dataset_split) -----------

from .ops.sampling import SPLIT_BUCKETS, SPLIT_TRAIN_LT, SPLIT_VAL_LT  # noqa: E402

DATASET_SPLIT_SQL = f"""
WITH s0 AS (SELECT doc_id, (CAST(doc_id AS HUGEINT) + {SQLMIX_ADD})
                           % {_TWO64}::HUGEINT AS z FROM documents),
s1 AS (SELECT doc_id, {_xorshift('z', 30)} AS z FROM s0),
s2 AS (SELECT doc_id, {_mulmod('z', SQLMIX_M1)} AS z FROM s1),
s3 AS (SELECT doc_id, {_xorshift('z', 27)} AS z FROM s2),
s4 AS (SELECT doc_id, {_mulmod('z', SQLMIX_M2)} AS z FROM s3),
s5 AS (SELECT doc_id, {_xorshift('z', 31)} AS z FROM s4)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(z % {SPLIT_BUCKETS} AS BIGINT) AS bucket,
       CASE WHEN z % {SPLIT_BUCKETS} < {SPLIT_TRAIN_LT} THEN 'train'
            WHEN z % {SPLIT_BUCKETS} < {SPLIT_VAL_LT} THEN 'val'
            ELSE 'test' END AS split
FROM s5
"""


# ---- BM25 retrieval ---------------------------------------------------------
# Constants (k1=1.2, b=0.75, terms, rational idf) are shared with
# ops/retrieval.py; floats written as the SAME expression tree numpy
# evaluates (left-assoc, k1+1 computed not folded) and floored to integer
# micro-units per (doc, term) BEFORE the order-independent integer sum.
# DSIR-style importance selection: hashed-unigram (winnow token hash % 64)
# target-vs-raw distributions with add-one smoothing, rational importance
# v[b] = floor(1e6 * (n_t+1)*R / ((n_r+1)*T)) in exact HUGEINT, per-doc
# score = floor(mean v over the doc's tokens) — per-token affinity, not
# length. Mirrors ops/retrieval.dsir_stats + dsir_select.
DSIR_SELECT_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, unnest({_DOC_TOKS}) AS tok FROM documents
),
bt AS (SELECT doc_id, source, CAST(({_WINNOW_TH}) % 64 AS BIGINT) AS b FROM toks),
cnt AS (
  SELECT b,
         count(*) FILTER (WHERE source = 'src0') AS n_t,
         count(*) AS n_r
  FROM bt GROUP BY b
),
tot AS (SELECT CAST(sum(n_t) + 64 AS HUGEINT) AS t_tot,
               CAST(sum(n_r) + 64 AS HUGEINT) AS r_tot FROM cnt),
v AS (
  SELECT b,
         CAST(1000000::HUGEINT * (n_t + 1) * r_tot
              // ((n_r + 1) * t_tot) AS BIGINT) AS v
  FROM cnt, tot
),
sc AS (
  SELECT doc_id, sum(v.v) // count(*) AS dsir_micro
  FROM bt JOIN v USING (b) GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY dsir_micro DESC, doc_id) AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(dsir_micro AS BIGINT) AS dsir_micro
FROM sc QUALIFY rank <= 100
"""

BM25_SEARCH_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_DOC_TOKS}) AS tok FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
-- n_docs/avgdl over EVERY document (token-less docs count with dl=0),
-- matching the engine's bm25_stats which counts all rows per batch.
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(COALESCE(dl.dl, 0)) AS DOUBLE) / count(*) AS avgdl
  FROM documents LEFT JOIN dl USING (doc_id)
),
tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks
  WHERE tok IN ('spark', 'window', 'vector') GROUP BY doc_id, tok
),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
scores AS (
  SELECT tf.doc_id,
    CAST(floor(
      1000000.0 * ((stats.n_docs - df.df + 0.5) / (df.df + 0.5))
      * (tf.tf * (1.2 + 1.0))
      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
    ) AS BIGINT) AS s
  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
),
totals AS (
  SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_micro
  FROM scores GROUP BY doc_id HAVING sum(s) > 0
)
SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank,
       doc_id, score_micro
FROM totals ORDER BY score_micro DESC, doc_id LIMIT 10
"""

# ---- nearest-centroid clustering assignment ---------------------------------
# Seeds = embeddings of vec_id < 8 (shared with ops/retrieval.kmeans_assign);
# tie rule = lowest centroid id, matching numpy argmax-first.
KMEANS_ASSIGN_SQL = """
WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT e.vec_id, c.cid,
         list_cosine_similarity(e.embedding, c.ce) AS sim,
         row_number() OVER (
           PARTITION BY e.vec_id ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid
         ) AS rn
  FROM embeddings e, c
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS BIGINT) AS cluster
FROM s WHERE rn = 1
"""


# ---- PII scrub ---------------------------------------------------------------
# Patterns shared with ops/textstats.py (PII_EMAIL_RE / PII_PHONE_RE); both
# engines are RE2 so scrubbed text matches byte-for-byte. The plant step
# mirrors textstats.plant_pii exactly.
PII_SCRUB_SQL = r"""
WITH planted AS (
  SELECT doc_id,
    text || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com tel +1-555-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS p
  FROM documents
)
SELECT doc_id,
  regexp_replace(
    regexp_replace(p, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed,
  CAST(length(regexp_extract_all(p, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(length(regexp_extract_all(p, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones
FROM planted
"""


# Source-domain stats: plant mirrors textstats.plant_url, extraction uses
# the same first-match regex; blocked restates the deterministic blocklist
# rule (site ids divisible by 7) the broadcast set is generated from.
DOMAIN_STATS_SQL = """
WITH planted AS (
  SELECT text || ' src http://site' || CAST(doc_id % 50 AS VARCHAR)
              || '.example/a' AS p
  FROM documents
),
d AS (
  SELECT regexp_extract(p, 'https?://([A-Za-z0-9.-]+)', 1) AS domain
  FROM planted
)
SELECT domain,
       CAST(CAST(regexp_extract(domain, 'site([0-9]+)', 1) AS BIGINT) % 7 = 0
            AS BIGINT) AS blocked,
       CAST(count(*) AS BIGINT) AS n_docs
FROM d GROUP BY 1, 2
"""


# ---- cross-document repeated-substring spans --------------------------------
# Shares the winnow shingle chain (_WINNOW_SHV_CTE, 1-based p) with
# DOC_WINNOW_SQL; span bounds convert to the engine's 0-based token
# indices. Gap-free windows (pos delta <= 3) merge via gaps-and-islands.
DUP_SPANS_SQL = f"""
WITH {_WINNOW_SHV_CTE},
hot AS (SELECT fp FROM shv GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
cov AS (SELECT doc_id, p FROM shv JOIN hot USING (fp)),
isl AS (
  SELECT doc_id, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 3
              THEN 0 ELSE 1 END AS brk
  FROM cov
),
grp AS (
  SELECT doc_id, p,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS g
  FROM isl
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(min(p) - 1 AS BIGINT) AS span_start,
       CAST(max(p) - 1 + 3 AS BIGINT) AS span_end
FROM grp GROUP BY doc_id, g
"""


# ---- incremental ingest dedup (shared mutable fp index) ----------------------
# Restates state/fp_index semantics relationally: delivery = odd docs plus a
# re-delivery of every 10th even doc under doc_id + 1,000,000; survivors are
# delivery rows whose text no even (v1) doc already carries. The engine's
# 128-bit siphash fingerprint equality stands in for text equality
# (collision odds ~2^-128).
INCREMENTAL_DEDUP_SQL = """
WITH delivery AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 2 = 0 AND doc_id % 10 = 0
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id
FROM delivery d
WHERE NOT EXISTS (
  SELECT 1 FROM documents e WHERE e.doc_id % 2 = 0 AND e.text = d.text
)
"""


# ---- quality-decile bucketing -------------------------------------------------
# Boundaries are the 9 global quantile_disc deciles of n_chars (the engine
# recomputes them with exact integer rank arithmetic in
# ops.quantiles.group_quantiles); bucket = #(boundaries <= value), so the
# assignment is free of ntile's row-order ambiguity.
QUALITY_BUCKETS_SQL = """
WITH b AS (
  SELECT unnest(list_value(
    quantile_disc(n_chars, 0.100), quantile_disc(n_chars, 0.200),
    quantile_disc(n_chars, 0.300), quantile_disc(n_chars, 0.400),
    quantile_disc(n_chars, 0.500), quantile_disc(n_chars, 0.600),
    quantile_disc(n_chars, 0.700), quantile_disc(n_chars, 0.800),
    quantile_disc(n_chars, 0.900))) AS q
  FROM documents
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
  CAST((SELECT count(*) FROM b WHERE b.q <= d.n_chars) AS BIGINT) AS bucket
FROM documents d
"""



# ---- cross-source shingle-overlap matrix --------------------------------------
# Shares the winnow shingle chain with DOC_WINNOW_SQL / DUP_SPANS_SQL.
SOURCE_OVERLAP_SQL = f"""
WITH {_WINNOW_SHV_CTE},
fps AS (
  SELECT DISTINCT s.fp, d.source FROM shv s JOIN documents d USING (doc_id)
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
GROUP BY 1, 2
"""



# ---- span cut (apply the dup_spans detection) ----------------------------------
# kept_text is the normalized token stream minus every token covered by a
# cross-document shingle; shares toks/shv with DUP_SPANS_SQL.
SPAN_CUT_SQL = f"""
WITH {_WINNOW_SHV_CTE},
hot AS (SELECT fp FROM shv GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
cov AS (SELECT doc_id, p FROM shv JOIN hot USING (fp)),
ct AS (
  SELECT DISTINCT t.doc_id, t.p
  FROM toks t JOIN cov c ON t.doc_id = c.doc_id AND t.p BETWEEN c.p AND c.p + 2
),
kept AS (
  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.p) AS kept_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM toks t LEFT JOIN ct ON ct.doc_id = t.doc_id AND ct.p = t.p
  WHERE ct.p IS NULL GROUP BY t.doc_id
),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok FROM toks GROUP BY doc_id)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       COALESCE(k.kept_text, '') AS kept_text,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(t.n_tok, 0) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_cut
FROM documents d LEFT JOIN kept k USING (doc_id) LEFT JOIN tot t USING (doc_id)
"""



# ---- vocabulary Bloom filter ---------------------------------------------------
# Same splitmix64 chain as the HLL oracles, applied to the winnow token
# hash of every distinct token; double-hashed probes (g1 + i*g2) mod M.
# Mirrors ops/sketch.bloom_vocab_bits / _bloom_positions.
from .ops.sketch import BLOOM_K, BLOOM_M  # noqa: E402

BLOOM_VOCAB_SQL = f"""
WITH toks AS (SELECT unnest({_DOC_TOKS}) AS tok FROM documents),
th AS (SELECT DISTINCT CAST({_WINNOW_TH} AS HUGEINT) AS h FROM toks),
s0 AS (SELECT (h + {SQLMIX_ADD}) % {_TWO64}::HUGEINT AS z FROM th),
s1 AS (SELECT {_xorshift('z', 30)} AS z FROM s0),
s2 AS (SELECT {_mulmod('z', SQLMIX_M1)} AS z FROM s1),
s3 AS (SELECT {_xorshift('z', 27)} AS z FROM s2),
s4 AS (SELECT {_mulmod('z', SQLMIX_M2)} AS z FROM s3),
s5 AS (SELECT {_xorshift('z', 31)} AS z FROM s4),
g AS (SELECT z % {BLOOM_M} AS g1, (z // 131072) % {BLOOM_M} AS g2 FROM s5),
b AS (
  SELECT DISTINCT CAST((g1 + i.i * g2) % {BLOOM_M} AS BIGINT) AS bit_idx
  FROM g, (SELECT unnest(range(0, {BLOOM_K})) AS i) i
)
SELECT bit_idx FROM b
"""


# ---- grouped HLL (distinct users per event_type) -------------------------------
HLL_USERS_BY_TYPE_SQL = f"""
WITH s0 AS (SELECT event_type, (CAST(user_id AS HUGEINT) + {SQLMIX_ADD})
                   % {_TWO64}::HUGEINT AS z FROM events),
s1 AS (SELECT event_type, {_xorshift('z', 30)} AS z FROM s0),
s2 AS (SELECT event_type, {_mulmod('z', SQLMIX_M1)} AS z FROM s1),
s3 AS (SELECT event_type, {_xorshift('z', 27)} AS z FROM s2),
s4 AS (SELECT event_type, {_mulmod('z', SQLMIX_M2)} AS z FROM s3),
s5 AS (SELECT event_type, {_xorshift('z', 31)} AS z FROM s4),
hm AS (SELECT event_type, CAST(z % 64 AS BIGINT) AS register,
              CAST(z // 64 AS BIGINT) AS rem FROM s5)
SELECT event_type, register,
       CAST(max(59 - CASE WHEN rem = 0 THEN 0 ELSE length(bin(rem)) END)
            AS BIGINT) AS rho_max
FROM hm GROUP BY event_type, register
"""


# ---- fuzzy-string matcher ladder (ML5 depth) --------------------------------
# Restates ops/fuzzy.py exactly: probe corruption modes keyed by event_id,
# distinct-name entity registry, and the four-tier unique-match ladder
# (exact -> tokenset -> subset -> levenshtein<=2). Reference semantics:
# /root/reference/src/fuzzy_matching.py:75-103 (ordered matching_funs,
# unique-or-fall-through, unknown residue).
FUZZY_ATTRIBUTION_SQL = """
WITH np AS (SELECT count(*) AS n FROM part),
pn AS (SELECT p_partkey, p_name, string_split(p_name, ' ') AS s FROM part),
ev AS (
  -- join keys precomputed as plain columns: equi-joining pn on the raw
  -- modulo EXPRESSIONS makes DuckDB fall back to nested-loop plans that
  -- re-evaluate the split-name CTE per row (observed: minutes vs 40 ms)
  SELECT e.event_id,
         e.event_id % np.n AS pk,
         (e.event_id % np.n + 1) % np.n AS pk5,
         (e.event_id % np.n + 7) % np.n AS pk7,
         (e.event_id % np.n + 3) % np.n AS pk3
  FROM events e CROSS JOIN np
),
probes AS (
  SELECT ev.event_id,
    CASE CAST(ev.event_id % 8 AS INT)
      WHEN 0 THEN p.p_name
      WHEN 1 THEN array_to_string(list_reverse(p.s), ' ')
      WHEN 2 THEN 'x' || substr(p.p_name, 2)
      WHEN 3 THEN p.p_name || ' deluxe'
      WHEN 5 THEN p.s[1] || ' ' || p5.p_name || ' ' || p.s[len(p.s)]
      WHEN 6 THEN array_to_string(list_reverse(p7.s), ' ') || ' ' || p.p_name
      WHEN 7 THEN p.s[len(p.s)] || ' ' || p3.p_name || ' ' || p.s[1]
      ELSE 'zz' || CAST(ev.event_id % 97 AS VARCHAR) || 'q'
    END AS probe_name
  FROM ev
  JOIN pn p  ON p.p_partkey  = ev.pk
  JOIN pn p5 ON p5.p_partkey = ev.pk5
  JOIN pn p7 ON p7.p_partkey = ev.pk7
  JOIN pn p3 ON p3.p_partkey = ev.pk3
),
reg AS (SELECT p_name AS nm, min(p_partkey) AS k FROM part GROUP BY p_name),
regs AS (SELECT nm, k, string_split(nm, ' ') AS s FROM reg),
flreg AS (
  SELECT s[1] || ' ' || s[len(s)] AS form, min(k) AS mk
  FROM regs WHERE len(s) >= 2 GROUP BY 1 HAVING count(*) = 1
),
tlreg AS (
  SELECT s[len(s) - 1] || ' ' || s[len(s)] AS form, min(k) AS mk
  FROM regs WHERE len(s) >= 2 GROUP BY 1 HAVING count(*) = 1
),
frreg AS (
  SELECT s[len(s)] || ' ' || s[1] AS form, min(k) AS mk
  FROM regs WHERE len(s) >= 2 GROUP BY 1 HAVING count(*) = 1
),
dp AS (SELECT DISTINCT probe_name AS probe FROM probes),
dp2 AS (SELECT probe, string_split(probe, ' ') AS ps FROM dp
        WHERE len(string_split(probe, ' ')) >= 2),
ex AS (
  SELECT probe, min(k) AS mk FROM dp JOIN reg ON reg.nm = dp.probe
  GROUP BY probe HAVING count(*) = 1
),
ts AS (
  SELECT probe, min(k) AS mk FROM dp JOIN reg
    ON list_sort(string_split(reg.nm, ' ')) = list_sort(string_split(dp.probe, ' '))
  GROUP BY probe HAVING count(*) = 1
),
ss AS (
  SELECT probe, min(k) AS mk FROM dp JOIN reg
    ON list_has_all(string_split(dp.probe, ' '), string_split(reg.nm, ' '))
  GROUP BY probe HAVING count(*) = 1
),
ld AS (
  SELECT dp.probe, reg.k, levenshtein(dp.probe, reg.nm) AS d
  FROM dp CROSS JOIN reg
  WHERE abs(length(dp.probe) - length(reg.nm)) <= 2
),
mdt AS (SELECT probe, min(d) AS md FROM ld GROUP BY probe),
lv AS (
  SELECT ld.probe, min(ld.k) AS mk
  FROM ld JOIN mdt ON mdt.probe = ld.probe
  WHERE ld.d = mdt.md AND mdt.md <= 2
  GROUP BY ld.probe HAVING count(*) = 1
),
fl AS (
  SELECT probe, mk FROM dp2
  JOIN flreg ON flreg.form = ps[1] || ' ' || ps[len(ps)]
),
tl AS (
  SELECT probe, mk FROM dp2
  JOIN tlreg ON tlreg.form = ps[len(ps) - 1] || ' ' || ps[len(ps)]
),
fr AS (
  SELECT probe, mk FROM dp2
  JOIN frreg ON frreg.form = ps[1] || ' ' || ps[len(ps)]
),
pick AS (
  SELECT dp.probe,
    CAST(COALESCE(ex.mk, ts.mk, ss.mk, lv.mk, fl.mk, tl.mk, fr.mk, -1)
         AS BIGINT) AS match_key,
    CASE WHEN ex.mk IS NOT NULL THEN 'exact'
         WHEN ts.mk IS NOT NULL THEN 'tokenset'
         WHEN ss.mk IS NOT NULL THEN 'subset'
         WHEN lv.mk IS NOT NULL THEN 'lev'
         WHEN fl.mk IS NOT NULL THEN 'first_last'
         WHEN tl.mk IS NOT NULL THEN 'two_last'
         WHEN fr.mk IS NOT NULL THEN 'first_last_rev'
         ELSE 'unknown' END AS match_type
  FROM dp
  LEFT JOIN ex ON ex.probe = dp.probe
  LEFT JOIN ts ON ts.probe = dp.probe
  LEFT JOIN ss ON ss.probe = dp.probe
  LEFT JOIN lv ON lv.probe = dp.probe
  LEFT JOIN fl ON fl.probe = dp.probe
  LEFT JOIN tl ON tl.probe = dp.probe
  LEFT JOIN fr ON fr.probe = dp.probe
)
SELECT p.event_id, p.probe_name, pick.match_key, pick.match_type
FROM probes p JOIN pick ON pick.probe = p.probe_name
"""

FUZZY_MATCH_REASONS_SQL = f"""
WITH att AS ({FUZZY_ATTRIBUTION_SQL})
SELECT match_type, CAST(count(*) AS BIGINT) AS n FROM att GROUP BY match_type
"""


# ---- version-diff QC sampling (ops/sampling.corpus_diff_sample) -------------
# v1/v2 snapshots restated from the same deterministic derivation; the
# engine compares 128-bit content fingerprints where the SQL compares text
# directly (equivalent barring 2^-128 collisions); the review sample is the
# identical splitmix64(doc_id*2 + DIFF_SALT) % 100 threshold per stratum.

from .ops.sampling import (  # noqa: E402
    DIFF_ADD_MOD,
    DIFF_CHG_MOD,
    DIFF_RATE_ADDED,
    DIFF_RATE_CHANGED,
    DIFF_SALT,
    DIFF_V1_SUFFIX,
)

CORPUS_DIFF_SAMPLE_SQL = f"""
WITH v1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % {DIFF_CHG_MOD} = 0
              THEN text || '{DIFF_V1_SUFFIX}' ELSE text END AS text
  FROM documents WHERE doc_id % {DIFF_ADD_MOD} <> 0
),
d0 AS (
  SELECT v2.doc_id, v2.source,
         CASE WHEN v1.doc_id IS NULL THEN 'added' ELSE 'changed' END AS status
  FROM documents v2 LEFT JOIN v1 USING (doc_id)
  WHERE v1.doc_id IS NULL OR v1.text <> v2.text
),
s0 AS (SELECT doc_id, source, status,
              (CAST(doc_id * 2 + {DIFF_SALT} AS HUGEINT) + {SQLMIX_ADD})
              % {_TWO64}::HUGEINT AS z
       FROM d0),
s1 AS (SELECT doc_id, source, status, {_xorshift('z', 30)} AS z FROM s0),
s2 AS (SELECT doc_id, source, status, {_mulmod('z', SQLMIX_M1)} AS z FROM s1),
s3 AS (SELECT doc_id, source, status, {_xorshift('z', 27)} AS z FROM s2),
s4 AS (SELECT doc_id, source, status, {_mulmod('z', SQLMIX_M2)} AS z FROM s3),
s5 AS (SELECT doc_id, source, status, {_xorshift('z', 31)} AS z FROM s4)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source, status
FROM s5
WHERE z % 100 < CASE status WHEN 'added' THEN {DIFF_RATE_ADDED}
                            ELSE {DIFF_RATE_CHANGED} END
"""


# ---- splitmix64 Bernoulli sampling / uids (ops/sampling) ---------------------
# The integer composite turn key replaces per-row md5 (VERDICT r2 #8): the
# SAME splitmix64 chain as dataset_split, over
# uid(conv_id) * 1e6 + turn_idx.

from .ops.sampling import (  # noqa: E402
    SAMPLE_RATE_PER_256,
    TURN_KEY_MULT,
)

_TURN_KEY_INT = (
    f"(CAST(substr(conv_id, 6) AS BIGINT) * {TURN_KEY_MULT} + turn_idx)"
)


def _mix_ctes(cols: str, key_expr: str, src: str) -> str:
    """s0..s5 CTE fragment: z = splitmix64(key_expr), carrying `cols`.
    s0 is MATERIALIZED: the chain's scalar expression fans out each input
    column reference ~4× per level, and inlining a derived `src` (e.g. the
    transcripts CTE) into that 4⁶-node tree OOMs the optimizer."""
    return (
        f"s0 AS MATERIALIZED (SELECT {cols}, (CAST({key_expr} AS HUGEINT) + {SQLMIX_ADD})"
        f" % {_TWO64}::HUGEINT AS z FROM {src}),\n"
        f"s1 AS (SELECT {cols}, {_xorshift('z', 30)} AS z FROM s0),\n"
        f"s2 AS (SELECT {cols}, {_mulmod('z', SQLMIX_M1)} AS z FROM s1),\n"
        f"s3 AS (SELECT {cols}, {_xorshift('z', 27)} AS z FROM s2),\n"
        f"s4 AS (SELECT {cols}, {_mulmod('z', SQLMIX_M2)} AS z FROM s3),\n"
        f"s5 AS (SELECT {cols}, {_xorshift('z', 31)} AS z FROM s4)"
    )


SAMPLE_TURNS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + ",\n"
    + _mix_ctes("conv_id, turn_idx", _TURN_KEY_INT, "transcripts")
    + f"""
SELECT conv_id, turn_idx FROM s5 WHERE z % 256 < {SAMPLE_RATE_PER_256}
"""
)

WEIGHTED_SAMPLE_SQL = (
    _with(TRANSCRIPTS_CTE)
    + ",\n"
    + _mix_ctes(
        "conv_id, turn_idx, ln",
        _TURN_KEY_INT,
        "(SELECT conv_id, turn_idx, length(text) AS ln FROM transcripts)",
    )
    + """
SELECT conv_id, turn_idx FROM s5
WHERE z % 256 < (CASE WHEN ln >= 200 THEN 64 ELSE 8 END)
"""
)

TURN_UIDS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + ",\n"
    + _mix_ctes("conv_id, turn_idx", _TURN_KEY_INT, "transcripts")
    + f"""
SELECT conv_id, turn_idx, {_sx('z')} AS uid FROM s5
"""
)


# ---- bigram Stupid-Backoff LM score (tokens.BigramScores) --------------------
# Brants et al. 2007: seen bigram -> floor(1000*ln(c12/c1)); unseen ->
# floor(1000*ln(0.4)) + smoothed unigram milli-nats of w2, the SAME
# (c+1)/(N+V) table as QF_PPL. Bigram table counted over `documents`
# adjacent token pairs, pruned at count >= BIGRAM_PRUNE — the exact mirror
# of tokens.train_bigram_counts + BigramScores.

from .sql import SIG_CTE as _SIG_CTE  # noqa: E402
from .tokens import BACKOFF_MILLINATS, BIGRAM_PRUNE  # noqa: E402

_BIGRAM_CTES = f"""
doc_freq AS (
  SELECT tok, count(*) AS c
  FROM (SELECT unnest({_DOC_TOKS}) AS tok FROM documents)
  GROUP BY tok
),
lm AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_total, CAST(count(*) AS BIGINT) AS v_size
  FROM doc_freq
),
doc_pairs AS (
  SELECT z[1] AS w1, z[2] AS w2
  FROM (SELECT unnest(list_zip(l, l[2:])) AS z
        FROM (SELECT {_DOC_TOKS} AS l FROM documents))
  WHERE z[2] IS NOT NULL
),
big AS (
  SELECT w1, w2, count(*) AS c12 FROM doc_pairs
  GROUP BY w1, w2 HAVING count(*) >= {BIGRAM_PRUNE}
),
turn_pairs AS (
  SELECT conv_id, turn_idx, z[1] AS w1, z[2] AS w2
  FROM (SELECT s.conv_id, s.turn_idx, unnest(list_zip(s.toks, s.toks[2:])) AS z
        FROM sig s)
  WHERE z[2] IS NOT NULL
),
pair_scores AS (
  SELECT tp.conv_id, tp.turn_idx,
    CASE WHEN b.c12 IS NOT NULL
      THEN CAST(floor(1000.0 * ln(b.c12 / CAST(f1.c AS DOUBLE))) AS BIGINT)
      ELSE {BACKOFF_MILLINATS}
           + CAST(floor(1000.0 * ln((COALESCE(f2.c, 0) + 1)
                                    / CAST(lm.n_total + lm.v_size AS DOUBLE))) AS BIGINT)
    END AS s
  FROM turn_pairs tp
  CROSS JOIN lm
  LEFT JOIN big b ON b.w1 = tp.w1 AND b.w2 = tp.w2
  LEFT JOIN doc_freq f1 ON f1.tok = tp.w1
  LEFT JOIN doc_freq f2 ON f2.tok = tp.w2
)"""

QF_PPL_BIGRAM_SQL = (
    _with(TRANSCRIPTS_CTE, SCRUBBED_CTE, _SIG_CTE)
    + ",\n"
    + _BIGRAM_CTES
    + """
SELECT s.conv_id, s.turn_idx,
       CAST(COALESCE(ps.total, 0) AS BIGINT) AS bigram_score
FROM sig s
LEFT JOIN (SELECT conv_id, turn_idx, sum(s) AS total
           FROM pair_scores GROUP BY conv_id, turn_idx) ps
  ON ps.conv_id = s.conv_id AND ps.turn_idx = s.turn_idx
"""
)


# ---- conversation-level quality gate (queries.q_conv_gate[_turns]) -----------
# Survive iff CONV_KEEP_DEN * n_keep >= CONV_KEEP_NUM * n_total over the
# flagship filter's per-turn keep decisions — whole-document rejection.

CONV_GATE_SQL = (
    _QF_STACK
    + f"""
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN drop_reason IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       {R.CONV_KEEP_DEN} * sum(CASE WHEN drop_reason IS NULL THEN 1 ELSE 0 END)
         >= {R.CONV_KEEP_NUM} * count(*) AS conv_keep
FROM final GROUP BY conv_id
"""
)

CONV_GATE_TURNS_SQL = (
    _QF_STACK
    + f"""
SELECT conv_id, turn_idx,
       (drop_reason IS NULL)
       AND ({R.CONV_KEEP_DEN} * sum(CASE WHEN drop_reason IS NULL THEN 1 ELSE 0 END)
              OVER (PARTITION BY conv_id)
            >= {R.CONV_KEEP_NUM} * count(*) OVER (PARTITION BY conv_id)) AS keep_final
FROM final
"""
)


# ---- Gopher-style duplicate-bigram repetition signal --------------------------
# permille of adjacent token pairs in a turn that repeat an earlier pair of
# the SAME turn: floor(1000*(total - distinct)/total), 0 when no pairs.
# Pair key w1||' '||w2 is injective (tokens are letter-runs, no spaces).

DUP_NGRAMS_SQL = (
    _with(TRANSCRIPTS_CTE, SCRUBBED_CTE, _SIG_CTE)
    + """,
turn_pairs AS (
  SELECT conv_id, turn_idx, z[1] AS w1, z[2] AS w2
  FROM (SELECT s.conv_id, s.turn_idx, unnest(list_zip(s.toks, s.toks[2:])) AS z
        FROM sig s)
  WHERE z[2] IS NOT NULL
),
pair_counts AS (
  SELECT conv_id, turn_idx,
         CAST(count(*) AS BIGINT) AS total,
         CAST(count(DISTINCT w1 || ' ' || w2) AS BIGINT) AS n_distinct
  FROM turn_pairs GROUP BY conv_id, turn_idx
)
SELECT s.conv_id, s.turn_idx,
       CAST(COALESCE(pc.total, 0) AS BIGINT) AS n_pairs,
       CASE WHEN COALESCE(pc.total, 0) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(floor(1000.0 * (pc.total - pc.n_distinct) / pc.total) AS BIGINT)
       END AS dup_permille
FROM sig s
LEFT JOIN pair_counts pc
  ON pc.conv_id = s.conv_id AND pc.turn_idx = s.turn_idx
"""
)


# ---- encoding normalization: mojibake repair + NFC ---------------------------
# Plants and repair chain are GENERATED from rules.MOJIBAKE_MAP /
# MOJI_PLANT_* / NFC_PLANT — non-ASCII and control chars are emitted as
# chr(codepoint) concatenations so the SQL text stays 7-bit clean.


def _sql_chr(s: str) -> str:
    """SQL expression for an arbitrary string: ascii runs as quoted
    literals, everything else as chr(n) — immune to encoding mangling."""
    parts, run = [], []
    for ch in s:
        if 32 <= ord(ch) < 127 and ch != "'":
            run.append(ch)
        else:
            if run:
                parts.append("'" + "".join(run) + "'")
                run = []
            parts.append(f"chr({ord(ch)})")
    if run:
        parts.append("'" + "".join(run) + "'")
    return "(" + " || ".join(parts) + ")" if parts else "''"


_MOJI_REPAIR = "p"
for _bad, _good in R.MOJIBAKE_MAP:
    _MOJI_REPAIR = f"replace({_MOJI_REPAIR}, {_sql_chr(_bad)}, {_sql_chr(_good)})"

FIX_ENCODING_SQL = f"""
WITH planted AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 3 = 0 THEN {_sql_chr(R.MOJI_PLANT_A)}
                      WHEN doc_id % 3 = 1 THEN {_sql_chr(R.MOJI_PLANT_B)}
                      ELSE '' END AS p
  FROM documents
)
SELECT doc_id,
       {_MOJI_REPAIR} AS fixed_text,
       CAST(length(p) - length(replace(p, chr(195), '')) AS BIGINT) AS n_moji
FROM planted
"""

NFC_DOCS_SQL = f"""
WITH planted AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 2 = 0 THEN {_sql_chr(R.NFC_PLANT)}
                      ELSE {_sql_chr(R.NFC_CLEAN)} END AS p
  FROM documents
)
SELECT doc_id, nfc_normalize(p) AS norm_text, p <> nfc_normalize(p) AS changed
FROM planted
"""


# ---- Gopher quality rule battery ---------------------------------------------
# Constants and plant tails come from the Ray implementation so both engines
# gate on the same thresholds (single source of truth).
from .ops.textstats import (  # noqa: E402
    GOPHER_DIGIT_EVERY,
    GOPHER_DIGIT_TAIL,
    GOPHER_MAX_SYMBOL_PERMILLE,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_PERMILLE,
    GOPHER_MIN_STOP_HITS,
    GOPHER_MIN_WORDS,
    GOPHER_SPAM_EVERY,
    GOPHER_SPAM_TAIL,
    GOPHER_WLEN_MAX_MILLI,
    GOPHER_WLEN_MIN_MILLI,
)

GOPHER_QUALITY_SQL = f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % {GOPHER_SPAM_EVERY} = 0 THEN text || '{GOPHER_SPAM_TAIL}'
              WHEN doc_id % {GOPHER_DIGIT_EVERY} = 0 THEN text || '{GOPHER_DIGIT_TAIL}'
              ELSE text END AS ptext
  FROM documents
),
w AS (
  SELECT doc_id, ptext,
         list_filter(string_split_regex(ptext, '{R.RE_WHITESPACE}'), x -> x <> '') AS ws,
         list_filter(string_split_regex(lower(ptext), '{R.RE_TOKEN_SEP}'), x -> x <> '') AS toks
  FROM p
),
sig AS (
  SELECT doc_id,
    CAST(length(ws) AS BIGINT) AS n_words,
    CAST(length(regexp_replace(ptext, '{R.RE_WHITESPACE}', '', 'g')) AS BIGINT) AS nonws,
    CAST(length(ptext) - length(replace(ptext, '#', '')) AS BIGINT)
      + CAST((length(ptext) - length(replace(ptext, '...', ''))) / 3 AS BIGINT) AS n_sym,
    CAST(length(list_filter(ws, x -> regexp_matches(x, '[a-zà-öø-ÿ]'))) AS BIGINT) AS n_alpha,
    CAST(length(list_filter(toks, x -> list_contains({_EN_LIST}, x))) AS BIGINT) AS n_stop
  FROM w
),
r AS (
  SELECT doc_id, n_words, n_stop,
    CASE WHEN n_words = 0 THEN NULL
         ELSE CAST(floor(1000.0 * nonws / n_words) AS BIGINT) END AS mean_wlen_milli,
    CASE WHEN n_words = 0 THEN NULL
         ELSE CAST(floor(1000.0 * n_sym / n_words) AS BIGINT) END AS symbol_permille,
    CASE WHEN n_words = 0 THEN NULL
         ELSE CAST(floor(1000.0 * n_alpha / n_words) AS BIGINT) END AS alpha_permille
  FROM sig
)
SELECT doc_id, n_words, mean_wlen_milli, symbol_permille, alpha_permille, n_stop,
  COALESCE(
    n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
    AND mean_wlen_milli >= {GOPHER_WLEN_MIN_MILLI}
    AND mean_wlen_milli <= {GOPHER_WLEN_MAX_MILLI}
    AND symbol_permille < {GOPHER_MAX_SYMBOL_PERMILLE}
    AND alpha_permille >= {GOPHER_MIN_ALPHA_PERMILLE}
    AND n_stop >= {GOPHER_MIN_STOP_HITS}, FALSE) AS keep
FROM r
"""


# ---- corpus-level exact line dedup -------------------------------------------
from .ops.dedup import LINE_FOOTERS, LINE_HEADERS, LINE_TOKENS  # noqa: E402


def _sql_choice(expr: str, options) -> str:
    cases = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(options)
    )
    return f"CASE {expr} {cases} END"


LINE_DEDUP_SQL = f"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '{R.RE_WHITESPACE}'), x -> x <> '') AS ws
  FROM documents
),
counts AS (
  SELECT doc_id,
         CAST(2 + (length(ws) + {LINE_TOKENS - 1}) // {LINE_TOKENS} AS BIGINT) AS n_lines,
         CAST((length(ws) + {LINE_TOKENS - 1}) // {LINE_TOKENS} AS BIGINT) AS nbody
  FROM tk
),
body AS (
  SELECT doc_id,
         CAST(1 + (i - 1) // {LINE_TOKENS} AS BIGINT) AS line_idx,
         string_agg(tok, ' ' ORDER BY i) AS line
  FROM (
    SELECT doc_id, unnest(ws) AS tok,
           unnest(range(1, length(ws) + 1)) AS i
    FROM tk
  )
  GROUP BY doc_id, 2
),
lines AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS line_idx,
         {_sql_choice(f"doc_id % {len(LINE_HEADERS)}", LINE_HEADERS)} AS line
  FROM documents
  UNION ALL
  SELECT doc_id, line_idx, line FROM body
  UNION ALL
  SELECT c.doc_id, c.nbody + 1 AS line_idx,
         {_sql_choice(f"c.doc_id % {len(LINE_FOOTERS)}", LINE_FOOTERS)} AS line
  FROM counts c
),
win AS (
  SELECT doc_id, line_idx, line
  FROM lines
  QUALIFY row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) = 1
)
SELECT w.doc_id, c.n_lines, CAST(count(*) AS BIGINT) AS n_kept,
       string_agg(w.line, chr(10) ORDER BY w.line_idx) AS text_dedup
FROM win w JOIN counts c USING (doc_id)
GROUP BY w.doc_id, c.n_lines
"""


# ---- product quantization (integer-grid PQ + ADC) ------------------------------
from .ops.similarity import (  # noqa: E402
    PQ_K,
    PQ_QUANT,
    PQ_SUBDIM,
    PQ_SUBS,
)

# Shared PQ pipeline: quantized vectors, pinned codebooks (vec_id < PQ_K),
# per-(vector, subspace, centroid) integer squared distances, and the
# resulting codes. Everything integral, so argmin/rank can never diverge
# between engines on float rounding.
_PQ_BASE_CTE = f"""qv AS (
  SELECT vec_id,
         list_transform(embedding, v -> CAST(floor({PQ_QUANT} * CAST(v AS DOUBLE)) AS BIGINT)) AS q
  FROM embeddings
),
cb AS (SELECT vec_id AS cid, q AS cq FROM qv WHERE vec_id < {PQ_K}),
subs AS (SELECT unnest(range(0, {PQ_SUBS})) AS sub),
d AS (
  SELECT v.vec_id, s.sub, c.cid,
         list_sum(list_transform(range(1, {PQ_SUBDIM + 1}),
           i -> (v.q[s.sub * {PQ_SUBDIM} + i] - c.cq[s.sub * {PQ_SUBDIM} + i])
              * (v.q[s.sub * {PQ_SUBDIM} + i] - c.cq[s.sub * {PQ_SUBDIM} + i]))) AS dist
  FROM qv v, subs s, cb c
),
codes AS (
  SELECT vec_id, sub, cid AS code
  FROM d QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) = 1
)"""

PQ_CODES_SQL = f"""
WITH {_PQ_BASE_CTE}
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(sub AS BIGINT) AS sub,
       CAST(code AS BIGINT) AS code
FROM codes
"""

ANN_PQ_SQL = f"""
WITH {_PQ_BASE_CTE},
dt AS (
  SELECT vec_id AS query_id, sub, cid, dist FROM d WHERE vec_id < 10
),
adc AS (
  SELECT dt.query_id, x.vec_id AS neighbor_id, CAST(sum(dt.dist) AS BIGINT) AS dist
  FROM codes x
  JOIN dt ON dt.sub = x.sub AND dt.cid = x.code
  WHERE x.vec_id <> dt.query_id
  GROUP BY 1, 2
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS BIGINT) AS rank,
       CAST(neighbor_id AS BIGINT) AS neighbor_id
FROM adc QUALIFY rank <= 5
"""


# ---- skew-salted join exhibit --------------------------------------------------
# The salted plan is row-identical to the plain join, so the oracle is the
# logical join itself — what's being proven is that salting (probe-side
# sub-keys + salt-times build replication for the hot key set) changes the
# PHYSICAL distribution only.
EVENTS_USER_JOIN_SALTED_SQL = """
SELECT CAST(e.event_id AS BIGINT) AS event_id,
       CAST(e.user_id AS BIGINT) AS user_id,
       c.c_mktsegment
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""


# ---- ROLLUP aggregation --------------------------------------------------------
CORPUS_ROLLUP_SQL = """
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY ROLLUP(source, lang)
"""


# ---- HTML text extraction ------------------------------------------------------
from .ops.textstats import HTML_ENTITIES, RE_SCRIPT_BLOCK, RE_TAG  # noqa: E402

_HTML_ENTITY_CHAIN = "c"
for _ent, _ch in HTML_ENTITIES:
    _rep = _ch.replace("'", "''")
    _HTML_ENTITY_CHAIN = (
        f"replace({_HTML_ENTITY_CHAIN}, '{_ent}', '{_rep}')"
    )

HTML_STRIP_SQL = f"""
WITH p AS (
  SELECT doc_id,
    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR)
    || '</title><script type="text/javascript">var x = ' || CAST(doc_id AS VARCHAR)
    || ';</script></head><body><div class="main"><p>' || text
    || '</p></div><br/><footer>&amp; copyright &lt;2026&gt;</footer></body></html>'
    AS h
  FROM documents
),
s AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(h, '{RE_SCRIPT_BLOCK}', ' ', 'g'),
                        '{RE_TAG}', ' ', 'g') AS c,
         CAST(length(regexp_extract_all(h, '{RE_TAG}')) AS BIGINT) AS n_tags
  FROM p
)
SELECT doc_id,
       trim(regexp_replace({_HTML_ENTITY_CHAIN}, '{R.RE_WHITESPACE}', ' ', 'g'), ' ') AS clean_text,
       n_tags
FROM s
"""


# ---- fixed-length training-sequence packing -------------------------------------
from .ops.sampling import SEQ_BUCKETS, SEQ_LEN  # noqa: E402

SEQ_PACK_SQL = f"""
WITH tt AS (
  SELECT doc_id, len({_DOC_TOKS}) AS n_tok, doc_id % {SEQ_BUCKETS} AS bucket
  FROM documents
),
o AS (
  SELECT doc_id, n_tok, bucket,
         sum(n_tok + 1) OVER (
           PARTITION BY bucket
           ORDER BY ((doc_id % {MIX_HASH_M}) * {MIX_HASH_MULT}
                     + {MIX_HASH_ADD}) % {MIX_HASH_M}, doc_id
         ) - (n_tok + 1) AS g
  FROM tt
),
seg AS (
  SELECT bucket, doc_id, n_tok, g,
         unnest(range(CAST(g // {SEQ_LEN} AS BIGINT),
                      CAST((g + n_tok - 1) // {SEQ_LEN} + 1 AS BIGINT))) AS s
  FROM o WHERE n_tok > 0
)
SELECT CAST(s * {SEQ_BUCKETS} + bucket AS BIGINT) AS seq_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(greatest(g, s * {SEQ_LEN}) - g AS BIGINT) AS doc_start,
       CAST(least(g + n_tok, (s + 1) * {SEQ_LEN}) - g AS BIGINT) AS doc_end,
       CAST(greatest(g, s * {SEQ_LEN}) - s * {SEQ_LEN} AS BIGINT) AS seq_off
FROM seg
"""


# ---- TF-IDF top terms per document ---------------------------------------------
from .ops.retrieval import TFIDF_SCALE, TFIDF_TOP_K  # noqa: E402

TFIDF_TERMS_SQL = f"""
WITH toks AS (SELECT doc_id, unnest({_DOC_TOKS}) AS tok FROM documents),
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
sc AS (
  SELECT tf.doc_id, tf.tok,
         tf.tf * CAST(floor({TFIDF_SCALE} * 1.0 * nd.n / df.df) AS BIGINT)
           AS score_micro,
         tf.tf
  FROM tf JOIN df USING (tok) CROSS JOIN nd
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, tok,
       CAST(tf AS BIGINT) AS tf, score_micro,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY score_micro DESC, tok
       ) AS BIGINT) AS rank
FROM sc QUALIFY rank <= {TFIDF_TOP_K}
"""


# ---- PageRank over the planted citation graph -----------------------------------
from .ops.graph import (  # noqa: E402
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_EDGE_MULS,
    PR_INIT,
    PR_ITERS,
    PR_OUT_DEG,
    PR_TELEPORT,
)


def _pagerank_sql(iters: int = PR_ITERS) -> str:
    edges = " UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id * {a} + {b}) % n.n AS dst "
        "FROM documents, n"
        for a, b in PR_EDGE_MULS
    )
    ctes = [
        f"n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)",
        f"e AS ({edges})",
        f"r0 AS (SELECT doc_id, CAST({PR_INIT} AS BIGINT) AS r FROM documents)",
    ]
    for k in range(1, iters + 1):
        ctes.append(f"""r{k} AS (
  SELECT d.doc_id,
         CAST({PR_TELEPORT} + ({PR_DAMP_NUM} * COALESCE(s.c, 0)) // {PR_DAMP_DEN}
              AS BIGINT) AS r
  FROM documents d LEFT JOIN (
    SELECT e.dst AS doc_id, CAST(sum(r.r // {PR_OUT_DEG}) AS BIGINT) AS c
    FROM e JOIN r{k - 1} r ON r.doc_id = e.src GROUP BY e.dst
  ) s USING (doc_id)
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(doc_id AS BIGINT) AS doc_id, r AS rank_micro FROM r{iters}"
    )


PAGERANK_SQL = _pagerank_sql()


# ---- pairwise source total-variation divergence ---------------------------------
from .ops.retrieval import DSIR_BUCKETS  # noqa: E402

SOURCE_DIVERGENCE_SQL = f"""
WITH toks AS (
  SELECT source, unnest({_DOC_TOKS}) AS tok FROM documents
),
bt AS (SELECT source, CAST(({_WINNOW_TH}) % {DSIR_BUCKETS} AS BIGINT) AS b FROM toks),
cnt AS (SELECT source, b, CAST(count(*) AS HUGEINT) AS n FROM bt GROUP BY 1, 2),
tot AS (SELECT source, CAST(sum(n) AS HUGEINT) AS N FROM cnt GROUP BY source),
grid AS (
  SELECT ta.source AS sa, tb.source AS sb, ta.N AS na_tot, tb.N AS nb_tot, g.b
  FROM tot ta, tot tb,
       (SELECT unnest(range(0, {DSIR_BUCKETS})) AS b) g
  WHERE ta.source < tb.source
),
diff AS (
  SELECT g.sa, g.sb, g.na_tot, g.nb_tot,
         abs(COALESCE(ca.n, 0) * g.nb_tot - COALESCE(cb.n, 0) * g.na_tot) AS d
  FROM grid g
  LEFT JOIN cnt ca ON ca.source = g.sa AND ca.b = g.b
  LEFT JOIN cnt cb ON cb.source = g.sb AND cb.b = g.b
)
SELECT sa AS src_a, sb AS src_b,
       CAST(1000000::HUGEINT * sum(d) // (2 * na_tot * nb_tot) AS BIGINT) AS tv_micro
FROM diff GROUP BY sa, sb, na_tot, nb_tot
"""


# ---- cluster topic terms ---------------------------------------------------------
from .ops.retrieval import CLUSTER_TOP_K  # noqa: E402

CLUSTER_TOPICS_SQL = f"""
WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT e.vec_id, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid
         ) AS rn
  FROM embeddings e, c
),
assign AS (SELECT vec_id, cid AS cluster FROM s WHERE rn = 1),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_DOC_TOKS}) AS tok FROM documents)
  GROUP BY 1, 2
),
cnt AS (
  SELECT a.cluster, tf.tok, CAST(sum(tf.tf) AS BIGINT) AS n
  FROM tf JOIN assign a ON a.vec_id = tf.doc_id
  GROUP BY 1, 2
)
SELECT CAST(cluster AS BIGINT) AS cluster, tok, n,
       CAST(row_number() OVER (
         PARTITION BY cluster ORDER BY n DESC, tok
       ) AS BIGINT) AS rank
FROM cnt QUALIFY rank <= {CLUSTER_TOP_K}
"""


# ---- inverted index + phrase search -----------------------------------------
from .ops.retrieval import PHRASE  # noqa: E402

INVERTED_INDEX_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest({_DOC_TOKS}) AS tok FROM documents)
)
SELECT tok, CAST(count(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY tok
"""

def _inverted_index_seg_sql() -> str:
    from .ops.retrieval import INDEX_SEG_RANGE

    return f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest({_DOC_TOKS}) AS tok FROM documents)
)
SELECT tok,
       CAST(doc_id // {INDEX_SEG_RANGE} AS BIGINT) AS seg_idx,
       CAST(count(*) AS BIGINT) AS df_seg,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         AS postings_chunk
FROM pairs GROUP BY tok, doc_id // {INDEX_SEG_RANGE}
"""


INVERTED_INDEX_SEG_SQL = _inverted_index_seg_sql()

_PHRASE_CONDS = " AND ".join(
    f"list_extract(l, p.pos + {j} + 1) = '{w}'" for j, w in enumerate(PHRASE)
)
PHRASE_SEARCH_SQL = f"""
WITH d AS (SELECT doc_id, {_DOC_TOKS} AS l FROM documents)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, CAST(p.pos AS BIGINT) AS pos
FROM d, LATERAL (
  SELECT unnest(range(len(l) - {len(PHRASE) - 1})) AS pos
) p
WHERE {_PHRASE_CONDS}
"""


# ---- blocked similarity self-join -------------------------------------------
from .ops.fuzzy import FUZZY_TITLE_MAX_DIST, FUZZY_TITLE_TOKENS  # noqa: E402

# strlen() = BYTE length, matching the engine's lossless byte-length filter
# (DuckDB levenshtein is byte-level, as is the engine's uint8 DP kernel).
FUZZY_TITLE_PAIRS_SQL = f"""
WITH k AS (
  SELECT doc_id,
         array_to_string(list_slice({_DOC_TOKS}, 1, {FUZZY_TITLE_TOKENS}), ' ') AS key,
         list_extract({_DOC_TOKS}, 1) AS block
  FROM documents
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_a, CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
FROM k a JOIN k b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE abs(strlen(a.key) - strlen(b.key)) <= {FUZZY_TITLE_MAX_DIST}
  AND levenshtein(a.key, b.key) <= {FUZZY_TITLE_MAX_DIST}
"""


# ---- PMI collocations --------------------------------------------------------
from .ops.textstats import PMI_MIN_COUNT, PMI_TOP_K  # noqa: E402

PMI_BIGRAMS_SQL = f"""
WITH d AS (SELECT doc_id, {_DOC_TOKS} AS l FROM documents),
t AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM d),
b AS (
  SELECT a.tok AS t1, c.tok AS t2, CAST(count(*) AS BIGINT) AS n_ab
  FROM t a JOIN t c ON c.doc_id = a.doc_id AND c.pos = a.pos + 1
  GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_COUNT}
),
u AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
tot AS (SELECT CAST(sum(n) AS HUGEINT) AS nn FROM u),
lift AS (
  SELECT b.t1, b.t2, b.n_ab,
         CAST(1000000::HUGEINT * tot.nn * b.n_ab // (ua.n * ub.n) AS BIGINT)
           AS lift_micro
  FROM b JOIN u ua ON ua.tok = b.t1 JOIN u ub ON ub.tok = b.t2 CROSS JOIN tot
)
SELECT t1, t2, n_ab, lift_micro,
       CAST(row_number() OVER (ORDER BY lift_micro DESC, t1, t2) AS BIGINT)
         AS rank
FROM lift QUALIFY rank <= {PMI_TOP_K}
"""


# ---- MAD robust outliers ------------------------------------------------------
from .ops.quantiles import MAD_K  # noqa: E402

LEN_OUTLIERS_SQL = f"""
WITH med AS (
  SELECT source, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med
  FROM documents GROUP BY source
),
dev AS (
  SELECT d.doc_id, d.source, d.n_chars, m.med,
         abs(d.n_chars - m.med) AS ad
  FROM documents d JOIN med m USING (source)
),
mad AS (
  SELECT source, CAST(quantile_disc(ad, 0.5) AS BIGINT) AS mad
  FROM dev GROUP BY source
)
SELECT CAST(dev.doc_id AS BIGINT) AS doc_id, dev.source,
       CAST(dev.n_chars AS BIGINT) AS n_chars,
       dev.med, mad.mad
FROM dev JOIN mad USING (source)
WHERE dev.ad > {MAD_K} * mad.mad
"""


CORPUS_CUBE_SQL = """
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY CUBE(source, lang)
"""


LEN_RANKS_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS dense_rnk
FROM documents
WINDOW w AS (PARTITION BY source ORDER BY n_chars)
"""


# ---- triangle counting ---------------------------------------------------------
TRIANGLE_COUNTS_SQL = """
WITH n AS (SELECT count(*) AS n FROM documents),
raw AS (
  SELECT doc_id AS i, (10 * doc_id + 1) % n.n AS d FROM documents, n
  UNION ALL
  SELECT doc_id AS i, (13 * doc_id + 2) % n.n AS d FROM documents, n
),
e AS (
  SELECT DISTINCT least(i, d) AS a, greatest(i, d) AS b
  FROM raw WHERE i <> d
),
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
),
x AS (
  SELECT a AS v FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT CAST(v AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_tri
FROM x GROUP BY v
"""


# ---- ordered funnel -------------------------------------------------------------
EVENT_FUNNEL_SQL = """
WITH u AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'click' GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT CAST(u.user_id AS BIGINT) AS user_id,
       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 WHEN s1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS reached
FROM u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
"""


HOPPING_DISTINCT_USERS_SQL = """
WITH h AS (
  SELECT user_id, time_bucket(INTERVAL 5 MINUTE, ts) AS b FROM events
),
x AS (
  SELECT user_id, b AS win_start FROM h
  UNION ALL
  SELECT user_id, b - INTERVAL 5 MINUTE AS win_start FROM h
)
SELECT win_start, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM x GROUP BY win_start
"""


JSON_PROPS_SQL = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


GLOBAL_LEN_ORDER_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rn
FROM documents
"""

VALUE_DELTAS_SQL = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id, ts,
       CAST(v - lag(v) OVER w AS DOUBLE) AS delta_micro
FROM (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 1000000.0) AS BIGINT) AS v
  FROM events
)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


LINEITEM_BLOOM_SEMI_SQL = """
SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey, l.l_extendedprice
FROM lineitem l
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_orderkey = l.l_orderkey
    AND o.o_orderdate >= DATE '1995-01-01'
    AND o.o_orderdate < DATE '1995-03-01'
)
"""


Q5_LOCAL_SUPPLY_SQL = """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE s.s_nationkey = c.c_nationkey
  AND r.r_name = 'AFRICA'
  AND o.o_orderdate >= DATE '1995-01-01'
  AND o.o_orderdate < DATE '1996-01-01'
GROUP BY 1
"""


FOOTER_STATS_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(doc_id) AS BIGINT) AS min_key,
       CAST(max(doc_id) AS BIGINT) AS max_key
FROM documents
"""


# ---- MMR diverse retrieval -----------------------------------------------------
from .ops.similarity import MMR_CANDIDATES, MMR_K  # noqa: E402

_MMR_DOT = ("CAST(list_sum(list_transform(range(1, 65), "
            "i -> {a}.q[i] * {b}.q[i])) AS BIGINT)")


def _mmr_sql() -> str:
    """Unrolled k-step greedy MMR as a CTE chain (the PageRank trick for a
    greedy algorithm): every argmax is a row_number()=1 pick with the
    engine's exact tie rule (score desc, vec_id asc)."""
    parts = [f"""g AS (
  SELECT vec_id,
         list_transform(embedding,
           v -> CAST(floor(1024 * CAST(v AS DOUBLE)) AS BIGINT)) AS q
  FROM embeddings
),
qv AS (SELECT q FROM g WHERE vec_id = 0),
relv AS (
  SELECT g.vec_id, {_MMR_DOT.format(a='g', b='qv')} AS rel
  FROM g, qv WHERE g.vec_id <> 0
),
cand AS (
  SELECT vec_id, rel FROM relv
  QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id) <= {MMR_CANDIDATES}
),
pair AS (
  SELECT a.vec_id AS pa, b.vec_id AS pb,
         {_MMR_DOT.format(a='ga', b='gb')} AS sim
  FROM cand a JOIN g ga ON ga.vec_id = a.vec_id
  JOIN cand b ON b.vec_id <> a.vec_id JOIN g gb ON gb.vec_id = b.vec_id
),
sel1 AS (
  SELECT vec_id, rel, CAST(2 * rel AS BIGINT) AS score FROM cand
  QUALIFY row_number() OVER (ORDER BY 2 * rel DESC, vec_id) = 1
),
chosen1 AS (SELECT vec_id FROM sel1)"""]
    for i in range(2, MMR_K + 1):
        parts.append(f"""sc{i} AS (
  SELECT c.vec_id, c.rel, CAST(2 * c.rel - max(p.sim) AS BIGINT) AS score
  FROM cand c JOIN pair p ON p.pa = c.vec_id
  WHERE p.pb IN (SELECT vec_id FROM chosen{i - 1})
    AND c.vec_id NOT IN (SELECT vec_id FROM chosen{i - 1})
  GROUP BY 1, 2
),
sel{i} AS (
  SELECT vec_id, rel, score FROM sc{i}
  QUALIFY row_number() OVER (ORDER BY score DESC, vec_id) = 1
),
chosen{i} AS (SELECT vec_id FROM chosen{i - 1}
              UNION ALL SELECT vec_id FROM sel{i})""")
    union = "\nUNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, CAST(vec_id AS BIGINT) AS vec_id,"
        f" rel, score FROM sel{i}"
        for i in range(1, MMR_K + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union


MMR_SELECT_SQL = _mmr_sql()


WINDOW_ANOMALIES_SQL = """
WITH h AS (SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS b FROM events),
x AS (
  SELECT b AS win_start FROM h
  UNION ALL
  SELECT b - INTERVAL 5 MINUTE FROM h
),
cnt AS (SELECT win_start, CAST(count(*) AS BIGINT) AS n FROM x GROUP BY 1),
med AS (SELECT CAST(quantile_disc(n, 0.5) AS BIGINT) AS med FROM cnt),
mad AS (
  SELECT CAST(quantile_disc(abs(n - med), 0.5) AS BIGINT) AS mad
  FROM cnt, med
)
SELECT win_start, n, med, mad
FROM cnt, med, mad WHERE abs(n - med) > 3 * mad
"""


# ---- exact-total proportional quota sample -----------------------------------
from .ops.sampling import QUOTA_TOTAL  # noqa: E402

QUOTA_SAMPLE_SQL = (
    "WITH "
    + _mix_ctes("doc_id, source", "doc_id", "documents")
    + f""",
n AS (SELECT source, CAST(count(*) AS BIGINT) AS ns FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(ns) AS BIGINT) AS nn FROM n),
q AS (
  SELECT source, ({QUOTA_TOTAL} * ns) // tot.nn AS base,
         ({QUOTA_TOTAL} * ns) % tot.nn AS rem
  FROM n, tot
),
bs AS (SELECT CAST(sum(base) AS BIGINT) AS sb FROM q),
give AS (
  SELECT source,
         base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                      <= {QUOTA_TOTAL} - bs.sb THEN 1 ELSE 0 END AS quota
  FROM q, bs
),
pick AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY z, doc_id) AS rn
  FROM s5
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source
FROM pick JOIN give USING (source) WHERE rn <= quota
"""
)


DEDUP_KEEP_BEST_SQL = f"""
WITH RECURSIVE {_JACCARD_EDGES_CTE},
labels AS (SELECT node, min(r) AS root FROM reach GROUP BY node),
best AS (
  SELECT l.root, d.doc_id
  FROM labels l JOIN documents d ON d.doc_id = l.node
  QUALIFY row_number() OVER (
    PARTITION BY l.root ORDER BY d.n_chars DESC, d.doc_id
  ) = 1
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id
FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM labels)
   OR d.doc_id IN (SELECT doc_id FROM best)
"""


# The upsert merge must reconstruct v2 exactly — the oracle is the table.
CORPUS_UPSERT_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
"""


CONV_RENDER_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
SELECT conv_id,
       string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx) AS rendered
FROM transcripts GROUP BY conv_id
"""
)


# ---- windowed skip-gram co-occurrence ------------------------------------------
from .ops.textstats import SKIPGRAM_TOP_K, SKIPGRAM_WINDOW  # noqa: E402

SKIPGRAM_PAIRS_SQL = f"""
WITH d AS (SELECT doc_id, {_DOC_TOKS} AS l FROM documents),
t AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM d),
p AS (
  SELECT a.tok AS t1, b.tok AS t2, CAST(count(*) AS BIGINT) AS n
  FROM t a JOIN t b
    ON b.doc_id = a.doc_id
   AND b.pos - a.pos BETWEEN 1 AND {SKIPGRAM_WINDOW}
  GROUP BY 1, 2
)
SELECT t1, t2, n,
       CAST(row_number() OVER (ORDER BY n DESC, t1, t2) AS BIGINT) AS rank
FROM p QUALIFY rank <= {SKIPGRAM_TOP_K}
"""


# ---- normal-equation sufficient statistics --------------------------------------
def _gram_sql() -> str:
    cols = {0: "x0", 1: "x1", 2: "x2", 3: "y"}
    terms = []
    for i in range(3):
        for j in list(range(i, 3)) + [3]:
            terms.append(
                f"SELECT CAST({i} AS BIGINT) AS i, CAST({j} AS BIGINT) AS j, "
                f"CAST(sum({cols[i]} * {cols[j]}) AS BIGINT) AS v FROM f"
            )
    body = "\nUNION ALL ".join(terms)
    return f"""
WITH f AS (
  SELECT CAST(length(text) AS BIGINT) AS x0,
         CAST(len({_DOC_TOKS}) AS BIGINT) AS x1,
         CAST(1 AS BIGINT) AS x2,
         CAST(len(list_distinct({_DOC_TOKS})) AS BIGINT) AS y
  FROM documents
)
{body}
"""


GRAM_MATRIX_SQL = _gram_sql()


# ---- recency-decayed aggregate ---------------------------------------------------
from .ops.temporal import DECAY_REF_DATE  # noqa: E402

DECAYED_USER_VALUE_SQL = f"""
WITH d AS (
  SELECT user_id,
         CAST(floor(value * 1000000.0) AS BIGINT)
           // (CAST(1 AS BIGINT) << least(greatest(
                datediff('day', CAST(ts AS DATE), DATE '{DECAY_REF_DATE}'),
                0), 62)) AS dv
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(sum(dv) AS BIGINT) AS decayed_micro,
       CAST(count(*) AS BIGINT) AS n_events
FROM d GROUP BY user_id
"""


DENSE_EVENT_GRID_SQL = """
WITH types AS (SELECT DISTINCT event_type FROM events),
days AS (SELECT unnest(range(1, 32)) AS day),
cnt AS (
  SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT t.event_type, CAST(d.day AS BIGINT) AS day,
       CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n
FROM types t CROSS JOIN days d
LEFT JOIN cnt ON cnt.event_type = t.event_type AND cnt.day = d.day
"""


# ---- overlapping token-window chunking (ops/sampling.chunk_docs) -------------
# Same _DOC_TOKS tokenization; window starts at every CHUNK_STRIDE tokens
# while < n, end clamped to min(start + CHUNK_LEN, n); list slice is the
# 1-based inclusive DuckDB form of the engine's [start:end) numpy slice.

from .ops.sampling import CHUNK_LEN, CHUNK_STRIDE  # noqa: E402

CHUNK_DOCS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_DOC_TOKS} AS t FROM documents
),
nn AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
starts AS (
  SELECT doc_id, t, n,
         CAST(unnest(range(0, n, {CHUNK_STRIDE})) AS BIGINT) AS s
  FROM nn
)
SELECT doc_id,
       CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       s AS tok_start,
       CAST(least(s + {CHUNK_LEN}, n) AS BIGINT) AS tok_end,
       array_to_string(
         t[CAST(s + 1 AS BIGINT):CAST(least(s + {CHUNK_LEN}, n) AS BIGINT)],
         ' '
       ) AS chunk_text
FROM starts
"""


# ---- per-domain document cap (ops/sampling.domain_cap) ------------------------
# Survivors = the cap smallest (splitmix64(doc_id), doc_id) per source —
# the identical chain as the Bernoulli samplers, ranked instead of
# thresholded.

from .ops.sampling import DOMAIN_CAP  # noqa: E402

DOMAIN_CAP_SQL = (
    "WITH "
    + _mix_ctes("doc_id, source", "doc_id", "documents")
    + f""",
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY z, doc_id) AS rn
  FROM s5
)
SELECT doc_id, source FROM ranked WHERE rn <= {DOMAIN_CAP}
"""
)


# ---- type-token ratio per source (ops/textstats.ttr_by_source) ---------------

TTR_BY_SOURCE_SQL = f"""
WITH tt AS (
  SELECT source, unnest({_DOC_TOKS}) AS tok FROM documents
),
agg AS (SELECT source, tok, count(*) AS n FROM tt GROUP BY 1, 2)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST((1000 * count(*)) // sum(n) AS BIGINT) AS ttr_permille
FROM agg GROUP BY source
"""


# ---- Lloyd's update step (ops/retrieval.kmeans_update) ------------------------
# Assignment CTE identical to KMEANS_ASSIGN_SQL; the update statistic is
# the per-(cluster, dim) sum of floor(embedding * 1024) — the same exact
# power-of-two grid as the PQ oracles — plus the member count.

from .ops.retrieval import KMEANS_N_SEEDS  # noqa: E402
from .ops.similarity import PQ_QUANT  # noqa: E402

KMEANS_UPDATE_SQL = f"""
WITH c AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings
  WHERE vec_id < {KMEANS_N_SEEDS}
),
s AS (
  SELECT e.vec_id, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid
         ) AS rn
  FROM embeddings e, c
),
a AS (SELECT vec_id, cid AS cluster FROM s WHERE rn = 1),
ex AS (
  SELECT a.cluster,
         generate_subscripts(e.embedding, 1) - 1 AS dim,
         unnest(e.embedding) AS v
  FROM embeddings e JOIN a ON a.vec_id = e.vec_id
)
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(dim AS BIGINT) AS dim,
       CAST(sum(CAST(floor(CAST(v AS DOUBLE) * {PQ_QUANT}) AS BIGINT)) AS BIGINT) AS sum_q,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM ex GROUP BY 1, 2
"""


# ---- whole-conversation exact dedup (ops/dedup.conv_dedup) --------------------

from .ops.dedup import CONV_DUP_MOD  # noqa: E402

CONV_DEDUP_SQL = (
    _with(TRANSCRIPTS_CTE)
    + f"""
, planted AS (
  SELECT conv_id, turn_idx, role, text FROM transcripts
  UNION ALL
  SELECT conv_id || '-dup', turn_idx, role, text FROM transcripts
  WHERE CAST(substr(conv_id, 6) AS BIGINT) % {CONV_DUP_MOD} = 0
),
fp AS (
  SELECT conv_id,
         md5(string_agg(role || '|' || text, chr(31) ORDER BY turn_idx)) AS f
  FROM planted GROUP BY conv_id
)
SELECT f AS fp, min(conv_id) AS conv_id, CAST(count(*) AS BIGINT) AS n_dupes
FROM fp GROUP BY f
"""
)


# ---- hard-negative mining (ops/similarity.hard_negatives) ---------------------

from .ops.similarity import NEG_K, NEG_SKIP  # noqa: E402

HARD_NEGATIVES_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q, embeddings e WHERE e.vec_id <> q.query_id
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS neighbor_id
FROM s QUALIFY rank BETWEEN {NEG_SKIP + 1} AND {NEG_K}
"""


# ---- URL canonicalization + first-wins dedup (ops/textstats.url_canon) --------

from .ops.textstats import URL_SITES, URL_VARIANTS  # noqa: E402

URL_CANON_SQL = rf"""
WITH planted AS (
  SELECT doc_id,
    CASE CAST(doc_id % {URL_VARIANTS} AS INTEGER)
      WHEN 0 THEN 'https://Site' || s || '.Example.com/path/' || s || '/page'
      WHEN 1 THEN 'https://site' || s || '.example.com/path/' || s || '/page/'
      WHEN 2 THEN 'https://site' || s || '.example.com/path/' || s
                  || '/page?utm_source=feed&ref=rss'
      WHEN 3 THEN 'https://SITE' || s || '.EXAMPLE.com/path/' || s || '/page#frag'
    END AS url
  FROM (SELECT doc_id, CAST(doc_id % {URL_SITES} AS VARCHAR) AS s FROM documents)
),
canon AS (
  SELECT doc_id, url,
         lower(regexp_replace(regexp_replace(regexp_replace(
           url, '#.*$', ''), '\?.*$', ''), '/+$', '')) AS canon_url
  FROM planted
)
SELECT doc_id, url, canon_url,
       doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS keep
FROM canon
"""


# ---- embedding-space outlier pruning (ops/similarity.emb_outliers) ------------

from .ops.similarity import OUTLIER_CENTI  # noqa: E402

EMB_OUTLIERS_SQL = f"""
WITH c AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings
  WHERE vec_id < {KMEANS_N_SEEDS}
),
s AS (
  SELECT e.vec_id, c.cid, list_cosine_similarity(e.embedding, c.ce) AS sim,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid
         ) AS rn
  FROM embeddings e, c
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(cid AS BIGINT) AS cluster,
       CAST(floor(100 * sim) AS BIGINT) AS sim_centi
FROM s WHERE rn = 1 AND floor(100 * sim) < {OUTLIER_CENTI}
"""


# ---- one-pass conditional-aggregation pivot (ops/relational.user_type_matrix) -

from .ops.relational import EVENT_TYPES  # noqa: E402

USER_TYPE_MATRIX_SQL = (
    "SELECT CAST(user_id AS BIGINT) AS user_id,\n"
    + ",\n".join(
        f"  CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    + ",\n  CAST(count(*) AS BIGINT) AS n_total\nFROM events GROUP BY user_id"
)


# ---- power-of-two length histogram (ops/quantiles.len_log2_hist) --------------
# bucket = floor(log2(n_chars)) with no libm on either side: binary-digit
# count minus one here, searchsorted on the 2^k table in the engine.

LEN_LOG2_HIST_SQL = """
WITH b AS (
  SELECT length(printf('%b', n_chars)) - 1 AS bucket FROM documents
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST((CAST(1 AS BIGINT) << bucket) AS BIGINT) AS lo,
       CAST((CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS BIGINT) AS hi,
       CAST(count(*) AS BIGINT) AS n_docs
FROM b GROUP BY bucket
"""


# ---- temperature-balanced source sampling (ops/sampling.temp_sample) ----------
# quota = EXACT isqrt(n_s): floor(sqrt) with a neighbor correction so a
# libm last-ulp error at perfect squares cannot flip the floor.

TEMP_SAMPLE_SQL = (
    "WITH "
    + _mix_ctes("doc_id, source", "doc_id", "documents")
    + """,
ns AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
q AS (
  SELECT source,
         CASE WHEN (f + 1) * (f + 1) <= n THEN f + 1
              WHEN f * f > n THEN f - 1
              ELSE f END AS quota
  FROM (SELECT source, n,
               CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS f
        FROM ns)
),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY z, doc_id) AS rn
  FROM s5
)
SELECT r.doc_id, r.source
FROM ranked r JOIN q USING (source) WHERE r.rn <= q.quota
"""
)


# ---- length-bucketed loader batches (ops/sampling.length_batches) -------------

from .ops.sampling import LB_BATCH  # noqa: E402

LENGTH_BATCHES_SQL = (
    "WITH "
    + _mix_ctes(
        "doc_id, bucket",
        "doc_id",
        "(SELECT doc_id, length(printf('%b', n_chars)) - 1 AS bucket"
        " FROM documents)",
    )
    + f"""
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST((row_number() OVER (PARTITION BY bucket ORDER BY z, doc_id) - 1)
            // {LB_BATCH} AS BIGINT) AS batch_idx
FROM s5
"""
)


# ---- Gini-Simpson concentration per source (ops/textstats.simpson_by_source) --

SIMPSON_BY_SOURCE_SQL = f"""
WITH tt AS (
  SELECT source, unnest({_DOC_TOKS}) AS tok FROM documents
),
agg AS (SELECT source, tok, count(*) AS n FROM tt GROUP BY 1, 2),
s AS (
  SELECT source,
         sum(CAST(n AS HUGEINT) * n) AS m2,
         sum(CAST(n AS HUGEINT)) AS nt
  FROM agg GROUP BY source
)
SELECT source,
       CAST(nt AS BIGINT) AS n_tokens,
       CAST((1000000 * m2) // (nt * nt) AS BIGINT) AS simpson_micro
FROM s
"""


# ---- vocabulary coverage / OOV rate (ops/textstats.vocab_oov) -----------------

from .ops.textstats import VOCAB_MIN, VOCAB_V  # noqa: E402

VOCAB_OOV_SQL = f"""
WITH tt AS (
  SELECT source, unnest({_DOC_TOKS}) AS tok FROM documents
),
cnt AS (SELECT tok, count(*) AS n FROM tt GROUP BY tok),
vocab AS (
  SELECT tok FROM cnt WHERE n >= {VOCAB_MIN}
  QUALIFY row_number() OVER (ORDER BY n DESC, tok) <= {VOCAB_V}
),
per AS (
  SELECT t.source,
         count(*) AS n_tokens,
         count(*) FILTER (WHERE v.tok IS NULL) AS n_oov
  FROM tt t LEFT JOIN vocab v ON v.tok = t.tok
  GROUP BY t.source
)
SELECT source,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_oov AS BIGINT) AS n_oov,
       CAST((1000 * n_oov) // n_tokens AS BIGINT) AS oov_permille
FROM per
"""


# ---- per-column profiling report (ops/relational.column_profile) --------------

COLUMN_PROFILE_SQL = """
SELECT * FROM (
  SELECT 'doc_id' AS "column", count(*) AS n_rows,
         count(DISTINCT doc_id) AS n_distinct,
         count(*) FILTER (WHERE doc_id IS NULL) AS n_null FROM documents
  UNION ALL
  SELECT 'lang', count(*), count(DISTINCT lang),
         count(*) FILTER (WHERE lang IS NULL) FROM documents
  UNION ALL
  SELECT 'n_chars', count(*), count(DISTINCT n_chars),
         count(*) FILTER (WHERE n_chars IS NULL) FROM documents
  UNION ALL
  SELECT 'source', count(*), count(DISTINCT source),
         count(*) FILTER (WHERE source IS NULL) FROM documents
  UNION ALL
  SELECT 'text', count(*), count(DISTINCT text),
         count(*) FILTER (WHERE text IS NULL) FROM documents
) ORDER BY "column"
"""


# ---- quality-filter drop-reason funnel (ops/textstats.qf_funnel) --------------

from .sql import QF_PIPELINE_SQL  # noqa: E402

QF_FUNNEL_SQL = f"""
WITH qf AS ({QF_PIPELINE_SQL})
SELECT CASE WHEN keep THEN 'kept' ELSE drop_reason END AS stage,
       CAST(count(*) AS BIGINT) AS n,
       CAST((1000 * count(*)) // (SELECT count(*) FROM qf) AS BIGINT)
         AS permille
FROM qf GROUP BY 1
"""


# ---- (lang x source) chi-square independence audit ----------------------------
# Exact integer micro units; HUGEINT so (o*N - r*c)^2 cannot overflow.

LANG_SOURCE_CHI2_SQL = """
WITH cell AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
r AS (SELECT lang, sum(o) AS rl FROM cell GROUP BY lang),
c AS (SELECT source, sum(o) AS cs FROM cell GROUP BY source),
t AS (SELECT sum(o) AS nn FROM cell)
SELECT cell.lang, cell.source, CAST(cell.o AS BIGINT) AS n,
       CAST((1000000::HUGEINT * r.rl * c.cs) // t.nn AS BIGINT)
         AS expected_micro,
       CAST((1000000::HUGEINT
             * (cell.o * t.nn - r.rl * c.cs)
             * (cell.o * t.nn - r.rl * c.cs))
            // (r.rl * c.cs * t.nn) AS BIGINT) AS chi2_micro
FROM cell
JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t
"""


# ---- duplicate-rate report per source (dup_rate_by_source) --------------------
# Dup rule = identical normalized text, the same rule dedup_docs'
# 128-bit fingerprints encode (their oracle already pins the
# equivalence).

DUP_RATE_BY_SOURCE_SQL = f"""
WITH d AS (SELECT source, {_NORM} AS norm FROM documents),
per AS (
  SELECT source, count(*) AS n_docs, count(DISTINCT norm) AS n_distinct
  FROM d GROUP BY source
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST((1000 * (n_docs - n_distinct)) // n_docs AS BIGINT)
         AS dup_permille
FROM per
"""


# ---- per-role turn-length quantiles (turn_len_quantiles) ----------------------

TURN_LEN_QUANTILES_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
SELECT role,
       CAST(quantile_disc(length(text), 0.500) AS BIGINT) AS p500,
       CAST(quantile_disc(length(text), 0.900) AS BIGINT) AS p900,
       CAST(quantile_disc(length(text), 0.990) AS BIGINT) AS p990
FROM transcripts GROUP BY role
"""
)


# ---- token-boundary truncation (ops/sampling.truncate_docs) -------------------

from .ops.sampling import TRUNC_TOKENS  # noqa: E402

TRUNCATE_DOCS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_DOC_TOKS} AS t FROM documents
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tok_orig,
       array_to_string(t[1:least({TRUNC_TOKENS}, len(t))], ' ')
         AS truncated_text,
       len(t) > {TRUNC_TOKENS} AS was_truncated
FROM toks
"""


# ---- RAG index build: postings over chunks (q_rag_index) ----------------------
# chunk_docs' window rule + the inverted-index postings shape, with the
# injective chunk_id = doc_id * RAG_CHUNK_MULT + chunk_idx.

RAG_CHUNK_MULT = 100_000

RAG_INDEX_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_DOC_TOKS} AS t FROM documents
),
nn AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
starts AS (
  SELECT doc_id, t, n,
         CAST(unnest(range(0, n, {CHUNK_STRIDE})) AS BIGINT) AS s
  FROM nn
),
chunks AS (
  SELECT doc_id * {RAG_CHUNK_MULT} + (s // {CHUNK_STRIDE}) AS chunk_id,
         t[CAST(s + 1 AS BIGINT):CAST(least(s + {CHUNK_LEN}, n) AS BIGINT)]
           AS ct
  FROM starts
),
pairs AS (SELECT DISTINCT chunk_id, unnest(ct) AS tok FROM chunks)
SELECT tok, CAST(count(*) AS BIGINT) AS df,
       string_agg(CAST(chunk_id AS VARCHAR), ',' ORDER BY chunk_id)
         AS postings
FROM pairs GROUP BY tok
"""


def _rag_index_seg_sql() -> str:
    """Segmented (tok, chunk_id-range) form of the RAG index — same chunk
    derivation, postings grouped per fixed-size id-range segment."""
    from .ops.retrieval import INDEX_SEG_RANGE

    chunks_prefix = RAG_INDEX_SQL.split("pairs AS")[0]
    return f"""{chunks_prefix}
pairs AS (SELECT DISTINCT chunk_id, unnest(ct) AS tok FROM chunks)
SELECT tok,
       CAST(chunk_id // {INDEX_SEG_RANGE} AS BIGINT) AS seg_idx,
       CAST(count(*) AS BIGINT) AS df_seg,
       string_agg(CAST(chunk_id AS VARCHAR), ',' ORDER BY chunk_id)
         AS postings_chunk
FROM pairs GROUP BY tok, chunk_id // {INDEX_SEG_RANGE}
"""


RAG_INDEX_SEG_SQL = _rag_index_seg_sql()


# ---- cohort retention matrix (ops/temporal.cohort_retention) ------------------

COHORT_RETENTION_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(day(ts) AS BIGINT) AS day FROM events
),
f AS (
  SELECT user_id, day,
         min(day) OVER (PARTITION BY user_id) AS cohort
  FROM d
)
SELECT CAST(cohort AS BIGINT) AS cohort_day,
       CAST(day - cohort AS BIGINT) AS age_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM f GROUP BY 1, 2
"""


# ---- per-day trending terms (ops/textstats.trending_terms) --------------------

from .ops.textstats import TREND_TOP_K  # noqa: E402

TRENDING_TERMS_SQL = (
    _with(TRANSCRIPTS_CTE)
    + f""",
tc AS (
  SELECT CAST(day(ts) AS BIGINT) AS day, tok AS term,
         CAST(count(*) AS BIGINT) AS n
  FROM (SELECT ts, unnest({_DOC_TOKS}) AS tok FROM transcripts)
  GROUP BY 1, 2
),
r AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY day ORDER BY n DESC, term)
                 AS BIGINT) AS rank
  FROM tc
)
SELECT day, term, n, rank FROM r WHERE rank <= {TREND_TOP_K}
"""
)


# ---- dialogue balance report (ops/windows.conv_balance) -----------------------

CONV_BALANCE_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
SELECT conv_id,
       CAST(count(*) FILTER (WHERE role = 'user') AS BIGINT) AS n_user,
       CAST(count(*) FILTER (WHERE role = 'assistant') AS BIGINT)
         AS n_assistant,
       CAST(COALESCE(sum(length(text)) FILTER (WHERE role = 'user'), 0)
            AS BIGINT) AS user_chars,
       CAST(COALESCE(sum(length(text)) FILTER (WHERE role = 'assistant'), 0)
            AS BIGINT) AS assistant_chars,
       CAST(CASE WHEN COALESCE(sum(length(text)), 0) = 0 THEN 0
                 ELSE (1000 * COALESCE(sum(length(text))
                              FILTER (WHERE role = 'assistant'), 0))
                      // sum(length(text)) END AS BIGINT)
         AS assistant_permille
FROM transcripts GROUP BY conv_id
"""
)


# ---- role-alternation score (ops/windows.alternation_part) --------------------

ALTERNATION_SCORE_SQL = (
    _with(TRANSCRIPTS_CTE)
    + """
, lagged AS (
  SELECT conv_id,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev,
         role
  FROM transcripts
),
per AS (
  SELECT conv_id,
         count(*) FILTER (WHERE prev IS NOT NULL) AS n_pairs,
         count(*) FILTER (WHERE prev IS NOT NULL AND role <> prev)
           AS n_alternating
  FROM lagged GROUP BY conv_id
)
SELECT conv_id,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_alternating AS BIGINT) AS n_alternating,
       CAST(CASE WHEN n_pairs = 0 THEN 0
                 ELSE (1000 * n_alternating) // n_pairs END AS BIGINT)
         AS alternation_permille
FROM per
"""
)


# ---- per-type winsorization (ops/temporal.winsorize_values) -------------------

from .ops.temporal import LATEST_K, WINSOR_HI_PM, WINSOR_LO_PM  # noqa: E402

WINSORIZE_VALUES_SQL = f"""
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 1000000) AS BIGINT) AS value_micro
  FROM events
),
q AS (
  SELECT event_type,
         CAST(quantile_disc(value_micro, {WINSOR_LO_PM / 1000}) AS BIGINT)
           AS lo,
         CAST(quantile_disc(value_micro, {WINSOR_HI_PM / 1000}) AS BIGINT)
           AS hi
  FROM v GROUP BY event_type
)
SELECT v.event_id, v.event_type, v.value_micro,
       CAST(least(greatest(v.value_micro, q.lo), q.hi) AS BIGINT)
         AS clamped_micro
FROM v JOIN q USING (event_type)
"""


# ---- latest-N events per user (ops/temporal.latest_events) --------------------

LATEST_EVENTS_SQL = f"""
SELECT CAST(user_id AS BIGINT) AS user_id, ts,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(row_number() OVER (
         PARTITION BY user_id ORDER BY ts DESC, event_id
       ) AS BIGINT) AS rank
FROM events QUALIFY rank <= {LATEST_K}
"""


# ---- vocabulary growth curve (ops/textstats.vocab_growth) ---------------------

VOCAB_GROWTH_SQL = (
    _with(TRANSCRIPTS_CTE)
    + f""",
tt AS (
  SELECT tok, CAST(day(ts) AS BIGINT) AS day
  FROM (SELECT ts, unnest({_DOC_TOKS}) AS tok FROM transcripts)
),
first AS (SELECT tok, min(day) AS day FROM tt GROUP BY tok),
per AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new_types
        FROM first GROUP BY day)
SELECT day, n_new_types,
       CAST(sum(n_new_types) OVER (ORDER BY day) AS BIGINT) AS n_types_cum
FROM per
"""
)


# ---- storage-co-partitioned join (ops/relational.bucket_join_events) ----------
# Bucketing is a physical layout; the oracle is the plain logical join.

BUCKET_JOIN_EVENTS_SQL = """
WITH v AS (
  SELECT event_id, user_id,
         CAST(floor(value * 1000000) AS BIGINT) AS value_micro
  FROM events
),
d AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_total
      FROM events GROUP BY user_id)
SELECT CAST(v.event_id AS BIGINT) AS event_id,
       CAST(v.user_id AS BIGINT) AS user_id,
       v.value_micro, d.n_total
FROM v JOIN d USING (user_id)
"""


# ---- declared-vs-detected language audit (ops/textstats.lang_mismatch) --------

LANG_MISMATCH_SQL = f"""
WITH t AS (
  SELECT source, lang AS declared, {_DOC_TOKS} AS toks FROM documents
),
c AS (
  SELECT source, declared,
    CAST(length(list_filter(toks, x -> list_contains({_SV_LIST}, x))) AS BIGINT) AS n_sv,
    CAST(length(list_filter(toks, x -> list_contains({_EN_LIST}, x))) AS BIGINT) AS n_en
  FROM t
),
d AS (
  SELECT source, declared,
         CASE WHEN n_sv > n_en THEN 'sv'
              WHEN n_en > n_sv THEN 'en'
              ELSE 'und' END AS detected
  FROM c
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE detected <> declared) AS BIGINT)
         AS n_mismatch,
       CAST((1000 * count(*) FILTER (WHERE detected <> declared)) // count(*)
            AS BIGINT) AS mismatch_permille
FROM d GROUP BY source
"""


# ---- gopher pass rate per source (ops/textstats.gopher_rate_by_source) --------

GOPHER_RATE_BY_SOURCE_SQL = f"""
WITH g AS ({GOPHER_QUALITY_SQL}),
j AS (
  SELECT d.source, CASE WHEN g.keep THEN 1 ELSE 0 END AS k
  FROM g JOIN documents d USING (doc_id)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(k) AS BIGINT) AS n_keep,
       CAST((1000 * sum(k)) // count(*) AS BIGINT) AS keep_permille
FROM j GROUP BY source
"""


# ---- exact activity Gini (ops/quantiles.activity_gini) ------------------------
# Row-number tie order cancels (equal x within a run), so the window
# restatement equals the engine's histogram fold exactly.

ACTIVITY_GINI_SQL = """
WITH ux AS (SELECT user_id, count(*) AS x FROM events GROUP BY user_id),
o AS (SELECT x, row_number() OVER (ORDER BY x, user_id) AS r FROM ux),
s AS (
  SELECT count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(r AS HUGEINT) * x) AS srx
  FROM o
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(sx AS BIGINT) AS total_events,
       CAST((1000000 * (2 * srx - (n + 1) * sx)) // (n * sx) AS BIGINT)
         AS gini_micro
FROM s
"""


# ---- TPC-H Q13: customer order-count distribution ------------------------------

from .ops.relational import Q13_EXCLUDE_PRIORITY  # noqa: E402

Q13_CUSTDIST_SQL = f"""
WITH oc AS (
  SELECT o_custkey, count(*) AS n FROM orders
  WHERE o_orderpriority <> '{Q13_EXCLUDE_PRIORITY}' GROUP BY o_custkey
),
cc AS (
  SELECT c.c_custkey, COALESCE(oc.n, 0) AS c_count
  FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM cc GROUP BY c_count
"""


# ---- weekly activity heatmap (ops/temporal.event_heatmap) ---------------------

EVENT_HEATMAP_SQL = """
SELECT CAST(isodow(ts) AS BIGINT) AS isodow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


# ---- pre-training capstone: the full curation chain as nested CTEs ----------
# html_strip -> gopher gate -> line dedup -> minhash keep-best ->
# decontaminate -> temperature sample -> seq_pack + shard_pack, each
# component oracle RETARGETED from the raw documents view onto the
# previous stage's transformed text (inner WITH blocks are scoped to
# their parenthesized subqueries, so component CTE names cannot collide).


def _over(sql: str, rel: str) -> str:
    """Retarget a component oracle from `documents` to another relation.

    Guard: the textual replace only rewrites the two forms every current
    component uses (`FROM documents` / `JOIN documents`); a future edit
    introducing another form (comma join, newline before the table name,
    correlated reference) would silently leave the raw table inside the
    composed CTEs, so any surviving standalone `documents` token is a
    hard error here rather than a wrong-but-plausible oracle."""
    import re

    out = sql.replace("FROM documents", f"FROM {rel}").replace(
        "JOIN documents", f"JOIN {rel}"
    )
    leftover = re.search(r"\bdocuments\b", out)
    if leftover:
        raise AssertionError(
            "_over(): component SQL still references `documents` after "
            f"retargeting onto {rel!r} (unsupported join/FROM form?): "
            f"...{out[max(0, leftover.start() - 60):leftover.end() + 20]}..."
        )
    return out


def _shingle_keep_best_sql(rel: str) -> str:
    """Keep-best near-dup dedup at SHINGLE granularity over `rel`
    (columns doc_id, text, n_chars): all-pairs winnow-shingle Jaccard
    >= 0.5 edges -> recursive transitive closure -> per-cluster argmax
    n_chars (ties to smaller id). The engine runs MinHash-LSH candidates
    + exact shingle verify + distributed components; equality proves the
    sketch's recall like minhash_verified does. Unigram Jaccard (the
    dedup_keep_best exhibit) degenerates on the fixture's ~31-token
    vocabulary — shingles are what production near-dup uses anyway."""
    return f"""
WITH RECURSIVE {_over(_WINNOW_SHV_CTE, rel)},
shd AS (SELECT DISTINCT doc_id, fp FROM shv),
counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shd GROUP BY doc_id),
jp AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
  FROM shd a JOIN shd b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jpairs AS (
  SELECT doc_a, doc_b FROM jp
  JOIN counts ca ON ca.doc_id = doc_a
  JOIN counts cb ON cb.doc_id = doc_b
  WHERE 2 * inter >= ca.n + cb.n - inter
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM jpairs
  UNION SELECT doc_b, doc_a FROM jpairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, re.r FROM reach re JOIN edges e ON e.src = re.node
),
labels AS (SELECT node, min(r) AS root FROM reach GROUP BY node),
best AS (
  SELECT l.root, d.doc_id
  FROM labels l JOIN {rel} d ON d.doc_id = l.node
  QUALIFY row_number() OVER (
    PARTITION BY l.root ORDER BY d.n_chars DESC, d.doc_id
  ) = 1
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id
FROM {rel} d
WHERE d.doc_id NOT IN (SELECT node FROM labels)
   OR d.doc_id IN (SELECT doc_id FROM best)
"""


PRETRAIN_PACK_SQL = f"""
WITH hs AS MATERIALIZED (
  SELECT doc_id, clean_text AS text FROM ({HTML_STRIP_SQL}) _hs
),
gk AS MATERIALIZED (
  SELECT doc_id FROM ({_over(GOPHER_QUALITY_SQL, 'hs')}) _gq WHERE keep
),
surv1 AS MATERIALIZED (SELECT hs.doc_id, hs.text FROM hs JOIN gk USING (doc_id)),
ldq AS MATERIALIZED (
  SELECT doc_id, text_dedup AS text, length(text_dedup) AS n_chars
  FROM ({_over(LINE_DEDUP_SQL, 'surv1')}) _ld
),
kept AS MATERIALIZED (
  SELECT doc_id FROM ({_shingle_keep_best_sql('ldq')}) _kb
),
surv2 AS MATERIALIZED (SELECT ldq.doc_id, ldq.text FROM ldq JOIN kept USING (doc_id)),
clean AS MATERIALIZED (
  SELECT doc_id FROM ({_over(DECONTAMINATE_SQL, 'surv2')}) _dc
  WHERE contaminated = 0
),
srcd AS MATERIALIZED (
  SELECT c.doc_id, d.source FROM clean c JOIN documents d USING (doc_id)
),
picked AS MATERIALIZED (
  SELECT doc_id FROM ({_over(TEMP_SAMPLE_SQL, 'srcd')}) _ts
),
final AS MATERIALIZED (SELECT s2.doc_id, s2.text FROM surv2 s2 JOIN picked USING (doc_id)),
segs AS MATERIALIZED ({_over(SEQ_PACK_SQL, 'final')}),
shards AS MATERIALIZED ({_over(SHARD_PACK_SQL, 'final')})
SELECT segs.seq_id, segs.doc_id, segs.doc_start, segs.doc_end, segs.seq_off,
       shards.n_tok, shards.shard_id
FROM segs JOIN shards USING (doc_id)
"""


# ---- pinned character-RLE compressibility (compress_ratio's checked twin) ----
# n_runs counts maximal runs of identical code points via string_split('')
# (code-point granularity — matches the engine's utf-32 neighbor compare)
# and an indexed list lambda; this DuckDB has no WITH ORDINALITY.
COMPRESS_RATIO_FIXED_SQL = """
WITH l AS (
  SELECT doc_id, string_split(text, '') AS cs, length(text) AS raw_len
  FROM documents
),
r AS (
  SELECT doc_id, raw_len,
         CAST(list_sum(list_transform(
           cs, (c, i) -> CASE WHEN i = 1 OR c != cs[i - 1] THEN 1 ELSE 0 END
         )) AS BIGINT) AS n_runs
  FROM l
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(raw_len AS BIGINT) AS raw_len,
       n_runs,
       (1000000 * n_runs) // raw_len AS ratio_micro
FROM r
"""
