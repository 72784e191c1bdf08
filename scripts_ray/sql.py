"""DuckDB oracle SQL — the independent re-statement of every pipeline stage.

All SQL is generated from the SAME constants as the Arrow kernels in
`scripts_ray.rules` (single source of truth for patterns/thresholds), but
executes in a completely different engine (DuckDB/RE2 SQL vs Ray/pyarrow),
which is what makes it a genuine oracle. Tables referenced by name
(`events`, `documents`, …) are the driver's pre-registered views.
"""

from __future__ import annotations

from . import rules as R
from .sources import REP_INJECT, SOFT_HYPHEN, SV_INJECT, SYMBOL_SOUP

# --------------------------------------------------------------------------
# The deterministic transcripts derivation (mirror of sources._event_columns
# + turn_idx ranking).
# --------------------------------------------------------------------------

TRANSCRIPTS_CTE = f"""
transcripts AS (
  SELECT
    'conv-' || lpad(CAST(e.user_id AS VARCHAR), 6, '0') AS conv_id,
    CAST(row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) - 1 AS INTEGER) AS turn_idx,
    CASE e.event_type
      WHEN 'click' THEN 'user'
      WHEN 'view' THEN 'assistant'
      WHEN 'signup' THEN 'system'
      WHEN 'purchase' THEN 'tool'
      WHEN 'error' THEN 'moderator'
    END AS role,
    CASE CAST(e.event_id % 13 AS INTEGER)
      WHEN 0 THEN '$ 4 om $ ' || d.text
      WHEN 1 THEN '8 14. ' || d.text
      WHEN 2 THEN '12 $ ' || d.text
      WHEN 3 THEN 'hyphen{SOFT_HYPHEN}ated ' || d.text
      WHEN 4 THEN 'ANDERS- SON sade: ' || d.text
      WHEN 5 THEN 'kontakta user' || CAST(e.event_id AS VARCHAR) || '@example.com nu ' || d.text
      WHEN 6 THEN 'ring +46 70 123 45 67 ' || d.text
      WHEN 7 THEN 'ok'
      WHEN 8 THEN '{SYMBOL_SOUP}'
      WHEN 9 THEN repeat('spam ', 60) || d.text
      WHEN 10 THEN '{SV_INJECT}' || d.text
      WHEN 11 THEN replace(d.text, ' ', '  ')
      ELSE d.text
    END AS text,
    CASE WHEN e.event_type = 'purchase' THEN 'checkout' ELSE NULL END AS tool,
    e.ts AS ts
  FROM events e
  JOIN documents d ON d.doc_id = e.event_id % (SELECT count(*) FROM documents)
)
"""

# --------------------------------------------------------------------------
# Scrub chain (same order as rules.scrub_text)
# --------------------------------------------------------------------------

SCRUB_EXPR = f"""
    regexp_replace(
      regexp_replace(
        trim(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                CASE
                  WHEN t.text LIKE '$%' THEN replace(t.text, '$', '§')
                  WHEN regexp_matches(t.text, '{R.RE_DOLLAR_SECTION}') THEN '§' || substr(t.text, 2)
                  WHEN regexp_matches(t.text, '{R.RE_DOLLAR_NUM}') THEN regexp_replace(t.text, '{R.RE_DOLLAR_NUM}', '\\1§')
                  ELSE t.text
                END,
                ' ?{SOFT_HYPHEN} ?', '', 'g'),
              '{R.RE_CAPS_DASH}', '\\1\\2', 'g'),
            '{R.RE_WHITESPACE}', ' ', 'g'),
          ' '),
        '{R.RE_EMAIL}', '{R.EMAIL_TOKEN}', 'g'),
      '{R.RE_PHONE}', '{R.PHONE_TOKEN}', 'g')
"""

SCRUBBED_CTE = f"""
scrubbed AS (
  SELECT t.conv_id, t.turn_idx, t.role, t.tool, t.ts, {SCRUB_EXPR} AS scrubbed_text
  FROM transcripts t
)
"""

_TOKS = f"list_filter(string_split_regex(lower(s.scrubbed_text), '{R.RE_TOKEN_SEP}'), x -> x <> '')"
_SV_LIST = "[" + ", ".join(f"'{w}'" for w in R.SV_STOPWORDS) + "]"
_EN_LIST = "[" + ", ".join(f"'{w}'" for w in R.EN_STOPWORDS) + "]"

SIG_CTE = f"""
sig AS (
  SELECT s.*,
    CAST(length(s.scrubbed_text) AS BIGINT) AS n_chars,
    CAST(length(regexp_extract_all(s.scrubbed_text, '{R.RE_SYMBOL}')) AS BIGINT) AS n_symbols,
    CAST(length({_TOKS}) AS BIGINT) AS n_tokens,
    CAST(length(list_distinct({_TOKS})) AS BIGINT) AS n_distinct,
    CAST(length(list_filter({_TOKS}, x -> list_contains({_SV_LIST}, x))) AS BIGINT) AS n_sv,
    CAST(length(list_filter({_TOKS}, x -> list_contains({_EN_LIST}, x))) AS BIGINT) AS n_en,
    {_TOKS} AS toks
  FROM scrubbed s
)
"""

# Unigram LM built from the raw `documents` corpus (mirror of
# pipelines.build_model_counts + tokens.UnigramScores).
_DOC_TOKS = f"list_filter(string_split_regex(lower(text), '{R.RE_TOKEN_SEP}'), x -> x <> '')"

LM_CTES = f"""
doc_freq AS (
  SELECT tok, count(*) AS c
  FROM (SELECT unnest({_DOC_TOKS}) AS tok FROM documents)
  GROUP BY tok
),
lm AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_total, CAST(count(*) AS BIGINT) AS v_size
  FROM doc_freq
),
turn_toks AS (
  SELECT s.conv_id, s.turn_idx, unnest(s.toks) AS tok FROM sig s
),
turn_scores AS (
  SELECT tt.conv_id, tt.turn_idx,
    CAST(sum(CAST(floor(1000.0 * ln((COALESCE(f.c, 0) + 1) / CAST(lm.n_total + lm.v_size AS DOUBLE))) AS BIGINT)) AS BIGINT) AS tok_sum
  FROM turn_toks tt
  CROSS JOIN lm
  LEFT JOIN doc_freq f ON f.tok = tt.tok
  GROUP BY tt.conv_id, tt.turn_idx
)
"""

SCORED_CTE = f"""
scored AS (
  SELECT s.conv_id, s.turn_idx, s.role, s.tool, s.ts, s.scrubbed_text,
    s.n_chars, s.n_symbols, s.n_tokens, s.n_distinct, s.n_sv, s.n_en,
    CASE WHEN s.n_sv > s.n_en THEN 'sv' WHEN s.n_en > s.n_sv THEN 'en' ELSE 'und' END AS lang,
    CAST(COALESCE(tsc.tok_sum, 0)
         - s.n_tokens * (SELECT CAST(floor(1000.0 * ln(1.0 / v_size)) AS BIGINT) FROM lm)
         + {R.PRIOR_MILLINATS} AS BIGINT) AS ppl_score
  FROM sig s
  LEFT JOIN turn_scores tsc ON tsc.conv_id = s.conv_id AND tsc.turn_idx = s.turn_idx
)
"""

_PROTECTED = "('system', 'moderator')"

GATED_CTE = f"""
gated AS (
  SELECT c.*,
    CASE
      WHEN c.role IN {_PROTECTED} THEN NULL
      WHEN c.n_chars = 0 THEN 'empty'
      WHEN c.n_chars < {R.MIN_CHARS} THEN 'too_short'
      WHEN c.n_chars > {R.MAX_CHARS} THEN 'too_long'
      WHEN {R.SYMBOL_NUM} * c.n_symbols > {R.SYMBOL_DEN} * c.n_chars THEN 'symbol_ratio'
      WHEN c.n_tokens >= {R.REP_MIN_TOKENS} AND {R.REP_NUM} * c.n_distinct < {R.REP_DEN} * c.n_tokens THEN 'repetition'
      WHEN c.lang NOT IN ('en', 'sv') THEN 'lang'
      WHEN c.ppl_score <= 0 THEN 'ppl'
      ELSE NULL
    END AS base_reason,
    min(CASE WHEN c.role = 'system' THEN c.turn_idx END) OVER (PARTITION BY c.conv_id) AS first_sys
  FROM scored c
),
final AS (
  SELECT g.conv_id, g.turn_idx, g.role, g.scrubbed_text, g.lang, g.ppl_score,
    CASE
      WHEN g.base_reason IS NOT NULL THEN g.base_reason
      WHEN g.role = 'assistant' AND g.first_sys IS NOT NULL AND g.turn_idx < g.first_sys THEN 'pre_system'
      ELSE NULL
    END AS drop_reason
  FROM gated g
)
"""


def _with(*ctes: str) -> str:
    return "WITH " + ",\n".join(c.strip().rstrip() for c in ctes)


_FULL_STACK = _with(
    TRANSCRIPTS_CTE,
    SCRUBBED_CTE,
    SIG_CTE,
    LM_CTES,
    SCORED_CTE,
    GATED_CTE,
)

QF_PIPELINE_SQL = (
    _FULL_STACK
    + """
SELECT conv_id, turn_idx, role, scrubbed_text, lang, ppl_score,
       drop_reason IS NULL AS keep, drop_reason
FROM final
ORDER BY conv_id, turn_idx
"""
)

QF_SCRUB_SQL = (
    _with(TRANSCRIPTS_CTE, SCRUBBED_CTE)
    + "\nSELECT conv_id, turn_idx, scrubbed_text FROM scrubbed ORDER BY conv_id, turn_idx"
)

QF_SIGNALS_SQL = (
    _with(TRANSCRIPTS_CTE, SCRUBBED_CTE, SIG_CTE)
    + "\nSELECT conv_id, turn_idx, n_chars, n_symbols, n_tokens, n_distinct, n_sv, n_en"
    + "\nFROM sig ORDER BY conv_id, turn_idx"
)

QF_LANGID_SQL = (
    _with(TRANSCRIPTS_CTE, SCRUBBED_CTE, SIG_CTE)
    + "\nSELECT s.conv_id, s.turn_idx,"
    + "\n  CASE WHEN s.n_sv > s.n_en THEN 'sv' WHEN s.n_en > s.n_sv THEN 'en' ELSE 'und' END AS lang"
    + "\nFROM sig s ORDER BY conv_id, turn_idx"
)

QF_PPL_SQL = (
    _with(TRANSCRIPTS_CTE, SCRUBBED_CTE, SIG_CTE, LM_CTES, SCORED_CTE)
    + "\nSELECT conv_id, turn_idx, ppl_score FROM scored ORDER BY conv_id, turn_idx"
)

# --------------------------------------------------------------------------
# Distributed-trained keep/drop gate (mirror of ops.train): exact integer
# ridge least squares — HUGEINT sufficient statistics + Cramer's rule +
# exact floor-division micro-quantization, then an int64 linear scorer.
# Labels y = the rule gate's own per-turn decision (base_reason IS NULL),
# so the ENTIRE training run is oracle-checkable.
# --------------------------------------------------------------------------

from .ops.train import (  # noqa: E402 — single source of truth for the model
    FEAT_CAP as _CAP,
    KEEP_NUM as _KEEP_NUM,
    RIDGE_LAMBDA as _LAM,
    W_SCALE as _WS,
)

# The two engineered features, restated over the gated CTE's signal
# columns (mirror of ops.train.rule_features): f1 = count of passed rule
# margins (0..5), f2 = winsorized length.
def _feat_sql(alias: str) -> tuple[str, str]:
    g = alias
    f1 = (
        f"(CASE WHEN {g}.n_chars >= {R.MIN_CHARS} AND {g}.n_chars <= {R.MAX_CHARS} THEN 1 ELSE 0 END"
        f" + CASE WHEN {R.SYMBOL_NUM} * {g}.n_symbols <= {R.SYMBOL_DEN} * {g}.n_chars THEN 1 ELSE 0 END"
        f" + CASE WHEN NOT ({g}.n_tokens >= {R.REP_MIN_TOKENS} AND {R.REP_NUM} * {g}.n_distinct < {R.REP_DEN} * {g}.n_tokens) THEN 1 ELSE 0 END"
        f" + CASE WHEN {g}.n_sv <> {g}.n_en THEN 1 ELSE 0 END"
        f" + CASE WHEN {g}.ppl_score > 0 THEN 1 ELSE 0 END)"
    )
    f2 = f"LEAST({g}.n_chars, {_CAP})"
    return f1, f2


_F1, _F2 = _feat_sql("g")

TRAIN_CTES = f"""
lab AS (
  SELECT {_F1} AS f1, {_F2} AS f2,
         CASE WHEN g.base_reason IS NULL THEN 1 ELSE 0 END AS y
  FROM gated g
  WHERE g.role NOT IN {_PROTECTED}
),
gsum AS (
  SELECT CAST(sum(f1*f1) AS HUGEINT) AS s11, CAST(sum(f1*f2) AS HUGEINT) AS s12,
         CAST(sum(f1) AS HUGEINT) AS s13,   CAST(sum(f2*f2) AS HUGEINT) AS s22,
         CAST(sum(f2) AS HUGEINT) AS s23,   CAST(count(*) AS HUGEINT) AS s33,
         CAST(sum(f1*y) AS HUGEINT) AS b1,  CAST(sum(f2*y) AS HUGEINT) AS b2,
         CAST(sum(y) AS HUGEINT) AS b3
  FROM lab
),
mat AS (
  SELECT s11 + {_LAM} AS a11, s12 AS a12, s13 AS a13,
         s22 + {_LAM} AS a22, s23 AS a23, s33 + {_LAM} AS a33,
         b1, b2, b3, s33
  FROM gsum
),
solved AS (
  SELECT s33,
    a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13) + a13*(a12*a23 - a22*a13) AS det,
    b1*(a22*a33 - a23*a23)  - a12*(b2*a33 - a23*b3)   + a13*(b2*a23 - a22*b3)   AS n1,
    a11*(b2*a33 - a23*b3)   - b1*(a12*a33 - a23*a13)  + a13*(a12*b3 - b2*a13)   AS n2,
    a11*(a22*b3 - a23*b2)   - a12*(a12*b3 - b2*a13)   + b1*(a12*a23 - a22*a13)  AS n3
  FROM mat
),
qn AS (
  SELECT s33, det, 2*det AS d2,
         2*{_WS}*n1 + det AS q1, 2*{_WS}*n2 + det AS q2, 2*{_WS}*n3 + det AS q3
  FROM solved
),
weights AS (
  SELECT
    CAST((q1 - (((q1 % d2) + d2) % d2)) // d2 AS BIGINT) AS w_rules_micro,
    CAST((q2 - (((q2 % d2) + d2) % d2)) // d2 AS BIGINT) AS w_chars_micro,
    CAST((q3 - (((q3 % d2) + d2) % d2)) // d2 AS BIGINT) AS w_bias_micro,
    CAST(s33 AS BIGINT) AS n_train
  FROM qn
)
"""

_TRAIN_STACK = _with(
    TRANSCRIPTS_CTE,
    SCRUBBED_CTE,
    SIG_CTE,
    LM_CTES,
    SCORED_CTE,
    GATED_CTE,
    TRAIN_CTES,
)

TRAINED_GATE_WEIGHTS_SQL = (
    _TRAIN_STACK
    + "\nSELECT w_rules_micro, w_chars_micro, w_bias_micro, n_train FROM weights"
)

_MODEL_KEEP = (
    f"(w.w_rules_micro * {_F1} + w.w_chars_micro * {_F2}"
    f" + w.w_bias_micro) >= {_KEEP_NUM}"
)

TRAINED_GATE_SQL = (
    _TRAIN_STACK
    + f"""
SELECT g.conv_id, g.turn_idx, {_MODEL_KEEP} AS keep_trained
FROM gated g CROSS JOIN weights w
ORDER BY conv_id, turn_idx
"""
)

QF_PIPELINE_TRAINED_SQL = (
    _TRAIN_STACK
    + f"""
, trained_final AS (
  SELECT g.conv_id, g.turn_idx, g.role, g.scrubbed_text, g.lang, g.ppl_score,
    CASE
      WHEN g.role IN {_PROTECTED} THEN NULL
      WHEN NOT ({_MODEL_KEEP}) THEN 'model'
      WHEN g.role = 'assistant' AND g.first_sys IS NOT NULL
           AND g.turn_idx < g.first_sys THEN 'pre_system'
      ELSE NULL
    END AS drop_reason
  FROM gated g CROSS JOIN weights w
)
SELECT conv_id, turn_idx, role, scrubbed_text, lang, ppl_score,
       drop_reason IS NULL AS keep, drop_reason
FROM trained_final
ORDER BY conv_id, turn_idx
"""
)
