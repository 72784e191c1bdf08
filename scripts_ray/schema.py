"""Canonical schemas for the transcript engine.

The input shape is fixed by the graft contract (BASELINE.json `input_hint`);
it is the columnar analog of the reference's document/element model
(one row per <u>/<note> element in document order,
/root/reference/src/classify_intros.py:25-30)."""

from __future__ import annotations

import pyarrow as pa

# Input: one row per turn, ordered by (conv_id, turn_idx).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Output of the flagship quality-filter pipeline. All numeric signal columns
# are integers so that the Ray pipeline, the single-process oracle and the
# DuckDB oracle SQL agree bit-for-bit (no float summation-order issues).
OUTPUT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("scrubbed_text", pa.string()),
        ("lang", pa.string()),
        ("ppl_score", pa.int64()),  # floored milli-nat log-odds sum + prior
        ("keep", pa.bool_()),
        ("drop_reason", pa.string()),  # null when keep
    ]
)

ROLES = ["user", "assistant", "system", "tool", "moderator"]

# Protected roles are never re-labeled by the gate — the analog of the
# reference's `exclude=["date", "speaker"]` protected-class list
# (/root/reference/src/cur-prot/reclassify.py:114).
PROTECTED_ROLES = ("system", "moderator")
