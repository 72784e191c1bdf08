"""Single-process oracle: the exact flagship semantics, no Ray.

Runs the same pure functions (rules/tokens/gate) sequentially over an
in-memory Arrow table — the straight-line reference implementation the
pytest suite compares the distributed pipeline against (the role the
gold-standard CSVs play in the reference, SURVEY.md §5). The *independent*
check is the DuckDB SQL in `scripts_ray.sql`.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from . import gate as gate_mod
from .pipelines import OUT_COLS
from .rules import scrub_text
from .tokens import UnigramScores, token_signals


def run_quality_filter(transcripts: pa.Table, counts: dict[str, int]) -> pa.Table:
    model = UnigramScores(counts)
    scrubbed = scrub_text(transcripts["text"].combine_chunks())
    sig = token_signals(scrubbed, model)
    lang = gate_mod.detect_lang(sig["n_sv"], sig["n_en"])
    ppl = gate_mod.ppl_score(sig["tok_score_sum"], sig["n_tokens"], model.drop_score)
    keep, reason = gate_mod.decide(
        role=transcripts["role"].to_numpy(zero_copy_only=False),
        lang=lang,
        ppl=ppl,
        n_chars=sig["n_chars"],
        n_symbols=sig["n_symbols"],
        n_tokens=sig["n_tokens"],
        n_distinct=sig["n_distinct"],
    )
    df = pd.DataFrame(
        {
            "conv_id": transcripts["conv_id"].to_pandas(),
            "turn_idx": transcripts["turn_idx"].to_pandas(),
            "role": transcripts["role"].to_pandas(),
            "scrubbed_text": pd.Series(scrubbed.to_pandas()),
            "lang": lang,
            "ppl_score": ppl,
            "keep": keep,
            "drop_reason": pd.Series(reason, dtype=object),
        }
    )
    parts = []
    for _, g in df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id", sort=True):
        k, r = gate_mod.demote_pre_system(
            g["turn_idx"].to_numpy(),
            g["role"].to_numpy(),
            g["keep"].to_numpy(),
            g["drop_reason"].to_numpy(dtype=object),
        )
        g = g.copy()
        g["keep"] = k
        g["drop_reason"] = r
        parts.append(g)
    out = pd.concat(parts, ignore_index=True)[OUT_COLS]
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("role", pa.string()),
                ("scrubbed_text", pa.string()),
                ("lang", pa.string()),
                ("ppl_score", pa.int64()),
                ("keep", pa.bool_()),
                ("drop_reason", pa.string()),
            ]
        )
    )
