"""Query registry: named Ray pipelines + their DuckDB oracle SQL.

Every entry in QUERIES is a callable `sf_dir -> Dataset | DataFrame |
pyarrow.Table`; ORACLES maps the same names to equivalent DuckDB SQL over
the driver's pre-registered views. Names of computed columns match between
both sides exactly.
"""

from __future__ import annotations

import pyarrow as pa

from . import sql
from .pipelines import (
    Scorer,
    build_model_counts,
    gate_batch,
    quality_filter,
    scrub_batch,
)
from .sources import derive_transcripts_ds
from .tokens import token_signals


def _put_counts(sf_dir: str):
    import ray

    return ray.put(build_model_counts(sf_dir))


def q_qf_pipeline(sf_dir: str):
    """Flagship end-to-end quality filter."""
    return quality_filter(derive_transcripts_ds(sf_dir), _put_counts(sf_dir))


def q_qf_scrub(sf_dir: str):
    return (
        derive_transcripts_ds(sf_dir)
        .map_batches(scrub_batch, batch_format="pyarrow")
        .select_columns(["conv_id", "turn_idx", "scrubbed_text"])
    )


def _signal_batch(batch: pa.Table) -> pa.Table:
    sig = token_signals(batch["scrubbed_text"].combine_chunks())
    for c in ["n_chars", "n_symbols", "n_tokens", "n_distinct", "n_sv", "n_en"]:
        batch = batch.append_column(c, pa.array(sig[c], type=pa.int64()))
    return batch


def q_qf_signals(sf_dir: str):
    return (
        derive_transcripts_ds(sf_dir)
        .map_batches(scrub_batch, batch_format="pyarrow")
        .map_batches(_signal_batch, batch_format="pyarrow")
        .select_columns(
            ["conv_id", "turn_idx", "n_chars", "n_symbols", "n_tokens",
             "n_distinct", "n_sv", "n_en"]
        )
    )


def _lang_batch(batch: pa.Table) -> pa.Table:
    import numpy as np

    from .gate import detect_lang

    sig = token_signals(batch["scrubbed_text"].combine_chunks())
    lang = detect_lang(sig["n_sv"], sig["n_en"])
    return batch.append_column("lang", pa.array(lang, type=pa.string()))


def q_qf_langid(sf_dir: str):
    return (
        derive_transcripts_ds(sf_dir)
        .map_batches(scrub_batch, batch_format="pyarrow")
        .map_batches(_lang_batch, batch_format="pyarrow")
        .select_columns(["conv_id", "turn_idx", "lang"])
    )


def q_qf_ppl(sf_dir: str):
    return (
        derive_transcripts_ds(sf_dir)
        .map_batches(scrub_batch, batch_format="pyarrow")
        .map_batches(
            Scorer,
            fn_constructor_args=(_put_counts(sf_dir),),
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=(1, 2),
            num_cpus=1,
        )
        .select_columns(["conv_id", "turn_idx", "ppl_score"])
    )


QUERIES = {
    "qf_pipeline": q_qf_pipeline,
    "qf_scrub": q_qf_scrub,
    "qf_signals": q_qf_signals,
    "qf_langid": q_qf_langid,
    "qf_ppl": q_qf_ppl,
}

ORACLES = {
    "qf_pipeline": sql.QF_PIPELINE_SQL,
    "qf_scrub": sql.QF_SCRUB_SQL,
    "qf_signals": sql.QF_SIGNALS_SQL,
    "qf_langid": sql.QF_LANGID_SQL,
    "qf_ppl": sql.QF_PPL_SQL,
}
