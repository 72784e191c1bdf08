"""Dead-letter routing: malformed rows leave the pipeline as DATA, not as
job failures.

At 100 TB a single undecodable row must not kill a stage, and silently
dropping it is worse — the production contract is: good rows flow on,
bad rows are routed to a side table with (key, stage, reason) for later
replay. Ray Data has no native side outputs, so the idiom here is
tag-and-fork: a stage tags each row with a nullable ``_dl_reason``
column, the dataset is materialized ONCE (bounded by the stage's output,
streaming upstream of it), and two filters fork the good and dead sides
off the shared lineage — each row is computed exactly once.

Two entry points:

- :func:`split` — for VECTORIZED validators (the preferred shape): the
  validator returns a reason string per row (None = good).
- :func:`map_batches_dead_letter` — for transforms that can genuinely
  RAISE on bad input: the batch function runs vectorized on the happy
  path; only a batch that throws is retried row-by-row to isolate the
  poison rows (rare-path cost only), which become dead letters carrying
  the exception text.

Reference analog: the reference's curation loops skip known-bad files by
hardcoded denylist (/root/reference/src/cur-prot/split_into_sections.py:20-23)
and print-and-continue on parse errors — the dead-letter table is the
scalable version of both.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd

REASON_COL = "_dl_reason"


def split(ds, reason_fn: Callable[[pd.DataFrame], pd.Series]):
    """Fork `ds` into (good, dead) datasets. `reason_fn` maps a batch to a
    string Series aligned with it: None/NaN = good row, else the
    dead-letter reason. The tagged dataset is materialized once so the
    two forks do not recompute upstream lineage."""

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out[REASON_COL] = reason_fn(batch).astype(object)
        return out

    tagged = ds.map_batches(tag, batch_format="pandas").materialize()

    def good(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.loc[batch[REASON_COL].isna()].drop(columns=[REASON_COL])

    def dead(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.loc[batch[REASON_COL].notna()].copy()
        return out.rename(columns={REASON_COL: "reason"})

    return (
        tagged.map_batches(good, batch_format="pandas"),
        tagged.map_batches(dead, batch_format="pandas"),
    )


def map_batches_dead_letter(
    ds,
    batch_fn: Callable[[pd.DataFrame], pd.DataFrame],
    key_cols: list[str],
    stage: str = "stage",
):
    """Apply `batch_fn` (vectorized, may raise) with poison-row isolation.

    Happy path: one vectorized call per batch — zero overhead. If the
    call raises, the batch is re-run row-by-row (rare-path cost only, and
    only for the poisoned batch); rows whose singleton call raises are
    emitted on the dead side as (key_cols..., stage, reason). Returns
    (good, dead) datasets off one materialized pass.

    Contracts (asserted): `batch_fn` is row-wise decomposable (output row
    i depends only on input row i — do NOT wrap aggregations), its output
    keeps `key_cols`, its output schema is stable across batches, and it
    accepts an empty input batch (standard for vectorized stages).
    """

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.reset_index(drop=True)
        deads = None
        try:
            out = batch_fn(batch).reset_index(drop=True)
        except Exception:
            goods, dead_rows = [], []
            for i in range(len(batch)):
                row = batch.iloc[[i]]
                try:
                    goods.append(batch_fn(row))
                except Exception as e:  # the poison row becomes data
                    dead_rows.append(
                        row[key_cols].assign(
                            stage=stage, **{REASON_COL: f"{type(e).__name__}: {e}"}
                        )
                    )
            out = (
                pd.concat(goods, ignore_index=True)
                if goods
                else batch_fn(batch.iloc[:0])
            )
            if dead_rows:
                deads = pd.concat(dead_rows, ignore_index=True)
        missing = set(key_cols) - set(out.columns)
        assert not missing, f"batch_fn output must keep key_cols, lost {missing}"
        cols = list(dict.fromkeys(list(out.columns) + ["stage", REASON_COL]))
        out = out.reindex(columns=cols)
        out["_dl_side"] = np.int8(0)
        if deads is not None:
            deads = deads.reindex(columns=cols)
            deads["_dl_side"] = np.int8(1)
            out = pd.concat([out, deads], ignore_index=True)
        # nullable dtypes keep column types identical between clean batches
        # and NaN-padded poisoned batches (int64 must not decay to float64)
        return out.convert_dtypes()

    tagged = ds.map_batches(run, batch_format="pandas").materialize()
    out_cols = [
        c for c in tagged.schema().names if c not in (REASON_COL, "_dl_side", "stage")
    ]
    dead_cols = key_cols + ["stage"]

    def good(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.loc[batch["_dl_side"] == 0, out_cols]

    def dead(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.loc[batch["_dl_side"] == 1, dead_cols + [REASON_COL]]
        return out.rename(columns={REASON_COL: "reason"})

    return (
        tagged.map_batches(good, batch_format="pandas"),
        tagged.map_batches(dead, batch_format="pandas"),
    )
