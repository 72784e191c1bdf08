"""Fragment-to-page alignment (M17 analog).

Reference semantics (/root/reference/src/add_modern_pagenumbers.py:94-152):
split each element's text into sentences, substring-search every sentence
against the candidate page texts, keep only sentences with a UNIQUE hit,
then per element take the modal page (ties dropped) and emit the
element→page assignment.

Graft analog: align each transcript TURN back to the `documents` row its
text was derived from, using only text evidence — turns are "elements",
documents are "pages". Containment is expressed over 5-token fragments:
the PAGE side materializes every sliding 5-token window (so a probe
fragment is found at ANY offset — the equality form of the reference's
substring scan, which unlike a substring probe can be hash-exchanged),
and the ELEMENT side probes with its non-overlapping 5-token chunks.

Plan (standard engine primitives, every stage vectorized):
  1. explode documents into distinct (fragment, doc_id) sliding windows,
     one exchange keyed by fragment → fragments contained in EXACTLY ONE
     document (the unique-hit rule, D3 shape);
  2. explode turns into strided (conv_id, turn_idx, fragment) chunks;
  3. distributed hash join on fragment (both sides scale with the
     corpus — no broadcast of an unbounded side);
  4. votes per (turn, doc) → modal doc per turn with ties dropped
     (A3 group-mode semantics, same tie rule as modal_role).

At 100 TB the page side carries ~n_tokens rows per document (sliding) —
the same cardinality the winnowing fingerprinter already handles. The
fragment STRING never leaves the map stage: the exchange/join key is a
deterministic integer fingerprint (per-token winnowing hash combined
with 5 odd multipliers mod WINNOW_M), which the DuckDB oracle recomputes
exactly — value-checked, and ~2× cheaper than exchanging ~30-char keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .dedup import WINNOW_M, winnow_token_hashes
from .hashagg import hash_join, map_partitions_by_key

FRAG_TOKENS = 5
# SQL-safe odd multipliers: token hash < 2^31 and mult < 2^32, so every
# product stays below 2^63 (exact in uint64 AND in DuckDB HUGEINT)
FRAG_MULTS = (1000003, 998244353, 69069, 2654435761, 998244853)


def _flat_tokens(text: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a string column: returns (token_counts_per_row, flat_tokens,
    row_start_offsets). Split semantics match DuckDB
    ``string_split(text, ' ')`` exactly (single literal space)."""
    parts = text.str.split(" ")
    lens = parts.str.len().to_numpy().astype(np.int64)
    flat = (
        np.concatenate(parts.to_numpy()).astype(object)
        if len(parts)
        else np.array([], dtype=object)
    )
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) else lens
    return lens, flat, offsets


def _frag_fps(flat: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Integer fingerprint of the FRAG_TOKENS-token window at each start:
    sum of (token_hash · FRAG_MULTS[k]) mod WINNOW_M — all uint64-exact,
    recomputed identically by the SQL oracle."""
    if len(starts) == 0:
        return np.zeros(0, dtype=np.int64)
    h = (winnow_token_hashes(flat) % WINNOW_M).astype(np.uint64)
    M = np.uint64(WINNOW_M)
    acc = np.zeros(len(starts), dtype=np.uint64)
    for k in range(FRAG_TOKENS):
        acc += (h[starts + k] * np.uint64(FRAG_MULTS[k])) % M
    return (acc % M).astype(np.int64)


def _concat_aranges(counts: np.ndarray) -> np.ndarray:
    """[arange(c) for c in counts], concatenated, without a Python loop."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)


def unique_fragment_docs(documents_ds):
    """(fragment fp → doc_id) for every sliding 5-token window contained in
    exactly one document. One hash exchange keyed by the integer fp."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        lens, flat, offsets = _flat_tokens(batch["text"])
        nwin = np.maximum(lens - (FRAG_TOKENS - 1), 0)
        starts = np.repeat(offsets, nwin) + _concat_aranges(nwin)
        out = pd.DataFrame(
            {
                "frag": _frag_fps(flat, starts),
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), nwin),
            }
        )
        # collapse within-document repeats before the exchange (combiner)
        return out.drop_duplicates()

    def uniq_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates()  # cross-batch (frag, doc) repeats
        counts = part.groupby("frag")["doc_id"].transform("size")
        out = part[counts == 1]
        return pd.DataFrame(
            {
                "frag": out["frag"].to_numpy(),
                "doc_id": out["doc_id"].astype(np.int64).to_numpy(),
            }
        )

    return map_partitions_by_key(
        documents_ds.map_batches(explode, batch_format="pandas"),
        keys="frag",
        fn=uniq_part,
    )


def page_align(transcripts_ds, documents_ds):
    """Per-turn modal source document, ties dropped (M17 + A3 + D3)."""

    def explode_turns(batch: pd.DataFrame) -> pd.DataFrame:
        lens, flat, offsets = _flat_tokens(batch["text"])
        nchunk = lens // FRAG_TOKENS
        starts = (
            np.repeat(offsets, nchunk) + _concat_aranges(nchunk) * FRAG_TOKENS
        )
        return pd.DataFrame(
            {
                "conv_id": np.repeat(batch["conv_id"].to_numpy(), nchunk),
                "turn_idx": np.repeat(batch["turn_idx"].to_numpy(), nchunk),
                "frag": _frag_fps(flat, starts),
            }
        )

    hits = hash_join(
        transcripts_ds.map_batches(explode_turns, batch_format="pandas"),
        unique_fragment_docs(documents_ds),
        on="frag",
        how="inner",
    )

    def modal_part(part: pd.DataFrame) -> pd.DataFrame:
        votes = (
            part.groupby(["conv_id", "turn_idx", "doc_id"], sort=False)
            .size()
            .reset_index(name="n_votes")
        )
        g = votes.groupby(["conv_id", "turn_idx"], sort=False)["n_votes"]
        is_max = votes["n_votes"] == g.transform("max")
        top = votes[is_max]
        # ties dropped: keep turns whose max is achieved by exactly one doc
        solo = (
            top.groupby(["conv_id", "turn_idx"], sort=False)["doc_id"]
            .transform("size")
            == 1
        )
        out = top[solo]
        return pd.DataFrame(
            {
                "conv_id": out["conv_id"].to_numpy(),
                "turn_idx": out["turn_idx"].astype(np.int32).to_numpy(),
                "page_doc": out["doc_id"].astype(np.int64).to_numpy(),
                "n_votes": out["n_votes"].astype(np.int64).to_numpy(),
            }
        )

    return map_partitions_by_key(
        hits.select_columns(["conv_id", "turn_idx", "doc_id"]),
        keys=["conv_id", "turn_idx"],
        fn=modal_part,
    )
