"""BPE trainer/encoder (ops/bpe): distributed-vs-local training equality,
the textbook merge sequence on a known corpus, and encoder invariants."""

import numpy as np
import pyarrow as pa
import pytest

from scripts_ray.ops.bpe import (
    BpeEncoder,
    bpe_encode_word,
    bpe_train,
    bpe_train_from_counts,
)


def test_textbook_merge_sequence():
    # the classic low/lower/newest/widest example (Sennrich et al. 2016):
    # 'es' and then 'est' dominate because newest+widest = 11 occurrences
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 5}
    merges = bpe_train_from_counts(counts, 3)
    assert merges[0] == ("e", "s")          # 11
    assert merges[1] == ("es", "t")         # 11
    assert merges[2] == ("l", "o")          # 7
    assert bpe_encode_word("newest", {p: i for i, p in enumerate(merges)}) == [
        "n", "e", "w", "est"
    ]


def test_encode_round_trip_and_monotonicity():
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 5}
    merges = bpe_train_from_counts(counts, 6)
    for w in list(counts) + ["lowest", "news", "zzz"]:
        for t in range(len(merges) + 1):
            ranks = {p: i for i, p in enumerate(merges[:t])}
            pieces = bpe_encode_word(w, ranks)
            assert "".join(pieces) == w  # lossless
        # more merges never increase the piece count
        ns = [
            len(bpe_encode_word(w, {p: i for i, p in enumerate(merges[:t])}))
            for t in range(len(merges) + 1)
        ]
        assert all(b <= a for a, b in zip(ns, ns[1:]))


def test_distributed_training_matches_local(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from scripts_ray.tokens import explode

    rng = np.random.default_rng(5)
    vocab = ["spark", "sparse", "sparkle", "low", "lower", "stream", "street"]
    texts = [" ".join(rng.choice(vocab, 12)) for _ in range(400)]
    t = pa.table({"doc_id": pa.array(range(400), type=pa.int64()),
                  "text": pa.array(texts)})
    path = str(tmp_path / "docs.parquet")
    pq.write_table(t, path)

    got = bpe_train(rd.read_parquet(path), n_merges=8)

    _, toks = explode(t["text"].combine_chunks())
    vals, cnts = np.unique(toks, return_counts=True)
    exp = bpe_train_from_counts(dict(zip(vals.tolist(), cnts.tolist())), 8)
    assert got == exp  # deterministic tie rule -> exact merge-list equality


def test_encoder_stage_counts(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["newest widest", "low lower", ""]),
        }
    )
    path = str(tmp_path / "enc.parquet")
    pq.write_table(t, path)
    merges = bpe_train_from_counts(
        {"low": 5, "lower": 2, "newest": 6, "widest": 5}, 3
    )
    out = (
        rd.read_parquet(path)
        .map_batches(
            BpeEncoder,
            fn_constructor_args=(ray.put(merges),),
            concurrency=(1, 2),
            batch_format="pyarrow",
        )
        .to_pandas()
        .set_index("doc_id")["n_bpe"]
    )
    ranks = {p: i for i, p in enumerate(merges)}
    assert out[0] == len(bpe_encode_word("newest", ranks)) + len(
        bpe_encode_word("widest", ranks)
    )
    assert out[2] == 0


def test_pinned_replace_chain_oracle_matches_encoder():
    # the bpe_budgets_fixed soundness claim, checked exhaustively over a
    # synthetic closure vocabulary: the DuckDB rank-ordered replace()
    # chain over '<sym>'-wrapped characters == the iterative
    # lowest-rank-first encoder, for the pinned merge table.
    import duckdb

    from scripts_ray.ops.bpe import BPE_PINNED_MERGES
    from scripts_ray.sql_ops import _bpe_fixed_encode_expr

    ranks = {p: i for i, p in enumerate(BPE_PINNED_MERGES)}
    # every <=5-char word over the merge alphabet (worst-case interactions)
    alpha = sorted({c for p in BPE_PINNED_MERGES for c in (p[0] + p[1])})
    words = list(alpha)
    for _ in range(4):
        words += [w + c for w in words[-len(alpha) ** 3 :] for c in alpha]
    words = sorted(set(words))[:800] + ["stat", "atat", "rater", "stater"]

    con = duckdb.connect()
    sql = (
        "SELECT tok, length(s) - length(replace(s, '<', '')) AS n "
        f"FROM (SELECT unnest(?) AS tok) t, LATERAL (SELECT "
        f"{_bpe_fixed_encode_expr()} AS s) x"
    )
    for tok, n in con.execute(sql, [words]).fetchall():
        assert n == len(bpe_encode_word(tok, ranks)), tok
