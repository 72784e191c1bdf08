"""Round 11 (round-5 session): incremental MinHash-LSH delivery dedup.

VERDICT r4 "Missing" #4: state/fp_index covers exact incremental dedup;
near-dup re-runs LSH over v1+v2 per delivery. state/lsh_index.py closes
it: persistent band buckets + verification blobs in a hash-sharded actor
pool. These tests pin:

- planted NEAR-dup re-deliveries (perturbed copies, not exact) are
  caught against the persisted index and exact-verified;
- the incremental probe equals an OFFLINE two-corpus LSH+verify run
  restricted to cross pairs (same hasher, same threshold);
- snapshot -> restore into a fresh actor pool reproduces the probe
  byte-for-byte (the resume path);
- filter_new drops exactly the delivery's near-dup rows.
"""

import numpy as np
import pandas as pd
import pytest


def _mk_docs(texts, start_id=0):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(start_id, start_id + len(texts), dtype=np.int64),
             "text": texts}
        )
    )


@pytest.fixture(scope="module")
def corpora(ray_session):
    """v1: 40 distinct docs. delivery: 10 fresh docs + 5 planted near-dups
    of v1 docs (2 of ~40 tokens perturbed -> token-set Jaccard ~0.9) + 1
    exact copy. Token streams are deterministic."""
    import itertools

    rng = np.random.default_rng(77)
    # letters only: digits are token separators in the engine's tokenizer
    vocab = np.array(
        ["".join(c) for c in itertools.product("abcdefgh", repeat=3)][:400],
        dtype=object,
    )

    def doc(r):
        return " ".join(r.choice(vocab, size=40, replace=False))

    v1 = [doc(rng) for _ in range(40)]
    fresh = [doc(rng) for _ in range(10)]
    planted = []
    for i in range(5):
        toks = v1[i * 3].split()
        toks[5], toks[17] = "zzqa", "zzqb"  # 2/40 tokens perturbed
        planted.append(" ".join(toks))
    exact = [v1[20]]
    return v1, fresh + planted + exact


def _build(v1_ds):
    from scripts_ray.state import lsh_index

    idx = lsh_index.LshIndex(n_shards=3)
    n = lsh_index.build(idx, v1_ds)
    return idx, n


def test_planted_near_dups_caught(ray_session, corpora):
    from scripts_ray.state import lsh_index

    v1, delivery = corpora
    idx, n = _build(_mk_docs(v1))
    assert n == len(v1)
    pairs = lsh_index.probe_pairs(idx, _mk_docs(delivery, start_id=1000)).to_pandas()
    # the 5 perturbed docs (ids 1010..1014) and the exact copy (1015) must
    # each match their source; the 10 fresh docs must match nothing
    assert set(pairs["doc_new"]) == set(range(1010, 1016))
    for i in range(5):
        assert (pairs["doc_new"] == 1010 + i).any()
        src = pairs.loc[pairs["doc_new"] == 1010 + i, "doc_old"]
        assert (src == i * 3).any()
    ex = pairs[pairs["doc_new"] == 1015]
    assert (ex["inter"] == ex["uni"]).any()  # exact copy: J == 1


def test_incremental_equals_offline_two_corpus_run(ray_session, corpora):
    """The scale claim: probing persisted state == re-running the batch
    LSH+verify over v1 ∪ delivery and keeping only cross pairs."""
    from scripts_ray.ops import dedup
    from scripts_ray.state import lsh_index

    v1, delivery = corpora
    idx, _ = _build(_mk_docs(v1))
    inc = lsh_index.probe_pairs(idx, _mk_docs(delivery, start_id=1000)).to_pandas()

    union = _mk_docs(v1).union(_mk_docs(delivery, start_id=1000))
    hasher = dedup.MinHasher(**dedup.VERIFY_HASHER_KWARGS)
    off = dedup.verify_pairs_exact(
        dedup.minhash_candidates(union, hasher, shingle_n=1),
        dedup.doc_token_hash_sets(
            _mk_docs(v1).union(_mk_docs(delivery, start_id=1000))
        ),
        dedup.doc_token_hash_sets(
            _mk_docs(v1).union(_mk_docs(delivery, start_id=1000))
        ),
    ).to_pandas()
    cross = off[(off["doc_a"] < 1000) != (off["doc_b"] < 1000)]
    # canonicalize to (new, old)
    new = np.where(cross["doc_a"] >= 1000, cross["doc_a"], cross["doc_b"])
    old = np.where(cross["doc_a"] >= 1000, cross["doc_b"], cross["doc_a"])
    off_norm = (
        pd.DataFrame(
            {"doc_new": new, "doc_old": old,
             "inter": cross["inter"].to_numpy(),
             "uni": cross["uni"].to_numpy()}
        )
        .sort_values(["doc_new", "doc_old"])
        .reset_index(drop=True)
    )
    inc_norm = inc.sort_values(["doc_new", "doc_old"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        inc_norm.astype("int64"), off_norm.astype("int64")
    )


def test_snapshot_restore_roundtrip(ray_session, corpora, tmp_path):
    from scripts_ray.state import lsh_index

    v1, delivery = corpora
    idx, _ = _build(_mk_docs(v1))
    before = (
        lsh_index.probe_pairs(idx, _mk_docs(delivery, start_id=1000))
        .to_pandas()
        .sort_values(["doc_new", "doc_old"])
        .reset_index(drop=True)
    )
    snap = str(tmp_path / "lsh_snap")
    idx.snapshot(snap)

    idx2 = lsh_index.LshIndex(n_shards=3)  # fresh actors, no state
    idx2.restore(snap)
    assert idx2.counts() == idx.counts()
    after = (
        lsh_index.probe_pairs(idx2, _mk_docs(delivery, start_id=1000))
        .to_pandas()
        .sort_values(["doc_new", "doc_old"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(before, after)


def test_filter_new_drops_exactly_the_dups(ray_session, corpora):
    from scripts_ray.state import lsh_index

    v1, delivery = corpora
    idx, _ = _build(_mk_docs(v1))
    kept = lsh_index.filter_new(
        idx, _mk_docs(delivery, start_id=1000)
    ).to_pandas()
    assert sorted(kept["doc_id"]) == list(range(1000, 1010))  # fresh only
    assert set(kept.columns) == {"doc_id", "text"}


def test_hot_bucket_stress(ray_session):
    """Degenerate corpus: 10k IDENTICAL docs collapse into ONE bucket per
    band. A 10-doc identical delivery must still probe correctly — every
    (new, old) pair is a verified exact duplicate (10 × 10k = 100k pairs,
    J = 1) and the quadratic fan-out is the ANSWER, not a failure. Pins
    the documented hot-bucket behavior (pre-exact-dedup is the production
    mitigation, module docstring)."""
    import numpy as np

    from scripts_ray.state import lsh_index

    text = "alpha beta gamma delta epsilon zeta eta theta"
    n_old, n_new = 10_000, 10
    idx = lsh_index.LshIndex(n_shards=3)
    lsh_index.build(idx, _mk_docs([text] * n_old))
    n_buckets, n_blobs = idx.counts()
    assert n_blobs == n_old
    assert n_buckets == idx.hasher.bands  # ONE bucket per band

    pairs = lsh_index.probe_pairs(idx, _mk_docs([text] * n_new, start_id=10**6)).to_pandas()
    assert len(pairs) == n_old * n_new
    assert (pairs["inter"] == pairs["uni"]).all()  # all exact dups
    assert pairs["doc_new"].nunique() == n_new
    assert pairs["doc_old"].nunique() == n_old


def _arm_fault():
    from scripts_ray.faults import FAULT_FILE

    with open(FAULT_FILE, "w") as f:
        f.write("armed")


def test_probe_retry_determinism(ray_session, corpora):
    """Kill one worker mid-probe (fail-once chaos hook): Ray retries the
    task; the probe is a pure read against the shard actors, so the
    output must be byte-identical to a clean run."""
    import os

    from scripts_ray.faults import FAULT_FILE
    from scripts_ray.state import lsh_index

    v1, delivery = corpora
    idx, _ = _build(_mk_docs(v1))
    clean = (
        lsh_index.probe_pairs(idx, _mk_docs(delivery, start_id=1000).repartition(4))
        .to_pandas()
        .sort_values(["doc_new", "doc_old"])
        .reset_index(drop=True)
    )
    _arm_fault()
    try:
        chaos = (
            lsh_index.probe_pairs(
                idx, _mk_docs(delivery, start_id=1000).repartition(4)
            )
            .to_pandas()
            .sort_values(["doc_new", "doc_old"])
            .reset_index(drop=True)
        )
    finally:
        if os.path.exists(FAULT_FILE):
            os.unlink(FAULT_FILE)
    pd.testing.assert_frame_equal(clean, chaos)


def test_build_retry_determinism(ray_session, corpora):
    """Kill one worker mid-BUILD: the retried batch re-issues its
    idempotent set-semantics inserts, so a probe against the chaos-built
    index equals a probe against a cleanly built one."""
    import os

    from scripts_ray.faults import FAULT_FILE
    from scripts_ray.state import lsh_index

    v1, delivery = corpora
    idx_clean, _ = _build(_mk_docs(v1))
    clean = (
        lsh_index.probe_pairs(idx_clean, _mk_docs(delivery, start_id=1000))
        .to_pandas()
        .sort_values(["doc_new", "doc_old"])
        .reset_index(drop=True)
    )
    _arm_fault()
    try:
        idx_chaos = lsh_index.LshIndex(n_shards=3)
        lsh_index.build(idx_chaos, _mk_docs(v1).repartition(4))
    finally:
        if os.path.exists(FAULT_FILE):
            os.unlink(FAULT_FILE)
    assert idx_chaos.counts() == idx_clean.counts()
    chaos = (
        lsh_index.probe_pairs(idx_chaos, _mk_docs(delivery, start_id=1000))
        .to_pandas()
        .sort_values(["doc_new", "doc_old"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(clean, chaos)


def test_build_is_idempotent(ray_session, corpora):
    """Set-semantics inserts: re-ingesting v1 must not change the probe
    (at-least-once delivery of build batches is safe)."""
    from scripts_ray.state import lsh_index

    v1, delivery = corpora
    idx, _ = _build(_mk_docs(v1))
    one = (
        lsh_index.probe_pairs(idx, _mk_docs(delivery, start_id=1000))
        .to_pandas()
        .sort_values(["doc_new", "doc_old"])
        .reset_index(drop=True)
    )
    lsh_index.build(idx, _mk_docs(v1))  # re-deliver the whole corpus
    two = (
        lsh_index.probe_pairs(idx, _mk_docs(delivery, start_id=1000))
        .to_pandas()
        .sort_values(["doc_new", "doc_old"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, two)
