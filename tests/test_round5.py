"""Round-2 final additions: BM25 retrieval, nearest-centroid clustering
assignment, PII redaction."""

import numpy as np
import pandas as pd

from tests.test_round3 import _cmp as _cmp_ds


def _cmp(res, duck, sql, sort_cols):
    if isinstance(res, pd.DataFrame):
        class _Wrap:
            def __init__(self, df):
                self._df = df

            def to_pandas(self):
                return self._df

        res = _Wrap(res)
    return _cmp_ds(res, duck, sql, sort_cols)


def test_bm25_search_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["bm25_search"](sf_dir),
        duck,
        sql_ops.BM25_SEARCH_SQL,
        ["rank"],
    )


def test_bm25_scores_positive_and_ranked(ray_session, sf_dir):
    from scripts_ray import queries

    got = queries.QUERIES["bm25_search"](sf_dir)
    assert (got["score_micro"] > 0).all()
    assert (got["score_micro"].diff().dropna() <= 0).all()  # non-increasing
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_kmeans_assign_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["kmeans_assign"](sf_dir),
        duck,
        sql_ops.KMEANS_ASSIGN_SQL,
        ["vec_id"],
    )


def test_kmeans_seeds_self_assign(ray_session, sf_dir):
    """Every seed vector must land in its own cluster (cos(self)=1)."""
    from scripts_ray import queries
    from scripts_ray.ops.retrieval import KMEANS_N_SEEDS

    got = queries.QUERIES["kmeans_assign"](sf_dir).to_pandas()
    seeds = got[got["vec_id"] < KMEANS_N_SEEDS]
    assert (seeds["cluster"] == seeds["vec_id"]).all()
    # every cluster id is a seed id
    assert set(got["cluster"]) <= set(range(KMEANS_N_SEEDS))


def test_pii_scrub_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["pii_scrub"](sf_dir),
        duck,
        sql_ops.PII_SCRUB_SQL,
        ["doc_id"],
    )


def test_pii_scrub_removes_all_pii(ray_session, sf_dir):
    from scripts_ray import queries
    from scripts_ray.ops.textstats import PII_EMAIL_RE, PII_PHONE_RE

    got = queries.QUERIES["pii_scrub"](sf_dir).to_pandas()
    assert (got["n_emails"] >= 1).all()
    assert (got["n_phones"] >= 1).all()
    assert not got["scrubbed"].str.contains(PII_EMAIL_RE, regex=True).any()
    assert not got["scrubbed"].str.contains(PII_PHONE_RE, regex=True).any()
    assert got["scrubbed"].str.contains("<EMAIL>", regex=False).all()
    assert got["scrubbed"].str.contains("<PHONE>", regex=False).all()


def test_dup_spans_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["dup_spans"](sf_dir),
        duck,
        sql_ops.DUP_SPANS_SQL,
        ["doc_id", "span_start"],
    )


def test_dup_spans_disjoint_and_wide_enough(ray_session, sf_dir):
    """Per doc: spans sorted, pairwise disjoint with a real gap (adjacent
    coverage would have merged), each at least one shingle window wide."""
    from scripts_ray import queries
    from scripts_ray.ops.dedup import DUPSPAN_W

    got = (
        queries.QUERIES["dup_spans"](sf_dir)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
    )
    assert (got["span_end"] - got["span_start"] >= DUPSPAN_W).all()
    prev_end = got.groupby("doc_id")["span_end"].shift()
    gap_ok = got["span_start"] > prev_end
    assert gap_ok[prev_end.notna()].all()


def test_dup_spans_planted_duplicate_covers_whole_doc(ray_session):
    """Two identical synthetic docs must be fully covered by one span."""
    import ray.data as rd

    from scripts_ray.ops.dedup import dup_spans

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ds = rd.from_pandas(
        __import__("pandas").DataFrame(
            {"doc_id": [1, 2, 3], "text": [text, text, "one two three"]}
        )
    )
    got = dup_spans(ds, num_partitions=4).to_pandas()
    full = got[got["doc_id"].isin([1, 2])]
    assert len(full) == 2
    assert (full["span_start"] == 0).all()
    assert (full["span_end"] == 10).all()  # 10 tokens, 8 shingles, 0..7+3
    assert 3 not in set(got["doc_id"])


def test_incremental_dedup_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["incremental_dedup"](sf_dir),
        duck,
        sql_ops.INCREMENTAL_DEDUP_SQL,
        ["doc_id"],
    )


def test_fp_index_snapshot_restore(ray_session, sf_dir, tmp_path):
    """A restored index filters identically to the live one, and the
    planted re-deliveries are dropped by the index (real hits)."""
    import ray.data as rd

    from scripts_ray.state import fp_index

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    idx = fp_index.FpIndex(n_shards=4)
    n = fp_index.build(idx, docs)
    assert idx.size() == n  # all docs unique in the fixture

    snap = str(tmp_path / "fp_snap")
    idx.snapshot(snap)
    idx2 = fp_index.FpIndex(n_shards=4)
    idx2.restore(snap)
    assert idx2.size() == idx.size()

    # every already-ingested doc is dropped; unseen text survives
    assert fp_index.filter_new(idx2, docs).count() == 0
    import pandas as pd

    fresh = rd.from_pandas(
        pd.DataFrame({"doc_id": [10**9], "text": ["never seen before text"]})
    )
    assert fp_index.filter_new(idx2, fresh).count() == 1


def test_quality_buckets_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["quality_buckets"](sf_dir),
        duck,
        sql_ops.QUALITY_BUCKETS_SQL,
        ["doc_id"],
    )


def test_quality_buckets_are_deciles(ray_session, sf_dir):
    """Each bucket holds ~10% of docs (exact-rank boundaries: no bucket
    may exceed a decile by more than the tie mass)."""
    from scripts_ray import queries

    got = queries.QUERIES["quality_buckets"](sf_dir).to_pandas()
    counts = got["bucket"].value_counts()
    assert set(counts.index) <= set(range(10))
    assert counts.max() <= len(got) * 0.2  # generous tie allowance


def test_source_overlap_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["source_overlap"](sf_dir),
        duck,
        sql_ops.SOURCE_OVERLAP_SQL,
        ["src_a", "src_b"],
    )


def test_source_overlap_symmetric_construction(ray_session, sf_dir):
    from scripts_ray import queries

    got = queries.QUERIES["source_overlap"](sf_dir).to_pandas()
    assert (got["src_a"] < got["src_b"]).all()
    assert (got["n_shared"] >= 1).all()


def test_span_cut_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["span_cut"](sf_dir),
        duck,
        sql_ops.SPAN_CUT_SQL,
        ["doc_id"],
    )


def test_span_cut_consistent_with_dup_spans(ray_session, sf_dir):
    """Tokens cut per doc == tokens covered by that doc's merged spans."""
    from scripts_ray import queries

    cut = queries.QUERIES["span_cut"](sf_dir).to_pandas().set_index("doc_id")
    spans = queries.QUERIES["dup_spans"](sf_dir).to_pandas()
    spans["w"] = spans["span_end"] - spans["span_start"]
    per_doc = spans.groupby("doc_id")["w"].sum()
    for doc_id, w in per_doc.items():
        assert cut.loc[doc_id, "n_cut"] == w
    no_span = cut.index.difference(per_doc.index)
    assert (cut.loc[no_span, "n_cut"] == 0).all()


def test_span_cut_identical_docs_fully_cut(ray_session):
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.dedup import span_cut

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [text, text, "one two three"]})
    got = (
        span_cut(lambda: rd.from_pandas(df), num_partitions=4)
        .to_pandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "kept_text"] == "" and got.loc[2, "n_cut"] == 10
    assert got.loc[3, "kept_text"] == "one two three"
    assert got.loc[3, "n_cut"] == 0


def test_hll_grouped_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["hll_users_by_type"](sf_dir),
        duck,
        sql_ops.HLL_USERS_BY_TYPE_SQL,
        ["event_type", "register"],
    )


def test_hll_grouped_estimates_near_exact(ray_session, sf_dir, duck):
    """Per-group estimate within 3 sigma (~3*13% at p=6) of the exact
    distinct count for every event_type."""
    from scripts_ray import queries
    from scripts_ray.ops.sketch import hll_estimate

    regs = queries.QUERIES["hll_users_by_type"](sf_dir).to_pandas()
    exact = dict(
        duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    for etype, g in regs.groupby("event_type"):
        est = hll_estimate(g[["register", "rho_max"]])
        assert abs(est - exact[etype]) / exact[etype] < 0.4


def test_ann_ivf_fixed_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["ann_ivf_fixed"](sf_dir),
        duck,
        sql_ops.ANN_IVF_FIXED_SQL,
        ["query_id", "rank"],
    )


def test_ann_ivf_fixed_is_truly_approximate(ray_session, sf_dir, duck):
    """nprobe=4/16 must NOT degenerate to the exact scan (else the oracle
    proves nothing about probe pruning) and must still keep high recall."""
    from scripts_ray import sql_ops

    ivf = set(map(tuple, duck.execute(sql_ops.ANN_IVF_FIXED_SQL).fetchall()))
    exact = set(map(tuple, duck.execute(sql_ops.ANN_COSINE_SQL).fetchall()))
    overlap = len(ivf & exact) / len(exact)
    assert overlap < 1.0  # pruning really dropped some exact neighbors
    assert overlap >= 0.6


def test_semdedup_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["semdedup"](sf_dir),
        duck,
        sql_ops.SEMDEDUP_SQL,
        ["vec_id"],
    )


def test_semdedup_drops_subset_of_allpairs(ray_session, sf_dir):
    """Every semdedup drop must be witnessed by an all-pairs near-dup pair
    at the same threshold (cluster pruning only ever PRUNES the pair set),
    and the witness is always a lower id."""
    from scripts_ray import queries

    sem = queries.QUERIES["semdedup"](sf_dir).to_pandas()
    allp = queries.QUERIES["near_dup_embedding"](sf_dir).to_pandas()
    pairs = set(zip(allp["vec_a"], allp["vec_b"]))
    assert len(sem) > 0
    assert (sem["witness_id"] < sem["vec_id"]).all()
    for r in sem.itertuples():
        assert (r.witness_id, r.vec_id) in pairs


def test_audio_chunks_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["audio_chunks"](sf_dir),
        duck,
        sql_ops.AUDIO_CHUNKS_SQL,
        ["item_id", "chunk_idx"],
    )


def test_audio_chunks_overlap_geometry(ray_session, sf_dir):
    """Consecutive chunks overlap by win-hop bytes and chunk bytes match
    the declared [start, end) bounds."""
    from scripts_ray import queries
    from scripts_ray.ops import multimodal as mm

    got = (
        mm.chunk_audio(
            mm.docs_as_payloads(
                queries._read(sf_dir, "documents", columns=["doc_id", "text"])
            )
        )
        .to_pandas()
        .sort_values(["item_id", "chunk_idx"])
    )
    assert (got["end_byte"] - got["start_byte"] <= mm.AUDIO_WIN_BYTES).all()
    assert (got["chunk"].str.len() == got["end_byte"] - got["start_byte"]).all()
    multi = got.groupby("item_id").filter(lambda g: len(g) > 1)
    assert len(multi) > 0  # the fixture must exercise the overlap path
    for _, one in multi.groupby("item_id"):
        starts = one["start_byte"].to_numpy()
        assert (np.diff(starts) == mm.AUDIO_HOP_BYTES).all()
        # overlap: next chunk starts before the previous one ends
        assert (starts[1:] < one["end_byte"].to_numpy()[:-1]).all()


def test_semdedup_blockwise_matches_single_block(ray_session, sf_dir, monkeypatch):
    """Shrinking the pairwise block budget (forcing many column blocks per
    cluster) must not change the result."""
    from scripts_ray import queries
    from scripts_ray.ops import similarity

    base = (
        queries.QUERIES["semdedup"](sf_dir)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(similarity, "_PRUNE_BLOCK_ELEMS", 16)
    small = (
        queries.QUERIES["semdedup"](sf_dir)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert base.equals(small)


def test_domain_stats_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["domain_stats"](sf_dir),
        duck,
        sql_ops.DOMAIN_STATS_SQL,
        ["domain"],
    )


def test_domain_stats_blocklist_membership(ray_session, sf_dir):
    """Exactly the broadcast-blocklisted domains are flagged, and counts
    sum to the corpus size (every doc has exactly one planted domain)."""
    import duckdb

    from scripts_ray import queries
    from scripts_ray.ops.textstats import default_blocklist

    got = queries.QUERIES["domain_stats"](sf_dir).to_pandas()
    flagged = set(got.loc[got["blocked"] == 1, "domain"])
    assert flagged == set(default_blocklist()) & set(got["domain"])
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert got["n_docs"].sum() == n_docs


def test_dsir_select_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["dsir_select"](sf_dir),
        duck,
        sql_ops.DSIR_SELECT_SQL,
        ["rank"],
    )


def test_dsir_select_enriches_target_domain(ray_session, sf_dir, duck):
    """The top-k must hold MORE target-source docs than the uniform-source
    baseline (sources are uniform in the fixture, 20 sources -> 5%)."""
    from scripts_ray import queries
    from scripts_ray.ops.retrieval import DSIR_TARGET_SOURCE

    got = queries.QUERIES["dsir_select"](sf_dir).reset_index(drop=True)
    src = dict(
        duck.execute("SELECT doc_id, source FROM documents").fetchall()
    )
    n_target = sum(src[d] == DSIR_TARGET_SOURCE for d in got["doc_id"])
    n_sources = len(set(src.values()))
    baseline = len(got) / n_sources
    assert n_target > baseline


def test_bloom_vocab_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["bloom_vocab"](sf_dir),
        duck,
        sql_ops.BLOOM_VOCAB_SQL,
        ["bit_idx"],
    )


def test_bloom_no_false_negatives_and_low_fp(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops
    from scripts_ray.ops.sketch import bloom_contains

    bits = set(
        queries.QUERIES["bloom_vocab"](sf_dir).to_pandas()["bit_idx"]
    )
    vocab = [
        r[0]
        for r in duck.execute(
            f"SELECT DISTINCT unnest({sql_ops._DOC_TOKS}) FROM documents"
        ).fetchall()
        if r[0]
    ]
    assert bloom_contains(bits, np.array(vocab, dtype=object)).all()
    probes = np.array([f"zqxv{i}never" for i in range(500)], dtype=object)
    fp = bloom_contains(bits, probes).mean()
    assert fp < 0.05  # fill is <1% at fixture scale; k=4 probes


def test_cms_by_source_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["cms_by_source"](sf_dir),
        duck,
        sql_ops.CMS_BY_SOURCE_SQL,
        ["source", "row", "col"],
    )


def test_cms_grouped_sums_to_global(ray_session, sf_dir):
    """Counter-wise SUM over groups must equal the global sketch — the
    mergeability property the keyed form exists for."""
    from scripts_ray import queries

    grouped = (
        queries.QUERIES["cms_by_source"](sf_dir)
        .to_pandas()
        .groupby(["row", "col"], as_index=False)["n"]
        .sum()
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    global_ = (
        queries.QUERIES["cms_words"](sf_dir)
        .to_pandas()
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    assert grouped.astype("int64").equals(global_[["row", "col", "n"]].astype("int64"))
