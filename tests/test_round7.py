"""Round-3 continuation: Gopher rule battery, corpus line dedup."""

import numpy as np
import pandas as pd


def test_gopher_gate_drops_planted_spam(ray_session, sf_dir):
    """The planted artifacts must flip the gate: symbol-spam docs fail the
    hash/ellipsis ratio, digit-run docs fail the alphabetic share, and
    unplanted docs overwhelmingly keep — i.e. the rules are a real filter,
    not a constant column."""
    from scripts_ray.ops import textstats as T
    from scripts_ray.queries import QUERIES

    df = QUERIES["gopher_quality"](sf_dir).to_pandas()
    spam = df["doc_id"] % T.GOPHER_SPAM_EVERY == 0
    digit = (df["doc_id"] % T.GOPHER_DIGIT_EVERY == 0) & ~spam
    clean = ~spam & ~digit

    assert spam.any() and digit.any()
    # symbol spam fails the symbol rule specifically
    assert (
        df.loc[spam, "symbol_permille"] >= T.GOPHER_MAX_SYMBOL_PERMILLE
    ).all()
    assert not df.loc[spam, "keep"].any()
    # digit runs depress the alphabetic share (hard drop only on short docs,
    # so assert the signal moved, and that at least one such doc dropped)
    assert (
        df.loc[digit, "alpha_permille"].max()
        < df.loc[clean, "alpha_permille"].min()
    )
    # clean docs pass in the majority, and every clean drop is explained
    # by exactly one rule — too few stop-word hits (the only signal the
    # uniform synthetic prose can fail)
    assert df.loc[clean, "keep"].mean() > 0.6
    clean_drops = df.loc[clean & ~df["keep"]]
    assert (clean_drops["n_stop"] < T.GOPHER_MIN_STOP_HITS).all()
    kept = df.loc[clean & df["keep"]]
    assert (kept["n_stop"] >= T.GOPHER_MIN_STOP_HITS).all()


def test_line_dedup_keeps_each_boilerplate_line_once(ray_session, sf_dir):
    """Corpus-wide: every planted header/footer line survives exactly once,
    owned by the lowest (doc_id, line_idx) occurrence; body lines (unique
    random prose) all survive, so n_kept == n_lines - lost boilerplate."""
    from scripts_ray.ops import dedup as D
    from scripts_ray.queries import QUERIES

    df = QUERIES["line_dedup"](sf_dir).to_pandas().sort_values("doc_id")
    all_lines = []
    for _, r in df.iterrows():
        for i, ln in enumerate(r["text_dedup"].split("\n")):
            all_lines.append((r["doc_id"], ln))
    lines = pd.DataFrame(all_lines, columns=["doc_id", "line"])

    boiler = set(D.LINE_HEADERS) | set(D.LINE_FOOTERS)
    b = lines[lines["line"].isin(boiler)]
    counts = b.groupby("line").size()
    # each planted line appears exactly once in the deduplicated corpus
    assert (counts == 1).all()
    assert len(counts) == len(boiler & set(lines["line"]))
    # the survivor is the lowest doc_id bearing that line class
    doc_ids = df["doc_id"].to_numpy()
    for i, h in enumerate(D.LINE_HEADERS):
        owners = doc_ids[doc_ids % len(D.LINE_HEADERS) == i]
        if h in set(b["line"]):
            assert b.loc[b["line"] == h, "doc_id"].iloc[0] == owners.min()
    # global conservation: kept lines == corpus-distinct derived lines
    # (short trailing body chunks genuinely collide across docs too, so
    # losses are NOT limited to the planted boilerplate)
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    derived = D._derive_lines(docs)
    assert df["n_kept"].sum() == derived["line"].nunique()
    assert (df["n_kept"] <= df["n_lines"]).all()
    # docs absent from the output lost every line to earlier occurrences
    lost_all = set(docs["doc_id"]) - set(df["doc_id"])
    if lost_all:
        dup_counts = derived.groupby("line").size()
        gone = derived[derived["doc_id"].isin(lost_all)]
        # every line of a vanished doc is genuinely duplicated corpus-wide
        assert (dup_counts[gone["line"]] > 1).all()


def test_pq_codes_compress_and_adc_approximates(ray_session, sf_dir):
    """PQ semantic checks: every vector gets one code per subspace in
    [0, PQ_K); pinned training rows (vec_id < PQ_K) encode sub-exactly to
    themselves (distance 0 to their own sub-vector => code == vec_id); and
    ADC retrieval overlaps the exact scan (measured 0.22 recall@5 at this
    scale for 8x16 PQ on random data — the RANKING itself is value-checked
    in SQL, so the floor here only guards against structural regressions)."""
    import numpy as np

    from scripts_ray.ops import similarity as S
    from scripts_ray.queries import QUERIES

    codes = QUERIES["pq_codes"](sf_dir).to_pandas()
    assert codes["code"].between(0, S.PQ_K - 1).all()
    assert codes.groupby("vec_id").size().eq(S.PQ_SUBS).all()
    pinned = codes[codes["vec_id"] < S.PQ_K]
    assert (pinned["code"] == pinned["vec_id"]).all()

    pq = QUERIES["ann_pq"](sf_dir).to_pandas()
    ex = QUERIES["ann_cosine"](sf_dir).to_pandas()
    P = set(zip(pq["query_id"], pq["neighbor_id"]))
    E = set(zip(ex["query_id"], ex["neighbor_id"]))
    assert len(P & E) / len(E) >= 0.1


def test_salted_join_equals_plain_join_under_heavy_skew(ray_session):
    """One key owns half the probe side; salted_join must be row-identical
    to hash_join (and to a pandas merge) for every supported join type,
    and must reject 'outer'."""
    import numpy as np
    import pytest
    import ray.data as rd

    from scripts_ray.ops.hashagg import hash_join, salted_join

    rng = np.random.default_rng(7)
    n = 20_000
    keys = np.where(rng.random(n) < 0.5, 42, rng.integers(0, 500, n))
    left = pd.DataFrame({"k": keys.astype(np.int64),
                         "v": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k2": np.arange(0, 400, dtype=np.int64),
                          "w": np.arange(0, 400, dtype=np.int64) * 10})

    def norm(df):
        return (df.sort_values(list(df.columns))
                  .reset_index(drop=True).astype("int64"))

    for how in ("inner", "left", "semi", "anti"):
        got = salted_join(
            rd.from_pandas(left).repartition(8),
            rd.from_pandas(right).repartition(4),
            on="k", right_on="k2", how=how,
            hot_keys=(42,), salt=8,
        ).to_pandas()
        ref = hash_join(
            rd.from_pandas(left).repartition(8),
            rd.from_pandas(right).repartition(4),
            on="k", right_on="k2", how=how,
        ).to_pandas()
        if how == "left":
            got, ref = got.fillna(-1), ref.fillna(-1)
        assert norm(got).equals(norm(ref)), how
        if how == "inner":
            # the hot key actually joined (42 < 400 so it has a build row)
            assert (got["k"] == 42).sum() == (left["k"] == 42).sum()

    with pytest.raises(ValueError):
        salted_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", right_on="k2", how="outer", hot_keys=(42,))


def test_html_strip_recovers_prose_exactly(ray_session, sf_dir):
    """Extraction must recover exactly: title text + the original prose +
    decoded footer entities, with script content gone and a constant tag
    count from the planted skeleton."""
    import pyarrow.parquet as pq

    from scripts_ray.queries import QUERIES

    out = QUERIES["html_strip"](sf_dir).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    for _, r in docs.sample(20, random_state=1).iterrows():
        got = out.loc[r["doc_id"]]
        want = f"doc {r['doc_id']} {' '.join(r['text'].split())} & copyright <2026>"
        assert got["clean_text"] == want
        assert "var x" not in got["clean_text"]  # script content removed
    assert (out["n_tags"] == out["n_tags"].iloc[0]).all()  # fixed skeleton


def test_seq_pack_segments_tile_docs_and_sequences(ray_session, sf_dir):
    """Packing invariants: each document's segments cover [0, n_tok)
    contiguously in seq order; within a sequence, segments never overlap
    and stay inside [0, SEQ_LEN); no segment is empty."""
    import numpy as np

    from scripts_ray.ops.sampling import SEQ_LEN
    from scripts_ray.queries import QUERIES

    df = QUERIES["seq_pack"](sf_dir).to_pandas()
    assert (df["doc_end"] > df["doc_start"]).all()
    assert (df["seq_off"] >= 0).all()
    assert (df["seq_off"] + (df["doc_end"] - df["doc_start"]) <= SEQ_LEN).all()

    for doc_id, g in df.groupby("doc_id"):
        g = g.sort_values("seq_id")
        assert g["doc_start"].iloc[0] == 0
        assert (g["doc_start"].iloc[1:].to_numpy()
                == g["doc_end"].iloc[:-1].to_numpy()).all(), doc_id

    for seq_id, g in df.groupby("seq_id"):
        g = g.sort_values("seq_off")
        ends = g["seq_off"] + (g["doc_end"] - g["doc_start"])
        # consecutive segments are separated by exactly one EOD position
        # unless the cut fell on the document edge
        gaps = g["seq_off"].iloc[1:].to_numpy() - ends.iloc[:-1].to_numpy()
        assert (gaps >= 0).all() and (gaps <= 1).all(), seq_id


def test_pagerank_mass_and_hubs(ray_session, sf_dir):
    """Mass stays within floor-loss of N * (teleport + damp) and the
    planted hub nodes (in-degree concentrated by the non-invertible edge
    multiplier) outrank non-hubs."""
    import numpy as np

    from scripts_ray.ops import graph as G
    from scripts_ray.queries import QUERIES

    df = QUERIES["pagerank"](sf_dir).to_pandas()
    n = len(df)
    total = df["rank_micro"].sum()
    # teleport contributes exactly N*PR_TELEPORT; damped link mass is at
    # most N*(PR_INIT - PR_TELEPORT)-ish; just bound loosely both ways
    assert n * G.PR_TELEPORT <= total <= n * G.PR_INIT
    a = G.PR_EDGE_MULS[0][0]
    import math

    g = math.gcd(a, n)
    assert g > 1, "fixture N must make the first multiplier non-invertible"
    hubs = df["doc_id"] % g == 1 % g
    assert df.loc[hubs, "rank_micro"].mean() > 2 * df.loc[~hubs, "rank_micro"].mean()
    assert df["rank_micro"].nunique() > 10  # genuinely non-uniform


def test_rolling_agg_hand_case(ray_session):
    """Hand-built stream: rolling ROWS-frame sum/count per user; the frame
    never crosses into the previous user's rows even when the two users'
    rows are adjacent after the partition sort; negative values exercise
    the floor-toward-minus-infinity micro conversion."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.temporal import rolling_agg

    t0 = pd.Timestamp("2024-03-01 12:00:00")
    s = pd.Timedelta(seconds=1)
    # user 1: values 1..7 at increasing ts; user 2: two rows incl. negative
    rows = [
        dict(event_id=i, user_id=1, ts=t0 + i * s, value=float(i))
        for i in range(1, 8)
    ] + [
        dict(event_id=100, user_id=2, ts=t0, value=-1.5),
        dict(event_id=101, user_id=2, ts=t0 + s, value=2.25),
    ]
    out = (
        rolling_agg(rd.from_pandas(pd.DataFrame(rows)), window=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    u1 = out[out["user_id"] == 1]
    # window=3 rolling sums of 1..7: 1,3,6,9,12,15,18 (micro units)
    assert u1["roll_sum_micro"].tolist() == [
        v * 1_000_000 for v in [1, 3, 6, 9, 12, 15, 18]
    ]
    assert u1["n_win"].tolist() == [1, 2, 3, 3, 3, 3, 3]
    u2 = out[out["user_id"] == 2].reset_index(drop=True)
    # floor(-1.5e6) = -1500000 exactly; second row adds floor(2.25e6)
    assert u2["roll_sum_micro"].tolist() == [-1_500_000, 750_000]
    assert u2["n_win"].tolist() == [1, 2]  # never sees user 1's rows


def test_phrase_search_overlaps_and_boundaries(ray_session):
    """Overlapping occurrences ('a a a' contains 'a a' at pos 0 AND 1),
    phrase at exact doc start/end, punctuation-split tokens, and a doc
    with no hit — all against a hand-tokenized expectation."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.retrieval import phrase_search

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "go go go stop",          # 'go go' at 0 and 1
                "Go-go!",                 # punctuation splits: hit at 0
                "stop go",                # no consecutive 'go go'
                "end with go go",         # hit at exact end: pos 2
            ],
        }
    )
    out = (
        phrase_search(rd.from_pandas(df), phrase=("go", "go"))
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [
        (1, 0), (1, 1), (2, 0), (4, 2)
    ]


def test_inverted_index_consistency(ray_session, sf_dir):
    """df equals the postings-list length, postings are strictly
    increasing doc_ids, and a token's df matches an independent per-doc
    membership count."""
    from scripts_ray.queries import QUERIES

    out = QUERIES["inverted_index"](sf_dir).to_pandas()
    assert len(out) > 0 and out["tok"].is_unique
    for _, r in out.iterrows():
        ids = [int(x) for x in r["postings"].split(",")]
        assert len(ids) == r["df"]
        assert all(a < b for a, b in zip(ids, ids[1:]))


def test_fuzzy_title_pairs_planted_typos(ray_session):
    """Planted titles: a one-edit typo pair is found with dist=1, an exact
    duplicate with dist=0, a same-block pair beyond max_dist is rejected,
    and a near-identical pair in a DIFFERENT block is (by documented
    blocking design) not a candidate."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.fuzzy import fuzzy_title_pairs

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "alpha beta gamma delta tail words here",
                "alpha beta gamma delta other tail",        # exact key dup of 1
                "alpha beta gamma delte x",                 # 1 edit from 1/2
                "alpha completely different words",          # same block, far
                "alpho beta gamma delta y",                  # 1 edit but block 'alpho'
                "zeta eta theta iota",                       # unrelated block
            ],
        }
    )
    out = (
        fuzzy_title_pairs(rd.from_pandas(df))
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    got = {(int(a), int(b)): int(d)
           for a, b, d in out.itertuples(index=False)}
    assert got == {(1, 2): 0, (1, 3): 1, (2, 3): 1}


def test_pmi_planted_collocation(ray_session):
    """A planted always-together pair must out-lift a frequent pair of
    independently common words, and lift must equal the exact rational."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.textstats import pmi_bigrams

    # 30 docs: filler 'data table' style common words appear everywhere;
    # 'naxos drone' appears exactly together 6 times and nowhere apart
    filler = "data table data table data table"
    docs = [filler] * 24 + [f"{filler} naxos drone"] * 6
    out = (
        pmi_bigrams(
            rd.from_pandas(pd.DataFrame({"text": docs})), min_count=5, k=10
        )
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert out.loc[0, ["t1", "t2"]].tolist() == ["naxos", "drone"]
    n_total = 30 * 6 + 6 * 2  # filler tokens + planted tokens
    assert out.loc[0, "lift_micro"] == (1_000_000 * n_total * 6) // (6 * 6)
    # independent frequent pair has lift ~ N*c_ab/(c_a*c_b) far below
    assert out.loc[0, "lift_micro"] > 5 * out.loc[1, "lift_micro"]


def test_robust_outliers_planted(ray_session):
    """A planted extreme row is flagged; the MAD rule resists the outlier
    itself (unlike a z-score the plant would inflate)."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.quantiles import robust_outliers

    # group 'a': 20 values tightly around 100 (MAD=2), one plant at 1000
    vals = [98, 99, 100, 101, 102] * 4 + [1000]
    df = pd.DataFrame(
        {
            "doc_id": range(len(vals)),
            "source": ["a"] * len(vals),
            "n_chars": vals,
        }
    )
    out = robust_outliers(rd.from_pandas(df)).to_pandas()
    assert out["doc_id"].tolist() == [20]
    assert out.loc[0, "med"] == 100 and out.loc[0, "mad"] <= 2


def test_triangle_counts_vs_bruteforce(ray_session, sf_dir):
    """Engine per-vertex triangle counts equal an independent set-based
    enumeration of the same planted graph."""
    import pyarrow.parquet as pq

    from scripts_ray.queries import QUERIES

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    edges = set()
    for i in range(n):
        for a, b in ((10, 1), (13, 2)):
            d = (a * i + b) % n
            if d != i:
                edges.add((min(i, d), max(i, d)))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect: dict[int, int] = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:
                for v in (a, b, c):
                    expect[v] = expect.get(v, 0) + 1

    out = QUERIES["triangle_counts"](sf_dir).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["n_tri"].astype(int)))
    assert got == expect and len(got) > 0


def test_event_funnel_ordering(ray_session):
    """Order matters: a user with click BEFORE their first view does not
    advance; a full in-order chain reaches 3; anchor is the EARLIEST
    qualifying completion (a later view cannot resurrect a dead chain);
    purchase-only users appear with reached 0."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.temporal import event_funnel

    t0 = pd.Timestamp("2024-03-01 12:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: view, click, purchase in order -> 3
        (1, t0, "view"), (1, t0 + m, "click"), (1, t0 + 2 * m, "purchase"),
        # user 2: click before view, purchase after view but no click after -> 1
        (2, t0, "click"), (2, t0 + m, "view"), (2, t0 + 2 * m, "purchase"),
        # user 3: simultaneous view/click (strict >) -> 1
        (3, t0, "view"), (3, t0, "click"),
        # user 4: purchase only -> 0
        (4, t0, "purchase"),
        # user 5: view, click, purchase BETWEEN view and click -> 2
        (5, t0, "view"), (5, t0 + m, "purchase"), (5, t0 + 2 * m, "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    out = event_funnel(rd.from_pandas(df)).to_pandas()
    got = dict(zip(out["user_id"].astype(int), out["reached"].astype(int)))
    assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 2}


def test_bloom_semi_join_prunes_and_matches(ray_session):
    """Bloom pushdown result equals the plain semi join, and the map-side
    filter really prunes: with a tiny build set, far fewer probe rows
    survive the bloom than exist."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.hashagg import hash_join
    from scripts_ray.ops.sketch import bloom_lookup, bloom_semi_join, _bloom_positions

    rng_keys = np.arange(5000, dtype=np.int64)
    probe = pd.DataFrame({"k": rng_keys, "payload": rng_keys * 7})
    build = pd.DataFrame({"b": np.array([3, 44, 555, 4999], dtype=np.int64)})

    got = (
        bloom_semi_join(
            rd.from_pandas(probe), lambda: rd.from_pandas(build),
            probe_key="k", build_key="b",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        hash_join(rd.from_pandas(probe), rd.from_pandas(build),
                  on="k", right_on="b", how="semi")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["k"].tolist() == [3, 44, 555, 4999]

    # pruning power: bloom of 4 keys passes only a tiny fraction of 5000
    bits = np.unique(_bloom_positions(build["b"].to_numpy().astype(np.uint64)))
    lookup = bloom_lookup(bits)
    pos = _bloom_positions(rng_keys.astype(np.uint64)).astype(np.int64)
    survivors = int(lookup[pos].all(axis=1).sum())
    assert survivors < 50  # ~4 + false positives at (kn/m)^k rates


def test_mmr_matches_independent_greedy(ray_session, sf_dir):
    """Engine MMR equals a from-scratch numpy greedy on the same integer
    grid (candidate pool, tie rules, and all k steps)."""
    import numpy as np
    import pyarrow.parquet as pq

    from scripts_ray.ops.similarity import (
        MMR_CANDIDATES, MMR_K, _pq_quantize, _to_matrix,
    )
    from scripts_ray.queries import QUERIES

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    g = _pq_quantize(_to_matrix(t["embedding"].combine_chunks()))
    qg = g[ids == 0][0]
    rel = g @ qg
    pool = ids != 0
    # top-C candidates by (rel desc, vec_id asc)
    order = np.lexsort((ids[pool], -rel[pool]))
    cand_idx = np.flatnonzero(pool)[order][:MMR_CANDIDATES]
    crel, cids, cg = rel[cand_idx], ids[cand_idx], g[cand_idx]
    sims = cg @ cg.T
    active = np.ones(len(cids), dtype=bool)
    sel, expect = [], []
    for step in range(1, MMR_K + 1):
        ms = sims[:, sel].max(axis=1) if sel else np.zeros(len(cids), np.int64)
        score = 2 * crel - ms
        k = np.lexsort((cids[active], -score[active]))[0]
        i = np.flatnonzero(active)[k]
        expect.append((step, int(cids[i]), int(crel[i]), int(score[i])))
        sel.append(i)
        active[i] = False

    out = QUERIES["mmr_select"](sf_dir)
    got = [tuple(int(x) for x in r) for r in out.itertuples(index=False)]
    assert got == expect


def test_quota_sample_exact_total_and_proportions(ray_session):
    """Quotas sum to exactly k; each stratum's take is within 1 of the
    proportional share (Hamilton apportionment invariant); heavily
    imbalanced strata still get their floor share."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.sampling import quota_sample

    df = pd.DataFrame(
        {
            "doc_id": np.arange(1000, dtype=np.int64),
            "source": (["big"] * 700 + ["mid"] * 230 + ["tiny"] * 70),
        }
    )
    out = quota_sample(rd.from_pandas(df), k=50).to_pandas()
    assert len(out) == 50
    got = out["source"].value_counts().to_dict()
    for s, n_s in (("big", 700), ("mid", 230), ("tiny", 70)):
        share = 50 * n_s / 1000
        assert abs(got.get(s, 0) - share) < 1 + 1e-9, (s, got)
    # deterministic: re-running picks the identical rows
    out2 = quota_sample(rd.from_pandas(df), k=50).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_dense_event_grid_zero_fill(ray_session, sf_dir):
    """The grid covers every (event_type, day 1..31) cell; missing days
    read 0 (fixture events stop on Jan 30, so day 31 must be all-zero);
    total count equals the events row count."""
    import pyarrow.parquet as pq

    from scripts_ray.ops.temporal import GRID_DAYS
    from scripts_ray.queries import QUERIES

    out = QUERIES["dense_event_grid"](sf_dir)
    types = out["event_type"].nunique()
    assert len(out) == types * GRID_DAYS
    assert not out.duplicated(["event_type", "day"]).any()
    day31 = out[out["day"] == 31]
    assert len(day31) == types and (day31["n"] == 0).all()
    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    assert int(out["n"].sum()) == n_events


def test_chunk_docs_windows_tile_and_reconstruct(ray_session, sf_dir):
    """Chunk windows start at every stride-th token, end clamped to doc
    length; each chunk_text has exactly tok_end - tok_start tokens; and
    dropping the overlap prefix of every chunk after the first
    reconstructs each document's full normalized token stream."""
    import pyarrow as pa

    from scripts_ray.ops.sampling import CHUNK_LEN, CHUNK_STRIDE
    from scripts_ray.queries import QUERIES, _read
    from scripts_ray.tokens import explode

    out = QUERIES["chunk_docs"](sf_dir).to_pandas()
    assert (out["tok_start"] == out["chunk_idx"] * CHUNK_STRIDE).all()
    assert (out["tok_end"] - out["tok_start"]).between(1, CHUNK_LEN).all()
    n_toks = out["chunk_text"].str.split(" ").str.len()
    assert (n_toks == out["tok_end"] - out["tok_start"]).all()

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
    rows, toks = explode(pa.array(docs["text"].tolist(), type=pa.string()))
    full = {
        int(docs["doc_id"].iloc[r]): " ".join(toks[rows == r])
        for r in range(len(docs))
    }
    for doc_id, g in out.sort_values("chunk_idx").groupby("doc_id"):
        parts, prev_end = [], 0
        for _, row in g.iterrows():
            t = row["chunk_text"].split(" ")
            parts.extend(t[prev_end - row["tok_start"]:])
            prev_end = row["tok_end"]
        assert " ".join(parts) == full[int(doc_id)], doc_id


def test_domain_cap_skew_and_partition_invariance(ray_session):
    """A 100-doc source is cut to exactly cap survivors (the cap smallest
    splitmix64 keys), an under-cap source keeps all docs, and the result
    is identical however the input is partitioned (local prune + final
    pass commute)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.dedup import sql_mix64
    from scripts_ray.ops.sampling import domain_cap

    df = pd.DataFrame(
        {
            "doc_id": np.arange(102, dtype=np.int64),
            "source": ["big"] * 100 + ["tiny"] * 2,
        }
    )
    out = domain_cap(rd.from_pandas(df), cap=3).to_pandas()
    assert sorted(out["source"].value_counts().to_dict().items()) == [
        ("big", 3), ("tiny", 2)
    ]
    z = sql_mix64(np.arange(100, dtype=np.int64))
    expect_big = set(np.argsort(z, kind="stable")[:3].tolist())
    assert set(out.loc[out["source"] == "big", "doc_id"]) == expect_big

    out2 = domain_cap(
        rd.from_pandas(df).repartition(7), cap=3
    ).to_pandas()
    a = out.sort_values(["source", "doc_id"]).reset_index(drop=True)
    b = out2.sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ttr_by_source_hand_case(ray_session):
    """Known type/token counts: cross-doc repeats collapse to one type
    per source (the two-level combine is exact), and the permille floor
    matches integer arithmetic."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.textstats import ttr_by_source

    df = pd.DataFrame(
        {
            "source": ["A", "A", "B"],
            "text": ["a b a", "b c", "x x x x"],
        }
    )
    out = (
        ttr_by_source(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert out.loc["A", "n_types"] == 3 and out.loc["A", "n_tokens"] == 5
    assert out.loc["A", "ttr_permille"] == 600
    assert out.loc["B", "n_types"] == 1 and out.loc["B", "n_tokens"] == 4
    assert out.loc["B", "ttr_permille"] == 250


def test_kmeans_update_sums_match_bruteforce(ray_session, sf_dir):
    """The update statistic is exact: per-cluster counts equal the
    kmeans_assign membership, and each cluster's per-dim sum_q equals the
    brute-force sum of floor(embedding*1024) over its members; the implied
    mean renormalizes to a valid unit centroid."""
    import numpy as np
    import pyarrow.parquet as pq

    from scripts_ray.ops.similarity import PQ_QUANT, _pq_quantize, _to_matrix
    from scripts_ray.queries import QUERIES

    upd = QUERIES["kmeans_update"](sf_dir).to_pandas()
    assign = QUERIES["kmeans_assign"](sf_dir).to_pandas()
    member_counts = assign.groupby("cluster").size()
    per_cluster = upd.groupby("cluster")["n_vecs"].agg(["min", "max"])
    assert (per_cluster["min"] == per_cluster["max"]).all()
    got_counts = upd.groupby("cluster")["n_vecs"].first()
    assert got_counts.sort_index().equals(member_counts.sort_index())

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = _pq_quantize(_to_matrix(t["embedding"].combine_chunks()))
    by_vec = dict(zip(assign["vec_id"], assign["cluster"]))
    cl = np.array([by_vec[i] for i in ids], dtype=np.int64)
    for c in got_counts.index:
        want = q[cl == c].sum(axis=0)
        got = (upd[upd["cluster"] == c].sort_values("dim")["sum_q"]
               .to_numpy(dtype=np.int64))
        assert (got == want).all(), c
        mean = got / (PQ_QUANT * got_counts[c])
        assert np.linalg.norm(mean) > 0  # renormalizable next centroid


def test_conv_dedup_collapses_planted_replicas(ray_session, sf_dir):
    """Every planted '-dup' replica collapses onto its source (survivor =
    the original conv_id, multiplicity 2); all other conversations are
    singletons; survivor count equals the true conversation count."""
    from scripts_ray.ops.dedup import CONV_DUP_MOD
    from scripts_ray.queries import QUERIES
    from scripts_ray.sources import derive_transcripts_ds

    out = QUERIES["conv_dedup"](sf_dir).to_pandas()
    assert not out["conv_id"].str.endswith("-dup").any()
    uid = out["conv_id"].str.slice(5).astype(int)
    planted = uid % CONV_DUP_MOD == 0
    assert (out.loc[planted, "n_dupes"] == 2).all()
    assert (out.loc[~planted, "n_dupes"] == 1).all()
    n_convs = (
        derive_transcripts_ds(sf_dir)
        .select_columns(["conv_id"])
        .to_pandas()["conv_id"]
        .nunique()
    )
    assert len(out) == n_convs


def test_hard_negatives_band_disjoint_from_positives(ray_session, sf_dir):
    """The mined band is exactly ranks NEG_SKIP+1..NEG_K: disjoint from
    ann_cosine's top-5 per query, 10 rows per query, and stacking top-5 +
    band reproduces a straight top-NEG_K scan."""
    from scripts_ray.ops.similarity import NEG_K, NEG_SKIP, ann_cosine
    from scripts_ray.queries import QUERIES, _read, similarity

    neg = QUERIES["hard_negatives"](sf_dir).to_pandas()
    pos = QUERIES["ann_cosine"](sf_dir).to_pandas()
    assert neg["rank"].between(NEG_SKIP + 1, NEG_K).all()
    assert neg.groupby("query_id").size().eq(NEG_K - NEG_SKIP).all()
    overlap = set(zip(neg["query_id"], neg["neighbor_id"])) & set(
        zip(pos["query_id"], pos["neighbor_id"])
    )
    assert not overlap

    qids, qvecs = similarity.load_queries(sf_dir, n_queries=10)
    full = ann_cosine(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        qids, qvecs, k=NEG_K,
    ).to_pandas()
    want = full[full["rank"] > NEG_SKIP]
    a = neg.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b[a.columns])


def test_url_canon_collapses_all_variants(ray_session, sf_dir):
    """All four surface forms of a site collapse to ONE canonical URL
    (exactly URL_SITES canonicals corpus-wide), exactly one keeper per
    canonical (the lowest doc_id), and canonicals carry no case, query,
    fragment, or trailing slash."""
    from scripts_ray.ops.textstats import URL_SITES
    from scripts_ray.queries import QUERIES

    out = QUERIES["url_canon"](sf_dir).to_pandas()
    assert out["canon_url"].nunique() == URL_SITES
    per = out.groupby("canon_url")
    assert per["keep"].sum().eq(1).all()
    keepers = out[out["keep"]].set_index("canon_url")["doc_id"]
    assert per["doc_id"].min().eq(keepers).all()
    c = out["canon_url"]
    assert c.str.fullmatch(r"https://site\d+\.example\.com/path/\d+/page").all()


def test_emb_outliers_threshold_and_cluster_agree(ray_session, sf_dir):
    """Outliers are exactly the vectors whose best-seed centi-cosine is
    under the threshold (brute-force check), and each outlier's cluster
    matches kmeans_assign's assignment."""
    import numpy as np
    import pyarrow.parquet as pq

    from scripts_ray.ops.similarity import OUTLIER_CENTI, _to_matrix, _unit_rows
    from scripts_ray.queries import QUERIES

    out = QUERIES["emb_outliers"](sf_dir).to_pandas()
    assert (out["sim_centi"] < OUTLIER_CENTI).all()

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = _unit_rows(_to_matrix(t["embedding"].combine_chunks()))
    order = np.argsort(ids)
    seeds = m[order[:8]]
    sims = m @ seeds.T
    centi = np.floor(100.0 * sims.max(axis=1)).astype(np.int64)
    want = set(ids[centi < OUTLIER_CENTI].tolist())
    assert set(out["vec_id"]) == want

    assign = QUERIES["kmeans_assign"](sf_dir).to_pandas()
    merged = out.merge(assign, on="vec_id", suffixes=("", "_assign"))
    assert (merged["cluster"] == merged["cluster_assign"]).all()


def test_user_type_matrix_equals_pandas_pivot(ray_session, sf_dir):
    """The one-pass pivot equals a brute pandas crosstab, and the row sum
    invariant holds (type columns sum to n_total)."""
    import pyarrow.parquet as pq

    from scripts_ray.ops.relational import EVENT_TYPES
    from scripts_ray.queries import QUERIES

    out = QUERIES["user_type_matrix"](sf_dir).to_pandas()
    cols = [f"n_{t}" for t in EVENT_TYPES]
    assert out[cols].sum(axis=1).equals(out["n_total"])

    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    ct = pd.crosstab(ev["user_id"], ev["event_type"])
    got = out.set_index("user_id").sort_index()
    for t in EVENT_TYPES:
        want = ct[t] if t in ct else pd.Series(0, index=ct.index)
        assert (got[f"n_{t}"] == want.sort_index()).all(), t
    assert got["n_total"].sum() == len(ev)


def test_len_log2_hist_exact_buckets(ray_session, sf_dir):
    """Bucket = int.bit_length - 1 for every doc (exact), bounds are
    [2^b, 2^(b+1)-1], counts conserve, and non-positive input fails
    loudly."""
    import pyarrow.parquet as pq
    import pytest
    import ray.data as rd

    from scripts_ray.ops.quantiles import len_log2_hist
    from scripts_ray.queries import QUERIES

    out = QUERIES["len_log2_hist"](sf_dir).to_pandas()
    assert (out["lo"] == 2 ** out["bucket"]).all()
    assert (out["hi"] == 2 ** (out["bucket"] + 1) - 1).all()
    x = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["n_chars"]).to_pandas()["n_chars"]
    want = x.map(lambda v: int(v).bit_length() - 1).value_counts()
    got = out.set_index("bucket")["n_docs"]
    assert got.sort_index().equals(want.sort_index().rename("n_docs"))
    assert out["n_docs"].sum() == len(x)

    bad = pd.DataFrame({"n_chars": [4, 0]})
    with pytest.raises(Exception):
        len_log2_hist(rd.from_pandas(bad)).to_pandas()


def test_temp_sample_isqrt_quotas(ray_session):
    """Each stratum contributes exactly isqrt(n_s) rows (alpha=0.5
    flattening: 100 -> 10, 17 -> 4, 2 -> 1), chosen as the smallest
    splitmix64 keys within the stratum."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.dedup import sql_mix64
    from scripts_ray.ops.sampling import temp_sample

    sizes = {"big": 100, "mid": 17, "tiny": 2}
    rows = []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = pd.DataFrame(rows, columns=["doc_id", "source"])
    out = temp_sample(rd.from_pandas(df).repartition(5)).to_pandas()
    got = out["source"].value_counts().to_dict()
    assert got == {s: math.isqrt(n) for s, n in sizes.items()}
    for s in sizes:
        ids = df.loc[df["source"] == s, "doc_id"].to_numpy(dtype=np.int64)
        z = sql_mix64(ids)
        want = set(ids[np.argsort(z, kind="stable")[: math.isqrt(len(ids))]])
        assert set(out.loc[out["source"] == s, "doc_id"]) == want, s


def test_length_batches_homogeneous_and_full(ray_session, sf_dir):
    """Every doc is assigned once; each (bucket, batch_idx) holds at most
    LB_BATCH docs and only the highest batch_idx of a bucket runs short;
    the bucket matches the exact bit-length rule."""
    import pyarrow.parquet as pq

    from scripts_ray.ops.sampling import LB_BATCH
    from scripts_ray.queries import QUERIES

    out = QUERIES["length_batches"](sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    assert len(out) == len(docs) and out["doc_id"].is_unique
    merged = out.merge(docs, on="doc_id")
    assert (
        merged["bucket"]
        == merged["n_chars"].map(lambda v: int(v).bit_length() - 1)
    ).all()
    sizes = out.groupby(["bucket", "batch_idx"]).size()
    assert (sizes <= LB_BATCH).all()
    for b, g in sizes.groupby(level="bucket"):
        short = g[g < LB_BATCH]
        assert len(short) <= 1
        if len(short):
            assert short.index.get_level_values("batch_idx")[0] == (
                g.index.get_level_values("batch_idx").max()
            )


def test_simpson_by_source_hand_cases(ray_session):
    """Degenerate source (one repeated token) scores exactly 10^6;
    a perfectly diverse source of n distinct tokens scores 10^6 // n."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.textstats import simpson_by_source

    df = pd.DataFrame(
        {
            "source": ["mono", "mono", "poly"],
            "text": ["x x x", "x x", "a b c d e"],
        }
    )
    out = (
        simpson_by_source(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("source")
    )
    assert out.loc["mono", "n_tokens"] == 5
    assert out.loc["mono", "simpson_micro"] == 1_000_000
    assert out.loc["poly", "n_tokens"] == 5
    assert out.loc["poly", "simpson_micro"] == 1_000_000 // 5


def test_vocab_oov_hand_case(ray_session):
    """Vocabulary selection honors min_count then top-v with the
    (count desc, token asc) tie rule; OOV rates follow exactly."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.textstats import vocab_oov

    # counts: a=4, b=3, c=3, d=1  -> min_count=2 drops d; v=2 keeps a,b
    df = pd.DataFrame(
        {
            "source": ["s1", "s1", "s2"],
            "text": ["a a b c", "a b c", "a b c d"],
        }
    )
    out = (
        vocab_oov(lambda: rd.from_pandas(df).repartition(2), v=2, min_count=2)
        .to_pandas()
        .set_index("source")
    )
    # s1: tokens a,a,b,c,a,b,c -> 7 total, OOV = {c}x2 -> 2
    assert out.loc["s1", "n_tokens"] == 7 and out.loc["s1", "n_oov"] == 2
    assert out.loc["s1", "oov_permille"] == (1000 * 2) // 7
    # s2: a,b,c,d -> 4 total, OOV = c,d -> 2
    assert out.loc["s2", "n_tokens"] == 4 and out.loc["s2", "n_oov"] == 2
    assert out.loc["s2", "oov_permille"] == 500


def test_compress_ratio_orders_repetition_vs_noise(ray_session):
    """Planted repetitive text compresses hard; incompressible-looking
    noise barely compresses — the signal must order them, and the ratio
    arithmetic must be the exact integer floor."""
    import zlib

    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.textstats import COMPRESS_LEVEL, compress_ratio

    rep = "spam ham " * 300
    noise = "".join(
        f"{(i * 2654435761) % 2**32:08x}" for i in range(300)
    )
    df = pd.DataFrame({"doc_id": [0, 1], "text": [rep, noise]})
    out = compress_ratio(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[0, "ratio_micro"] < 100_000          # repetitive: <10%
    assert out.loc[1, "ratio_micro"] > 500_000          # noise: >50%
    for i, t in ((0, rep), (1, noise)):
        raw = t.encode("utf-8")
        comp = len(zlib.compress(raw, COMPRESS_LEVEL))
        assert out.loc[i, "comp_len"] == comp
        assert out.loc[i, "ratio_micro"] == (1_000_000 * comp) // len(raw)


def test_column_profile_counts(ray_session, sf_dir):
    """doc_id is a unique non-null key; every column reports the true
    row count; distinct counts match DuckDB exactly (oracle-checked too,
    this is the independent pandas recount)."""
    import pyarrow.parquet as pq

    from scripts_ray.queries import QUERIES

    out = QUERIES["column_profile"](sf_dir).set_index("column")
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    assert (out["n_rows"] == len(docs)).all()
    assert out.loc["doc_id", "n_distinct"] == len(docs)
    assert (out["n_null"] == 0).all()
    for col in out.index:
        assert out.loc[col, "n_distinct"] == docs[col].nunique(), col


def test_qf_funnel_conserves_and_matches_pipeline(ray_session, sf_dir):
    """Funnel stages partition the stream: stage counts sum to the turn
    count, 'kept' equals the pipeline's keep count, and every dropped
    stage matches the pipeline's own drop_reason tally."""
    from scripts_ray.queries import QUERIES, _put_counts, quality_filter
    from scripts_ray.sources import derive_transcripts_ds

    out = QUERIES["qf_funnel"](sf_dir).set_index("stage")
    qf = (
        quality_filter(derive_transcripts_ds(sf_dir), _put_counts(sf_dir))
        .select_columns(["keep", "drop_reason"])
        .to_pandas()
    )
    assert out["n"].sum() == len(qf)
    assert out.loc["kept", "n"] == int(qf["keep"].sum())
    want = qf.loc[~qf["keep"], "drop_reason"].value_counts()
    for stage, n in want.items():
        assert out.loc[stage, "n"] == n, stage
    assert (out["permille"] == (1000 * out["n"]) // len(qf)).all()


def test_lang_source_chi2_margins_and_uniform_case(ray_session, sf_dir):
    """Observed counts reproduce the margins; a perfectly independent
    hand table scores zero chi2 in every cell."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.textstats import lang_source_chi2
    from scripts_ray.queries import QUERIES

    out = QUERIES["lang_source_chi2"](sf_dir)
    assert (out["chi2_micro"] >= 0).all()
    assert out.groupby("lang")["n"].sum().gt(0).all()

    # independent 2x2: every cell o == expected -> chi2 == 0
    df = pd.DataFrame(
        {
            "lang": ["sv"] * 4 + ["en"] * 4,
            "source": ["a", "a", "b", "b"] * 2,
        }
    )
    ind = lang_source_chi2(rd.from_pandas(df))
    assert (ind["chi2_micro"] == 0).all()
    assert (ind["expected_micro"] == ind["n"] * 1_000_000).all()


def test_dup_rate_by_source_with_planted_dupes(ray_session):
    """A source whose docs repeat one text reports the exact dup share;
    an all-distinct source reports zero."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.dedup import dup_rate_by_source

    df = pd.DataFrame(
        {
            "doc_id": range(10),
            "source": ["dirty"] * 6 + ["clean"] * 4,
            "text": ["same text"] * 4 + ["other", "third"]
            + [f"unique {i}" for i in range(4)],
        }
    )
    out = (
        dup_rate_by_source(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("source")
    )
    assert out.loc["dirty", "n_docs"] == 6
    assert out.loc["dirty", "n_distinct"] == 3
    assert out.loc["dirty", "dup_permille"] == (1000 * 3) // 6
    assert out.loc["clean", "dup_permille"] == 0


def test_truncate_docs_token_boundary(ray_session, sf_dir):
    """Truncated text has exactly min(n_tok_orig, budget) tokens, the
    prefix property holds, and the flag marks exactly the over-budget
    docs."""
    from scripts_ray.ops.sampling import TRUNC_TOKENS
    from scripts_ray.queries import QUERIES

    out = QUERIES["truncate_docs"](sf_dir).to_pandas()
    n_out = out["truncated_text"].str.split(" ").str.len()
    want = out["n_tok_orig"].clip(upper=TRUNC_TOKENS)
    assert (n_out == want).all()
    assert (out["was_truncated"] == (out["n_tok_orig"] > TRUNC_TOKENS)).all()
    assert out["was_truncated"].any() and (~out["was_truncated"]).any()


def test_rag_index_postings_consistency(ray_session, sf_dir):
    """Every chunk id in a token's postings decodes to a real chunk that
    contains the token; each token's df equals its postings length; and
    a chunk's tokens all point back to it."""
    from scripts_ray.queries import QUERIES
    from scripts_ray.sql_ops import RAG_CHUNK_MULT

    idx = QUERIES["rag_index"](sf_dir).to_pandas()
    chunks = QUERIES["chunk_docs"](sf_dir).to_pandas()
    chunks["chunk_id"] = (
        chunks["doc_id"] * RAG_CHUNK_MULT + chunks["chunk_idx"]
    )
    by_id = chunks.set_index("chunk_id")["chunk_text"]

    assert (
        idx["postings"].str.split(",").str.len() == idx["df"]
    ).all()
    for _, r in idx.sample(10, random_state=3).iterrows():
        ids = [int(x) for x in r["postings"].split(",")]
        assert ids == sorted(ids)
        for cid in ids[:5]:
            assert r["tok"] in by_id.loc[cid].split(" "), (r["tok"], cid)
    # reverse direction on a sample of chunks
    post = {
        t: set(int(x) for x in p.split(","))
        for t, p in zip(idx["tok"], idx["postings"])
    }
    for cid, text in by_id.sample(10, random_state=4).items():
        for tok in set(text.split(" ")):
            assert cid in post[tok], (cid, tok)


def test_cohort_retention_hand_case(ray_session):
    """Hand-built activity: u1 active days 1,2,5; u2 days 2,2,3 (dup
    event same day counts once); u3 day 5 only. Cells must be exact."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.temporal import cohort_retention

    ts = pd.to_datetime(
        [
            "2024-01-01 05:00", "2024-01-02 06:00", "2024-01-05 07:00",  # u1
            "2024-01-02 01:00", "2024-01-02 02:00", "2024-01-03 03:00",  # u2
            "2024-01-05 09:00",                                          # u3
        ]
    )
    df = pd.DataFrame({"user_id": [1, 1, 1, 2, 2, 2, 3], "ts": ts})
    out = (
        cohort_retention(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index(["cohort_day", "age_days"])["n_users"]
        .to_dict()
    )
    assert out == {
        (1, 0): 1, (1, 1): 1, (1, 4): 1,   # u1
        (2, 0): 1, (2, 1): 1,              # u2 (same-day dup collapses)
        (5, 0): 1,                         # u3
    }


def test_trending_terms_rank_and_counts(ray_session, sf_dir):
    """Each day carries exactly top-k ranks in order; counts are
    non-increasing with rank within a day; every (day, term) count matches
    a brute recount over the transcript stream."""
    import pyarrow as pa

    from scripts_ray.ops.textstats import TREND_TOP_K
    from scripts_ray.queries import QUERIES
    from scripts_ray.sources import derive_transcripts_ds
    from scripts_ray.tokens import explode

    out = QUERIES["trending_terms"](sf_dir).to_pandas()
    per_day = out.groupby("day")["rank"].agg(["min", "max", "count"])
    assert (per_day["min"] == 1).all()
    assert (per_day["max"] == per_day["count"]).all()
    assert (per_day["count"] <= TREND_TOP_K).all()
    mono = out.sort_values(["day", "rank"]).groupby("day")["n"]
    assert (mono.diff().dropna() <= 0).all()

    tr = (
        derive_transcripts_ds(sf_dir)
        .select_columns(["ts", "text"])
        .to_pandas()
    )
    rows, toks = explode(pa.array(tr["text"].tolist(), type=pa.string()))
    days = tr["ts"].dt.day.to_numpy()[rows]
    brute = (
        pd.DataFrame({"day": days, "term": toks})
        .groupby(["day", "term"])
        .size()
    )
    for _, r in out.sample(15, random_state=5).iterrows():
        assert brute.loc[(r["day"], r["term"])] == r["n"]


def test_conv_balance_and_alternation_hand_case(ray_session):
    """A hand conversation: roles u,a,u,a,t — balance masses and the
    alternation share are exact; a single-turn conv scores 0/0 pairs."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.hashagg import map_partitions_by_key
    from scripts_ray.ops.windows import alternation_part, conv_balance

    df = pd.DataFrame(
        {
            "conv_id": ["c1"] * 5 + ["c2"],
            "turn_idx": [0, 1, 2, 3, 4, 0],
            "role": ["user", "assistant", "user", "assistant", "tool",
                     "user"],
            "text": ["aa", "bbbb", "c", "ddd", "e", "zz"],
        }
    )
    bal = (
        conv_balance(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("conv_id")
    )
    assert bal.loc["c1", "n_user"] == 2 and bal.loc["c1", "n_assistant"] == 2
    assert bal.loc["c1", "user_chars"] == 3
    assert bal.loc["c1", "assistant_chars"] == 7
    assert bal.loc["c1", "assistant_permille"] == (1000 * 7) // 11
    assert bal.loc["c2", "assistant_permille"] == 0

    alt = (
        map_partitions_by_key(
            rd.from_pandas(df).repartition(3), "conv_id", alternation_part
        )
        .to_pandas()
        .set_index("conv_id")
    )
    # c1 pairs: u->a, a->u, u->a, a->t : all 4 alternate
    assert alt.loc["c1", "n_pairs"] == 4
    assert alt.loc["c1", "n_alternating"] == 4
    assert alt.loc["c1", "alternation_permille"] == 1000
    assert alt.loc["c2", "n_pairs"] == 0
    assert alt.loc["c2", "alternation_permille"] == 0


def test_winsorize_clamps_planted_outliers(ray_session):
    """A planted glitch value is pulled to the per-type p99 bound; inliers
    pass through untouched; the clamp never widens the band."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.temporal import winsorize_values

    n = 500
    df = pd.DataFrame(
        {
            "event_id": range(n),
            "event_type": ["click"] * n,
            "value": [float(i % 100) for i in range(n - 1)] + [1e9],
        }
    )
    out = (
        winsorize_values(lambda: rd.from_pandas(df).repartition(4))
        .to_pandas()
        .set_index("event_id")
    )
    glitch = out.loc[n - 1]
    assert glitch["value_micro"] == 10**15
    assert glitch["clamped_micro"] < 10**15  # pulled to the p99 bound
    inlier = out.loc[50]
    assert inlier["clamped_micro"] == inlier["value_micro"]
    assert (out["clamped_micro"] >= out["clamped_micro"].min()).all()
    assert (
        out["clamped_micro"].between(
            out["clamped_micro"].min(), out["clamped_micro"].max()
        )
    ).all()


def test_latest_events_is_true_recency_topk(ray_session, sf_dir):
    """Per user: ranks are 1..min(k, n_events) and the rank-1 row is the
    user's true max timestamp (brute pandas check)."""
    import pyarrow.parquet as pq

    from scripts_ray.ops.temporal import LATEST_K
    from scripts_ray.queries import QUERIES

    out = QUERIES["latest_events"](sf_dir).to_pandas()
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["user_id", "ts", "event_id"]).to_pandas()
    per = out.groupby("user_id")
    counts = ev.groupby("user_id").size()
    for uid, g in per:
        expect = min(LATEST_K, counts[uid])
        assert sorted(g["rank"]) == list(range(1, expect + 1)), uid
        top = g.loc[g["rank"] == 1].iloc[0]
        assert top["ts"] == ev.loc[ev["user_id"] == uid, "ts"].max(), uid


def test_vocab_growth_hand_case(ray_session):
    """Planted stream: day 1 brings {a,b}, day 2 re-uses a and adds {c},
    day 5 adds {d,e}. New-type counts and the cumulative curve are
    exact; re-occurrences never count twice."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.textstats import vocab_growth

    ts = pd.to_datetime(
        ["2024-01-01", "2024-01-02", "2024-01-02", "2024-01-05"]
    )
    df = pd.DataFrame(
        {"ts": ts, "text": ["a b a", "a c", "b c", "d e a"]}
    )
    out = vocab_growth(rd.from_pandas(df).repartition(3)).set_index("day")
    assert out["n_new_types"].to_dict() == {1: 2, 2: 1, 5: 2}
    assert out["n_types_cum"].to_dict() == {1: 2, 2: 3, 5: 5}


def test_bucket_join_equals_distributed_join(ray_session, sf_dir):
    """The co-bucketed physical join is row-identical to the engine's
    distributed hash join on the same logical inputs, and the bucket
    layout actually partitions by the key (every bucket file holds only
    its user_id % B keys)."""
    import os

    import pyarrow.parquet as pq

    from scripts_ray.ops.relational import BJOIN_BUCKETS
    from scripts_ray.queries import QUERIES, _read
    from scripts_ray.ops.hashagg import hash_aggregate, hash_join

    out = QUERIES["bucket_join_events"](sf_dir).to_pandas()

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    import numpy as np

    def project(batch):
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype(np.int64),
                "user_id": batch["user_id"].astype(np.int64),
                "value_micro": np.floor(
                    batch["value"].to_numpy(dtype=np.float64) * 1e6
                ).astype(np.int64),
            }
        )

    dim = hash_aggregate(
        _read(sf_dir, "events", columns=["user_id"]),
        keys=["user_id"],
        aggs={"n_total": ("user_id", "count")},
    )
    ref = hash_join(
        ev.map_batches(project, batch_format="pandas"),
        dim, on="user_id", how="inner",
    ).to_pandas()[out.columns]
    a = out.sort_values(["event_id"]).reset_index(drop=True)
    b = ref.sort_values(["event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))

    for b_ in range(BJOIN_BUCKETS):
        d = f"/tmp/graft_bucket_join/facts/_b={b_}"
        if os.path.isdir(d):
            t = pq.read_table(d, columns=["user_id"]).to_pandas()
            assert (t["user_id"] % BJOIN_BUCKETS == b_).all(), b_


def test_lang_mismatch_consistency(ray_session, sf_dir):
    """The per-source mismatch tallies reconcile exactly with a doc-level
    join of lang_docs (detected) against the declared column."""
    import pyarrow.parquet as pq

    from scripts_ray.ops.textstats import lang_docs
    from scripts_ray.queries import QUERIES, _read

    out = QUERIES["lang_mismatch"](sf_dir).to_pandas().set_index("source")
    det = lang_docs(
        _read(sf_dir, "documents", columns=["doc_id", "text"])
    ).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source"]).to_pandas()
    m = det.merge(docs, on="doc_id")
    want = (
        m.assign(mis=(m["lang_x"] != m["lang_y"]).astype(int))
        .groupby("source")
        .agg(n_docs=("mis", "size"), n_mismatch=("mis", "sum"))
    )
    assert out["n_docs"].sort_index().equals(want["n_docs"].sort_index())
    assert out["n_mismatch"].sort_index().equals(
        want["n_mismatch"].sort_index()
    )


def test_gopher_rate_reconciles_with_gate(ray_session, sf_dir):
    """Per-source keep counts equal the gate's own doc-level keeps joined
    to sources; totals conserve."""
    import pyarrow.parquet as pq

    from scripts_ray.queries import QUERIES

    out = QUERIES["gopher_rate_by_source"](sf_dir).to_pandas()
    gate = QUERIES["gopher_quality"](sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    m = gate.merge(docs, on="doc_id")
    want = m.groupby("source")["keep"].agg(["size", "sum"]).sort_index()
    got = out.set_index("source").sort_index()
    # the join path yields pandas string[python]-dtype keys — compare values
    assert [str(i) for i in got.index] == [str(i) for i in want.index]
    assert got["n_docs"].to_numpy().tolist() == want["size"].to_numpy().tolist()
    assert (
        got["n_keep"].astype("int64").to_numpy().tolist()
        == want["sum"].astype("int64").to_numpy().tolist()
    )
    assert got["n_docs"].sum() == len(gate)


def test_activity_gini_known_distributions(ray_session):
    """Uniform activity scores ~0; one dominant user pushes G toward
    (n-1)/n; both match the closed-form integer formula."""
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.quantiles import activity_gini

    uniform = pd.DataFrame({"user_id": list(range(10)) * 7})
    g0 = activity_gini(rd.from_pandas(uniform).repartition(3))
    assert g0["gini_micro"].iloc[0] == 0
    assert g0["n_users"].iloc[0] == 10 and g0["total_events"].iloc[0] == 70

    skew = pd.DataFrame({"user_id": [1] * 96 + [2, 3, 4, 5]})
    g1 = activity_gini(rd.from_pandas(skew))
    # exact: x=(1,1,1,1,96) ranks 1..5 -> Σr·x = 1+2+3+4+480 = 490,
    # G = (2·490 − 6·100)/(5·100) = 0.76
    assert g1["gini_micro"].iloc[0] == (1_000_000 * (2 * 490 - 6 * 100)) // 500


def test_q13_custdist_zero_bucket_and_conservation(ray_session, sf_dir):
    """The zero-order bucket exists only via the left-join miss side and
    must equal the customers absent from the filtered orders; the
    distribution sums to the customer count."""
    import pyarrow.parquet as pq

    from scripts_ray.ops.relational import Q13_EXCLUDE_PRIORITY
    from scripts_ray.queries import QUERIES

    out = QUERIES["q13_custdist"](sf_dir).to_pandas().set_index("c_count")
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey"]).to_pandas()
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    ).to_pandas()
    kept = orders[orders["o_orderpriority"] != Q13_EXCLUDE_PRIORITY]
    with_orders = set(kept["o_custkey"])
    zero = len(set(cust["c_custkey"]) - with_orders)
    assert out["custdist"].sum() == len(cust)
    if zero:
        assert out.loc[0, "custdist"] == zero
    counts = kept.groupby("o_custkey").size().value_counts()
    for c, n in counts.items():
        assert out.loc[c, "custdist"] == n, c


def test_event_heatmap_conventions(ray_session, sf_dir):
    """ISO dow in 1..7 and hour in 0..23; counts conserve to the event
    total; spot cells match a brute pandas recount."""
    import pyarrow.parquet as pq

    from scripts_ray.queries import QUERIES

    out = QUERIES["event_heatmap"](sf_dir).to_pandas()
    assert out["isodow"].between(1, 7).all()
    assert out["hour"].between(0, 23).all()
    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"]).to_pandas()
    assert out["n"].sum() == len(ev)
    brute = (
        ev.assign(isodow=ev["ts"].dt.dayofweek + 1, hour=ev["ts"].dt.hour)
        .groupby(["isodow", "hour"])
        .size()
    )
    got = out.set_index(["isodow", "hour"])["n"]
    assert got.sort_index().equals(brute.sort_index().rename("n"))
