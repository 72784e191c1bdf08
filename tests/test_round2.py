"""Round-2 operator units: exchange-based bucket pairing, distributed
hash join vs pandas merge, seeded shuffle determinism, ToC range-move,
config surface (denylist / cascade / JSON load), QC tolerance rule."""

import itertools
import json

import numpy as np
import pandas as pd
import pytest


# ---- band_pairs: exchange expansion vs brute force --------------------------


def test_band_pairs_matches_bruteforce(ray_session):
    import ray.data as rd

    from scripts_ray.ops import dedup

    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame(
        {
            "band_id": rng.integers(0, 4, n),
            "band_hash": rng.integers(0, 12, n),
            "doc_id": rng.integers(0, 60, n),
        }
    )
    got = (
        dedup.band_pairs(rd.from_pandas(df), num_partitions=8)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )

    expect = {}
    for (b, h), g in df.drop_duplicates().groupby(["band_id", "band_hash"]):
        for a, c in itertools.combinations(sorted(g["doc_id"].unique()), 2):
            expect[(a, c)] = expect.get((a, c), 0) + 1
    edf = (
        pd.DataFrame(
            [(a, b, n) for (a, b), n in expect.items()],
            columns=["doc_a", "doc_b", "n_bands"],
        )
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype(np.int64), edf.astype(np.int64), check_dtype=False
    )


def test_band_pairs_hot_bucket(ray_session):
    """Skew: one boilerplate bucket with 300 members must expand to all
    C(300,2)=44850 pairs, exactly once each."""
    import ray.data as rd

    from scripts_ray.ops import dedup

    df = pd.DataFrame(
        {
            "band_id": np.zeros(300, dtype=np.int64),
            "band_hash": np.full(300, 7, dtype=np.int64),
            "doc_id": np.arange(300, dtype=np.int64),
        }
    )
    out = dedup.band_pairs(rd.from_pandas(df)).to_pandas()
    assert len(out) == 300 * 299 // 2
    assert (out["n_bands"] == 1).all()
    assert (out["doc_a"] < out["doc_b"]).all()


def test_expand_bucket_pairs_empty_and_singletons():
    from scripts_ray.ops.dedup import _expand_bucket_pairs_part

    empty = _expand_bucket_pairs_part(
        pd.DataFrame({"band_id": [], "band_hash": [], "doc_id": []})
    )
    assert len(empty) == 0 and list(empty.columns) == ["doc_a", "doc_b"]
    singles = _expand_bucket_pairs_part(
        pd.DataFrame({"band_id": [0, 1, 2], "band_hash": [7, 8, 9], "doc_id": [1, 2, 3]})
    )
    assert len(singles) == 0


# ---- hash_join vs pandas merge (ADVICE round 1) -----------------------------


def _join_frames():
    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, 300),
            "lv": rng.integers(0, 1000, 300),
        }
    )
    # right misses some keys entirely (=> empty side in some partitions)
    right = pd.DataFrame(
        {
            "rk": np.arange(0, 25),
            "rv": np.arange(100, 125),
        }
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left"])
def test_hash_join_matches_pandas_merge(ray_session, how):
    import ray.data as rd

    from scripts_ray.ops.hashagg import hash_join

    left, right = _join_frames()
    got = (
        hash_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", right_on="rk", how=how, num_partitions=16,
        )
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, how=how, left_on="k", right_on="rk")
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ["k", "lv"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()
    for c in ["rk", "rv"]:
        ge, ee = got[c].astype("Float64"), exp[c].astype("Float64")
        assert ge.fillna(-1).to_numpy().tolist() == ee.fillna(-1).to_numpy().tolist()


def test_hash_join_rejects_shared_and_reserved_columns(ray_session):
    import ray.data as rd

    from scripts_ray.ops.hashagg import hash_join

    a = rd.from_pandas(pd.DataFrame({"k": [1], "v": [1]}))
    b = rd.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    with pytest.raises(ValueError, match="shared"):
        hash_join(a, b, on="k")
    c = rd.from_pandas(pd.DataFrame({"k": [1], "_part": [0]}))
    with pytest.raises(ValueError, match="reserved"):
        hash_join(c, rd.from_pandas(pd.DataFrame({"k": [1], "w": [2]})), on="k")


# ---- seeded shuffle (O8) ----------------------------------------------------


def test_seeded_shuffle_deterministic(ray_session, sf_dir):
    import ray.data as rd

    def order(seed):
        ds = rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id"]
        ).random_shuffle(seed=seed)
        return [r["event_id"] for r in ds.take(200)]

    assert order(42) == order(42)
    assert order(42) != order(43)


# ---- ToC ordered range-move (M18/W10) --------------------------------------


def test_toc_extract_part_unit():
    from scripts_ray.ops.windows import toc_extract_part

    df = pd.DataFrame(
        {
            "conv_id": ["c1"] * 6 + ["c2"] * 3,
            "turn_idx": [0, 1, 2, 3, 4, 5, 0, 1, 2],
            "text": ["a", "b", "c", "12 $ toc", "d", "e", "x", "y", "z"],
            "tool": [None, "checkout", None, None, None, "checkout", None, None, None],
        }
    )
    out = toc_extract_part(df).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # c1: marker at 3, preceding tool-bearing turn at 1 → rows 1..5 re-homed
    c1 = out[out.conv_id == "c1"]
    assert c1["section"].tolist() == ["body", "toc", "toc", "toc", "toc", "toc"]
    assert c1["sec_idx"].tolist() == [0, 0, 1, 2, 3, 4]
    # c2: no marker → all body, original ordinals
    c2 = out[out.conv_id == "c2"]
    assert c2["section"].tolist() == ["body"] * 3
    assert c2["sec_idx"].tolist() == [0, 1, 2]


def test_toc_extract_no_boundary_moves_from_start():
    from scripts_ray.ops.windows import toc_extract_part

    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 3,
            "turn_idx": [0, 1, 2],
            "text": ["12 $ toc first", "a", "b"],
            "tool": [None, None, None],
        }
    )
    out = toc_extract_part(df)
    assert out["section"].tolist() == ["toc"] * 3


# ---- config surface (§2.9, D6) ---------------------------------------------


def test_denylist_filters_configured_convs(ray_session):
    import ray.data as rd

    from scripts_ray.config import EngineConfig, denylist_filter

    df = pd.DataFrame({"conv_id": ["conv-000001", "conv-000002", "conv-000003"],
                       "turn_idx": [0, 0, 0]})
    cfg = EngineConfig(deny_conv_ids=("conv-000002",))
    out = denylist_filter(rd.from_pandas(df), cfg).to_pandas()
    assert sorted(out["conv_id"]) == ["conv-000001", "conv-000003"]


def test_config_from_json(tmp_path):
    from scripts_ray.config import EngineConfig

    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({
        "protected_roles": ["system"],
        "cascade": ["fallback"],
        "deny_conv_ids": ["conv-000009"],
        "scorer": "unigram",
    }))
    cfg = EngineConfig.from_json(str(p))
    assert cfg.cascade == ("fallback",)
    assert cfg.protected_roles == ("system",)
    assert cfg.deny_conv_ids == ("conv-000009",)


def test_cascade_order_is_honored(ray_session, sf_dir):
    import ray

    from scripts_ray.ops import attribution
    from scripts_ray.sources import derive_transcripts_ds

    idx = ray.put(attribution.build_order_index(sf_dir))
    default = attribution.attribute_turns(
        derive_transcripts_ds(sf_dir), idx, cascade=("primary", "fallback")
    ).to_pandas()
    reversed_ = attribution.attribute_turns(
        derive_transcripts_ds(sf_dir), idx, cascade=("fallback", "primary")
    ).to_pandas()
    # fallback-first: 'fallback' always applies, so no primary matches remain
    assert (default["match_type"] == "primary").any()
    assert not (reversed_["match_type"] == "primary").any()
    with pytest.raises(ValueError):
        attribution.attribute_turns(derive_transcripts_ds(sf_dir), idx, cascade=("bogus",))


# ---- ML4 merge-strategy slot ------------------------------------------------


def test_merge_strategy_slot():
    from scripts_ray.ops.windows import merge_intro_pairs_part

    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 4,
            "turn_idx": [0, 1, 2, 3],
            "role": ["system", "assistant", "user", "assistant"],
            "text": ["intro-", "continued", "q", "a"],
        }
    )
    rule = merge_intro_pairs_part(df, strategy="rule")
    assert len(rule) == 3 and rule.iloc[0]["text"] == "intro-continued"
    never = merge_intro_pairs_part(df, strategy="never")
    assert len(never) == 4 and never["text"].tolist() == df["text"].tolist()
    with pytest.raises(ValueError):
        merge_intro_pairs_part(df, strategy="nsp-model")


# ---- QC ±10% tolerance rule (A10) ------------------------------------------


def test_tolerance_rule_classification(ray_session, sf_dir):
    from scripts_ray.queries import QUERIES

    df = QUERIES["qc_keep_ci"](sf_dir)
    assert set(df["coverage"]).issubset({"pass", "almost", "fail"})
    # integer cross-multiplied rule re-checked directly
    g_keep, g_total = df["n_keep"].sum(), df["n_total"].sum()
    for _, r in df.iterrows():
        d10 = 10 * abs(r.n_keep * g_total - g_keep * r.n_total)
        want = (
            "pass" if d10 <= g_keep * r.n_total
            else "almost" if d10 <= 2 * g_keep * r.n_total
            else "fail"
        )
        assert r.coverage == want
    # CI bounds bracket the posterior mean
    assert (df["ci_lo_permille"] <= df["ci_hi_permille"]).all()


# ---- winnowing fingerprints ---------------------------------------------------


def test_winnow_duplicate_docs_share_fingerprint_sets(ray_session, sf_dir):
    """Exact duplicate documents (same text) must emit IDENTICAL winnowing
    fingerprint sets — the containment property rolling-hash fingerprints
    exist for."""
    import ray.data as rd

    from scripts_ray.ops.dedup import winnow_fingerprints

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "the quick brown fox jumps over the lazy dog again and again",
                "the quick brown fox jumps over the lazy dog again and again",
                "a completely different document about spark query engines here",
            ],
        }
    )
    out = winnow_fingerprints(rd.from_pandas(df)).to_pandas()
    sets = out.groupby("doc_id")["fp"].apply(frozenset)
    assert sets[0] == sets[1]
    assert sets[0] != sets[2]


def test_winnow_shared_substring_shares_a_fingerprint():
    from scripts_ray.ops.dedup import winnow_fingerprints
    import ray.data as rd

    common = "alpha beta gamma delta epsilon zeta eta theta"
    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [f"one two three {common}", f"{common} nine ten eleven"],
        }
    )
    out = winnow_fingerprints(rd.from_pandas(df)).to_pandas()
    sets = out.groupby("doc_id")["fp"].apply(set)
    assert sets[0] & sets[1], "shared 8-token substring must share a fingerprint"


# ---- config-driven protected roles -------------------------------------------


def test_protected_roles_config_changes_gate():
    import numpy as np

    from scripts_ray.gate import decide

    role = np.array(["system", "user"], dtype=object)
    lang = np.array(["und", "und"], dtype=object)
    args = dict(
        lang=lang,
        ppl=np.array([-5, -5]),
        n_chars=np.array([1, 1]),
        n_symbols=np.array([0, 0]),
        n_tokens=np.array([1, 1]),
        n_distinct=np.array([1, 1]),
    )
    keep_default, _ = decide(role=role, **args)
    assert keep_default.tolist() == [True, False]  # system protected
    keep_none, _ = decide(role=role, protected_roles=(), **args)
    assert keep_none.tolist() == [False, False]  # protection lifted


# ---- IVF ANN recall contract -------------------------------------------------


def test_ann_ivf_recall_bound(ray_session, sf_dir, duck):
    from scripts_ray.queries import BENCH_EXTRAS, ORACLES

    approx = BENCH_EXTRAS["ann_ivf"](sf_dir).to_pandas()
    exact = duck.execute(ORACLES["ann_cosine"]).df()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.75, f"ann_ivf recall@5 dropped to {recall:.2f}"
    # the output shape contract still holds: k ranked rows per query
    assert (approx.groupby("query_id")["rank"].max() == 5).all()


# ---- flagship execution modes ----------------------------------------------


def test_quality_filter_modes_equivalent(ray_session, sf_dir):
    """mode='broadcast' (two-pass window, no full-row exchange) must emit
    exactly the rows of mode='exchange' (the general path)."""
    import ray

    from scripts_ray.pipelines import build_model_counts, quality_filter
    from scripts_ray.sources import derive_transcripts_ds

    counts_ref = ray.put(build_model_counts(sf_dir))
    a = quality_filter(derive_transcripts_ds(sf_dir), counts_ref).to_pandas()
    b = quality_filter(
        derive_transcripts_ds(sf_dir), counts_ref, mode="broadcast"
    ).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b)


def test_conv_first_sys_from_files_matches_dataset_path(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from scripts_ray.pipelines import conv_first_sys, conv_first_sys_from_files

    # conversations straddling files
    t1 = pa.table({"conv_id": ["a", "a", "b"], "turn_idx": [5, 1, 2],
                   "role": ["system", "user", "system"],
                   "text": ["x", "y", "z"], "tool": [None, None, None]})
    t2 = pa.table({"conv_id": ["a", "b", "c"], "turn_idx": [3, 0, 1],
                   "role": ["system", "user", "user"],
                   "text": ["x", "y", "z"], "tool": [None, None, None]})
    pq.write_table(t1, str(tmp_path / "p1.parquet"))
    pq.write_table(t2, str(tmp_path / "p2.parquet"))
    got = conv_first_sys_from_files(str(tmp_path))
    assert got.to_dict() == {"a": 3, "b": 2}
    via_ds = conv_first_sys(rd.read_parquet(str(tmp_path)))
    assert got.sort_index().to_dict() == via_ds.sort_index().to_dict()


# ---- ts repair --------------------------------------------------------------


def test_ts_repair_coalesce_semantics(ray_session, sf_dir):
    import ray

    from scripts_ray.ops import attribution
    from scripts_ray.sources import derive_transcripts_ds

    fix = attribution.build_ts_corrections().set_index("conv_id")["ts_fix"]
    out = attribution.repair_ts(
        derive_transcripts_ds(sf_dir), ray.put(fix)
    ).to_pandas()
    orig = derive_transcripts_ds(sf_dir).to_pandas()[
        ["conv_id", "turn_idx", "ts"]
    ]
    m = out.merge(orig, on=["conv_id", "turn_idx"])
    assert len(m) == len(out) > 0
    assert m["repaired"].any() and (~m["repaired"]).any()
    un = m[~m["repaired"]]
    assert (un["ts_fixed"].to_numpy() == un["ts"].to_numpy()).all()
    rep = m[m["repaired"]]
    assert (rep["ts_fixed"].map(lambda t: fix[rep.iloc[0]["conv_id"]] is not None)).all()
    for cid, g in rep.groupby("conv_id"):
        assert (g["ts_fixed"] == fix[cid]).all()
