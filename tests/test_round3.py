"""Round-3 additions: config-driven KWIC bank, and friends."""

import numpy as np
import pandas as pd


def _cmp(ray_res, duck, sql, sort_cols):
    got = ray_res.to_pandas().sort_values(sort_cols).reset_index(drop=True)
    exp = duck.execute(sql).df().sort_values(sort_cols).reset_index(drop=True)
    for c in got.columns:
        if got[c].dtype != exp[c].dtype and np.issubdtype(exp[c].dtype, np.integer):
            got[c] = got[c].astype(exp[c].dtype)
        elif got[c].dtype != exp[c].dtype and np.issubdtype(exp[c].dtype, np.floating):
            got[c] = got[c].astype(exp[c].dtype)  # nullable Float64 → float64
        elif pd.api.types.is_string_dtype(got[c]) and exp[c].dtype == object:
            got[c] = got[c].astype(object)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_kwic_bank_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["kwic_bank"](sf_dir),
        duck,
        sql_ops.KWIC_BANK_SQL,
        ["doc_id", "pattern_name", "context"],
    )


def test_kwic_bank_config_override(ray_session, sf_dir, tmp_path):
    import json

    from scripts_ray.config import EngineConfig
    from scripts_ray.ops import textstats

    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"kwic_bank": {"win": ".{0,10}window.{0,10}"}}))
    cfg = EngineConfig.from_json(str(p))
    assert cfg.kwic_bank == (("win", ".{0,10}window.{0,10}"),)

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = textstats.kwic_bank(ds, cfg.kwic_bank).to_pandas()
    assert (out["pattern_name"] == "win").all()
    assert out["context"].str.contains("window").all()
    assert len(out) > 0


# ---- exact distributed quantiles + grouped top-k ---------------------------


def test_group_quantiles_matches_duckdb_adversarial(ray_session):
    """Exact-rational rank (ceil(n*q/1000) in int64) must match DuckDB's
    quantile_disc at the float-hazard points (0.9*10 = 9.000000000000002)."""
    import duckdb
    import ray.data as rd

    from scripts_ray.ops.quantiles import group_quantiles

    rows = []
    for g, n in [("a", 10), ("b", 7), ("c", 200), ("d", 1)]:
        rows += [{"g": g, "v": i + 1} for i in range(n)]
    df = pd.DataFrame(rows)
    got = (
        group_quantiles(
            rd.from_pandas(df), "v", ["g"], [500, 900, 990]
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        """SELECT g, quantile_disc(v, 0.500) AS p500,
                  quantile_disc(v, 0.900) AS p900,
                  quantile_disc(v, 0.990) AS p990
           FROM t GROUP BY g ORDER BY g"""
    ).df()
    for c in ["p500", "p900", "p990"]:
        assert got[c].astype(int).tolist() == exp[c].astype(int).tolist(), c


def test_group_topk_tie_break(ray_session):
    import ray.data as rd

    from scripts_ray.ops.quantiles import group_topk

    df = pd.DataFrame(
        {
            "g": ["x"] * 4 + ["y"] * 2,
            "term": ["b", "a", "c", "d", "q", "p"],
            "n": [5, 5, 9, 1, 3, 3],
        }
    )
    out = (
        group_topk(rd.from_pandas(df), ["g"], "n", 2, ["term"])
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    assert out[["g", "term", "rank"]].values.tolist() == [
        ["x", "c", 1],
        ["x", "a", 2],
        ["y", "p", 1],
        ["y", "q", 2],
    ]


def test_group_topk_hot_group_preprune(ray_session):
    """A hot group (most rows in one key) must survive the per-batch
    pre-prune combiner with exact results: compare against pandas."""
    import numpy as np
    import ray.data as rd

    from scripts_ray.ops.quantiles import group_topk

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": ["hot"] * 5000 + [f"g{i}" for i in rng.integers(0, 20, 500)],
            "term": [f"t{i}" for i in rng.integers(0, 4000, 5500)],
            "n": rng.integers(1, 1000, 5500),
        }
    ).drop_duplicates(["g", "term"])
    got = (
        group_topk(rd.from_pandas(df).repartition(16), ["g"], "n", 3, ["term"])
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["g", "n", "term"], ascending=[True, False, True])
        .groupby("g", sort=True)
        .head(3)
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got[["g", "term", "n"]].values.tolist() == exp[["g", "term", "n"]].values.tolist()


def test_boilerplate_docs_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["boilerplate_docs"](sf_dir),
        duck,
        sql_ops.BOILERPLATE_DOCS_SQL,
        ["doc_id"],
    )


def test_doc_repetition_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["doc_repetition"](sf_dir),
        duck,
        sql_ops.DOC_REPETITION_SQL,
        ["doc_id"],
    )


def test_boilerplate_planted(ray_session):
    """Planted boilerplate: a phrase shared by >= BOILER_MIN_DOCS docs is
    flagged in every carrier; unique docs and sub-3-token docs keep."""
    import ray.data as rd

    from scripts_ray.ops.dedup import BOILER_MIN_DOCS, boilerplate_docs

    shared = "all rights reserved contact the operator"
    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                shared,                        # pure boilerplate x3
                shared,
                shared,
                shared + " plus a very different unique tail entirely here",
                "completely unique text with no shared phrases at all ok",
                "tiny doc",                    # < 3 tokens: no shingles
            ],
        }
    )
    assert BOILER_MIN_DOCS <= 3
    out = (
        boilerplate_docs(rd.from_pandas(docs).repartition(4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "boiler_permille"] == 1000 and out.loc[0, "keep"] == 0
    assert out.loc[2, "keep"] == 0
    assert 0 < out.loc[3, "boiler_permille"] < 1000
    assert out.loc[4, "boiler_permille"] == 0 and out.loc[4, "keep"] == 1
    assert out.loc[5, "n_sh"] == 0 and out.loc[5, "keep"] == 1


def test_doc_repetition_planted(ray_session):
    """A looping doc trips the duplicate-shingle gate; modal-token skew
    trips the top-token gate; a plain doc keeps."""
    import ray.data as rd

    from scripts_ray.ops.textstats import doc_repetition

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "buy now " * 50,                       # phrase loop
                "spam " * 40 + "one two three four",   # modal-token skew
                "a perfectly ordinary sentence with distinct words only",
            ],
        }
    )
    out = (
        doc_repetition(rd.from_pandas(docs).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "dup_shingle_permille"] > 900 and out.loc[0, "keep"] == 0
    assert out.loc[1, "top_tok_permille"] > 800 and out.loc[1, "keep"] == 0
    assert out.loc[2, "dup_shingle_permille"] == 0 and out.loc[2, "keep"] == 1


def test_decontaminate_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["decontaminate"](sf_dir),
        duck,
        sql_ops.DECONTAMINATE_SQL,
        ["doc_id"],
    )


def test_decontaminate_planted(ray_session):
    """A training doc embedding an eval doc's phrase is flagged; eval docs
    themselves never appear in the output."""
    import ray.data as rd

    from scripts_ray.ops.dedup import decontaminate

    leak = "the secret benchmark answer is forty two exactly"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 97, 5, 7],  # 0 and 97 are eval (mod 97)
            "text": [
                leak,
                "another eval doc with its own distinct phrasing here",
                leak + " copied into a training document verbatim",
                "clean training doc sharing nothing with the eval suite",
            ],
        }
    )
    out = (
        decontaminate(rd.from_pandas(docs).repartition(2), min_hits=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [5, 7]
    assert out.loc[0, "contaminated"] == 1 and out.loc[0, "n_hit"] >= 3
    assert out.loc[1, "n_hit"] == 0 and out.loc[1, "contaminated"] == 0


def test_mixture_sample_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["mixture_sample"](sf_dir),
        duck,
        sql_ops.MIXTURE_SAMPLE_SQL,
        ["source", "doc_id"],
    )


def test_mixture_sample_budget_invariants(ray_session, sf_dir):
    """Each source lands in [budget, budget + max selected doc) tokens
    unless it ran out of docs, and the selection is partition-invariant."""
    import ray.data as rd

    from scripts_ray.ops.sampling import MIX_TOKEN_BUDGET, mixture_sample

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    a = mixture_sample(ds).to_pandas().sort_values(["source", "doc_id"])
    b = (
        mixture_sample(ds.repartition(7))
        .to_pandas()
        .sort_values(["source", "doc_id"])
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    per = a.groupby("source").agg(
        tot=("n_tok", "sum"), mx=("n_tok", "max"), n_sel=("doc_id", "count")
    )
    n_docs = (
        pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
        .groupby("source")
        .size()
    )
    exhausted = per["n_sel"] == n_docs.reindex(per.index)
    assert ((per["tot"] >= MIX_TOKEN_BUDGET) | exhausted).all()
    assert (per["tot"] - per["mx"] < MIX_TOKEN_BUDGET).all()


def test_curate_mix_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["curate_mix"](sf_dir),
        duck,
        sql_ops.CURATE_MIX_SQL,
        ["source", "doc_id"],
    )


def test_curate_mix_subset_of_gates(ray_session, sf_dir):
    """Every curated doc passes all three gates and is absent from the
    eval slice."""
    from scripts_ray import queries
    from scripts_ray.ops.dedup import CONTAM_EVAL_MOD

    sel = queries.QUERIES["curate_mix"](sf_dir).to_pandas()
    rep = queries.QUERIES["doc_repetition"](sf_dir).to_pandas()
    boil = queries.QUERIES["boilerplate_docs"](sf_dir).to_pandas()
    ids = set(sel["doc_id"])
    assert not any(i % CONTAM_EVAL_MOD == 0 for i in ids)
    assert ids <= set(rep.loc[rep["keep"] == 1, "doc_id"])
    assert ids <= set(boil.loc[boil["keep"] == 1, "doc_id"])


def test_shard_pack_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["shard_pack"](sf_dir),
        duck,
        sql_ops.SHARD_PACK_SQL,
        ["doc_id"],
    )


def test_shard_pack_invariants(ray_session, sf_dir):
    """Every doc lands in exactly one shard; every non-final shard of a
    bucket stops within one document of the target; partition-invariant."""
    import ray.data as rd

    from scripts_ray.ops.sampling import SHARD_BUCKETS, SHARD_TOKENS, shard_pack

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    a = shard_pack(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        shard_pack(ds.repartition(5))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert a["doc_id"].is_unique
    g = a.groupby("shard_id").agg(tot=("n_tok", "sum"), mx=("n_tok", "max"))
    bucket = g.index.to_numpy() % SHARD_BUCKETS
    import numpy as np

    last_of_bucket = np.zeros(len(g), dtype=bool)
    for bk in np.unique(bucket):
        idx = np.nonzero(bucket == bk)[0]
        last_of_bucket[idx[g.index.to_numpy()[idx].argmax()]] = True
    full = g[~last_of_bucket]
    assert (full["tot"] + full["mx"] > SHARD_TOKENS).all()


def test_hll_users_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["hll_users"](sf_dir),
        duck,
        sql_ops.HLL_USERS_SQL,
        ["register"],
    )


def test_hll_estimate_accuracy(ray_session, sf_dir, duck):
    """Deterministic HLL estimate lands within the m=64 error envelope of
    the exact distinct count, and is partition-invariant."""
    import ray.data as rd

    from scripts_ray.ops.sketch import hll_estimate, hll_registers

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    regs = hll_registers(ds, "user_id").to_pandas()
    regs2 = hll_registers(ds.repartition(9), "user_id").to_pandas()
    assert regs.sort_values("register").reset_index(drop=True).equals(
        regs2.sort_values("register").reset_index(drop=True)
    )
    exact = duck.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    est = hll_estimate(regs)
    assert 0.6 * exact < est < 1.4 * exact
