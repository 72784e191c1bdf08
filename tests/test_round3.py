"""Round-3 additions: config-driven KWIC bank, and friends."""

import numpy as np
import pandas as pd


def _cmp(ray_res, duck, sql, sort_cols):
    got = ray_res.to_pandas().sort_values(sort_cols).reset_index(drop=True)
    exp = duck.execute(sql).df().sort_values(sort_cols).reset_index(drop=True)
    for c in got.columns:
        if got[c].dtype != exp[c].dtype and np.issubdtype(exp[c].dtype, np.integer):
            got[c] = got[c].astype(exp[c].dtype)
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
