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
