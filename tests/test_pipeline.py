"""Flagship pipeline correctness: Ray DAG vs single-process oracle vs DuckDB SQL."""

import pandas as pd
import pytest

from scripts_ray import oracle, pipelines, sources, sql


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    assert len(a) == len(b)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        x, y = a[c], b[c]
        if x.dtype == object:
            assert (x.fillna("\0") == y.fillna("\0")).all(), c
        else:
            assert (x == y).all(), c


@pytest.fixture(scope="module")
def expected(sf_dir):
    counts = pipelines.build_model_counts(sf_dir)
    tbl = sources.derive_transcripts_table(sf_dir)
    return counts, _norm(oracle.run_quality_filter(tbl, counts).to_pandas())


def test_derivation_matches_sql(sf_dir, duck):
    py = _norm(sources.derive_transcripts_table(sf_dir).to_pandas())
    sq = _norm(
        duck.execute(
            "WITH " + sql.TRANSCRIPTS_CTE.strip() + " SELECT * FROM transcripts"
        ).df()
    )
    _assert_frames_equal(py, sq)


def test_oracle_matches_sql(duck, expected):
    _, exp = expected
    sq = _norm(duck.execute(sql.QF_PIPELINE_SQL).df())
    _assert_frames_equal(exp, sq)


def test_ray_pipeline_matches_oracle(ray_session, sf_dir, expected):
    counts, exp = expected
    ds = sources.derive_transcripts_ds(sf_dir)
    out = pipelines.quality_filter(ds, ray_session.put(counts))
    _assert_frames_equal(_norm(out.to_pandas()), exp)


def test_keep_f1_vs_oracle_is_exact(ray_session, sf_dir, expected):
    """North-rule gate: keep/drop F1 ≥ 0.99 — we assert exact equality,
    which implies F1 = 1.0."""
    counts, exp = expected
    out = _norm(
        pipelines.quality_filter(
            sources.derive_transcripts_ds(sf_dir), ray_session.put(counts)
        ).to_pandas()
    )
    assert (out["keep"] == exp["keep"]).all()
    assert (out["scrubbed_text"] == exp["scrubbed_text"]).all()


def test_row_count_conservation(ray_session, sf_dir, expected):
    counts, exp = expected
    ds = sources.derive_transcripts_ds(sf_dir)
    assert (
        pipelines.quality_filter(ds, ray_session.put(counts)).count() == len(exp)
    )


def test_turn_ids_unique(sf_dir):
    tbl = sources.derive_transcripts_table(sf_dir).to_pandas()
    assert not tbl.duplicated(["conv_id", "turn_idx"]).any()
    assert (
        tbl.groupby("conv_id")["turn_idx"].agg(lambda s: (s.sort_values().to_numpy()
        == range(len(s))).all()).all()
    ), "turn_idx must be contiguous from 0 within each conversation"


def test_synth_transcripts_deterministic_and_skewed():
    a = sources.synth_transcripts(n_convs=40, seed=3)
    b = sources.synth_transcripts(n_convs=40, seed=3)
    assert a.equals(b)
    lens = pd.Series(a["conv_id"].to_pandas()).value_counts()
    assert lens.min() >= 5


def test_stage_list_equals_flagship(ray_session, sf_dir, expected):
    """The declared stage-list surface composes to the same result as the
    fused flagship DAG."""
    counts, exp = expected
    out = pipelines.run_stages(
        sources.derive_transcripts_ds(sf_dir),
        ["scrub", "score", "gate", "ordered"],
        ray_session.put(counts),
    )
    _assert_frames_equal(_norm(out.to_pandas()), exp)


def test_scrub_is_idempotent(sf_dir):
    """In-place-rewrite analog: re-running the scrub chain over its own
    output is a no-op (the reference rewrites files in place idempotently)."""
    from scripts_ray.rules import scrub_text

    texts = sources.derive_transcripts_table(sf_dir)["text"].combine_chunks()
    once = scrub_text(texts)
    twice = scrub_text(once)
    assert once.equals(twice)
