"""North-rule skew handling: the flagship pipeline must stay correct when
conversation lengths are heavily skewed (a single conversation with
thousands of turns lands whole in one hash partition), and the CLI entry
point must run end-to-end with resumable bucketed output."""

import json

import pandas as pd
import pytest

from scripts_ray import cli, oracle, pipelines, sources


@pytest.fixture(scope="module")
def skewed(sf_dir):
    tbl = sources.synth_transcripts(n_convs=60, seed=11, max_tail_turns=2000)
    counts = pipelines.build_model_counts(sf_dir)
    return tbl, counts


def test_skewed_convs_exact_vs_oracle(ray_session, skewed):
    import ray.data as rd

    tbl, counts = skewed
    lens = pd.Series(tbl["conv_id"].to_pandas()).value_counts()
    assert lens.max() >= 200, "fixture must contain a heavy-tail conversation"

    out = (
        pipelines.quality_filter(
            rd.from_arrow(tbl), ray_session.put(counts), num_partitions=8
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = (
        oracle.run_quality_filter(tbl, counts)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    assert (out["keep"].to_numpy() == exp["keep"].to_numpy()).all()
    assert (out["scrubbed_text"] == exp["scrubbed_text"]).all()


def test_cli_end_to_end(ray_session, sf_dir, tmp_path, capsys):
    cli.main(
        [
            "run",
            "--sf-dir",
            sf_dir,
            "--output",
            str(tmp_path / "out"),
            "--buckets",
            "4",
        ]
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["buckets_done"] == 4
    n_rows = len(sources.derive_transcripts_table(sf_dir))
    assert rep["rows_out"] == n_rows
    assert 0 < rep["kept"] < n_rows
