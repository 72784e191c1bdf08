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


def test_temporal_joins_hot_user(ray_session):
    """A single user holding most of the stream (hot key) still lands in
    one partition and produces exact counts — skew degrades balance, not
    correctness."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scripts_ray.ops.temporal import asof_join_events, range_join_events

    rng = np.random.RandomState(7)
    n = 5000
    # user 1 owns 80% of events; 50 cold users share the rest
    users = np.where(rng.rand(n) < 0.8, 1, rng.randint(2, 52, n))
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.randint(0, 86400 * 30, n)), unit="s"
    )
    etype = np.where(rng.rand(n) < 0.5, "click", np.where(rng.rand(n) < 0.5, "view", "purchase"))
    df = pd.DataFrame(
        {"event_id": np.arange(n), "user_id": users, "ts": ts,
         "event_type": etype, "value": rng.rand(n)}
    )
    ds = rd.from_pandas(df).repartition(16)
    n_purch = int((df["event_type"] == "purchase").sum())
    asof = asof_join_events(ds).to_pandas()
    rng_out = range_join_events(ds).to_pandas()
    assert len(asof) == n_purch and len(rng_out) == n_purch
    # exact reference for the hot user's last purchase
    hot = df[df["user_id"] == 1]
    p = hot[hot["event_type"] == "purchase"].iloc[-1]
    expect = hot[
        (hot["event_type"] == "click")
        & (hot["ts"] > p["ts"] - pd.Timedelta(days=7))
        & (hot["ts"] <= p["ts"])
    ].shape[0]
    got = rng_out.loc[rng_out["event_id"] == p["event_id"], "n_clicks_7d"].iloc[0]
    assert got == expect


def test_rolling_and_funnel_hot_user(ray_session):
    """One user owns 95% of the stream (hot key lands whole in one
    partition): the ROWS-frame rolling sum and the funnel chain must
    equal a single-process pandas reference."""
    import numpy as np
    import ray.data as rd

    from scripts_ray.ops.temporal import event_funnel, rolling_agg

    rng = np.random.RandomState(7)
    n_hot, n_cold = 5000, 250
    t0 = pd.Timestamp("2024-03-01")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n_hot + n_cold, dtype=np.int64),
            "user_id": np.concatenate(
                [np.zeros(n_hot, dtype=np.int64),
                 1 + (np.arange(n_cold, dtype=np.int64) % 50)]
            ),
            "ts": t0 + pd.to_timedelta(
                rng.randint(0, 10**6, n_hot + n_cold), unit="s"
            ),
            "value": rng.rand(n_hot + n_cold) * 10 - 3,
            "event_type": rng.choice(
                ["view", "click", "purchase"], n_hot + n_cold
            ),
        }
    )

    got = (
        rolling_agg(rd.from_pandas(df), window=5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.assign(
        v=np.floor(df["value"].to_numpy() * 1e6).astype(np.int64)
    ).sort_values(["user_id", "ts", "event_id"])
    g = ref.groupby("user_id")["v"]
    ref = ref.assign(
        roll=g.rolling(5, min_periods=1).sum().reset_index(level=0, drop=True),
        nw=g.rolling(5, min_periods=1).count().reset_index(level=0, drop=True),
    ).sort_values("event_id").reset_index(drop=True)
    assert (got["roll_sum_micro"].to_numpy() == ref["roll"].to_numpy()).all()
    assert (got["n_win"].to_numpy() == ref["nw"].astype(np.int64).to_numpy()).all()

    fun = event_funnel(rd.from_pandas(df)).to_pandas()
    fgot = dict(zip(fun["user_id"].astype(int), fun["reached"].astype(int)))

    def ref_reached(g: pd.DataFrame) -> int:
        anchor, reached = None, 0
        for step in ("view", "click", "purchase"):
            ev = g[g["event_type"] == step]
            if anchor is not None:
                ev = ev[ev["ts"] > anchor]
            if len(ev) == 0:
                return reached
            anchor = ev["ts"].min()
            reached += 1
        return reached

    fref = {
        int(u): ref_reached(g) for u, g in df.groupby("user_id")
    }
    assert fgot == fref
