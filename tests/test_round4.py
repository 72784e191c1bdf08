"""Round-2 late additions: temporal joins (as-of, range), hopping windows,
sentence-to-page alignment (M17 analog), Q3-shaped mixed join plan."""

import numpy as np
import pandas as pd

from tests.test_round3 import _cmp


def test_asof_events_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["asof_events"](sf_dir),
        duck,
        sql_ops.ASOF_EVENTS_SQL,
        ["event_id"],
    )


def test_range_join_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["clicks_before_purchase"](sf_dir),
        duck,
        sql_ops.RANGE_JOIN_EVENTS_SQL,
        ["event_id"],
    )


def test_hopping_windows_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["hopping_windows"](sf_dir),
        duck,
        sql_ops.HOPPING_WINDOWS_SQL,
        ["event_type", "win_start"],
    )


def test_hopping_every_event_in_two_windows(ray_session, sf_dir, duck):
    """Replication invariant: sum(n) over all windows == 2 × event count."""
    from scripts_ray import queries

    got = queries.QUERIES["hopping_windows"](sf_dir).to_pandas()
    n_events = duck.execute("SELECT count(*) FROM events").fetchone()[0]
    assert got["n"].sum() == 2 * n_events


def test_page_align_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["page_align"](sf_dir),
        duck,
        sql_ops.PAGE_ALIGN_SQL,
        ["conv_id", "turn_idx"],
    )


def test_page_align_recovers_provenance(ray_session, sf_dir, duck):
    """The aligner re-derives turn→document provenance from text alone;
    the generator's ground truth is doc_id = event_id % n_docs. For turns
    the aligner assigns at all, the assignment must be overwhelmingly the
    true source document (only near-duplicate docs can mislead it)."""
    from scripts_ray import queries

    got = queries.QUERIES["page_align"](sf_dir).to_pandas()
    truth = duck.execute(
        """
        SELECT 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
                    AS INTEGER) AS turn_idx,
               CAST(event_id % (SELECT count(*) FROM documents) AS BIGINT) AS true_doc
        FROM events
        """
    ).df()
    m = got.merge(truth, on=["conv_id", "turn_idx"], how="left")
    assert len(m) > 0
    assert (m["page_doc"] == m["true_doc"]).mean() >= 0.95


def test_asof_range_same_partitioning(ray_session, sf_dir):
    """Both temporal joins emit one row per probe event regardless of the
    partition count (exchange correctness under repartitioning)."""
    import duckdb

    from scripts_ray import queries

    n_purchases = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet' "
        "WHERE event_type = 'purchase'"
    ).fetchone()[0]
    asof = queries.QUERIES["asof_events"](sf_dir).to_pandas()
    rng = queries.QUERIES["clicks_before_purchase"](sf_dir).to_pandas()
    assert len(asof) == n_purchases
    assert len(rng) == n_purchases
    assert asof["event_id"].is_unique and rng["event_id"].is_unique


def test_q3_shipping_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["q3_shipping"](sf_dir),
        duck,
        sql_ops.Q3_SHIPPING_SQL,
        ["o_orderkey"],
    )


def test_range_join_adversarial_boundaries(ray_session):
    """Hand-built stream: clicks exactly at ts-7d (excluded), just inside
    (included), at ts (included), after ts (excluded); multi-user; a user
    with purchases but no clicks."""
    import ray.data as rd

    from scripts_ray.ops.temporal import range_join_events

    t0 = pd.Timestamp("2024-03-01 12:00:00")
    d7 = pd.Timedelta(days=7)
    rows = [
        # user 1: one purchase at t0; clicks probing every boundary
        dict(event_id=1, user_id=1, ts=t0, event_type="purchase"),
        dict(event_id=2, user_id=1, ts=t0 - d7, event_type="click"),           # excluded (ts > t0-7d strict)
        dict(event_id=3, user_id=1, ts=t0 - d7 + pd.Timedelta(seconds=1),
             event_type="click"),                                              # included
        dict(event_id=4, user_id=1, ts=t0, event_type="click"),                # included (<= ts)
        dict(event_id=5, user_id=1, ts=t0 + pd.Timedelta(seconds=1),
             event_type="click"),                                              # excluded
        # user 2: purchase with zero clicks
        dict(event_id=6, user_id=2, ts=t0, event_type="purchase"),
        # user 3: clicks only — no output row
        dict(event_id=7, user_id=3, ts=t0, event_type="click"),
    ]
    df = pd.DataFrame(rows)
    out = (
        range_join_events(rd.from_pandas(df))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [1, 6]
    assert out["n_clicks_7d"].tolist() == [2, 0]


def test_asof_tie_and_miss(ray_session):
    """Two views at the same max ts collapse to max(value); a purchase
    before any view gets nulls."""
    import ray.data as rd

    from scripts_ray.ops.temporal import asof_join_events

    t0 = pd.Timestamp("2024-03-01 12:00:00")
    m = pd.Timedelta(minutes=1)
    df = pd.DataFrame(
        [
            dict(event_id=1, user_id=1, ts=t0, event_type="purchase", value=0.0),
            dict(event_id=2, user_id=1, ts=t0 - m, event_type="view", value=3.0),
            dict(event_id=3, user_id=1, ts=t0 - m, event_type="view", value=9.0),
            dict(event_id=4, user_id=1, ts=t0 - 2 * m, event_type="view", value=7.0),
            dict(event_id=5, user_id=2, ts=t0, event_type="purchase", value=0.0),
            dict(event_id=6, user_id=2, ts=t0 + m, event_type="view", value=1.0),
        ]
    )
    out = (
        asof_join_events(rd.from_pandas(df))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [1, 5]
    assert out.loc[0, "view_value"] == 9.0
    assert out.loc[0, "view_ts"] == t0 - m
    assert pd.isna(out.loc[1, "view_value"]) and pd.isna(out.loc[1, "view_ts"])


def test_cms_registers_match_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["cms_words"](sf_dir),
        duck,
        sql_ops.CMS_WORDS_SQL,
        ["row", "col"],
    )


def test_cms_point_estimates_bound_exact_counts(ray_session, sf_dir, duck):
    """CMS never undercounts; for heavy hitters the overcount is bounded by
    the classic e·N/W bound (with generous slack for the tiny fixture)."""
    import math

    from scripts_ray import queries
    from scripts_ray.ops.sketch import CMS_W, cms_point_estimate

    regs = queries.QUERIES["cms_words"](sf_dir).to_pandas()
    exact = duck.execute(
        """
        SELECT tok, count(*) AS n FROM (
          SELECT unnest(list_filter(string_split_regex(lower(text),
                 '[^a-zà-öø-ÿ]+'), x -> x <> '')) AS tok
          FROM documents
        ) GROUP BY tok ORDER BY n DESC LIMIT 10
        """
    ).df()
    n_total = regs[regs["row"] == 0]["n"].sum()
    ests = cms_point_estimate(regs, exact["tok"].tolist())
    for tok, n in zip(exact["tok"], exact["n"]):
        assert ests[tok] >= n, (tok, ests[tok], n)
        assert ests[tok] <= n + 4 * math.e * n_total / CMS_W, (tok, ests[tok], n)


def test_docs_csv_by_source_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["docs_csv_by_source"](sf_dir),
        duck,
        sql_ops.DOCS_BY_SOURCE_SQL,
        ["source", "lang"],
    )


def test_bib_compile_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["bib_compile"](sf_dir),
        duck,
        sql_ops.BIB_COMPILE_SQL,
        ["doc_id"],
    )


def test_bib_compile_artifact_is_sorted_and_valid_only(ray_session, sf_dir, duck):
    from scripts_ray import queries

    got = queries.QUERIES["bib_compile"](sf_dir).to_pandas()
    assert got["doc_id"].is_monotonic_increasing
    n_valid = duck.execute(
        "SELECT count(*) FROM documents WHERE length(text) >= 50"
    ).fetchone()[0]
    assert len(got) == n_valid
    assert got["entry"].str.startswith("@doc{").all()


def test_image_resize_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["image_resize"](sf_dir),
        duck,
        sql_ops.IMAGE_RESIZE_SQL,
        ["item_id"],
    )


def test_image_resize_never_upscales_and_fits(ray_session, sf_dir):
    from scripts_ray import queries
    from scripts_ray.ops.multimodal import RESIZE_MAX_SIDE

    got = queries.QUERIES["image_resize"](sf_dir).to_pandas()
    assert (got["out_w"] <= RESIZE_MAX_SIDE).all()
    assert (got["out_h"] <= RESIZE_MAX_SIDE).all()
    assert (got["scale_permille"] <= 1000).all()


def test_orders_no_lineitem_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["orders_no_lineitem"](sf_dir),
        duck,
        sql_ops.ORDERS_NO_LINEITEM_SQL,
        ["o_orderkey"],
    )


def test_hash_join_semi_anti_vs_pandas(ray_session):
    """semi/anti hash_join against the pandas reference, including keys on
    only one side and duplicate right keys (must not multiply semi rows)."""
    import ray.data as rd

    from scripts_ray.ops.hashagg import hash_join

    left = pd.DataFrame({"k": [1, 2, 3, 4, 4], "a": [10, 20, 30, 40, 41]})
    right = pd.DataFrame({"rk": [2, 4, 4, 9], "b": [0, 0, 0, 0]})
    semi = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right),
                  on="k", right_on="rk", how="semi")
        .to_pandas().sort_values("a").reset_index(drop=True)
    )
    anti = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right),
                  on="k", right_on="rk", how="anti")
        .to_pandas().sort_values("a").reset_index(drop=True)
    )
    assert semi["a"].tolist() == [20, 40, 41]
    assert list(semi.columns) == ["k", "a"]
    assert anti["a"].tolist() == [10, 30]


def test_hash_join_anti_empty_right(ray_session):
    import ray.data as rd

    from scripts_ray.ops.hashagg import hash_join

    left = pd.DataFrame({"k": [1, 2], "a": [10, 20]})
    right = pd.DataFrame({"rk": [1], "b": [0]})
    empty_right = rd.from_pandas(right).filter(lambda r: r["rk"] < 0)
    out = hash_join(
        rd.from_pandas(left), empty_right, on="k", right_on="rk",
        how="anti", empty_right_cols=["rk", "b"],
    ).to_pandas()
    assert sorted(out["a"].tolist()) == [10, 20]


def test_click_purchase_matrix_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["click_purchase_matrix"](sf_dir),
        duck,
        sql_ops.CLICK_PURCHASE_MATRIX_SQL,
        ["user_id"],
    )


def test_hash_join_outer_vs_pandas(ray_session):
    """Full outer join against the pandas reference: left-only, right-only
    and matched keys, duplicate keys multiplying matched rows."""
    import ray.data as rd

    from scripts_ray.ops.hashagg import hash_join

    left = pd.DataFrame({"k": [1, 2, 2], "a": [10, 20, 21]})
    right = pd.DataFrame({"rk": [2, 3], "b": [200, 300]})
    got = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right),
                  on="k", right_on="rk", how="outer")
        .to_pandas()
        .astype("Float64")
        .sort_values(["k", "a", "rk"], na_position="last")
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, how="outer", left_on="k", right_on="rk")
        .astype("Float64")
        .sort_values(["k", "a", "rk"], na_position="last")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_dataset_split_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["dataset_split"](sf_dir),
        duck,
        sql_ops.DATASET_SPLIT_SQL,
        ["doc_id"],
    )


def test_dataset_split_proportions_and_stability(ray_session, sf_dir):
    """~90/5/5 proportions, and a document's split never depends on the
    rest of the corpus (append-stability: the first half of the table gets
    identical assignments when processed alone)."""
    import ray.data as rd

    from scripts_ray.ops.sampling import dataset_split

    full = queries_split = None
    from scripts_ray import queries

    full = queries.QUERIES["dataset_split"](sf_dir).to_pandas()
    frac = full["split"].value_counts(normalize=True)
    assert 0.80 <= frac["train"] <= 0.97
    assert frac.get("val", 0) > 0 and frac.get("test", 0) > 0
    half_ids = full["doc_id"].iloc[: len(full) // 2]
    half = dataset_split(
        rd.from_pandas(pd.DataFrame({"doc_id": half_ids}))
    ).to_pandas()
    m = half.merge(full, on="doc_id", suffixes=("_half", "_full"))
    assert (m["split_half"] == m["split_full"]).all()


def test_cli_query_and_list(ray_session, sf_dir, tmp_path, capsys):
    """`query <name>` runs any registered operator; `list` enumerates the
    registry. The CLI reuses the session's Ray (guarded init)."""
    from scripts_ray.cli import main

    main(["list"])
    names = [l.split("\t")[0] for l in capsys.readouterr().out.splitlines()]
    assert "word_freq" in names and "qf_pipeline" in names

    out = str(tmp_path / "wf.csv")
    main(["query", "word_freq", "--sf-dir", sf_dir, "--output", out])
    got = pd.read_csv(out)
    assert list(got.columns) == ["token", "cnt"] and len(got) > 0
