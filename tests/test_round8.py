"""Round-4: ADVICE regression fixes (pinned edge-case conventions) and
scale-path hardening."""

import numpy as np
import pandas as pd


def test_conv_balance_zero_char_conversation_scores_zero(ray_session):
    """The pinned convention: a conversation whose turns are all empty
    strings emits assistant_permille 0 (both engines), not an error."""
    import ray.data as rd

    from scripts_ray.ops.windows import conv_balance

    df = pd.DataFrame(
        {
            "conv_id": ["c0", "c0", "c1", "c1"],
            "role": ["user", "assistant", "user", "assistant"],
            "text": ["", "", "hi", "hello there"],
        }
    )
    out = (
        conv_balance(rd.from_pandas(df))
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert out.loc["c0", "assistant_permille"] == 0
    assert out.loc["c0", "user_chars"] == 0
    assert (
        out.loc["c1", "assistant_permille"]
        == 1000 * len("hello there") // (2 + len("hello there"))
    )


def test_column_profile_excludes_nulls_from_distinct(ray_session):
    """count(DISTINCT col) semantics: NULL is counted in n_null but never
    as a distinct value (the oracle's convention)."""
    import ray.data as rd

    from scripts_ray.ops.relational import column_profile

    df = pd.DataFrame({"a": ["x", "y", None, "x", None]})
    out = column_profile(lambda col: rd.from_pandas(df[[col]]), ("a",))
    row = out.iloc[0]
    assert row["n_rows"] == 5
    assert row["n_distinct"] == 2  # x, y — not the null group
    assert row["n_null"] == 2


def test_bucket_join_skips_empty_buckets(ray_session, tmp_path):
    """An events table whose user_ids occupy only 2 of 8 buckets writes no
    hive directory for the other 6 — the join must skip them instead of
    raising FileNotFoundError, and still match the pandas join."""
    import ray.data as rd

    from scripts_ray.ops.relational import bucket_join_events

    df = pd.DataFrame(
        {
            "event_id": np.arange(10, dtype=np.int64),
            "user_id": np.array([8, 8, 16, 16, 16, 9, 9, 8, 16, 9],
                                dtype=np.int64),  # buckets {0, 1} only
            "value": np.linspace(0.5, 5.0, 10),
        }
    )
    out = (
        bucket_join_events(lambda: rd.from_pandas(df), str(tmp_path / "bj"))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp_totals = df.groupby("user_id").size()
    assert len(out) == 10
    assert (
        out["n_total"].to_numpy()
        == exp_totals.loc[out["user_id"]].to_numpy()
    ).all()
    assert (
        out["value_micro"].to_numpy()
        == np.floor(df["value"].to_numpy() * 1_000_000.0).astype(np.int64)
    ).all()


def test_inverted_index_seg_caps_stopword_group(ray_session):
    """20k docs all containing 'the': the single-string layout would build
    one 20k-entry postings group; the segmented layout must cap every
    group at the doc_id range and reassemble to the identical postings."""
    import ray.data as rd

    from scripts_ray.ops.retrieval import INDEX_SEG_RANGE, inverted_index_seg

    n = 20_000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["the tok" + chr(ord("a") + i % 26) for i in range(n)],
        }
    )
    out = inverted_index_seg(rd.from_pandas(df)).to_pandas()
    the = out[out["tok"] == "the"].sort_values("seg_idx")
    # every group bounded by the range, full coverage, exact reassembly
    assert the["df_seg"].max() <= INDEX_SEG_RANGE
    assert len(the) == -(-n // INDEX_SEG_RANGE)
    assert the["df_seg"].sum() == n
    joined = ",".join(the["postings_chunk"])
    assert joined == ",".join(str(i) for i in range(n))


def test_gopher_filter_matches_flag_then_subset(ray_session):
    """The fused in-place gate must keep exactly the rows gopher_quality
    flags keep=True, preserving all input columns (the capstone relies on
    this equivalence to avoid shipping corpus text through a join)."""
    import ray.data as rd

    from scripts_ray.ops.textstats import gopher_filter, gopher_quality

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    ds = rd.from_pandas(docs)
    flags = gopher_quality(ds).to_pandas().sort_values("doc_id")
    fused = gopher_filter(ds).to_pandas().sort_values("doc_id")
    want = set(flags.loc[flags["keep"], "doc_id"])
    assert set(fused["doc_id"]) == want
    assert list(fused.columns) == ["doc_id", "text"]
    merged = fused.merge(docs, on="doc_id", suffixes=("_f", "_raw"))
    assert (merged["text_f"] == merged["text_raw"]).all()


def test_compress_ratio_fixed_rle_semantics(ray_session):
    """Pinned character-RLE twin: repetitive text yields few runs / low
    ratio, diverse text approaches 10^6; code-POINT granularity (a
    combining accent is its own run) matches the DuckDB oracle's
    string_split('') semantics."""
    import ray.data as rd

    from scripts_ray.ops.textstats import compress_ratio_fixed

    df = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": ["aaaaaaaaab", "abcdefghij", "éé"],
        }
    )
    out = (
        compress_ratio_fixed(rd.from_pandas(df))
        .to_pandas()
        .set_index("doc_id")
    )
    assert int(out.loc[1, "n_runs"]) == 2 and int(out.loc[1, "raw_len"]) == 10
    assert int(out.loc[1, "ratio_micro"]) == 200_000
    assert int(out.loc[2, "n_runs"]) == 10
    assert int(out.loc[2, "ratio_micro"]) == 1_000_000
    # 4 code points, every neighbor differs -> 4 runs
    assert int(out.loc[3, "raw_len"]) == 4 and int(out.loc[3, "n_runs"]) == 4


def test_q5_plan_equivalence(ray_session, sf_dir):
    """The size-routed Q5 star join gives IDENTICAL results on both plans:
    broadcast dims (default at fixture scale — customer/supplier are under
    Q5_BROADCAST_KEY_LIMIT) and the distributed hash_join route (forced
    with broadcast_limit=0, the 100-TB path where the dims scale with the
    facts)."""
    from scripts_ray.ops import relational
    from scripts_ray.queries import _read

    def run(limit):
        return relational.q5_local_supply(
            _read(sf_dir, "orders",
                  columns=["o_orderkey", "o_custkey", "o_orderdate"]),
            _read(sf_dir, "lineitem",
                  columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                           "l_discount"]),
            _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
            _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
            sf_dir,
            broadcast_limit=limit,
        ).to_pandas().sort_values("n_name").reset_index(drop=True)

    bcast = run(relational.Q5_BROADCAST_KEY_LIMIT)
    dist = run(0)
    assert len(bcast) > 0
    assert bcast.equals(dist)
