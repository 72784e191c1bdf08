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
