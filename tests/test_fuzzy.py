"""Fuzzy-string matcher ladder (ML5 depth): unit coverage of the tiers,
the uniqueness/fall-through rule, and the vectorized Levenshtein DP —
reference semantics /root/reference/src/fuzzy_matching.py:75-103."""

import numpy as np
import pandas as pd
import pytest

from scripts_ray.ops import fuzzy


def _reg_from_names(names, keys=None):
    """Registry from an in-memory name list (shared packing)."""
    keys = (
        np.arange(len(names), dtype=np.int64)
        if keys is None
        else np.asarray(keys, dtype=np.int64)
    )
    return fuzzy.build_registry(
        pd.DataFrame({"p_partkey": keys, "p_name": names})
    )


def _py_lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_lev_pairs_matches_reference_dp():
    rng = np.random.default_rng(7)
    alpha = np.array(list("abcde "))
    a = ["".join(rng.choice(alpha, rng.integers(0, 12))) for _ in range(60)]
    b = ["".join(rng.choice(alpha, rng.integers(0, 12))) for _ in range(60)]
    w = max(max(map(len, a)), max(map(len, b)), 1)
    d = fuzzy.lev_pairs(
        fuzzy._encode(np.array(a, dtype=object), w),
        np.array([len(s) for s in a], dtype=np.int64),
        fuzzy._encode(np.array(b, dtype=object), w),
        np.array([len(s) for s in b], dtype=np.int64),
    )
    exp = np.array([_py_lev(x, y) for x, y in zip(a, b)], dtype=np.int64)
    assert (d == exp).all()


def test_ladder_misspelled_keys_resolve_past_exact():
    """Misspelled probes that exact matching misses must land in the lev
    tier with the right entity — the reason the ladder exists."""
    reg = _reg_from_names(["alice johnson", "bob smith", "carol jones"])
    probes = np.array(
        ["alice johnson",      # exact
         "smith bob",          # tokenset (order flip)
         "bob smith junior",   # subset (extra token)
         "alicz johnson",      # lev: 1 substitution, misses exact
         "carol jonez",        # lev: 1 substitution
         "zzzzqqqq"],          # unknown
        dtype=object,
    )
    keys, types = fuzzy.match_ladder(probes, reg)
    assert list(types) == ["exact", "tokenset", "subset", "lev", "lev",
                           "unknown"]
    assert list(keys) == [0, 1, 1, 0, 2, -1]


def test_ladder_uniqueness_falls_through_ambiguity():
    """A tier that matches MORE than one entity must not claim the probe
    (reference's unique-match rule); the probe falls to later tiers."""
    reg = _reg_from_names(["ann lee", "ann dee"])
    # lev distance 1 from BOTH names -> ambiguous at lev -> unknown
    keys, types = fuzzy.match_ladder(np.array(["ann gee"], dtype=object), reg)
    assert list(types) == ["unknown"] and list(keys) == [-1]
    # but distance 1 from exactly one -> claimed
    keys, types = fuzzy.match_ladder(np.array(["ann lex"], dtype=object), reg)
    assert list(types) == ["lev"] and list(keys) == [0]


def test_ladder_order_is_observable():
    """§2.9: reordering / truncating the ladder changes match_type — the
    cascade is configuration, not hardcoded."""
    reg = _reg_from_names(["alice johnson"])
    p = np.array(["johnson alice"], dtype=object)
    _, t_full = fuzzy.match_ladder(p, reg)
    assert list(t_full) == ["tokenset"]
    _, t_cut = fuzzy.match_ladder(p, reg, ladder=("exact", "lev"))
    assert list(t_cut) == ["unknown"]
    with pytest.raises(ValueError, match="unknown fuzzy tier"):
        fuzzy.match_ladder(p, reg, ladder=("exact", "soundex"))


def test_fuzzy_attribution_oracle(ray_session, sf_dir, duck):
    """End-to-end engine-vs-SQL equality of the full ladder over events."""
    from scripts_ray import queries, sql_ops

    got = (
        queries.QUERIES["fuzzy_attribution"](sf_dir)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = (
        duck.execute(sql_ops.FUZZY_ATTRIBUTION_SQL)
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the fixture's corruption modes exercise EVERY tier
    assert set(got["match_type"]) == {"exact", "tokenset", "subset", "lev",
                                      "first_last", "two_last",
                                      "first_last_rev", "unknown"}


def test_positional_tiers_resolve_multi_token_names():
    """Tiers 5-7 (reference firstname_lastname / two_lastnames /
    firstname_lastname_reversed): middle-token noise that defeats the
    containment tiers resolves positionally, in ladder order."""
    reg = _reg_from_names(
        ["alice marie johnson", "bob james smith", "carol ann jones"]
    )
    probes = np.array(
        ["alice xq johnson",    # middle replaced -> first_last
         "xyzzy james smith",   # first replaced -> two_last
         "johnson xq alice"],   # reversed + noise -> first_last_rev
        dtype=object,
    )
    keys, types = fuzzy.match_ladder(probes, reg)
    assert list(types) == ["first_last", "two_last", "first_last_rev"]
    assert list(keys) == [0, 1, 0]
    # ambiguity rule holds positionally too: two names sharing (first,
    # last) make the first_last form unclaimable
    reg2 = _reg_from_names(["ann b lee", "ann c lee"])
    keys2, types2 = fuzzy.match_ladder(
        np.array(["ann xqzzy lee"], dtype=object), reg2
    )
    assert list(types2) == ["unknown"] and list(keys2) == [-1]
