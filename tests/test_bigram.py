"""Bigram Stupid-Backoff scorer (tokens.BigramScores): semantic checks the
oracle-equality harness can't express — seen-transition vs backoff ordering
and the prune bound on the trained model."""

import numpy as np
import pyarrow as pa

from scripts_ray.tokens import (
    BACKOFF_MILLINATS,
    BigramScores,
    UnigramScores,
    bigram_pairs,
    bigram_turn_scores,
)

CORPUS = pa.array(
    ["the quick brown fox jumps over the lazy dog"] * 50
    + ["quick zephyr vex brown"]  # breaks up a few transitions once
)


def _counts(arr):
    from scripts_ray.tokens import explode

    _, toks = explode(arr)
    vals, cnts = np.unique(toks, return_counts=True)
    return dict(zip(vals.tolist(), cnts.tolist()))


def _bigram_counts(arr, prune=2):
    _, w1, w2 = bigram_pairs(arr)
    pairs = [a + " " + b for a, b in zip(w1, w2)]
    vals, cnts = np.unique(np.array(pairs, dtype=object), return_counts=True)
    return {p: int(c) for p, c in zip(vals, cnts) if c >= prune}


def test_seen_phrase_outscores_shuffled():
    uni = _counts(CORPUS)
    model = BigramScores(uni, _bigram_counts(CORPUS))
    scored = bigram_turn_scores(
        pa.array(
            [
                "the quick brown fox",   # all transitions seen in corpus
                "fox the brown quick",   # same tokens, unseen transitions
                "xyzzy plugh abracadabra",  # fully OOV
                "one",                   # <2 tokens: no transitions
                "",
            ]
        ),
        model,
    )
    assert scored[0] > scored[1] > scored[2]
    assert scored[3] == 0 and scored[4] == 0


def test_backoff_value_is_alpha_times_unigram():
    uni = _counts(CORPUS)
    model = BigramScores(uni, {})  # empty bigram table: everything backs off
    s = bigram_turn_scores(pa.array(["the quick"]), model)
    expected = BACKOFF_MILLINATS + int(
        np.floor(UnigramScores(uni).scores_for(np.array(["quick"], dtype=object))[0])
    )
    assert s[0] == expected


def test_seen_pair_score_is_conditional_millinats():
    uni = _counts(CORPUS)
    big = _bigram_counts(CORPUS)
    model = BigramScores(uni, big)
    c12, c1 = big["quick brown"], uni["quick"]
    expected = int(np.floor(1000.0 * np.log(c12 / float(c1))))
    s = bigram_turn_scores(pa.array(["quick brown"]), model)
    assert s[0] == expected
