"""Round-2 final additions: BM25 retrieval, nearest-centroid clustering
assignment, PII redaction."""

import numpy as np
import pandas as pd

from tests.test_round3 import _cmp as _cmp_ds


def _cmp(res, duck, sql, sort_cols):
    if isinstance(res, pd.DataFrame):
        class _Wrap:
            def __init__(self, df):
                self._df = df

            def to_pandas(self):
                return self._df

        res = _Wrap(res)
    return _cmp_ds(res, duck, sql, sort_cols)


def test_bm25_search_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["bm25_search"](sf_dir),
        duck,
        sql_ops.BM25_SEARCH_SQL,
        ["rank"],
    )


def test_bm25_scores_positive_and_ranked(ray_session, sf_dir):
    from scripts_ray import queries

    got = queries.QUERIES["bm25_search"](sf_dir)
    assert (got["score_micro"] > 0).all()
    assert (got["score_micro"].diff().dropna() <= 0).all()  # non-increasing
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_kmeans_assign_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["kmeans_assign"](sf_dir),
        duck,
        sql_ops.KMEANS_ASSIGN_SQL,
        ["vec_id"],
    )


def test_kmeans_seeds_self_assign(ray_session, sf_dir):
    """Every seed vector must land in its own cluster (cos(self)=1)."""
    from scripts_ray import queries
    from scripts_ray.ops.retrieval import KMEANS_N_SEEDS

    got = queries.QUERIES["kmeans_assign"](sf_dir).to_pandas()
    seeds = got[got["vec_id"] < KMEANS_N_SEEDS]
    assert (seeds["cluster"] == seeds["vec_id"]).all()
    # every cluster id is a seed id
    assert set(got["cluster"]) <= set(range(KMEANS_N_SEEDS))


def test_pii_scrub_matches_oracle(ray_session, sf_dir, duck):
    from scripts_ray import queries, sql_ops

    _cmp(
        queries.QUERIES["pii_scrub"](sf_dir),
        duck,
        sql_ops.PII_SCRUB_SQL,
        ["doc_id"],
    )


def test_pii_scrub_removes_all_pii(ray_session, sf_dir):
    from scripts_ray import queries
    from scripts_ray.ops.textstats import PII_EMAIL_RE, PII_PHONE_RE

    got = queries.QUERIES["pii_scrub"](sf_dir).to_pandas()
    assert (got["n_emails"] >= 1).all()
    assert (got["n_phones"] >= 1).all()
    assert not got["scrubbed"].str.contains(PII_EMAIL_RE, regex=True).any()
    assert not got["scrubbed"].str.contains(PII_PHONE_RE, regex=True).any()
    assert got["scrubbed"].str.contains("<EMAIL>", regex=False).all()
    assert got["scrubbed"].str.contains("<PHONE>", regex=False).all()
