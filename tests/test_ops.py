"""Every registered query vs its DuckDB oracle at sf0.001 — the same
row-count + schema + order-insensitive value-hash comparison the driver
performs."""

import hashlib

import pandas as pd
import pytest

from scripts_ray.queries import BENCH_EXTRAS, ORACLES, QUERIES

NON_QF = [n for n in ORACLES if not n.startswith("qf_")]


def test_registry_structurally_all_green():
    """Every entry the driver can sample from queries() has a SQL oracle;
    the rows-only measured variants live ONLY on the bench surface."""
    assert set(QUERIES) <= set(ORACLES), sorted(set(QUERIES) - set(ORACLES))
    assert not set(BENCH_EXTRAS) & set(QUERIES)


def to_df(x):
    if isinstance(x, pd.DataFrame):
        return x
    return x.to_pandas()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = df.astype(str).apply(lambda r: "|".join(r), axis=1).sort_values()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", NON_QF)
def test_query_matches_oracle(name, ray_session, sf_dir, duck):
    rdf = to_df(QUERIES[name](sf_dir))
    odf = duck.execute(ORACLES[name]).df()
    assert len(rdf) == len(odf), f"{name}: rows {len(rdf)} vs {len(odf)}"
    assert sorted(rdf.columns) == sorted(odf.columns), f"{name}: schema"
    assert value_hash(rdf) == value_hash(odf), f"{name}: value hash"


@pytest.mark.parametrize("name", sorted(BENCH_EXTRAS))
def test_rows_only_queries_deterministic(name, ray_session, sf_dir):
    a = to_df(BENCH_EXTRAS[name](sf_dir))
    b = to_df(BENCH_EXTRAS[name](sf_dir))
    assert len(a) == len(b)
    assert value_hash(a) == value_hash(b), f"{name}: nondeterministic"
