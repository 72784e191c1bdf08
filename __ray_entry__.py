"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship quality-filter pipeline on /root/testdata/sf0.001."""
    from scripts_ray.queries import QUERIES

    return QUERIES["qf_pipeline"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from scripts_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from scripts_ray.queries import ORACLES

    return dict(ORACLES)
