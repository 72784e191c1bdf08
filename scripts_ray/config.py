"""Pipeline configuration surface (SURVEY §2.9).

The reference scatters its knobs across CLI args, env vars and hard-coded
lists (pluggable classifier `--method` /root/reference/src/cur-prot/reclassify.py:84-98,
protected-class exclusions :114, the ordered matcher ladder
/root/reference/src/fuzzy_matching.py:75-76, hard-coded skip lists
/root/reference/src/cur-prot/split_into_sections.py:20-23). The engine
replaces all of that with ONE declarative config object, loadable from
JSON, whose fields feed the corresponding stages:

- ``protected_roles``  → gate.decide (never re-labeled)
- ``cascade``          → attribution.attribute_turns probe order
- ``deny_conv_ids``    → denylist filter stage (D6), broadcast membership
- ``scorer``           → pipelines scorer strategy name (ML3)

The default denylist is generated from a deterministic rule
(user number % DENY_USER_MOD == DENY_USER_REM) so the DuckDB oracle can
re-state it; a user-supplied config replaces the list wholesale — the
engine consumes the materialized LIST, never the rule.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

DENY_USER_MOD = 50
DENY_USER_REM = 7
_DENY_USER_RANGE = 10_000  # covers every synthesizable user id


def default_deny_conv_ids() -> tuple[str, ...]:
    return tuple(
        f"conv-{u:06d}"
        for u in range(_DENY_USER_RANGE)
        if u % DENY_USER_MOD == DENY_USER_REM
    )


# KWIC pattern bank (M13 generalized): named keyword-in-context regexes,
# config-replaceable; the oracle restates the DEFAULTS (a user-supplied
# bank changes the query, as with the denylist).
DEFAULT_KWIC_BANK: tuple[tuple[str, str], ...] = (
    ("spark", ".{0,30}spark.{0,30}"),
    ("join", ".{0,30}join.{0,30}"),
    ("filter", ".{0,30}filter.{0,30}"),
)


@dataclass(frozen=True)
class EngineConfig:
    protected_roles: tuple[str, ...] = ("system", "moderator")
    cascade: tuple[str, ...] = ("primary", "fallback")
    deny_conv_ids: tuple[str, ...] = field(default_factory=default_deny_conv_ids)
    scorer: str = "unigram"
    kwic_bank: tuple[tuple[str, str], ...] = DEFAULT_KWIC_BANK

    @staticmethod
    def from_json(path: str) -> "EngineConfig":
        with open(path) as f:
            raw = json.load(f)
        kwargs = {}
        for k in ("protected_roles", "cascade", "deny_conv_ids"):
            if k in raw:
                kwargs[k] = tuple(raw[k])
        if "scorer" in raw:
            kwargs["scorer"] = raw["scorer"]
        if "kwic_bank" in raw:  # JSON object: {name: pattern}
            kwargs["kwic_bank"] = tuple(raw["kwic_bank"].items())
        return EngineConfig(**kwargs)


DEFAULT_CONFIG = EngineConfig()


def denylist_filter(ds, config: EngineConfig = DEFAULT_CONFIG):
    """D6: drop turns of denylisted conversations. The denylist is a
    broadcast membership set inside the task closure (dimension-sized;
    at larger list sizes move it to ``ray.put``)."""
    import pandas as pd

    deny = frozenset(config.deny_conv_ids)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.loc[~batch["conv_id"].isin(deny)]

    return ds.map_batches(keep, batch_format="pandas")
