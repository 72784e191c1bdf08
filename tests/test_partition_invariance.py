"""Results must not depend on physical partitioning choices."""

import pandas as pd

from scripts_ray import pipelines, sources


def _run(ray_session, sf_dir, num_partitions):
    counts = pipelines.build_model_counts(sf_dir)
    out = pipelines.quality_filter(
        sources.derive_transcripts_ds(sf_dir),
        ray_session.put(counts),
        num_partitions=num_partitions,
    )
    return (
        out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def test_flagship_invariant_to_num_partitions(ray_session, sf_dir):
    a = _run(ray_session, sf_dir, 3)
    b = _run(ray_session, sf_dir, 64)
    assert a.equals(b)


def test_attribution_exercises_full_cascade(ray_session, sf_dir):
    import ray

    from scripts_ray.ops import attribution
    from scripts_ray.sources import derive_transcripts_ds

    ref = ray.put(attribution.build_order_index(sf_dir))
    df = attribution.attribute_turns(derive_transcripts_ds(sf_dir), ref).to_pandas()
    kinds = set(df["match_type"].unique())
    assert kinds == {"primary", "fallback", "unknown"}
    assert (df.loc[df.match_type == "unknown", "order_key"] == -1).all()
    assert df.loc[df.match_type == "unknown", "days_since"].isna().all()
    assert (df.loc[df.match_type != "unknown", "days_since"] >= 0).all()
    assert (
        df.loc[df.match_type != "unknown", "days_since"]
        <= attribution.MAX_AGE_DAYS
    ).all()


def test_conv_gate_turns_invariant_to_num_partitions(ray_session, sf_dir):
    """The conversation gate applies inside conv_id-keyed partitions — the
    per-turn verdicts must not depend on how many partitions the exchange
    produces (a conversation never straddles partitions)."""
    import numpy as np

    from scripts_ray import rules as R
    from scripts_ray.ops.hashagg import map_partitions_by_key
    from scripts_ray.queries import QUERIES, _put_counts
    from scripts_ray.pipelines import quality_filter
    from scripts_ray.sources import derive_transcripts_ds

    def apply_gate(part: pd.DataFrame) -> pd.DataFrame:
        kept = part["keep"].astype("int64")
        g = kept.groupby(part["conv_id"])
        ok = (
            R.CONV_KEEP_DEN * g.transform("sum")
            >= R.CONV_KEEP_NUM * g.transform("count")
        )
        return pd.DataFrame(
            {
                "conv_id": part["conv_id"],
                "turn_idx": part["turn_idx"],
                "keep_final": part["keep"] & ok,
            }
        )

    def run(n_parts):
        qf = quality_filter(derive_transcripts_ds(sf_dir), _put_counts(sf_dir))
        return (
            map_partitions_by_key(qf, "conv_id", apply_gate, num_partitions=n_parts)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    assert run(2).equals(run(64))
