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
