"""scripts_ray — a Ray-Data-native quality-filter / curation engine.

A from-scratch re-expression of the data-processing capabilities of the
swerik-project/scripts curation toolchain (reference studied for behavior
only) over Parquet tables of multi-turn conversation transcripts:

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp[us])

Architecture is Ray-Data-first: every stage is a `map_batches` transform
over zero-copy Arrow batches, stateful scorers run in actor pools, and
ordering-dependent transforms run as `groupby(conv_id)` grouped maps after
an in-group sort on `turn_idx`.

Nothing in this package calls ``ray.init()``; the caller owns the session.
"""

__version__ = "0.1.0"
