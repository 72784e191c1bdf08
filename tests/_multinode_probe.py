"""Multi-node topology probe (run as a SUBPROCESS by test_multinode.py).

Stands up a virtual 4-node Ray cluster in-process (`ray.cluster_utils.
Cluster` — separate raylets + object stores per node, real inter-node
object transfer over the loopback plasma protocol), runs the flagship
quality filter (exchange mode — the all-to-all conv_id exchange must
cross node boundaries) and the word_freq hash aggregate, records which
nodes actually executed tasks and the per-node object-store traffic,
then re-runs both on a single local node and compares value hashes.

Prints ONE JSON line:
  {"nodes_in_cluster": 4, "nodes_seen_qf": k1, "nodes_seen_wf": k2,
   "rows": R, "qf_match": bool, "wf_match": bool, "transfer_note": "..."}
"""

import hashlib
import json
import sys

import pandas as pd


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = df.astype(str).apply(lambda r: "|".join(r), axis=1).sort_values()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def tag_node(batch: pd.DataFrame) -> pd.DataFrame:
    import ray

    batch = batch.copy()
    batch["_node"] = ray.get_runtime_context().get_node_id()
    return batch


def run_pipelines(sf_dir: str):
    """(qf frame + nodes seen, wf frame + nodes seen) on the CURRENT
    Ray session. The qf node tag is applied INSIDE the post-exchange
    reducer (ordered finalize per hash partition), so `qf_nodes` counts
    the nodes that actually received exchanged blocks — the inter-node
    shuffle evidence."""
    import pyarrow as pa
    import ray

    from scripts_ray.ops.textstats import word_freq
    from scripts_ray.pipelines import (
        ScrubScoreGate,
        build_model_counts,
        ordered_pass_arrow,
    )
    from scripts_ray.sources import derive_transcripts_ds

    counts_ref = ray.put(build_model_counts(sf_dir))

    # amplify x8 with distinct conv_ids so the exchange carries enough
    # blocks to fan out (the raw sf0.001 fixture collapses to one reducer)
    def replicate(i):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["conv_id"] = batch["conv_id"] + f"-r{i}"
            return batch

        return f

    base = derive_transcripts_ds(sf_dir)
    ds = base.map_batches(replicate(0), batch_format="pandas")
    for i in range(1, 8):
        ds = ds.union(base.map_batches(replicate(i), batch_format="pandas"))

    scored = ds.repartition(24).map_batches(
        ScrubScoreGate,
        fn_constructor_args=(counts_ref, 64),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        num_cpus=1,
    )

    def run(part: pa.Table) -> pa.Table:
        out = ordered_pass_arrow(part.drop_columns(["_part"]))
        node = ray.get_runtime_context().get_node_id()
        return out.append_column(
            "_node", pa.array([node] * len(out), type=pa.string())
        )

    qf_df = (
        scored.groupby("_part").map_groups(run, batch_format="pyarrow").to_pandas()
    )
    qf_hist = qf_df["_node"].value_counts().to_dict()
    qf_nodes = set(qf_df.pop("_node").unique())

    import ray.data as rd

    wf = word_freq(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"]).repartition(16)
    ).map_batches(tag_node, batch_format="pandas")
    wf_df = wf.to_pandas()
    wf_nodes = set(wf_df.pop("_node").unique())

    # the join-rich capstone (three stage boundaries, two exchange
    # families, distributed joins) — correctness when blocks cross nodes
    from scripts_ray.queries import pretrain_pack_pipeline

    pp_df = pretrain_pack_pipeline(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]),
    ).to_pandas()
    return qf_df, qf_nodes, wf_df, wf_nodes, qf_hist, pp_df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, "/root/repo")

    import ray
    from ray.cluster_utils import Cluster

    # 4 virtual nodes x 4 CPUs, 256 MiB object store each
    cluster = Cluster()
    for _ in range(4):
        cluster.add_node(num_cpus=4, object_store_memory=256 * 1024 * 1024)
    ray.init(address=cluster.address, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    n_nodes = len([n for n in ray.nodes() if n["Alive"]])

    qf_df, qf_nodes, wf_df, wf_nodes, qf_hist, pp_df = run_pipelines(sf_dir)
    qf_multi, wf_multi = value_hash(qf_df), value_hash(wf_df)
    pp_multi = value_hash(pp_df)
    rows = len(qf_df)

    # per-node object-store traffic summary (evidence blocks crossed nodes)
    try:
        from ray._private.internal_api import memory_summary

        transfer_note = " | ".join(
            ln.strip()
            for ln in memory_summary(stats_only=True).splitlines()
            if "Plasma memory usage" in ln or "objects" in ln.lower()
        )[:400]
    except Exception as e:  # noqa: BLE001 — stats are evidence, not gate
        transfer_note = f"unavailable: {e!r}"
    # rows-per-node histogram of the exchange reducers (proof the
    # exchange fanned out, anonymized to sorted counts)
    qf_rows_per_node = sorted(qf_hist.values())

    ray.shutdown()
    cluster.shutdown()

    # single-node reference on a fresh local session
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    qf1_df, _, wf1_df, _, _, pp1_df = run_pipelines(sf_dir)
    ray.shutdown()

    print(
        json.dumps(
            {
                "nodes_in_cluster": n_nodes,
                "nodes_seen_qf": len(qf_nodes),
                "nodes_seen_wf": len(wf_nodes),
                "qf_rows_per_node": qf_rows_per_node,
                "rows": rows,
                "qf_match": qf_multi == value_hash(qf1_df),
                "wf_match": wf_multi == value_hash(wf1_df),
                "pp_match": pp_multi == value_hash(pp1_df),
                "pp_rows": len(pp_df),
                "transfer_note": transfer_note,
            }
        )
    )


if __name__ == "__main__":
    main()
