"""Benchmark runner. Prints ONE JSON line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns": T,
   "turns_per_sec": X}

Headline = flagship quality-filter pipeline end-to-end over the transcripts
corpus derived from $GRAFT_SF_DIR (default /root/testdata/sf0.1), amplified
by $GRAFT_BENCH_REPLICATE deterministic replicas (default 5 → ~500k turns
at sf0.1). `--scaling` runs the same job in fresh processes at 8 and 32
CPUs and reports throughput at both plus scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "5"))


def prepare_transcripts(sf_dir: str) -> str:
    """Materialize the derived transcripts once (untimed; also warms the
    page cache). Cached across runs for identical input at both CPU levels."""
    import pyarrow.parquet as pq

    from scripts_ray import sources

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/bench_transcripts_{tag}.parquet"
    if not os.path.exists(path):
        pq.write_table(sources.derive_transcripts_table(sf_dir), path)
    return path


def amplified_ds(path: str, replicate: int):
    import pyarrow as pa
    import ray.data as rd

    def prefixer(i: int):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            conv = pc.binary_join_element_wise(
                pa.array([f"r{i:02d}-"] * len(batch), type=pa.string()),
                batch["conv_id"].combine_chunks(),
                "",
            )
            return batch.set_column(
                batch.schema.get_field_index("conv_id"), "conv_id", conv
            )

        return fn

    parts = [
        rd.read_parquet(path).map_batches(prefixer(i), batch_format="pyarrow")
        for i in range(replicate)
    ]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def consume(ds) -> int:
    n = 0
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n += b.num_rows
    return n


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from scripts_ray import pipelines
    from scripts_ray.queries import QUERIES

    path = prepare_transcripts(SF_DIR)
    counts_ref = ray.put(pipelines.build_model_counts(SF_DIR))

    queries: dict[str, float] = {}

    # headline: flagship quality filter over the amplified corpus
    t0 = time.time()
    out = pipelines.quality_filter(
        amplified_ds(path, REPLICATE),
        counts_ref,
        score_concurrency=(1, max(2, NCPU // 2)),
        batch_size=8192,
    )
    turns = consume(out)
    headline = time.time() - t0
    queries["qf_pipeline"] = round(headline, 3)

    for name in ["word_freq", "event_agg", "sessionize", "dedup_turns", "ann_cosine"]:
        t0 = time.time()
        res = QUERIES[name](SF_DIR)
        if hasattr(res, "iter_batches"):
            consume(res)
        queries[name] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "quality_filter_e2e_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "turns": turns,
        "turns_per_sec": round(turns / headline, 1),
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    prepare_transcripts(SF_DIR)  # warm cache before either timed run
    lo, hi = run(8), run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "turns_per_sec_8": lo["turns_per_sec"],
        "turns_per_sec_32": hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "turns": lo["turns"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
