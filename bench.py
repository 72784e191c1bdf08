"""Benchmark runner. Prints ONE JSON line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns": T,
   "turns_per_sec": X}

Headline = flagship quality-filter pipeline end-to-end over the transcripts
corpus derived from $GRAFT_SF_DIR (default /root/testdata/sf0.1), amplified
by $GRAFT_BENCH_REPLICATE deterministic replicas (default 40 → ~4M turns
at sf0.1; amplification is materialized once, untimed). `--scaling` runs
the same job in fresh processes at 8 and 32 CPUs on identical input
(default ×80 → 8M turns) and reports throughput at both plus scaling
efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "40"))


def prepare_transcripts(sf_dir: str, replicate: int = 1) -> str:
    """Materialize the (optionally amplified) transcript corpus once,
    untimed — row-group-chunked so the timed read parallelizes naturally.
    Cached across runs for identical input at both CPU levels."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scripts_ray import sources

    tag = sf_dir.strip("/").replace("/", "_")
    path = f"/tmp/bench_transcripts_{tag}_x{replicate}"
    if not os.path.exists(path):
        base = sources.derive_transcripts_table(sf_dir)
        conv = base["conv_id"].combine_chunks()
        os.makedirs(path + ".tmp", exist_ok=True)
        for i in range(replicate):  # one file per replica → parallel read
            prefixed = pa.compute.binary_join_element_wise(
                pa.array([f"r{i:02d}-"] * len(base), type=pa.string()), conv, ""
            )
            t = base.set_column(
                base.schema.get_field_index("conv_id"), "conv_id", prefixed
            )
            pq.write_table(
                t, f"{path}.tmp/part-{i:04d}.parquet", row_group_size=65536
            )
        os.rename(path + ".tmp", path)
    return path


def consume(ds) -> int:
    n = 0
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n += b.num_rows
    return n


def write_and_count(ds, out_dir: str) -> int:
    """Sink the pipeline to partitioned Parquet (parallel writers, no
    driver funnel) and return the row count from file metadata."""
    import shutil

    import pyarrow.dataset as pads

    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_parquet(out_dir)
    return sum(
        f.metadata.num_rows
        for f in pads.dataset(out_dir, format="parquet").get_fragments()
    )


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

    import ray.data as rd

    path = prepare_transcripts(SF_DIR, REPLICATE)
    counts_ref = ray.put(pipelines.build_model_counts(SF_DIR))

    queries: dict[str, float] = {}

    # headline: flagship quality filter over the amplified corpus, sunk to
    # partitioned Parquet (warm actor pool sized to the session, capped
    # below NCPU so task stages are never starved)
    t0 = time.time()
    out = pipelines.quality_filter(
        rd.read_parquet(path),
        counts_ref,
        # fixed pool of 3*NCPU/4: leaves a quarter of the node for read/
        # shuffle/write tasks + driver; a full-size pool oversubscribes and
        # collapses throughput; swept empirically at 8 and 32 CPUs
        score_concurrency=(max(2, 3 * NCPU // 4), max(2, 3 * NCPU // 4)),
        batch_size=8192,
        num_partitions=32,
    )
    turns = write_and_count(out, f"/tmp/bench_out_{NCPU}")
    headline = time.time() - t0
    queries["qf_pipeline"] = round(headline, 3)

    secondary = (
        []
        if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY")
        else [
            "word_freq",
            "event_agg",
            "sessionize",
            "dedup_turns",
            "ann_cosine",
            "turn_attribution",
            "sectionize",
        ]
    )
    for name in secondary:
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
    replicate = os.environ.get("GRAFT_SCALING_REPLICATE", "80")

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_REPLICATE=replicate,
            GRAFT_BENCH_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    prepare_transcripts(SF_DIR, int(replicate))  # warm before either timed run

    def best_of(ncpu: int, reps: int = 2) -> dict:
        # fresh process per rep; min wall filters scheduler/page-cache noise
        results = []
        for _ in range(reps):
            os.sync()  # flush prior runs' dirty pages outside the timed window
            results.append(run(ncpu))
        return min(results, key=lambda r: r["value"])

    lo, hi = best_of(8), best_of(32)
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
