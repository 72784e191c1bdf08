"""CLI entry point: run the flagship quality-filter job with resumable
partitioned output.

    python -m scripts_ray.cli run --sf-dir /root/testdata/sf0.01 \
        --output /tmp/qf_out --buckets 8 --num-cpus 8 [--no-resume]

Owns the Ray session (guarded init) — the only place besides bench.py and
the test fixture that does.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(prog="scripts_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    run = sub.add_parser("run", help="run the quality-filter pipeline")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    run.add_argument("--output", required=True)
    run.add_argument("--work-dir", default=None)
    run.add_argument("--buckets", type=int, default=8)
    run.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    run.add_argument("--no-resume", action="store_true")
    run.add_argument("--max-buckets", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        from . import checkpoint, pipelines, sources

        work = args.work_dir or (args.output.rstrip("/") + "_input")
        checkpoint.prepare_input(
            sources.derive_transcripts_ds(args.sf_dir), work, args.buckets
        )
        counts_ref = ray.put(pipelines.build_model_counts(args.sf_dir))

        def pipe(ds):
            return pipelines.quality_filter(ds, counts_ref)

        recs = checkpoint.run_buckets(
            work,
            args.output,
            pipe,
            n_buckets=args.buckets,
            resume=not args.no_resume,
            max_buckets=args.max_buckets,
        )
        print(json.dumps({"buckets_done": len(recs),
                          "rows_out": sum(r["rows_out"] for r in recs),
                          "kept": sum(r["kept"] for r in recs)}))
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    main()
