"""CLI entry point.

    # flagship quality-filter job with resumable partitioned output
    python -m scripts_ray.cli run --sf-dir /root/testdata/sf0.01 \
        --output /tmp/qf_out --buckets 8 --num-cpus 8 [--no-resume]

    # any registered operator by name (see `list`)
    python -m scripts_ray.cli list
    python -m scripts_ray.cli query word_freq --sf-dir /root/testdata/sf0.01
    python -m scripts_ray.cli query dedup_turns --output /tmp/dedup.parquet

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
    run.add_argument(
        "--method", choices=["heuristic", "trained"], default="heuristic",
        help="per-turn gate: the rule cascade (default) or the "
             "distributed-trained linear model (ops.train)")
    q = sub.add_parser("query", help="run any registered query by name")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--output", default=None,
                   help="sink path (.csv → CSV, else partitioned Parquet); "
                        "omit to print the first --show rows")
    q.add_argument("--show", type=int, default=10)
    q.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    ing = sub.add_parser(
        "ingest",
        help="incremental delivery ingestion: dedup a (doc_id, text) "
             "parquet delivery against all previously accepted deliveries "
             "(exact + near-dup persistent indexes), append survivors, "
             "snapshot state",
    )
    ing.add_argument("--corpus", required=True, help="delivery parquet file/dir")
    ing.add_argument("--state", required=True, help="persistent index state dir")
    ing.add_argument("--output", required=True, help="accepted-corpus root dir")
    ing.add_argument("--delivery-id", default=None,
                     help="stable id (default: next ordinal); re-running a "
                          "published id is a no-op")
    ing.add_argument("--hasher", choices=["production", "verify"],
                     default="production",
                     help="LSH preset: 4-row bands (scale) or the "
                          "oracle-exact high-recall 2-row form")
    ing.add_argument("--shards", type=int, default=4)
    ing.add_argument("--num-cpus", type=int,
                     default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    sub.add_parser("list", help="list registered queries")
    args = p.parse_args(argv)

    if args.cmd == "list":
        from .queries import ORACLES, QUERIES

        for name in sorted(QUERIES):
            kind = "oracle" if name in ORACLES else "rows-only"
            print(f"{name}\t{kind}")
        return

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

        if args.cmd == "query":
            from .queries import QUERIES

            if args.name not in QUERIES:
                raise SystemExit(
                    f"unknown query {args.name!r} — run `list` for names"
                )
            res = QUERIES[args.name](args.sf_dir)
            is_ds = hasattr(res, "iter_batches")
            if args.output:
                if args.output.endswith(".csv"):
                    if is_ds:
                        res = res.to_pandas()
                    elif hasattr(res, "to_pandas"):  # pyarrow.Table
                        res = res.to_pandas()
                    res.to_csv(args.output, index=False)
                    print(json.dumps({"rows": len(res), "sink": args.output}))
                else:
                    if not is_ds:
                        import ray.data as rd

                        res = rd.from_pandas(
                            res.to_pandas() if hasattr(res, "to_pandas") else res
                        )
                    res.write_parquet(args.output)
                    print(json.dumps({"sink": args.output}))
            else:
                head = res.limit(args.show).to_pandas() if is_ds else (
                    res.to_pandas().head(args.show)
                    if hasattr(res, "to_pandas") else res.head(args.show)
                )
                print(head.to_string(index=False))
            return

        if args.cmd == "ingest":
            import ray.data as rd

            from . import ingest

            delivery_id = args.delivery_id or str(
                len(ingest.read_manifest(args.state)["deliveries"])
            )
            rec = ingest.ingest_delivery(
                rd.read_parquet(args.corpus),
                args.state,
                args.output,
                delivery_id,
                n_shards=args.shards,
                hasher=args.hasher,
            )
            print(json.dumps(rec))
            return

        from . import checkpoint, pipelines, sources

        work = args.work_dir or (args.output.rstrip("/") + "_input")
        checkpoint.prepare_input(
            sources.derive_transcripts_ds(args.sf_dir), work, args.buckets
        )
        counts_ref = ray.put(pipelines.build_model_counts(args.sf_dir))

        weights = None
        if args.method == "trained":
            # one distributed training pass; the model (3 ints) rides into
            # the gate stage by value
            from .ops.train import train_keep_weights
            from .queries import _labeled_signals_ds

            weights = train_keep_weights(_labeled_signals_ds(args.sf_dir))

        def pipe(ds):
            return pipelines.quality_filter(ds, counts_ref, trained_weights=weights)

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
