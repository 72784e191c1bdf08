"""Benchmark runner. Prints ONE JSON line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns": T,
   "turns_per_sec": X}

Headline = flagship quality-filter pipeline end-to-end over the transcripts
corpus derived from $GRAFT_SF_DIR (default /root/testdata/sf0.1), amplified
by $GRAFT_BENCH_REPLICATE deterministic replicas (default 80 → ~8M turns
at sf0.1; amplification is materialized once, untimed), run in the
broadcast-window mode ($GRAFT_BENCH_MODE) with a warmup pass
($GRAFT_BENCH_WARMUP) so the timed window is steady-state.

`--scaling` runs the same job in fresh processes at N and 4N CPUs
($GRAFT_SCALING_LEGS, default "8,32") on identical input (default ×120 →
12M turns), best-of-2 per leg, and reports throughput at both plus
scaling efficiency. See BASELINE.md for the multi-pair bracket and the
host-capacity microbenchmark that contextualizes the 32-CPU leg.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "80"))
PARTITIONS = int(os.environ.get("GRAFT_BENCH_PARTITIONS", "32"))
WARMUP = os.environ.get("GRAFT_BENCH_WARMUP", "1") != "0"
# flagship execution mode: "broadcast" (two-pass window, no full-row
# exchange — the fast path while conv-level state fits memory) or
# "exchange" (fully general conv_id hash exchange)
MODE = os.environ.get("GRAFT_BENCH_MODE", "broadcast")
# actor-pool sizing: 3*NCPU/4 leaves a quarter of the node for read/write/
# shuffle tasks and Ray system threads. Larger pools (NCPU-2) starve the
# task stages and stall the stream — swept empirically at 8 and 32 CPUs.
POOL = int(os.environ.get("GRAFT_BENCH_POOL", str(max(2, 3 * NCPU // 4))))
BATCH = int(os.environ.get("GRAFT_BENCH_BATCH", "8192"))


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


def prepare_minhash_docs(n_docs: int = 120_000, seed: int = 3) -> str:
    """Synthetic near-dup bench corpus: mostly-unique docs (60 tokens from a
    2k vocabulary) with ~1% planted near-duplicates (3 tokens perturbed) —
    the VERDICT-requested scale point proving candidate generation holds
    past 10⁵ docs without quadratic pair blowup (unlike the tiny sf tables,
    which are near-identical by construction)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"/tmp/bench_minhash_docs_v2_{n_docs}"
    if not os.path.exists(path):
        rng = np.random.default_rng(seed)
        toks = rng.integers(0, 2000, size=(n_docs, 60))
        dup = np.arange(n_docs) % 100 == 1  # doc i dupes doc i-1
        toks[dup] = toks[np.flatnonzero(dup) - 1]
        toks[dup, -3:] = rng.integers(0, 2000, size=(int(dup.sum()), 3))
        # ALPHABETIC vocabulary (the tokenizer is letters-only — digits are
        # separators, so "tok0".."tok1999" would all collapse to one token
        # and every doc would near-dup every doc: 7e9 candidate pairs)
        letters = "abcdefghijklmnopqrstuvwxyz"
        vocab = np.array(
            [letters[i % 26] + letters[(i // 26) % 26] + letters[i // 676]
             for i in range(2000)],
            dtype=object,
        )
        texts = [" ".join(row) for row in vocab[toks]]
        os.makedirs(path + ".tmp", exist_ok=True)
        per_file = 16384
        for i in range(0, n_docs, per_file):
            t = pa.table(
                {
                    "doc_id": pa.array(range(i, min(i + per_file, n_docs)),
                                       type=pa.int64()),
                    "text": pa.array(texts[i : i + per_file], type=pa.string()),
                }
            )
            pq.write_table(t, f"{path}.tmp/part-{i // per_file:04d}.parquet")
        os.rename(path + ".tmp", path)
    return path


def prepare_pretrain_docs(n_docs: int = 100_000, seed: int = 11) -> str:
    """Synthetic web-corpus for the pretrain_pack capstone bench: multi-line
    docs of 4-6-letter words with stopword-bearing lines (so a healthy
    fraction survives the Gopher gate), ~10% of lines drawn from a small
    boilerplate pool (real work for corpus line dedup) and ~1% planted
    near-duplicates (real work for MinHash keep-best), plus a 32-way
    source column for the temperature sampler."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"/tmp/bench_pretrain_docs_v3_{n_docs}"
    if not os.path.exists(path):
        rng = np.random.default_rng(seed)
        letters = "abcdefghijklmnopqrstuvwxyz"
        vocab = np.array(
            ["".join(letters[c % 26] for c in row)
             for row in rng.integers(0, 10_000, size=(2000, 5))],
            dtype=object,
        )
        # line = "the " + 14 random vocab words: the stopword anchors the
        # Gopher stop-hit rule without creating a UNIFORM line-junction
        # trigram (a shared "of it the" junction would put every doc's
        # shingle set in contact with the eval slice and mass-flag the
        # corpus as contaminated). Cross-doc duplicate LINES come from
        # line_dedup's own planted per-doc header/footer (it re-chunks
        # text into 12-token lines, so document newlines are cosmetic).
        lines = rng.integers(0, 2000, size=(n_docs, 5, 14))
        texts = [
            "\n".join("the " + " ".join(vocab[lines[i, j]]) for j in range(5))
            for i in range(n_docs)
        ]
        # ~1% near-dupes: the PREVIOUS doc with one word PREPENDED — the
        # insertion shifts every 12-token chunk boundary, so corpus line
        # dedup (which runs first and would strip any byte-equal chunk
        # from the copy, eroding the pair below the verify bar) keeps both
        # docs whole, while the shingle Jaccard stays ~0.95
        dup = np.flatnonzero(np.arange(n_docs) % 100 == 1)
        dup = dup[dup > 0]
        extra = rng.integers(0, 2000, size=len(dup))
        for i, w in zip(dup, extra):
            texts[i] = vocab[w] + " " + texts[i - 1]
        os.makedirs(path + ".tmp", exist_ok=True)
        per_file = 16384
        for i in range(0, n_docs, per_file):
            hi = min(i + per_file, n_docs)
            t = pa.table(
                {
                    "doc_id": pa.array(range(i, hi), type=pa.int64()),
                    "text": pa.array(texts[i:hi], type=pa.string()),
                    "source": pa.array(
                        [f"src{j % 32:02d}" for j in range(i, hi)],
                        type=pa.string(),
                    ),
                }
            )
            pq.write_table(t, f"{path}.tmp/part-{i // per_file:04d}.parquet")
        os.rename(path + ".tmp", path)
    return path


def prepare_stopword_docs(n_docs: int = 160_000, seed: int = 7) -> str:
    """Synthetic corpus where ONE stop-word token ('the') appears in EVERY
    document — the postings-skew stress for the segmented inverted index:
    the single-string layout would build one O(n_docs) group; the
    (tok, doc_id-range) layout must cap every group at the segment range."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"/tmp/bench_stopword_docs_{n_docs}"
    if not os.path.exists(path):
        rng = np.random.default_rng(seed)
        letters = "abcdefghijklmnopqrstuvwxyz"
        vocab = np.array(
            [letters[i % 26] + letters[(i // 26) % 26] + letters[i // 676]
             for i in range(2000)],
            dtype=object,
        )
        toks = rng.integers(0, 2000, size=(n_docs, 20))
        texts = ["the " + " ".join(row) for row in vocab[toks]]
        os.makedirs(path + ".tmp", exist_ok=True)
        per_file = 16384
        for i in range(0, n_docs, per_file):
            t = pa.table(
                {
                    "doc_id": pa.array(range(i, min(i + per_file, n_docs)),
                                       type=pa.int64()),
                    "text": pa.array(texts[i : i + per_file], type=pa.string()),
                }
            )
            pq.write_table(t, f"{path}.tmp/part-{i // per_file:04d}.parquet")
        os.rename(path + ".tmp", path)
    return path


def _hostcap_chunk(_):
    """One fixed chunk of scorer-like work (regex tokenize + siphash over
    strings) — used by --hostcap to measure the HOST's own process-level
    scaling, independent of Ray."""
    import re
    import time as _t

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(1)
    words = np.array(["alpha", "beta", "gamma", "delta", "spark", "query"],
                     dtype=object)
    texts = pd.Series([" ".join(rng.choice(words, 12)) for _ in range(20000)])
    rx = re.compile(r"[a-z]+")
    t0 = _t.time()
    for _ in range(6):
        toks = texts.str.findall(rx).explode()
        pd.util.hash_array(toks.to_numpy(dtype=object)).sum()
    return _t.time() - t0


def run_hostcap() -> dict:
    """Ray-free host-capacity probe: K identical processes each run one
    fixed work chunk; perfect host scaling keeps aggregate chunks/s ∝ K.
    Contextualizes the 8→32 scaling leg (see BASELINE.md): if THIS scales
    and the engine doesn't, the gap is the Ray runtime sharing the box."""
    import multiprocessing as mp

    out = {}
    for k in [1, 8, 16, 24, 32]:
        with mp.Pool(k) as p:
            t0 = time.time()
            p.map(_hostcap_chunk, range(k))
            wall = time.time() - t0
        out[f"chunks_per_sec_{k}"] = round(k / wall, 2)
    out["host_scaling_8_to_32"] = round(
        (out["chunks_per_sec_32"] / out["chunks_per_sec_8"]) / 4, 3
    )
    return out


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


def _start_runtime_pinner(worker_cores: set, runtime_cores: set) -> None:
    """CPU-pin Ray's runtime processes (gcs_server, raylet, agents, log
    monitor, and this driver) to `runtime_cores` and the `ray::` worker
    processes to `worker_cores`, so workers are never time-sliced against
    the runtime's own threads — the single-box proxy for a real cluster
    where node daemons have dedicated headroom (VERDICT r2 Next #4).
    Workers spawn throughout the run (actor pools ramp mid-pipeline), so a
    daemon thread rescans /proc and pins new pids as they appear; a worker
    inherits the raylet's runtime-core mask for at most one scan period."""
    import threading

    runtime_markers = (
        "gcs_server", "raylet", "log_monitor", "agent.py",
        "runtime_env_agent", "dashboard",
    )

    def classify(cmd: str):
        if "ray::" in cmd:
            return "worker"
        if any(m in cmd for m in runtime_markers):
            return "runtime"
        return None

    os.sched_setaffinity(0, runtime_cores)  # the driver is runtime too

    def loop():
        pinned: dict[int, str] = {}
        while True:
            for pid_s in os.listdir("/proc"):
                if not pid_s.isdigit():
                    continue
                pid = int(pid_s)
                try:
                    with open(f"/proc/{pid}/cmdline", "rb") as f:
                        cmd = f.read().replace(b"\0", b" ").decode("utf-8", "replace")
                except OSError:
                    continue
                kind = classify(cmd)
                if kind and pinned.get(pid) != kind:
                    try:
                        os.sched_setaffinity(
                            pid,
                            worker_cores if kind == "worker" else runtime_cores,
                        )
                        pinned[pid] = kind
                    except OSError:
                        pass
            time.sleep(0.25)

    threading.Thread(target=loop, daemon=True).start()


def run_bench() -> dict:
    import ray

    # GRAFT_PIN_RUNTIME="28-31": reserve that core range for Ray's runtime
    # daemons + the driver; workers get cores [0, NCPU). Requires the two
    # sets to be disjoint (so NCPU <= first reserved core).
    pin = os.environ.get("GRAFT_PIN_RUNTIME")
    if pin:
        lo_c, hi_c = (int(x) for x in pin.split("-"))
        runtime_cores = set(range(lo_c, hi_c + 1))
        worker_cores = set(range(NCPU))
        assert not (worker_cores & runtime_cores), "pin ranges overlap"
        _start_runtime_pinner(worker_cores, runtime_cores)

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Ray 2.49's actor-pool operator intermittently wedges waiting for its
    # minimum actor count (one actor stuck 'pending' forever blocks ALL
    # dispatch). Convert that infinite wait into a timeout + in-process
    # retry (fresh execution = fresh pool) instead of a hung benchmark.
    ctx.wait_for_min_actors_s = 90

    from scripts_ray import pipelines
    from scripts_ray.queries import BENCH_EXTRAS, QUERIES

    # The bench runs the driver-checked registry PLUS the measured-only
    # exhibits (trained BPE / trained IVF / real-zlib) that have pinned
    # value-checked twins in QUERIES but no SQL oracle of their own.
    BENCHABLE = {**QUERIES, **BENCH_EXTRAS}

    import ray.data as rd

    # GRAFT_BENCH_JOB=minhash: headline = MinHash-LSH candidate generation
    # over the synthetic near-dup corpus — the secondary scaling subject
    # (shuffle-bound, unlike the map-dominated quality filter), so
    # `--scaling` evidence isn't flagship-only.
    if os.environ.get("GRAFT_BENCH_JOB") == "minhash":
        from scripts_ray.ops import dedup as _dedup

        n_docs = int(os.environ.get("GRAFT_BENCH_MINHASH_DOCS", "480000"))
        path = prepare_minhash_docs(n_docs)
        if WARMUP:
            consume(_dedup.minhash_candidates(rd.read_parquet(path).limit(5000)))
        t0 = time.time()
        n_pairs = consume(_dedup.minhash_candidates(rd.read_parquet(path)))
        headline = time.time() - t0
        ray.shutdown()
        return {
            "metric": "minhash_candidates_sec",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": {"minhash_candidates": round(headline, 3)},
            "sf": f"synthetic_{n_docs}_docs",
            "num_cpus": NCPU,
            "turns": n_docs,
            "turns_per_sec": round(n_docs / headline, 1),
            "cand_pairs": n_pairs,
        }

    # GRAFT_BENCH_JOB=pretrain: headline = the pretrain_pack capstone over
    # the synthetic web corpus — the heaviest, most join-rich composition
    # (two exchange families + three stage boundaries), so `--scaling`
    # evidence covers the barrier-bound end of the engine, not just the
    # map-dominated flagship and the shuffle-bound MinHash job.
    if os.environ.get("GRAFT_BENCH_JOB") == "pretrain":
        from scripts_ray.queries import pretrain_pack_pipeline as _pp

        n_docs = int(os.environ.get("GRAFT_BENCH_PRETRAIN_DOCS", "100000"))
        path = prepare_pretrain_docs(n_docs)
        if WARMUP:
            consume(
                _pp(
                    rd.read_parquet(path, columns=["doc_id", "text"]).limit(4000),
                    rd.read_parquet(path, columns=["doc_id", "source"]).limit(4000),
                )
            )
        t0 = time.time()
        n_rows = consume(
            _pp(
                rd.read_parquet(path, columns=["doc_id", "text"]),
                rd.read_parquet(path, columns=["doc_id", "source"]),
            )
        )
        headline = time.time() - t0
        ray.shutdown()
        return {
            "metric": "pretrain_pack_sec",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": {"pretrain_pack": round(headline, 3)},
            "sf": f"synthetic_{n_docs}_docs",
            "num_cpus": NCPU,
            "turns": n_docs,
            "turns_per_sec": round(n_docs / headline, 1),
            "seg_rows": n_rows,
        }

    path = prepare_transcripts(SF_DIR, REPLICATE)
    counts_ref = ray.put(pipelines.build_model_counts(SF_DIR))

    queries: dict[str, float] = {}

    # autoscaling band (POOL - NCPU/8, POOL): a strictly fixed pool
    # (min == max) intermittently deadlocks Ray 2.49's actor-pool operator
    # at high concurrency (N-1 actors running, 1 pending forever, upstream
    # reads frozen); leaving slack in the minimum tolerates a pending actor
    # while still pinning throughput near the swept optimum
    conc = (max(2, POOL - max(1, NCPU // 8)), POOL)

    if WARMUP:
        # one tiny pass through the full pipeline shape before the timed
        # window: spawns+retires an actor pool and touches every module so
        # worker-process spawn, imports and page-cache warmup are amortized
        # out of the steady-state measurement (cold-start is a per-JOB cost,
        # not a per-byte cost — at 100 TB it vanishes; at bench scale it
        # distorts the scaling ratio)
        warm = pipelines.quality_filter(
            rd.read_parquet(path).limit(5000),
            counts_ref,
            score_concurrency=conc,
            batch_size=BATCH,
            num_partitions=PARTITIONS,
            mode=MODE,
        )
        consume(warm)
        if MODE == "broadcast":
            pipelines.conv_first_sys_from_files(path, cpu_limit=NCPU)  # warm the pre-pass

    # headline: flagship quality filter over the amplified corpus, sunk to
    # partitioned Parquet — TIMED end-to-end including the broadcast
    # pre-pass (it is part of the job). Retried on the actor-pool wedge
    # (see wait_for_min_actors_s above); a retried attempt restarts the
    # clock, so the reported number is one clean end-to-end run.
    for attempt in range(3):
        t0 = time.time()
        try:
            if MODE == "broadcast":
                fs_ref = ray.put(
                    pipelines.conv_first_sys_from_files(path, cpu_limit=NCPU)
                )
                out = pipelines.quality_filter(
                    rd.read_parquet(path),
                    counts_ref,
                    score_concurrency=conc,
                    batch_size=BATCH,
                    mode="broadcast",
                    first_sys_ref=fs_ref,
                )
            else:
                out = pipelines.quality_filter(
                    rd.read_parquet(path),
                    counts_ref,
                    score_concurrency=conc,
                    batch_size=BATCH,
                    num_partitions=PARTITIONS,
                )
            # sink dir: default /tmp (single local disk). GRAFT_BENCH_OUT
            # lets the scaling protocol use a RAM-backed sink (/dev/shm) so
            # the two legs compare ENGINE scaling rather than one shared
            # disk's writeback ceiling — on a multi-node cluster every node
            # writes at constant per-node bandwidth (see BASELINE.md)
            out_base = os.environ.get("GRAFT_BENCH_OUT", "/tmp")
            turns = write_and_count(out, f"{out_base}/bench_out_{NCPU}")
            break
        except Exception as e:  # actor-pool wedge timeout → fresh attempt
            print(f"headline attempt {attempt} failed: {e!r}", file=sys.stderr)
            if attempt == 2:
                raise
    headline = time.time() - t0
    queries["qf_pipeline"] = round(headline, 3)

    if os.environ.get("GRAFT_BENCH_STATS"):
        # per-stage execution breakdown (ray.data stats for the executed
        # plan) — the feedback loop for sizing batch_size / concurrency;
        # key findings are transcribed into BASELINE.md
        print(out.stats(), file=sys.stderr)

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
            "doc_len_quantiles",
            "top_terms_per_source",
            "boilerplate_docs",
            "decontaminate",
            "curate_mix",
            "page_align",
            "asof_events",
            "q3_shipping",
            "dup_spans",
            "bm25_search",
            "pii_scrub",
            "kmeans_assign",
            "semdedup",
            "hll_users_by_type",
            "ann_ivf_fixed",
            "dsir_select",
            "qf_ppl_bigram",
            "conv_gate_turns",
            "dup_ngrams",
            "fix_encoding",
            "gopher_quality",
            "line_dedup",
            "html_strip",
            "tfidf_terms",
            "seq_pack",
            "pagerank",
            "ann_pq",
            "events_user_join_salted",
            "pmi_bigrams",
            "fuzzy_title_pairs",
            "inverted_index",
            "rolling_events",
            "event_funnel",
            "hopping_distinct_users",
            "triangle_counts",
            "len_outliers",
            "cluster_topics",
            "q5_local_supply",
            "lineitem_bloom_semi",
            "mmr_select",
            "window_anomalies",
            "json_props",
            "value_deltas",
            "global_len_order",
            "quota_sample",
            "corpus_upsert",
            "conv_render",
            "chunk_docs",
            "domain_cap",
            "ttr_by_source",
            "kmeans_update",
            "conv_dedup",
            "hard_negatives",
            "url_canon",
            "dense_event_grid",
            "emb_outliers",
            "user_type_matrix",
            "temp_sample",
            "length_batches",
            "simpson_by_source",
            "vocab_oov",
            "compress_ratio",
            "bpe_budgets",
            "qf_funnel",
            "dup_rate_by_source",
            "rag_index",
            "truncate_docs",
            "cohort_retention",
            "trending_terms",
            "winsorize_values",
            "latest_events",
            "vocab_growth",
            "bucket_join_events",
            "conv_balance",
            "alternation_score",
            "lang_mismatch",
            "gopher_rate_by_source",
            "activity_gini",
            "q13_custdist",
            "event_heatmap",
            "trained_gate",
            "qf_pipeline_trained",
            "incr_lsh_pairs",
            "incr_lsh_keep",
        ]
    )
    for name in secondary:
        t0 = time.time()
        res = BENCHABLE[name](SF_DIR)
        if hasattr(res, "iter_batches"):
            consume(res)
        queries[name] = round(time.time() - t0, 3)

    extras: dict[str, float] = {}
    if not os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        # MinHash-LSH candidate generation at >10⁵ docs (shingle default):
        # the scale proof point for the exchange-based bucket pairing
        from scripts_ray.ops import dedup as _dedup

        mh_path = prepare_minhash_docs()
        t0 = time.time()
        n_pairs = consume(_dedup.minhash_candidates(rd.read_parquet(mh_path)))
        dt = time.time() - t0
        queries["minhash_120k_docs"] = round(dt, 3)
        extras["minhash_docs_per_sec"] = round(120_000 / dt, 1)
        extras["minhash_cand_pairs"] = n_pairs

        # segmented inverted index under maximal postings skew: a planted
        # stop word in EVERY one of 160k docs — the max per-group size must
        # stay at the segment range (64), proving no single postings group
        # dominates (the single-string layout's group would be 160k)
        import pandas as _pd

        from scripts_ray.ops import retrieval as _retrieval

        sw_path = prepare_stopword_docs()
        t0 = time.time()
        seg = _retrieval.inverted_index_seg(rd.read_parquet(sw_path))
        folded = seg.map_batches(
            lambda b: _pd.DataFrame(
                {"mx": [int(b["df_seg"].max())], "n": [len(b)]}
            ),
            batch_format="pandas",
        ).to_pandas()  # one row per block — bounded driver collect
        queries["invidx_seg_160k_docs"] = round(time.time() - t0, 3)
        extras["invidx_seg_max_group"] = int(folded["mx"].max())
        extras["invidx_seg_rows"] = int(folded["n"].sum())

        # headline-2: the pretrain_pack capstone (docs in -> packed segment
        # rows out) over a 100k-doc synthetic web corpus — the end-to-end
        # curation chain (strip/gate/line-dedup/minhash-keep-best/decontam/
        # temp-sample/pack) as one measured number
        from scripts_ray.queries import pretrain_pack_pipeline

        pp_path = prepare_pretrain_docs()
        pp_docs = int(pp_path.rsplit("_", 1)[1])
        t0 = time.time()
        pp_out = pretrain_pack_pipeline(
            rd.read_parquet(pp_path, columns=["doc_id", "text"]),
            rd.read_parquet(pp_path, columns=["doc_id", "source"]),
        )
        def _fold_pp(b):
            # per-block unique doc ids (deduped globally on the driver —
            # a doc whose segment rows straddle a block boundary must not
            # count once per block) + the block's row count on row 0
            u = b["doc_id"].unique()
            if len(u) == 0:
                return _pd.DataFrame({"doc_id": [], "rows": []})
            rows = [len(b)] + [0] * (len(u) - 1)
            return _pd.DataFrame({"doc_id": u, "rows": rows})

        pp_folded = pp_out.map_batches(
            _fold_pp, batch_format="pandas"
        ).to_pandas()  # ≤ one row per packed doc — bounded driver collect
        dt = time.time() - t0
        queries["pretrain_pack_100k_docs"] = round(dt, 3)
        extras["pretrain_docs_per_sec"] = round(pp_docs / dt, 1)
        extras["pretrain_seg_rows"] = int(pp_folded["rows"].sum())
        extras["pretrain_docs_packed"] = int(pp_folded["doc_id"].nunique())

        # the capstone's 100-TB operating mode: every stage boundary a
        # parquet checkpoint (disk, resumable) instead of an in-memory
        # materialize — the cost of resumability is the delta vs above
        import shutil as _shutil
        import tempfile as _tempfile

        ck_dir = _tempfile.mkdtemp(prefix="graft_bench_pp_ckpt_")
        t0 = time.time()
        consume(
            pretrain_pack_pipeline(
                rd.read_parquet(pp_path, columns=["doc_id", "text"]),
                rd.read_parquet(pp_path, columns=["doc_id", "source"]),
                checkpoint_dir=ck_dir,
            )
        )
        dt = time.time() - t0
        queries["pretrain_pack_ckpt_100k_docs"] = round(dt, 3)
        extras["pretrain_ckpt_docs_per_sec"] = round(pp_docs / dt, 1)
        _shutil.rmtree(ck_dir, ignore_errors=True)

        # measured ANN recall@5 vs the exact baseline for both scale paths
        exact = BENCHABLE["ann_cosine"](SF_DIR).to_pandas()
        e = set(zip(exact["query_id"], exact["neighbor_id"]))
        for name in ["ann_lsh", "ann_ivf"]:
            approx = BENCHABLE[name](SF_DIR).to_pandas()
            a = set(zip(approx["query_id"], approx["neighbor_id"]))
            extras[f"{name}_recall_at_5"] = round(len(e & a) / max(1, len(e)), 4)

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
        **extras,
    }


def run_scaling() -> dict:
    # ×120 (12M turns): long enough that per-job fixed costs (pre-pass,
    # actor-pool ramp, write tail — ~3-5s, scale-independent) amortize at
    # the 4N leg, short enough that the whole corpus stays page-cached
    # between reps (the first pass over a cold corpus is ~2x slower and is
    # filtered by best-of-2)
    replicate = os.environ.get("GRAFT_SCALING_REPLICATE", "120")

    # leg pair: N and 4N. Default 8→32 is the full-machine pair; on this
    # shared VM the 32-leg runs in the host-saturated regime (per-core
    # throughput drops ~2× with 30+ busy cores — memory bandwidth +
    # co-tenant throttling), so BASELINE.md reports a bracket of pairs.
    legs = os.environ.get("GRAFT_SCALING_LEGS", "8,32")
    n_lo, n_hi = (int(x) for x in legs.split(","))
    assert n_hi == 4 * n_lo, "scaling legs must be N and 4N"
    # GRAFT_PIN_RUNTIME (e.g. "28-31") propagates to both legs: runtime
    # daemons live on the reserved cores in BOTH, so the pair compares
    # worker scaling under identical runtime isolation (see BASELINE.md).

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_REPLICATE=replicate,
            GRAFT_BENCH_HEADLINE_ONLY="1",
        )
        for attempt in range(3):  # child may die on a wedged Ray session
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env,
                    capture_output=True,
                    text=True,
                    check=True,
                    timeout=900,
                ).stdout
                return json.loads(out.strip().splitlines()[-1])
            except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
                print(f"leg ncpu={ncpu} attempt {attempt}: {e!r}", file=sys.stderr)
        raise RuntimeError(f"leg ncpu={ncpu} failed 3 attempts")

    if os.environ.get("GRAFT_BENCH_JOB") == "minhash":
        prepare_minhash_docs(int(os.environ.get("GRAFT_BENCH_MINHASH_DOCS", "480000")))
    elif os.environ.get("GRAFT_BENCH_JOB") == "pretrain":
        prepare_pretrain_docs(int(os.environ.get("GRAFT_BENCH_PRETRAIN_DOCS", "100000")))
    else:
        prepare_transcripts(SF_DIR, int(replicate))  # warm before either timed run

    def best_of(ncpu: int, reps: int = int(os.environ.get("GRAFT_SCALING_REPS", "2"))) -> dict:
        # fresh process per rep; min wall filters scheduler/page-cache noise
        results = []
        for _ in range(reps):
            os.sync()  # flush prior runs' dirty pages outside the timed window
            results.append(run(ncpu))
        return min(results, key=lambda r: r["value"])

    lo, hi = best_of(n_lo), best_of(n_hi)
    eff = (lo["value"] / hi["value"]) / (n_hi / n_lo)
    return {
        "legs": [n_lo, n_hi],
        "sec_lo": lo["value"],
        "sec_hi": hi["value"],
        "turns_per_sec_lo": lo["turns_per_sec"],
        "turns_per_sec_hi": hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "turns": lo["turns"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--stats" in sys.argv:
        # one flagship run + per-stage ds.stats() dump to stderr
        os.environ["GRAFT_BENCH_STATS"] = "1"
        os.environ.setdefault("GRAFT_BENCH_HEADLINE_ONLY", "1")
        print(json.dumps(run_bench()))
    elif "--hostcap" in sys.argv:
        print(json.dumps(run_hostcap()))
    else:
        print(json.dumps(run_bench()))
