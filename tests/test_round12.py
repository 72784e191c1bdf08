"""Round 12 (round-5 session): the resumable delivery-ingestion surface.

`scripts_ray.ingest` composes the two persistent state components
(exact fingerprint index + near-dup LSH band index) into the
user-facing incremental pipeline: each delivery is deduplicated
within itself, then against every previously ACCEPTED delivery,
survivors are appended (one parquet dir per delivery) and the state is
snapshotted atomically with a manifest commit. These tests pin:

- end-to-end counters over two deliveries with planted self-dups,
  exact cross-dups and near cross-dups;
- state persistence: every call restores from disk (no live objects
  shared between deliveries);
- idempotence: re-running a published delivery_id is a no-op;
- crash-resume: after a simulated crash BETWEEN the snapshot publish
  and the manifest commit, the re-run finishes from the published
  delivery dir instead of re-probing (which would wrongly drop the
  whole delivery against its own state);
- the CLI subcommand drives the same path.
"""

import itertools
import json
import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def texts():
    rng = np.random.default_rng(123)
    vocab = np.array(
        ["".join(c) for c in itertools.product("abcdefgh", repeat=3)][:400],
        dtype=object,
    )

    def doc(r):
        return " ".join(r.choice(vocab, size=40, replace=False))

    d1 = [doc(rng) for _ in range(30)]
    fresh = [doc(rng) for _ in range(9)]
    pair_text = doc(rng)
    exact = d1[:4]
    near = []
    for i in range(4):
        toks = d1[10 + i].split()
        toks[7] = "zzqx"
        near.append(" ".join(toks))
    d2 = fresh + [pair_text, pair_text] + exact + near
    return d1, d2


def _ds(texts_list, start_id):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.arange(
                    start_id, start_id + len(texts_list), dtype=np.int64
                ),
                "text": texts_list,
            }
        )
    )


def test_two_delivery_flow_counters(ray_session, texts, tmp_path):
    from scripts_ray import ingest

    d1, d2 = texts
    state = str(tmp_path / "state")
    out = str(tmp_path / "corpus")

    r1 = ingest.ingest_delivery(_ds(d1, 0), state, out, "d1")
    assert r1["rows_in"] == 30 and r1["rows_out"] == 30
    assert r1["removed_self_exact"] == 0
    assert os.path.isdir(os.path.join(out, "delivery-d1"))
    assert os.path.isdir(os.path.join(state, "fp"))
    assert os.path.isdir(os.path.join(state, "lsh"))

    # second delivery: separate call — state restored purely from disk
    r2 = ingest.ingest_delivery(_ds(d2, 1000), state, out, "d2")
    assert r2["rows_in"] == 19
    assert r2["removed_self_exact"] == 1  # the within-delivery pair
    assert r2["removed_cross_exact"] == 4  # exact copies of d1 docs
    assert r2["removed_cross_near"] == 4  # one-token-perturbed d1 docs
    assert r2["rows_out"] == 10  # 9 fresh + 1 of the pair

    corpus = ingest.corpus_ds(out).to_pandas()
    assert len(corpus) == 40
    man = ingest.read_manifest(state)
    assert [d["delivery_id"] for d in man["deliveries"]] == ["d1", "d2"]


def test_published_delivery_is_noop(ray_session, texts, tmp_path):
    from scripts_ray import ingest

    d1, d2 = texts
    state = str(tmp_path / "state")
    out = str(tmp_path / "corpus")
    ingest.ingest_delivery(_ds(d1, 0), state, out, "d1")
    r2a = ingest.ingest_delivery(_ds(d2, 1000), state, out, "d2")
    # same id again: returns the manifest record, corpus unchanged
    r2b = ingest.ingest_delivery(_ds(d2, 1000), state, out, "d2")
    assert r2b == r2a
    assert len(ingest.corpus_ds(out).to_pandas()) == 40
    assert len(ingest.read_manifest(state)["deliveries"]) == 2


def test_crash_between_snapshot_and_manifest_resumes(
    ray_session, texts, tmp_path
):
    """Simulated worst crash window: delivery dir published AND indexes
    ingested/snapshotted, but the manifest commit never happened. The
    re-run must finish from the published dir (idempotent re-ingest),
    NOT re-probe — a fresh probe against the already-updated state would
    drop every survivor as a duplicate of itself."""
    from scripts_ray import ingest

    d1, d2 = texts
    state = str(tmp_path / "state")
    out = str(tmp_path / "corpus")
    ingest.ingest_delivery(_ds(d1, 0), state, out, "d1")
    ingest.ingest_delivery(_ds(d2, 1000), state, out, "d2")

    # rewind ONLY the manifest to just after d1 (= crash before commit)
    man = ingest.read_manifest(state)
    man["deliveries"] = man["deliveries"][:1]
    with open(os.path.join(state, "manifest.json"), "w") as f:
        json.dump(man, f)

    r2 = ingest.ingest_delivery(_ds(d2, 1000), state, out, "d2")
    assert r2["resumed"] is True
    assert r2["rows_out"] == 10
    assert len(ingest.corpus_ds(out).to_pandas()) == 40
    assert len(ingest.read_manifest(state)["deliveries"]) == 2


def test_state_preset_mismatch_rejected(ray_session, texts, tmp_path):
    from scripts_ray import ingest

    d1, _ = texts
    state = str(tmp_path / "state")
    out = str(tmp_path / "corpus")
    ingest.ingest_delivery(_ds(d1, 0), state, out, "d1")
    with pytest.raises(ValueError, match="hasher"):
        ingest.ingest_delivery(
            _ds(d1, 0), state, out, "d2", hasher="verify"
        )


def test_cli_ingest_subcommand(ray_session, texts, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scripts_ray import cli, ingest

    d1, d2 = texts
    p1 = str(tmp_path / "d1.parquet")
    p2 = str(tmp_path / "d2.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(30, dtype=np.int64), "text": d1}), p1
    )
    pq.write_table(
        pa.table(
            {"doc_id": np.arange(1000, 1019, dtype=np.int64), "text": d2}
        ),
        p2,
    )
    state = str(tmp_path / "state")
    out = str(tmp_path / "corpus")
    # Ray is already initialised by the session fixture; cli must not own it
    cli.main(["ingest", "--corpus", p1, "--state", state, "--output", out])
    cli.main(["ingest", "--corpus", p2, "--state", state, "--output", out])
    man = ingest.read_manifest(state)
    assert [d["delivery_id"] for d in man["deliveries"]] == ["0", "1"]
    assert man["deliveries"][1]["rows_out"] == 10
    assert len(ingest.corpus_ds(out).to_pandas()) == 40
