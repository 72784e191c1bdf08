"""Multimodal plumbing: binary payload schema, actor-pool decode stub,
frame sampling (flat-map shape)."""

import pyarrow as pa

from scripts_ray.ops import multimodal


def _payloads(ray_session, sf_dir):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return multimodal.docs_as_payloads(docs)


def test_payload_schema(ray_session, sf_dir):
    ds = _payloads(ray_session, sf_dir)
    schema = ds.schema()
    assert schema.names == ["item_id", "payload"]
    assert pa.types.is_binary(schema.types[1])


def test_decode_deterministic(ray_session, sf_dir):
    ds = _payloads(ray_session, sf_dir)
    a = multimodal.decode_images(ds).to_pandas().sort_values("item_id").reset_index(drop=True)
    b = multimodal.decode_images(_payloads(ray_session, sf_dir)).to_pandas().sort_values("item_id").reset_index(drop=True)
    assert a.equals(b)
    assert list(a.columns) == ["item_id", "width", "height", "mean_intensity"]
    assert (a["width"] >= 64).all() and (a["height"] >= 64).all()


def test_frame_sampler_explodes(ray_session, sf_dir):
    ds = _payloads(ray_session, sf_dir)
    frames = multimodal.sample_frames(ds, frame_bytes=64, stride=2).to_pandas()
    n_docs = _payloads(ray_session, sf_dir).count()
    assert len(frames) > n_docs  # flat-map produced multiple frames per doc
    assert list(frames.columns) == ["item_id", "frame_idx", "frame"]
    assert (frames["frame"].str.len() <= 64).all()


def test_chunker_bytes_match_per_row_slicing():
    """The vectorized gather must reproduce per-row Python slicing byte for
    byte, including empty payloads, non-multiple tails, and a single row
    larger than the 4 MiB gather block."""
    import numpy as np
    import pyarrow as pa

    from scripts_ray.ops.multimodal import (AudioChunker, FrameSampler,
                                            _GATHER_BLOCK)

    rng = np.random.default_rng(3)
    payloads = [rng.bytes(int(n)) for n in rng.integers(0, 900, 200)]
    payloads.append(rng.bytes(_GATHER_BLOCK + 777))
    batch = pa.table(
        {
            "item_id": pa.array(range(len(payloads)), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )

    ac = AudioChunker()(batch)
    exp = []
    for i, p in enumerate(payloads):
        n = len(p)
        for c in range(1 + max(0, n - 128) // 64):
            s = c * 64
            exp.append((i, c, s, min(n, s + 128), p[s:min(n, s + 128)]))
    got = list(zip(ac["item_id"].to_pylist(), ac["chunk_idx"].to_pylist(),
                   ac["start_byte"].to_pylist(), ac["end_byte"].to_pylist(),
                   ac["chunk"].to_pylist()))
    assert got == exp

    fs = FrameSampler(frame_bytes=64, stride=2)(batch)
    exp = []
    for i, p in enumerate(payloads):
        for f in range(0, max(1, len(p) // 64), 2):
            exp.append((i, f, p[f * 64:(f + 1) * 64]))
    got = list(zip(fs["item_id"].to_pylist(), fs["frame_idx"].to_pylist(),
                   fs["frame"].to_pylist()))
    assert got == exp
