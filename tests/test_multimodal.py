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
