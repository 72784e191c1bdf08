"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with metadata columns;
decode / feature-extract / frame-sample run as actor-pool `map_batches`
stages with small batch sizes (large rows). The decode libraries are not
available in this environment, so the decode kernel is a clearly-marked
deterministic fake (DETERMINISTIC_FAKE_DECODE) behind an import-try —
the Ray-side plumbing (schema, actor signature, batch sizing, output
layout) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DETERMINISTIC_FAKE_DECODE = True  # flips to False if a real codec is importable

try:  # pragma: no cover - not present in this environment
    import PIL.Image  # noqa: F401

    DETERMINISTIC_FAKE_DECODE = False
except ImportError:
    pass


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decode: derives (width, height,
    mean_intensity) purely from the bytes. Replace with a real codec when
    the library is available."""
    n = len(payload)
    width = 64 + (n % 193)
    height = 64 + ((n // 7) % 129)
    arr = np.frombuffer(payload, dtype=np.uint8)
    mean = float(arr.mean()) if len(arr) else 0.0
    return width, height, mean


class ImageDecoder:
    """Actor-pool decode stage: codec state initialized once per actor.

    Input batch: (item_id: int64, payload: binary)
    Output batch: (item_id, width: int64, height: int64, mean_intensity: float64)
    Use small batch_size (payloads are large) and concurrency=(1, N).
    """

    def __init__(self):
        self.fake = DETERMINISTIC_FAKE_DECODE
        if not self.fake:  # pragma: no cover
            raise NotImplementedError(
                "real image decode path not implemented in this environment"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        dims = [_fake_decode(p) for p in payloads]
        return pa.table(
            {
                "item_id": batch["item_id"],
                "width": pa.array([d[0] for d in dims], type=pa.int64()),
                "height": pa.array([d[1] for d in dims], type=pa.int64()),
                "mean_intensity": pa.array([d[2] for d in dims], type=pa.float64()),
            }
        )


class FrameSampler:
    """Video-analog actor stage: splits a binary payload into fixed-size
    'frames' and emits every k-th (flat-map shape: output rows > input rows)."""

    def __init__(self, frame_bytes: int = 256, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        ids, frames, offsets = [], [], []
        for item_id, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            n_frames = max(1, len(payload) // self.frame_bytes)
            for f in range(0, n_frames, self.stride):
                ids.append(item_id)
                offsets.append(f)
                frames.append(payload[f * self.frame_bytes : (f + 1) * self.frame_bytes])
        return pd.DataFrame(
            {"item_id": ids, "frame_idx": offsets, "frame": frames}
        )


AUDIO_WIN_BYTES = 128
AUDIO_HOP_BYTES = 64


class AudioChunker:
    """Audio-analog actor stage: STFT-style OVERLAPPING framing of a binary
    payload (win > hop, unlike FrameSampler's strided disjoint frames) —
    the windowing shape feature extractors (fbank/MFCC/wav2vec) consume.
    A real resampler/codec would load once per actor here; in this
    environment the payload is treated as raw bytes and the frame GEOMETRY
    is the tested contract (n_chunks = 1 + floor(max(0, n-win)/hop);
    chunk i covers [i*hop, min(n, i*hop+win))), value-checked in SQL.

    Input batch: (item_id, payload); output rows per chunk:
    (item_id, chunk_idx, start_byte, end_byte, chunk: binary).
    """

    def __init__(self, win_bytes: int = AUDIO_WIN_BYTES, hop_bytes: int = AUDIO_HOP_BYTES):
        self.win = win_bytes
        self.hop = hop_bytes

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        ids, idxs, starts, ends, chunks = [], [], [], [], []
        for item_id, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            n = len(payload)
            n_chunks = 1 + max(0, (n - self.win)) // self.hop
            for i in range(n_chunks):
                s = i * self.hop
                e = min(n, s + self.win)
                ids.append(item_id)
                idxs.append(i)
                starts.append(s)
                ends.append(e)
                chunks.append(payload[s:e])
        return pd.DataFrame(
            {
                "item_id": np.array(ids, dtype=np.int64),
                "chunk_idx": np.array(idxs, dtype=np.int64),
                "start_byte": np.array(starts, dtype=np.int64),
                "end_byte": np.array(ends, dtype=np.int64),
                "chunk": chunks,
            }
        )


def chunk_audio(payload_ds, concurrency=(1, 4), batch_size=64, **kw):
    return payload_ds.map_batches(
        AudioChunker,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def docs_as_payloads(docs_ds):
    """Adapter used by tests: document text bytes as a stand-in binary payload."""

    def to_payload(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "item_id": batch["doc_id"],
                "payload": pc.cast(batch["text"].combine_chunks(), pa.binary()),
            }
        )

    return docs_ds.map_batches(to_payload, batch_format="pyarrow")


def decode_images(payload_ds, concurrency=(1, 4), batch_size=64):
    return payload_ds.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(payload_ds, concurrency=(1, 4), batch_size=64, **kw):
    return payload_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


RESIZE_MAX_SIDE = 224


class ImageResizer:
    """Actor-pool resize stage chained after decode: fit (width, height)
    into RESIZE_MAX_SIDE preserving aspect ratio, never upscaling — all
    integer math (scale in permille, floor), so the output geometry is
    value-checked by the SQL oracle. The pixel work is what a real codec
    would do per batch; the geometry contract is what downstream batching
    (fixed-size tensor stacking) depends on, and is real and tested.

    Input batch: (item_id, width, height); output adds
    (out_w, out_h, scale_permille).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False)
        h = batch["height"].to_numpy(zero_copy_only=False)
        side = np.maximum(w, h)
        scale = np.where(
            side <= RESIZE_MAX_SIDE, 1000, RESIZE_MAX_SIDE * 1000 // side
        ).astype(np.int64)
        return pa.table(
            {
                "item_id": batch["item_id"],
                "out_w": pa.array(w * scale // 1000, type=pa.int64()),
                "out_h": pa.array(h * scale // 1000, type=pa.int64()),
                "scale_permille": pa.array(scale, type=pa.int64()),
            }
        )


def resize_images(payload_ds, concurrency=(1, 4), batch_size=64):
    """decode → resize actor-pool chain over binary payloads."""
    return decode_images(
        payload_ds, concurrency=concurrency, batch_size=batch_size
    ).map_batches(
        ImageResizer,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
