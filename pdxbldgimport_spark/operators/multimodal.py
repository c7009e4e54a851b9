"""Multimodal column operators: image/audio/video as opaque ``binary``
payloads with typed metadata, processed in Arrow-batched ``mapInPandas``
kernels (round instructions; the reference has no media path — this is
the training-data-pipeline extension over the same engine core).

The *decode* step for real codecs is stubbed (`decode_real`) — the
image/audio libraries are not in this container — but every Spark-side
concern is real and tested: BinaryType schema, typed metadata struct,
Arrow batch shapes (payload bytes arrive as one contiguous buffer per
batch), vectorized numpy over the concatenated byte buffer (no per-row
Python loops beyond offset bookkeeping), and deterministic outputs.

The deterministic fake codec interprets the payload as its true byte
grid: images/video frames are width×height uint8 grids, audio is a
uint8 sample vector — so resize/frame-sample/feature kernels do real
array math on real bytes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def decode_real(payload: bytes, kind: str):
    """Real-codec decode (PNG/JPEG/WAV/MP4). Gated on libraries that are
    not shipped in this container — clearly-marked stub per the build
    instructions; the deterministic byte-grid fake below is the tested
    path."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "real media decode needs PIL/cv2/soundfile, not available in "
            "this container; use the deterministic byte-grid kernels"
        ) from exc
    raise NotImplementedError("real decode path reserved for round 2+")


def _concat_payloads(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """One contiguous uint8 buffer + row offsets for a batch of payloads
    (the Arrow batch shape: list<binary> → values buffer + offsets)."""
    bufs = pdf["payload"].to_numpy()
    lens = np.fromiter((len(b) for b in bufs), np.int64, len(bufs))
    offs = np.concatenate(([0], np.cumsum(lens)))
    flat = (
        np.frombuffer(b"".join(bufs), dtype=np.uint8)
        if len(bufs)
        else np.empty(0, np.uint8)
    )
    return flat, offs


def media_features(media: DataFrame) -> DataFrame:
    """Per-asset byte statistics (the feature-extract kernel): length,
    sum, min/max, mean in milli-units — exact integers, vectorized over
    the batch buffer with reduceat (no per-byte Python)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("byte_sum", T.LongType()),
            T.StructField("byte_min", T.IntegerType()),
            T.StructField("byte_max", T.IntegerType()),
            T.StructField("mean_milli", T.LongType()),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            flat, offs = _concat_payloads(pdf)
            flat64 = flat.astype(np.int64)
            sums = np.add.reduceat(flat64, offs[:-1])
            mins = np.minimum.reduceat(flat, offs[:-1]).astype(np.int32)
            maxs = np.maximum.reduceat(flat, offs[:-1]).astype(np.int32)
            lens = np.diff(offs)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": lens,
                    "byte_sum": sums,
                    "byte_min": mins,
                    "byte_max": maxs,
                    "mean_milli": sums * 1000 // np.maximum(lens, 1),
                }
            )

    return media.select("doc_id", "kind", "payload").mapInPandas(gen, schema)


def frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: split the payload into n_frames equal
    frames, keep every ``every``-th (frame 0, every, 2·every, …). Output
    decodes the sampled frame back to text (the payloads are ASCII by
    construction) so the result is oracle-comparable; the slicing itself
    happens on the binary buffer."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_text", T.StringType()),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            out_doc, out_idx, out_txt = [], [], []
            flat, offs = _concat_payloads(pdf)
            nfr = pdf["n_frames"].to_numpy()
            flen = pdf["frame_len"].to_numpy()
            docs = pdf["doc_id"].to_numpy()
            for i in range(len(pdf)):
                frames = np.arange(0, nfr[i], every, dtype=np.int64)
                base = offs[i]
                for fidx in frames:
                    s = base + fidx * flen[i]
                    out_doc.append(docs[i])
                    out_idx.append(int(fidx))
                    out_txt.append(flat[s : s + flen[i]].tobytes().decode("ascii"))
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_text": out_txt}
            )

    vids = media.where(F.col("kind") == "video").select(
        "doc_id", "n_frames", "frame_len", "payload"
    )
    return vids.mapInPandas(gen, schema)


def image_resize_half(media: DataFrame) -> DataFrame:
    """Deterministic 2× downsample of the width×height byte grid (every
    second row/column — nearest-neighbor). Emits the resized grid's
    metadata + checksum; the pixel array math is real numpy over the
    true grid."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("out_sum", T.LongType()),
            T.StructField("out_bytes", T.BinaryType()),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for doc_id, w, h, payload in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                grid = np.frombuffer(payload, np.uint8).reshape(int(h), int(w))
                small = grid[::2, ::2]
                rows.append(
                    (
                        doc_id,
                        small.shape[1],
                        small.shape[0],
                        int(small.astype(np.int64).sum()),
                        small.tobytes(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_w", "out_h", "out_sum", "out_bytes"]
            )

    imgs = media.where(F.col("kind") == "image").select(
        "doc_id", "width", "height", "payload"
    )
    return imgs.mapInPandas(gen, schema)


def audio_rms_milli(media: DataFrame) -> DataFrame:
    """Audio feature: integer 'energy' (sum of squared samples) and
    mean-square in milli-units over the uint8 sample vector (integer
    outputs — exact cross-engine, no float-sqrt boundary risk)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("energy", T.LongType()),
            T.StructField("msq_milli", T.LongType()),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            flat, offs = _concat_payloads(pdf)
            sq = flat.astype(np.int64) ** 2
            energy = np.add.reduceat(sq, offs[:-1])
            lens = np.diff(offs)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_samples": lens,
                    "energy": energy,
                    "msq_milli": energy * 1000 // np.maximum(lens, 1),
                }
            )

    auds = media.where(F.col("kind") == "audio").select("doc_id", "payload")
    return auds.mapInPandas(gen, schema)
