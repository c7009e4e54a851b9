"""Multimodal column operators: image/audio/video as opaque ``binary``
payloads with typed metadata, processed in Arrow-batched ``mapInPandas``
kernels (round instructions; the reference has no media path — this is
the training-data-pipeline extension over the same engine core).

Real-format decode exists for the two formats that are deterministic
byte-grid parses needing no codec libraries: 8-bit grayscale BMP
(header walk, stride padding, bottom-up rows — `decode_bmp`) and 8-bit
PCM WAV (RIFF chunk walk — `decode_wav`), both oracle-gated. Compressed
codecs (PNG/JPEG/MP4) would slot into the same mapInPandas kernels but
need libraries this container doesn't ship. Every Spark-side concern is
real and tested: BinaryType schema, typed metadata struct, Arrow batch
shapes (payload bytes arrive as one contiguous buffer per batch),
vectorized numpy over the concatenated byte buffer (no per-row Python
loops beyond offset bookkeeping), and deterministic outputs.

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


# ----------------------------------------------------------------------
# Real-format codecs (no external libs needed): 8-bit grayscale BMP and
# 8-bit PCM mono WAV are deterministic byte-grid parses — header walk,
# row stride/padding, bottom-up row order, RIFF chunk walk. The encoder
# and decoder are independent code paths; the decode is oracle-gated
# end-to-end by queries_multimodal.media_bmp_roundtrip /
# media_wav_energy (a decoder that ignores BMP's bottom-up row order or
# 4-byte row padding fails the row-weighted checksum).

import struct

_BMP_HDR = 14 + 40 + 1024  # file header + BITMAPINFOHEADER + 256-gray palette


def encode_bmp(grid: np.ndarray) -> bytes:
    """height×width uint8 grid → 8-bit grayscale BMP (BI_RGB, bottom-up
    rows, rows padded to 4 bytes, 256-entry grayscale palette)."""
    h, w = grid.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = grid[::-1]  # BMP stores rows bottom-up
    palette = np.zeros((256, 4), np.uint8)
    palette[:, :3] = np.arange(256, dtype=np.uint8)[:, None]
    file_hdr = struct.pack("<2sIHHI", b"BM", _BMP_HDR + h * stride, 0, 0, _BMP_HDR)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, h * stride, 2835, 2835, 256, 0
    )
    return file_hdr + info_hdr + palette.tobytes() + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP header walk → top-down height×width uint8 grid. Handles the
    pixel-data offset from the file header (palette size varies), row
    stride padding, and both bottom-up (h>0) and top-down (h<0) files."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    if bpp != 8:
        raise ValueError(f"only 8-bit BMP supported, got {bpp}")
    top_down = h < 0
    h = abs(h)
    stride = (w + 3) & ~3
    buf = np.frombuffer(payload, np.uint8, count=h * stride, offset=data_off)
    px = buf.reshape(h, stride)[:, :w]
    return px if top_down else px[::-1]


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """uint8 sample vector → 8-bit PCM mono WAV (RIFF/fmt/data). An
    odd-length data chunk gets RIFF's pad byte (chunks align to even
    offsets) and the pad is counted in the RIFF size, so strict external
    readers accept the container; decode_wav already skips it."""
    n = len(samples)
    pad = b"\x00" if n % 2 else b""
    riff = b"RIFF" + struct.pack("<I", 36 + n + len(pad)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
    data = b"data" + struct.pack("<I", n)
    return riff + fmt + data + np.asarray(samples, np.uint8).tobytes() + pad


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF chunk walk → (uint8 samples, sample rate). Tolerates extra
    chunks and RIFF's odd-size padding byte."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            _tag, _ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if bits != 8:
                raise ValueError(f"only 8-bit PCM supported, got {bits}")
        elif cid == b"data":
            samples = np.frombuffer(body, np.uint8)
        pos += 8 + sz + (sz & 1)  # chunks pad to even length
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


def bmp_roundtrip(media: DataFrame) -> DataFrame:
    """Images: byte grid → real BMP encode → independent header-walk
    decode → stats of the DECODED grid. ``row_weighted_sum`` is
    row-order-sensitive (Σ (row+1)·pixel over the top-down grid), so a
    decoder that drops the bottom-up flip or mis-computes the stride
    cannot pass; ``bmp_bytes`` pins the container size (headers +
    palette + padded rows)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("bmp_w", T.IntegerType()),
            T.StructField("bmp_h", T.IntegerType()),
            T.StructField("bmp_bytes", T.LongType()),
            T.StructField("pix_sum", T.LongType()),
            T.StructField("row_weighted_sum", T.LongType()),
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
                bmp = encode_bmp(grid)
                dec = decode_bmp(bmp).astype(np.int64)
                rw = np.arange(1, dec.shape[0] + 1, dtype=np.int64)
                rows.append(
                    (
                        doc_id,
                        dec.shape[1],
                        dec.shape[0],
                        len(bmp),
                        int(dec.sum()),
                        int((rw * dec.sum(axis=1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "bmp_w", "bmp_h", "bmp_bytes",
                    "pix_sum", "row_weighted_sum",
                ],
            )

    imgs = media.where(F.col("kind") == "image").select(
        "doc_id", "width", "height", "payload"
    )
    return imgs.mapInPandas(gen, schema)


def wav_energy(media: DataFrame) -> DataFrame:
    """Audio: sample vector → real WAV encode → independent RIFF-walk
    decode → energy stats of the DECODED samples + the decoded sample
    rate and container size."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("wav_rate", T.IntegerType()),
            T.StructField("wav_bytes", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("energy", T.LongType()),
        ]
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for doc_id, rate, payload in zip(
                pdf["doc_id"], pdf["sample_rate"], pdf["payload"]
            ):
                wav = encode_wav(np.frombuffer(payload, np.uint8), int(rate))
                samples, dec_rate = decode_wav(wav)
                s64 = samples.astype(np.int64)
                rows.append(
                    (doc_id, dec_rate, len(wav), len(samples), int((s64 * s64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "wav_rate", "wav_bytes", "n_samples", "energy"],
            )

    auds = media.where(F.col("kind") == "audio").select(
        "doc_id", "sample_rate", "payload"
    )
    return auds.mapInPandas(gen, schema)


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


def image_ahash(media: DataFrame) -> DataFrame:
    """Images: real-codec roundtrip (encode→decode, same path as
    bmp_roundtrip) → 4×4-block average hash. Bit (br, bc) is set when
    the block's mean exceeds the image mean, compared exactly as
    block_sum · n_px > total_sum · block_n (no float means); blocks
    are the integer partition row_block = row·4 // height, so images
    smaller than 4 px on a side simply leave the skipped blocks at 0
    on both engines. The 16-bit hash is the classic perceptual
    near-dup bucket key (aHash): identical content up to brightness-
    preserving noise lands in one bucket."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ahash", T.LongType()),
            T.StructField("n_px", T.LongType()),
        ]
    )

    imgs = media.where(F.col("kind") == "image").select(
        "doc_id", "width", "height", "payload"
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
                dec = decode_bmp(encode_bmp(grid)).astype(np.int64)
                hh, ww = dec.shape
                br = (np.arange(hh, dtype=np.int64) * 4) // hh
                bc = (np.arange(ww, dtype=np.int64) * 4) // ww
                idx = (br[:, None] * 4 + bc[None, :]).ravel()
                bs = np.bincount(idx, weights=dec.ravel(), minlength=16).astype(
                    np.int64
                )
                bn = np.bincount(idx, minlength=16).astype(np.int64)
                ts, tn = int(dec.sum()), hh * ww
                bits = bs * tn > ts * bn
                ahash = int(
                    sum(1 << i for i in range(16) if bits[i])
                )
                rows.append((doc_id, ahash, tn))
            yield pd.DataFrame(rows, columns=["doc_id", "ahash", "n_px"])

    return imgs.mapInPandas(gen, schema)


def audio_loudness_windows(media: DataFrame, win: int, msq: int) -> DataFrame:
    """Audio: fixed-size sample windows (last window partial), each
    flagged loud when its energy exceeds the mean-square threshold
    exactly (Σb² > msq · n_window — no float means). Returns per doc
    the window count, loud count, and max window energy."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_windows", T.LongType()),
            T.StructField("n_loud", T.LongType()),
            T.StructField("max_energy", T.LongType()),
        ]
    )

    auds = media.where(F.col("kind") == "audio").select("doc_id", "payload")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, np.uint8).astype(np.int64)
                idx = np.arange(len(b)) // win
                e = np.bincount(idx, weights=b * b).astype(np.int64)
                n = np.bincount(idx).astype(np.int64)
                loud = e > msq * n
                rows.append(
                    (doc_id, len(e), int(loud.sum()), int(e.max()))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_windows", "n_loud", "max_energy"]
            )

    return auds.mapInPandas(gen, schema)
