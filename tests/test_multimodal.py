"""Multimodal plumbing tests: BinaryType schema round-trip, Arrow batch
shapes, kernel math vs independent per-row Python, and the real BMP/WAV
codecs (header walk, stride padding, bottom-up rows, RIFF chunks)."""

from __future__ import annotations

import numpy as np
import pytest

from pdxbldgimport_spark.operators import multimodal as MM
from pdxbldgimport_spark.queries import views


def test_bmp_roundtrip_odd_width_stride():
    """Width 5 → stride 8: the decoder must strip padding and undo the
    bottom-up row order."""
    rng = np.random.default_rng(0)
    grid = rng.integers(0, 256, (7, 5), dtype=np.uint8)
    bmp = MM.encode_bmp(grid)
    assert bmp[:2] == b"BM" and len(bmp) == 14 + 40 + 1024 + 7 * 8
    assert np.array_equal(MM.decode_bmp(bmp), grid)


def test_bmp_decode_top_down_and_offsets():
    """A hand-built TOP-DOWN BMP (negative height) with the standard
    offset must decode identically — exercises the h<0 branch the
    encoder never produces."""
    import struct

    grid = np.arange(12, dtype=np.uint8).reshape(3, 4)
    stride = 4
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 1024 + 3 * stride, 0, 0, 14 + 40 + 1024)
    info = struct.pack("<IiiHHIIiiII", 40, 4, -3, 1, 8, 0, 3 * stride, 0, 0, 256, 0)
    palette = bytes(1024)
    bmp = hdr + info + palette + grid.tobytes()
    assert np.array_equal(MM.decode_bmp(bmp), grid)
    with pytest.raises(ValueError):
        MM.decode_bmp(b"PNG" + bmp)


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 41), h=st.integers(1, 23),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_bmp_roundtrip_property(w, h, seed):
        """Any width (every stride-padding residue) × any height ×
        arbitrary bytes round-trips exactly."""
        grid = np.random.default_rng(seed).integers(0, 256, (h, w), np.uint8)
        assert np.array_equal(MM.decode_bmp(MM.encode_bmp(grid)), grid)

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(0, 513), rate=st.integers(1, 192_000),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_wav_roundtrip_property(n, rate, seed):
        samples = np.random.default_rng(seed).integers(0, 256, n, np.uint8)
        got, got_rate = MM.decode_wav(MM.encode_wav(samples, rate))
        assert got_rate == rate and np.array_equal(got, samples)

except ImportError:  # pragma: no cover - hypothesis ships in this env
    pass


def test_wav_roundtrip_and_extra_chunk():
    samples = np.arange(37, dtype=np.uint8)  # odd length → pad byte rule
    wav = MM.encode_wav(samples, 8200)
    got, rate = MM.decode_wav(wav)
    assert rate == 8200 and np.array_equal(got, samples)
    # strict container shape: padded to even, RIFF size covers the pad
    assert len(wav) % 2 == 0
    assert int.from_bytes(wav[4:8], "little") == len(wav) - 8
    # tolerate an extra odd-sized chunk before fmt/data
    extra = b"LIST" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
    wav2 = wav[:12] + extra + wav[12:]
    riff_sz = len(wav2) - 8
    wav2 = wav2[:4] + riff_sz.to_bytes(4, "little") + wav2[8:]
    got2, rate2 = MM.decode_wav(wav2)
    assert rate2 == 8200 and np.array_equal(got2, samples)
    with pytest.raises(ValueError):
        MM.decode_wav(b"FFIR" + wav[4:])


def test_media_schema_binary(spark):
    views(spark, "/root/testdata/sf0.001")
    media = spark.table("media")
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.where("kind = 'video'").select("payload", "n_frames", "frame_len").first()
    assert isinstance(bytes(row["payload"]), bytes)
    assert len(row["payload"]) == row["n_frames"] * row["frame_len"]


def test_media_features_match_python(spark):
    views(spark, "/root/testdata/sf0.001")
    media = spark.table("media")
    got = {r["doc_id"]: r.asDict() for r in MM.media_features(media).collect()}
    for r in media.select("doc_id", "payload").limit(20).collect():
        b = np.frombuffer(bytes(r["payload"]), np.uint8)
        g = got[r["doc_id"]]
        assert g["n_bytes"] == len(b)
        assert g["byte_sum"] == int(b.astype(np.int64).sum())
        assert g["byte_min"] == int(b.min()) and g["byte_max"] == int(b.max())


def test_frame_sample_strides_binary(spark):
    views(spark, "/root/testdata/sf0.001")
    media = spark.table("media")
    frames = MM.frame_sample(media, every=2)
    vid = media.where("kind = 'video'").select(
        "doc_id", "n_frames", "frame_len", "payload"
    ).first()
    rows = sorted(
        (r["frame_idx"], r["frame_text"])
        for r in frames.where(frames.doc_id == vid["doc_id"]).collect()
    )
    payload = bytes(vid["payload"])
    fl = vid["frame_len"]
    assert [i for i, _ in rows] == list(range(0, vid["n_frames"], 2))
    for i, txt in rows:
        assert txt == payload[i * fl : (i + 1) * fl].decode("ascii")


def test_resize_grid_math(spark):
    views(spark, "/root/testdata/sf0.001")
    media = spark.table("media")
    out = {r["doc_id"]: r.asDict() for r in MM.image_resize_half(media).collect()}
    img = media.where("kind = 'image'").select("doc_id", "width", "height", "payload").first()
    grid = np.frombuffer(bytes(img["payload"]), np.uint8).reshape(
        img["height"], img["width"]
    )
    small = grid[::2, ::2]
    g = out[img["doc_id"]]
    assert (g["out_h"], g["out_w"]) == small.shape
    assert bytes(g["out_bytes"]) == small.tobytes()
    assert g["out_sum"] == int(small.astype(np.int64).sum())
