"""Multimodal plumbing tests: BinaryType schema round-trip, Arrow batch
shapes, kernel math vs independent per-row Python, and the gated real
decoder (round instructions: decode stubbed, Spark plumbing real)."""

from __future__ import annotations

import numpy as np
import pytest

from pdxbldgimport_spark.operators import multimodal as MM
from pdxbldgimport_spark.queries import views


def test_decode_real_is_gated():
    with pytest.raises(NotImplementedError):
        MM.decode_real(b"\x89PNG...", "image")


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
