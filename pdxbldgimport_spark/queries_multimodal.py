"""Multimodal query family: typed-metadata projection, byte-feature
extraction, video frame sampling, image resize, audio energy — the
engine operates on the real ``binary`` payload in Arrow kernels
(operators/multimodal.py); the DuckDB oracle reasons about the same
bytes through the byte-exact ASCII twin column ``payload_str``
(synth._MEDIA; DuckDB 1.0 has no BLOB substring/aggregation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import synth
from .operators import multimodal as MM
from .queries import register, views

_MEDIA_ORACLE = synth.oracle_with("media_base")


# Typed metadata + payload length straight off the binary column.
@register(
    "media_meta",
    _MEDIA_ORACLE
    + """
    SELECT doc_id, kind, width, height, n_frames, n_samples, sample_rate,
           CAST(length(payload_str) AS BIGINT) AS n_bytes
    FROM media_base
    """,
)
def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return spark.table("media").select(
        "doc_id", "kind", "width", "height", "n_frames", "n_samples",
        "sample_rate", F.length("payload").cast("long").alias("n_bytes"),
    )


_CHARS = """
, chars AS (
  SELECT doc_id, kind, ascii(ch) AS b
  FROM (
    SELECT doc_id, kind, UNNEST(string_split(payload_str, '')) AS ch
    FROM media_base
  )
)
"""


# Byte-statistics feature extraction (vectorized reduceat engine-side).
@register(
    "media_features",
    _MEDIA_ORACLE
    + _CHARS
    + """
    SELECT doc_id, ANY_VALUE(kind) AS kind,
           COUNT(*) AS n_bytes,
           CAST(SUM(b) AS BIGINT) AS byte_sum,
           CAST(MIN(b) AS INT) AS byte_min,
           CAST(MAX(b) AS INT) AS byte_max,
           CAST(SUM(b) * 1000 // COUNT(*) AS BIGINT) AS mean_milli
    FROM chars GROUP BY doc_id
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return MM.media_features(spark.table("media"))


# Video frame sampling: every 2nd frame, sliced from the binary buffer.
@register(
    "media_frame_sample",
    _MEDIA_ORACLE
    + """
    SELECT m.doc_id, CAST(f.i AS INT) AS frame_idx,
           substr(m.payload_str, CAST(1 + f.i * m.frame_len AS BIGINT),
                  CAST(m.frame_len AS BIGINT)) AS frame_text
    FROM media_base m, range(0, {MAX_F}, 2) f(i)
    WHERE m.kind = 'video' AND f.i < m.n_frames
    """.format(MAX_F=synth.MEDIA_MAX_FRAMES + 1),
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return MM.frame_sample(spark.table("media"), every=2)


# Image resize (2x nearest-neighbor downsample of the byte grid).
# out_bytes is BINARY engine-side; the comparable projection hashes it.
@register(
    "media_resize",
    _MEDIA_ORACLE
    + """
    , imgs AS (SELECT * FROM media_base WHERE kind = 'image')
    , cells AS (
      SELECT i.doc_id, i.width, r.i AS r, c.i AS c,
             substr(i.payload_str, CAST(r.i * i.width + c.i + 1 AS BIGINT), 1) AS px
      FROM imgs i, range(0, {MAX_H}, 2) r(i), range(0, {MAX_W}, 2) c(i)
      WHERE r.i < i.height AND c.i < i.width
    )
    SELECT doc_id,
           CAST((MAX(width) + 1) // 2 AS INT) AS out_w,
           CAST(COUNT(DISTINCT r) AS INT) AS out_h,
           CAST(SUM(ascii(px)) AS BIGINT) AS out_sum,
           md5(string_agg(px, '' ORDER BY r, c)) AS out_md5
    FROM cells GROUP BY doc_id
    """.format(MAX_H=synth.MEDIA_MAX_H + 1, MAX_W=synth.MEDIA_MAX_W + 1),
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    out = MM.image_resize_half(spark.table("media"))
    return out.select(
        "doc_id", "out_w", "out_h", "out_sum",
        F.md5(F.col("out_bytes")).alias("out_md5"),
    )


# Real-codec decode, oracle-gated (BMP): the engine encodes each image
# grid as a real 8-bit BMP and decodes it back with the independent
# header-walk parser (operators/multimodal.decode_bmp); the oracle
# predicts the decoded grid's stats (incl. the row-order-sensitive
# weighted sum — a decoder skipping BMP's bottom-up flip fails) and the
# exact container size (headers + 256-entry palette + 4-byte-padded
# rows) from the ASCII twin.
@register(
    "media_bmp_decode",
    _MEDIA_ORACLE
    + """
    , imgs AS (SELECT * FROM media_base WHERE kind = 'image')
    , cells AS (
      SELECT i.doc_id, i.width, i.height, r.i AS r,
             ascii(substr(i.payload_str,
                          CAST(r.i * i.width + c.i + 1 AS BIGINT), 1)) AS b
      FROM imgs i, range(0, {MAX_H}) r(i), range(0, {MAX_W}) c(i)
      WHERE r.i < i.height AND c.i < i.width
    )
    SELECT doc_id,
           CAST(MAX(width) AS INT) AS bmp_w,
           CAST(MAX(height) AS INT) AS bmp_h,
           CAST(14 + 40 + 1024
                + MAX(height) * ((MAX(width) + 3) // 4 * 4) AS BIGINT) AS bmp_bytes,
           CAST(SUM(b) AS BIGINT) AS pix_sum,
           CAST(SUM((r + 1) * b) AS BIGINT) AS row_weighted_sum
    FROM cells GROUP BY doc_id
    """.format(MAX_H=synth.MEDIA_MAX_H + 1, MAX_W=synth.MEDIA_MAX_W + 1),
)
def q_media_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return MM.bmp_roundtrip(spark.table("media"))


# Real-codec decode, oracle-gated (WAV): 8-bit PCM encode → RIFF chunk
# walk decode; the oracle predicts the decoded sample rate, count,
# energy, and the 44-byte-header container size.
@register(
    "media_wav_decode",
    _MEDIA_ORACLE
    + _CHARS
    + """
    , stats AS (
      SELECT doc_id, COUNT(*) AS n_samples, CAST(SUM(b * b) AS BIGINT) AS energy
      FROM chars WHERE kind = 'audio' GROUP BY doc_id
    )
    SELECT s.doc_id,
           CAST(m.sample_rate AS INT) AS wav_rate,
           CAST(44 + s.n_samples + s.n_samples % 2 AS BIGINT) AS wav_bytes,
           CAST(s.n_samples AS BIGINT) AS n_samples,
           s.energy AS energy
    FROM stats s JOIN media_base m ON m.doc_id = s.doc_id
    """,
)
def q_media_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return MM.wav_energy(spark.table("media"))


# Audio energy: integer sum-of-squares + mean-square in milli-units.
@register(
    "media_audio_energy",
    _MEDIA_ORACLE
    + _CHARS
    + """
    SELECT doc_id, COUNT(*) AS n_samples,
           CAST(SUM(b * b) AS BIGINT) AS energy,
           CAST(SUM(b * b) * 1000 // COUNT(*) AS BIGINT) AS msq_milli
    FROM chars WHERE kind = 'audio' GROUP BY doc_id
    """,
)
def q_media_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return MM.audio_rms_milli(spark.table("media"))


# ----------------------------------------------------------------------
# media_dedup_exact: exact content dedup of media at FRAME granularity —
# every frame (video), image grid, or audio buffer is sliced from the
# binary payload, content-hashed map-side, and grouped by digest; each
# cluster reports copy count, distinct carrying docs, and the pinned
# keeper (lexicographically least (doc_id, frame_idx)). Synth videos
# repeat one frame n_frames times, so live dup clusters of size 4-8 are
# guaranteed alongside image/audio singletons.
#
# Scale shape: bounded ×MAX_FRAMES explode, md5 computed before the
# exchange, ONE partial/final hash agg keyed by digest — count/min
# partials collapse within-video duplicates map-side, so the shuffle
# carries ~|distinct frames| rows, exactly the content-hash dedup you
# would run on a 100-TB media corpus. Keeper is packed as
# doc_id*16+frame_idx (frame_idx < 16 by MEDIA_MAX_FRAMES) so MIN is a
# plain partial-aggregatable long, decomposed after the agg.
_MDE_ORACLE = (
    _MEDIA_ORACLE
    + """
, fr AS (
  SELECT doc_id, f.i AS frame_idx,
         md5(substr(payload_str, CAST(1 + f.i * frame_len AS BIGINT),
                    CAST(frame_len AS BIGINT))) AS digest
  FROM media_base m, range(0, {MAX_F}) f(i)
  WHERE f.i < COALESCE(m.n_frames, 1)
)
SELECT digest,
       COUNT(*) AS n_copies,
       COUNT(DISTINCT doc_id) AS n_docs,
       MIN(doc_id * 16 + frame_idx) // 16 AS keeper_doc,
       MIN(doc_id * 16 + frame_idx) % 16 AS keeper_frame
FROM fr GROUP BY digest
""".format(MAX_F=synth.MEDIA_MAX_FRAMES + 1)
)


@register("media_dedup_exact", _MDE_ORACLE)
def q_media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    fr = (
        spark.table("media")
        .select(
            "doc_id",
            "frame_len",
            "payload",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("n_frames"), F.lit(1)) - 1,
                )
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.md5(
                F.expr(
                    "substring(payload, CAST(frame_idx * frame_len + 1 AS INT),"
                    " CAST(frame_len AS INT))"
                )
            ).alias("digest"),
        )
    )
    return (
        fr.groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(F.col("doc_id") * 16 + F.col("frame_idx")).alias("k"),
        )
        .select(
            "digest",
            "n_copies",
            "n_docs",
            F.expr("k div 16").alias("keeper_doc"),
            F.expr("k % 16").alias("keeper_frame"),
        )
    )


# Perceptual average-hash (aHash): 4x4 block means vs the image mean,
# compared exactly as block_sum*n_px > total_sum*block_n — the
# near-dup bucket key for image dedup (the perceptual sibling of
# media_dedup_exact's byte-md5). The oracle re-derives every bit from
# the ASCII twin's pixel grid; the engine hashes the REAL-codec
# decoded grid (encode->decode roundtrip), so agreement also re-proves
# the codec on every image.
@register(
    "media_ahash",
    _MEDIA_ORACLE
    + """
    , imgs AS (SELECT * FROM media_base WHERE kind = 'image')
    , acells AS (
      SELECT i.doc_id, i.width, i.height, r.i AS r, c.i AS c,
             ascii(substr(i.payload_str,
                          CAST(r.i * i.width + c.i + 1 AS BIGINT), 1)) AS b
      FROM imgs i, range(0, {MAX_H}) r(i), range(0, {MAX_W}) c(i)
      WHERE r.i < i.height AND c.i < i.width
    )
    , blocks AS (
      SELECT doc_id, (r * 4) // height AS br, (c * 4) // width AS bc,
             CAST(SUM(b) AS BIGINT) AS bs, COUNT(*) AS bn
      FROM acells GROUP BY 1, 2, 3
    )
    , tot AS (
      SELECT doc_id, CAST(SUM(bs) AS BIGINT) AS ts,
             CAST(SUM(bn) AS BIGINT) AS tn
      FROM blocks GROUP BY 1
    )
    SELECT b.doc_id,
           CAST(SUM(CASE WHEN b.bs * t.tn > t.ts * b.bn
                         THEN 1 << (b.br * 4 + b.bc) ELSE 0 END)
             AS BIGINT) AS ahash,
           CAST(MIN(t.tn) AS BIGINT) AS n_px
    FROM blocks b JOIN tot t USING (doc_id)
    GROUP BY 1
    """.format(MAX_H=synth.MEDIA_MAX_H + 1, MAX_W=synth.MEDIA_MAX_W + 1),
)
def q_media_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return MM.image_ahash(spark.table("media"))


# Windowed loudness scan: fixed 64-sample windows (last partial), loud
# when window energy exceeds the mean-square threshold exactly
# (Σb² > msq·n — no float means; the threshold straddles the synth
# world's window energies, so both arms are live). One Arrow pass,
# no keyed shuffle; the oracle enumerates sample positions from the
# ASCII twin and groups them by p // W.
LOUD_WIN = 64
LOUD_MSQ = 10_000


@register(
    "media_loudness_windows",
    _MEDIA_ORACLE
    + """
    , samples AS (
      SELECT m.doc_id, p.i // {W} AS w,
             ascii(substr(m.payload_str, CAST(p.i + 1 AS BIGINT), 1)) AS b
      FROM media_base m, range(0, {MAX_S}) p(i)
      WHERE m.kind = 'audio' AND p.i < m.n_samples
    )
    , wins AS (
      SELECT doc_id, w, CAST(SUM(b * b) AS BIGINT) AS e, COUNT(*) AS n
      FROM samples GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN e > {MSQ} * n THEN 1 ELSE 0 END) AS BIGINT)
             AS n_loud,
           CAST(MAX(e) AS BIGINT) AS max_energy
    FROM wins GROUP BY 1
    """.format(W=LOUD_WIN, MAX_S=synth.MEDIA_MAX_SAMPLES + 1, MSQ=LOUD_MSQ),
)
def q_media_loudness_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir)
    return MM.audio_loudness_windows(
        spark.table("media"), LOUD_WIN, LOUD_MSQ
    )
