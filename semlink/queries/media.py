"""Multimodal plumbing: header decode + real PNG pixel decode."""
from __future__ import annotations

from pyspark.sql import functions as F

from ..datapipe.multimodal import extract_media_features, synthesize_media
from . import SCALE, _docs, _r6, _spread, q


_MEDIA_DIMS_SQL = """
  SELECT doc_id, md5(text) AS d,
         1 + CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) % 64 AS width,
         1 + CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT) % 64 AS height,
         CASE ((CAST(('0x' || substr(md5(text), 5, 1)) AS BIGINT) % 4) * 2)
              WHEN 0 THEN 1 WHEN 2 THEN 3 WHEN 4 THEN 2 WHEN 6 THEN 4 END
           AS channels
  FROM documents
"""

@q("media_features", f"""
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         'image' AS kind,
         CAST(68 + height * (1 + width * channels) AS BIGINT) AS n_bytes,
         'png' AS fmt,
         CAST(width AS BIGINT) AS width,
         CAST(height AS BIGINT) AS height,
         CAST(channels AS BIGINT) AS channels
  FROM ({_MEDIA_DIMS_SQL})
""")
def media_features(spark, sf_dir):
    """Multimodal round trip: JVM-synthesized VALID PNGs (now with a
    real stored-deflate IDAT — 68 + h·(1+w·c) bytes total) with
    md5-derived dims → Arrow mapInPandas STRUCTURAL byte decode; the
    oracle predicts the decoder's output from the generator params, so
    a decode bug (endianness, offset, color-type map) fails the hash."""
    # spread the single-split scan so the Arrow decode runs on all
    # cores, not 1 task (guide §2.5/§6)
    media = synthesize_media(_spread(_docs(spark, sf_dir)))
    return extract_media_features(media).select(
        "media_id", "kind", "n_bytes", "fmt", "width", "height", "channels")


@q("media_pixels", f"""
  SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
         CAST(width * height AS BIGINT) AS n_px,
         CAST(ROUND(CAST(v0 + CASE WHEN channels > 1 THEN v1 ELSE 0 END
                            + CASE WHEN channels > 2 THEN v2 ELSE 0 END
                            + CASE WHEN channels > 3 THEN v3 ELSE 0 END
                         AS DOUBLE) / channels * {SCALE}) AS BIGINT) AS mean6,
         md5(repeat(
               lpad(lower(to_hex(v0)), 2, '0')
               || CASE WHEN channels > 1
                       THEN lpad(lower(to_hex(v1)), 2, '0') ELSE '' END
               || CASE WHEN channels > 2
                       THEN lpad(lower(to_hex(v2)), 2, '0') ELSE '' END
               || CASE WHEN channels > 3
                       THEN lpad(lower(to_hex(v3)), 2, '0') ELSE '' END,
               CAST(width * height AS INTEGER))) AS px_digest
  FROM (SELECT doc_id, width, height, channels,
               CAST(('0x' || substr(d, 7, 1)) AS BIGINT) * 17 AS v0,
               CAST(('0x' || substr(d, 8, 1)) AS BIGINT) * 17 AS v1,
               CAST(('0x' || substr(d, 9, 1)) AS BIGINT) * 17 AS v2,
               CAST(('0x' || substr(d, 10, 1)) AS BIGINT) * 17 AS v3
        FROM ({_MEDIA_DIMS_SQL}))
""")
def media_pixels(spark, sf_dir):
    """REAL pixel decode (VERDICT r03 next #4): the synthesized PNGs'
    stored-deflate IDAT is inflated with stdlib zlib and unfiltered
    (Sub row 0, Up rows 1+) by decode_png_pixels; the oracle predicts
    the per-pixel channel pattern from the md5-derived generator params
    and hashes the ENTIRE reconstructed sample stream (px_digest =
    md5(hex(pixels))), so any inflate/unfilter/stride/interleave bug
    hash-mismatches. mean6 is the exact channel-average."""
    media = synthesize_media(_spread(_docs(spark, sf_dir)))
    from ..datapipe.multimodal import extract_pixel_stats
    return (extract_pixel_stats(media)
            .select("media_id", "n_px", _r6(F.col("mean")).alias("mean6"),
                    "px_digest"))


@q("media_audio", f"""
  WITH p AS (SELECT doc_id,
               1 + CAST(('0x' || substr(md5(text), 11, 1)) AS BIGINT) % 2
                 AS n_ch,
               1 + CAST(('0x' || substr(md5(text), 12, 2)) AS BIGINT)
                 AS frames,
               CAST(('0x' || substr(md5(text), 13, 1)) AS BIGINT) * 1000
                 AS a0,
               CAST(('0x' || substr(md5(text), 14, 1)) AS BIGINT) * 1000
                 AS a1
             FROM documents)
  SELECT 'a' || CAST(doc_id AS VARCHAR) AS media_id,
         CAST(frames * n_ch AS BIGINT) AS n_samples,
         CAST(ROUND(CAST(a0 + CASE WHEN n_ch > 1 THEN a1 ELSE 0 END
                         AS DOUBLE) / n_ch * {SCALE}) AS BIGINT) AS mean6,
         md5(repeat(
               lpad(lower(to_hex(a0 % 256)), 2, '0')
               || lpad(lower(to_hex(a0 // 256)), 2, '0')
               || CASE WHEN n_ch > 1 THEN
                    lpad(lower(to_hex(a1 % 256)), 2, '0')
                    || lpad(lower(to_hex(a1 // 256)), 2, '0')
                  ELSE '' END,
               CAST(frames AS INTEGER))) AS digest
  FROM p
""")
def media_audio(spark, sf_dir):
    """REAL audio decode round trip: JVM-synthesized valid 16-bit PCM
    WAVs (RIFF/fmt/data from pure SQL hex expressions, md5-derived
    channel count / frame count / amplitudes) → decode_wav_samples
    (RIFF chunk walk + numpy int16 stream); the oracle predicts the
    sample count, exact mean, and md5(hex(PCM bytes)) from the
    generator parameters, so an endianness, chunk-walk, or
    sample-width bug hash-mismatches."""
    from ..datapipe.multimodal import extract_audio_stats, synthesize_audio
    media = synthesize_audio(_spread(_docs(spark, sf_dir)))
    return (extract_audio_stats(media)
            .select("media_id", "n_samples",
                    _r6(F.col("mean")).alias("mean6"), "digest"))


# ------------------------------------------------------------- jpeg
def _jpeg_golden_rows():
    import json
    import os
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "datapipe", "golden_jpeg.json")
    with open(p) as f:
        return json.load(f)


_JPEG_VALUES = ",\n    ".join(
    f"('{mid}', CAST({n} AS BIGINT), CAST({m6} AS BIGINT), '{dig}')"
    for mid, n, m6, dig in _jpeg_golden_rows())

@q("media_jpeg", f"""
  SELECT media_id, n_px, mean6, px_digest
  FROM (VALUES {_JPEG_VALUES}) AS t(media_id, n_px, mean6, px_digest)
""")
def media_jpeg(spark, sf_dir):
    """REAL baseline JPEG pixel decode through the distributed
    mapInPandas path (VERDICT r04 next #3): 60 deterministic fixture
    JPEGs (gray + color, with and without restart markers, Annex-K
    quant tables) are Huffman-decoded, dequantized, IDCT'd and
    color-converted by decode_jpeg_pixels; the oracle is a pinned
    golden-constant table (the ml_logistic_fit pattern — JVM-side SQL
    synthesis of a Huffman bitstream is not closed-form), re-derived
    from the decoder by pytest so staleness fails the suite."""
    from ..datapipe.multimodal import (extract_pixel_stats,
                                       synthesize_jpeg_fixtures)
    rows = [(mid, bytearray(payload))
            for mid, payload, _w, _h, _c in synthesize_jpeg_fixtures(60)]
    media = spark.createDataFrame(rows, "media_id string, payload binary")
    s = extract_pixel_stats(media)
    return s.select("media_id", "n_px",
                    F.round(F.col("mean") * SCALE).cast("bigint")
                    .alias("mean6"), "px_digest")


# ------------------------------------------------------- video frames
def _frame_golden_rows():
    import json
    import os
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "datapipe", "golden_frames.json")
    with open(p) as f:
        return json.load(f)


_FRAME_VALUES = ",\n    ".join(
    f"('{mid}', CAST({fi} AS BIGINT), CAST({nf} AS BIGINT),"
    f" CAST({n} AS BIGINT), CAST({m6} AS BIGINT), '{dig}')"
    for mid, fi, nf, n, m6, dig in _frame_golden_rows())

@q("media_video_frames", f"""
  SELECT media_id, frame_idx, n_frames, n_px, mean6, px_digest
  FROM (VALUES {_FRAME_VALUES})
    AS t(media_id, frame_idx, n_frames, n_px, mean6, px_digest)
""")
def media_video_frames(spark, sf_dir):
    """Video-style FRAME SAMPLING through the distributed mapInPandas
    path: 40 deterministic animated-GIF fixtures (uncompressed-LZW
    trick, per-frame graphic-control extensions, alternating global/
    local palettes) are multi-frame decoded by decode_gif_frames and
    sampled at every_k=2; the oracle is a pinned golden-constant
    table (the media_jpeg pattern — a GIF LZW bitstream is not
    closed-form in SQL), re-derived from the decoder by pytest so
    staleness fails the suite. Registry + pytest + oracle verified on
    demand; demoted from the driver window (see __spark_entry__)."""
    from ..datapipe.multimodal import (extract_frame_stats,
                                       synthesize_animation_fixtures)
    rows = [(mid, bytearray(payload))
            for mid, payload, _nf, _w, _h in synthesize_animation_fixtures(40)]
    media = spark.createDataFrame(rows, "media_id string, payload binary")
    s = extract_frame_stats(media, every_k=2)
    return s.select("media_id", "frame_idx", "n_frames", "n_px",
                    F.round(F.col("mean") * SCALE).cast("bigint")
                    .alias("mean6"), "px_digest")


# --------------------------------------------------- perceptual dedup
def _ahash_golden_rows():
    import json
    import os
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "datapipe", "golden_ahash.json")
    with open(p) as f:
        return json.load(f)


_AHASH_VALUES = ",\n    ".join(
    f"('{mid}', '{a}', '{keep}', CAST({n} AS BIGINT))"
    for mid, a, keep, n in _ahash_golden_rows())

@q("media_ahash_dedup", f"""
  SELECT media_id, ahash, keeper, group_size
  FROM (VALUES {_AHASH_VALUES})
    AS t(media_id, ahash, keeper, group_size)
""")
def media_ahash_dedup(spark, sf_dir):
    """Perceptual image dedup via average-hash: decode (PNG/GIF/JPEG)
    → BT.601 luminance → 8×8 block-mean RESIZE → threshold-at-mean 64
    bits, then exact-equality grouping on the hash key. Fixtures plant
    perceptual triples — the same pattern as PNG, as GIF (lossless
    cross-format), and brightness-shifted (+30, no clipping) — that
    must land in one group each, beside unrelated JPEG singletons.
    Oracle is a pinned golden-constant table (the media_jpeg pattern),
    re-derived from the hasher by pytest. Registry + pytest + oracle
    verified on demand; demoted from the driver window (see
    __spark_entry__)."""
    from pyspark.sql import Window
    from ..datapipe.multimodal import extract_ahash, synthesize_phash_fixtures
    rows = [(mid, bytearray(p))
            for mid, p, _g in synthesize_phash_fixtures(12)]
    media = spark.createDataFrame(rows, "media_id string, payload binary")
    w = Window.partitionBy("ahash")
    return (extract_ahash(media)
            .withColumn("keeper", F.min("media_id").over(w))
            .withColumn("group_size", F.count(F.lit(1)).over(w)
                        .cast("bigint")))


_HAM_K = 15   # 16 nibble bands guarantee recall at hamming <= 15

_AHASH_ID_VALUES = ",\n    ".join(
    f"('{mid}', '{a}')" for mid, a, _k, _n in _ahash_golden_rows())


def _ham_sql(a: str, b: str) -> str:
    terms = " + ".join(
        f"bit_count(xor(instr('0123456789abcdef', substr({a}, {i}, 1)) - 1,"
        f" instr('0123456789abcdef', substr({b}, {i}, 1)) - 1))"
        for i in range(1, 17))
    return f"CAST(({terms}) AS BIGINT)"


@q("media_ahash_near_pairs", f"""
  WITH a AS (SELECT media_id, ahash
             FROM (VALUES {_AHASH_ID_VALUES}) t(media_id, ahash)),
  p AS (SELECT l.media_id AS left_id, l.ahash AS a_l,
               r.media_id AS right_id, r.ahash AS a_r
        FROM a l JOIN a r ON l.media_id < r.media_id)
  SELECT left_id, right_id, {_ham_sql('a_l', 'a_r')} AS hamming
  FROM p WHERE {_ham_sql('a_l', 'a_r')} <= {_HAM_K}
""")
def media_ahash_near_pairs(spark, sf_dir):
    """Perceptual NEAR-duplicate pairs — the scale path past exact
    hash equality: the 64-bit aHash splits into 16 nibble bands
    (pigeonhole: any pair at hamming <= 15 shares at least one
    identical nibble at the same position, so the band equi join has
    NO false negatives at this radius — the SimHash-banding argument
    with a proven bound), candidates verified by an exact 16-term
    nibble-XOR popcount. The oracle brute-forces ALL pairs over the
    pinned hash table with the same integer hamming expression, so
    the banded plan must reproduce the quadratic answer exactly
    (fixtures plant hamming-5..13 tweak variants; cross-group
    distances measured >= 20). Registry + pytest + oracle verified on
    demand; demoted from the driver window (see __spark_entry__)."""
    from ..datapipe.multimodal import extract_ahash, synthesize_phash_fixtures
    rows = [(mid, bytearray(p))
            for mid, p, _g in synthesize_phash_fixtures(12)]
    media = spark.createDataFrame(rows, "media_id string, payload binary")
    ah = extract_ahash(media).filter(F.col("ahash").isNotNull())
    bands = ah.select(
        "media_id", "ahash",
        F.posexplode(F.expr("split(ahash, '(?!$)')")).alias("p", "ch"))
    lft = bands.select(F.col("media_id").alias("left_id"),
                       F.col("ahash").alias("a_l"), "p", "ch")
    rgt = bands.select(F.col("media_id").alias("right_id"),
                       F.col("ahash").alias("a_r"), "p", "ch")
    cand = (lft.join(rgt, ["p", "ch"])
            .filter(F.col("left_id") < F.col("right_id"))
            .select("left_id", "right_id", "a_l", "a_r").distinct())
    ham = None
    for i in range(1, 17):
        nib_l = F.expr(f"instr('0123456789abcdef', substring(a_l, {i}, 1)) - 1")
        nib_r = F.expr(f"instr('0123456789abcdef', substring(a_r, {i}, 1)) - 1")
        t = F.bit_count(nib_l.bitwiseXOR(nib_r))
        ham = t if ham is None else ham + t
    return (cand.withColumn("hamming", ham.cast("bigint"))
            .filter(F.col("hamming") <= _HAM_K)
            .select("left_id", "right_id", "hamming"))
