"""Multimodal-column queries (SURVEY §2.11) — oracle-checked plumbing.

The media table is derived deterministically from `documents`
(operators/media.py: payload = UTF-8 bytes, kind cycled by doc_id, typed
metadata struct), so every query here has an exact DuckDB twin that
replays the same integer arithmetic over the text column (the corpus is
pure ASCII: byte values == codepoints, verified in tests).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.media import (
    FRAME_BYTES,
    attach_media_columns,
    byte_features,
    decode_resize_thumbnail,
    frame_diff_stats,
    sample_frames,
)
from data_ingestion_lambda_spark.plans._util import t
from data_ingestion_lambda_spark.plans.registry import pin, register

# DuckDB twin of attach_media_columns' kind/meta derivation.
_SQL_KIND = "(['image', 'audio', 'video'])[doc_id % 3 + 1]"


@register(
    "media_metadata_stats",
    oracle=f"""
    WITH media AS (
        SELECT doc_id, {_SQL_KIND} AS kind, length(text) AS n_bytes, n_chars
        FROM documents
    )
    SELECT kind,
           COUNT(*) AS n_assets,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(CASE WHEN kind = 'image' THEN 64 + n_chars % 192 END) AS BIGINT) AS sum_width,
           CAST(SUM(CASE WHEN kind = 'audio' THEN n_chars * 10 END) AS BIGINT) AS total_duration_ms,
           CAST(SUM(CASE WHEN kind = 'video' THEN n_bytes // 64 END) AS BIGINT) AS total_frames
    FROM media GROUP BY kind
    """,
    tags=("llm", "multimodal"),
)
def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup per modality — runs entirely on the typed
    struct column; the binary payload is pruned out of the scan (check
    ReadSchema: payload never read). The shape that makes 100 TB media
    lakes queryable: stats/filters on metadata, decode only on demand."""
    media = attach_media_columns(t(spark, sf_dir, "documents"))
    return media.groupBy(F.col("meta.kind").alias("kind")).agg(
        F.count("*").alias("n_assets"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.sum("meta.width").alias("sum_width"),
        F.sum("meta.duration_ms").alias("total_duration_ms"),
        F.sum("meta.n_frames").alias("total_frames"),
    )


@register(
    "media_byte_features",
    oracle="""
    SELECT doc_id,
           length(text) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
           CAST(ascii(substr(text, length(text), 1)) AS BIGINT) AS last_byte,
           CAST(list_sum(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)))
               % 1000000007 AS BIGINT) AS byte_sum_mod,
           len(list_distinct(list_transform(string_split(text, ''), c -> ascii(c))))
               AS n_distinct_bytes
    FROM documents
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def media_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over opaque payload bytes via Arrow-batched
    mapInPandas (operators/media.py) — the decode-stage plumbing with a
    deterministic byte-statistics 'decoder'."""
    media = attach_media_columns(t(spark, sf_dir, "documents"))
    return byte_features(media)


_ROUNDTRIP_N = 50  # bounded: files written driver-side, one per doc


@register(
    "media_binary_roundtrip",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
           CAST(ascii(substr(text, length(text), 1)) AS BIGINT) AS last_byte,
           CAST(list_sum(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)))
               % 1000000007 AS BIGINT) AS byte_sum_mod,
           len(list_distinct(list_transform(string_split(text, ''), c -> ascii(c))))
               AS n_distinct_bytes
    FROM documents
    WHERE doc_id IN (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {_ROUNDTRIP_N})
    """,
    tags=("llm", "multimodal", "source"),
)
def media_binary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end binaryFile lane: REAL files on disk → binaryFile source →
    media table → Arrow-batched feature extraction — the exact pipeline a
    media lake runs, not the parquet-derived stand-in.

    The first _ROUNDTRIP_N documents are materialized as one .txt file each
    (bounded driver-side write, like the probe-vector collects elsewhere),
    read back through sources/binary_source.py, adapted with
    media_table_from_binary (path-hash doc_id, NULL metadata — the honest
    post-ingest state), and feature-extracted with byte_features. The
    path-hash id is joined back to the real doc_id via a broadcast mapping
    parsed from the filename, so the oracle compares on document ids."""
    from data_ingestion_lambda_spark.sources.binary_source import (
        media_table_from_binary,
        read_binary_files,
    )

    # Per-process scratch dir: two sessions building this plan against the
    # same sf_dir (bench vs correctness driver) must not rmtree files under
    # each other's still-lazy DataFrames.
    out_dir = os.path.join(
        "/tmp",
        "spark_graft_binfiles",
        f"{sf_dir.strip('/').replace('/', '_')}_pid{os.getpid()}",
    )
    # Recreate from scratch: stale files from a prior run against different
    # table contents (the driver regenerates testdata between rounds) would
    # satisfy the glob and poison the comparison.
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    docs = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(_ROUNDTRIP_N)
        .collect()  # bounded to _ROUNDTRIP_N rows by construction
    )
    for r in docs:
        with open(os.path.join(out_dir, f"{r['doc_id']}.txt"), "wb") as f:
            f.write(r["text"].encode("utf-8"))

    files = read_binary_files(spark, out_dir, glob="*.txt")
    media = media_table_from_binary(files, "image")
    mapping = files.select(
        F.xxhash64("path").alias("doc_id"),
        F.regexp_extract("path", r"(-?\d+)\.txt$", 1).cast("long").alias("real_doc_id"),
    )
    return (
        byte_features(media)
        .join(F.broadcast(mapping), "doc_id")
        .select(
            F.col("real_doc_id").alias("doc_id"),
            "n_bytes",
            "first_byte",
            "last_byte",
            "byte_sum_mod",
            "n_distinct_bytes",
        )
    )


@register(
    "media_frame_sample",
    oracle=f"""
    WITH video AS (
        SELECT doc_id, text, length(text) // {FRAME_BYTES} AS n_full
        FROM documents WHERE {_SQL_KIND} = 'video'
    )
    SELECT doc_id,
           i AS frame_no,
           i * {FRAME_BYTES} AS "offset",
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES}), ''),
                                  c -> CAST(ascii(c) AS BIGINT))),
               (a, b) -> (a * 31 + b) % 1000000007) AS frame_checksum
    FROM video, UNNEST(generate_series(0, n_full - 1)) AS u(i)
    WHERE n_full > 0
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video payloads: variable fan-out mapInPandas
    (one row per {FRAME_BYTES}-byte frame) + per-frame checksum."""
    media = attach_media_columns(t(spark, sf_dir, "documents"))
    return sample_frames(media)


@register(
    "media_decode_resize",
    oracle=f"""
    WITH img AS (
        SELECT doc_id,
               64 + n_chars % 192 AS w,
               64 + doc_id % 128 AS h,
               length(text) AS n,
               list_transform(string_split(text, ''),
                              c -> CAST(ascii(c) AS BIGINT)) AS codes
        FROM documents WHERE doc_id % 3 = 0
    ),
    thumb AS (
        SELECT doc_id,
               flatten(list_transform(generate_series(0, 31), r ->
                   flatten(list_transform(generate_series(0, 31), q ->
                       list_transform(generate_series(0, 2), ch ->
                           codes[((((r*h)//32)*w + ((q*w)//32))*3 + ch) % n + 1])))))
                   AS sample
        FROM img
    )
    SELECT doc_id,
           CAST(32 AS BIGINT) AS thumb_w,
           CAST(32 AS BIGINT) AS thumb_h,
           list_reduce(list_prepend(CAST(0 AS BIGINT), sample),
                       (a, b) -> (a * 31 + b) % 1000000007) AS thumb_checksum,
           CAST(list_sum(list_transform(generate_series(1, 3072),
                    i -> CASE WHEN (i-1) % 3 = 0 THEN sample[i] ELSE 0 END)) AS BIGINT) AS sum_c0,
           CAST(list_sum(list_transform(generate_series(1, 3072),
                    i -> CASE WHEN (i-1) % 3 = 1 THEN sample[i] ELSE 0 END)) AS BIGINT) AS sum_c1,
           CAST(list_sum(list_transform(generate_series(1, 3072),
                    i -> CASE WHEN (i-1) % 3 = 2 THEN sample[i] ELSE 0 END)) AS BIGINT) AS sum_c2
    FROM thumb
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def media_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + nearest-neighbor resize of the image payloads to a 32x32
    thumbnail via the deterministic fake codec
    (operators/media.py::decode_resize_thumbnail) — the full binary →
    pixel-grid → resample → feature pipeline as Arrow-batched mapInPandas,
    with the DuckDB oracle replaying the identical index arithmetic."""
    media = attach_media_columns(t(spark, sf_dir, "documents"))
    return decode_resize_thumbnail(media)


@register(
    "media_phash",
    oracle="""
    WITH img AS (
        SELECT doc_id,
               64 + n_chars % 192 AS w,
               64 + doc_id % 128 AS h,
               length(text) AS n,
               list_transform(string_split(text, ''),
                              c -> CAST(ascii(c) AS BIGINT)) AS codes
        FROM documents WHERE doc_id % 3 = 0
    ),
    grid AS (
        SELECT doc_id,
               flatten(list_transform(generate_series(0, 7), r ->
                   list_transform(generate_series(0, 7), q ->
                       codes[((((r*h)//8)*w + ((q*w)//8))*3) % n + 1]))) AS pix
        FROM img
    ),
    feat AS (SELECT doc_id, pix, list_sum(pix) AS total FROM grid),
    bits AS (
        SELECT doc_id,
               list_transform(generate_series(1, 64),
                   i -> CASE WHEN pix[i] * 64 > total THEN 1 ELSE 0 END) AS bit
        FROM feat
    )
    SELECT doc_id,
           CAST(list_sum(bit) AS BIGINT) AS n_set_bits,
           CAST(list_sum(list_transform(generate_series(1, 16),
                j -> bit[j] * (1 << (j - 1)))) AS BIGINT) AS b0,
           CAST(list_sum(list_transform(generate_series(1, 16),
                j -> bit[16 + j] * (1 << (j - 1)))) AS BIGINT) AS b1,
           CAST(list_sum(list_transform(generate_series(1, 16),
                j -> bit[32 + j] * (1 << (j - 1)))) AS BIGINT) AS b2,
           CAST(list_sum(list_transform(generate_series(1, 16),
                j -> bit[48 + j] * (1 << (j - 1)))) AS BIGINT) AS b3
    FROM bits
    """,
    tags=("llm", "multimodal", "dedup", "pandas-udf"),
)
def media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash per image (operators/media.py::
    perceptual_hash): 8x8 NN-downsample of channel 0, bit set iff the cell
    exceeds the grid mean (all-integer pixel*64 > sum test), packed as
    four 16-bit blocks — the image-modality twin of the SimHash text
    fingerprint. The blocks are banding-ready: Hamming <= 3 between two
    hashes guarantees an exact match on >= 1 block, so image near-dup at
    corpus scale is four equi-joins on (block_idx, block_value), the exact
    dedup_simhash shape — never an all-pairs pass."""
    from data_ingestion_lambda_spark.operators.media import perceptual_hash

    media = attach_media_columns(t(spark, sf_dir, "documents"))
    return perceptual_hash(media)


@register(
    "media_phash_candidates",
    oracle="""
    WITH p AS (
        SELECT doc_id, b0, b1, b2, b3 FROM (
            WITH img AS (
                SELECT doc_id,
                       64 + n_chars % 192 AS w,
                       64 + doc_id % 128 AS h,
                       length(text) AS n,
                       list_transform(string_split(text, ''),
                                      c -> CAST(ascii(c) AS BIGINT)) AS codes
                FROM documents WHERE doc_id % 3 = 0
            ),
            grid AS (
                SELECT doc_id,
                       flatten(list_transform(generate_series(0, 7), r ->
                           list_transform(generate_series(0, 7), q ->
                               codes[((((r*h)//8)*w + ((q*w)//8))*3) % n + 1]))) AS pix
                FROM img
            ),
            feat AS (SELECT doc_id, pix, list_sum(pix) AS total FROM grid),
            bits AS (
                SELECT doc_id,
                       list_transform(generate_series(1, 64),
                           i -> CASE WHEN pix[i] * 64 > total THEN 1 ELSE 0 END) AS bit
                FROM feat
            )
            SELECT doc_id,
                   CAST(list_sum(list_transform(generate_series(1, 16),
                        j -> bit[j] * (1 << (j - 1)))) AS BIGINT) AS b0,
                   CAST(list_sum(list_transform(generate_series(1, 16),
                        j -> bit[16 + j] * (1 << (j - 1)))) AS BIGINT) AS b1,
                   CAST(list_sum(list_transform(generate_series(1, 16),
                        j -> bit[32 + j] * (1 << (j - 1)))) AS BIGINT) AS b2,
                   CAST(list_sum(list_transform(generate_series(1, 16),
                        j -> bit[48 + j] * (1 << (j - 1)))) AS BIGINT) AS b3
            FROM bits
        )
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
              + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
                AS INTEGER) AS hamming
    FROM p a JOIN p b
      ON a.doc_id < b.doc_id
     AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
    """,
    tags=("llm", "multimodal", "dedup"),
)
def media_phash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup candidate generation over the perceptual hashes: two
    images are candidates iff they agree exactly on >= 1 of the four
    16-bit blocks (the pigeonhole guarantee: every pair within Hamming 3
    collides somewhere), scored with the exact 64-bit Hamming distance.

    Scale: the Spark side builds candidates from four block equi-joins
    (explode to (block_idx, value) → self-join → distinct), NOT the
    quadratic OR-join the compact oracle uses — the oracle states the
    semantics, the plan states the 100 TB shape; the driver's hash compare
    proves they agree."""
    from data_ingestion_lambda_spark.operators.media import perceptual_hash

    p = perceptual_hash(attach_media_columns(t(spark, sf_dir, "documents"))).select(
        "doc_id", "b0", "b1", "b2", "b3"
    ).transform(pin)
    blocks = p.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("k"), F.col(f"b{k}").alias("val"))
                    for k in range(4)
                ]
            )
        ).alias("blk"),
    ).select("doc_id", "blk.k", "blk.val")
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    pa = p.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
    )
    pb = p.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(4)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"bb{k}"))) for k in range(4)
    )
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
    )


@register(
    "media_audio_energy",
    oracle=f"""
    WITH audio AS (
        SELECT doc_id, text, length(text) // 160 AS n_full,
               list_transform(string_split(text, ''),
                              c -> CAST(ascii(c) AS BIGINT)) AS codes
        FROM documents WHERE {_SQL_KIND} = 'audio'
    ),
    frames AS (
        SELECT doc_id, n_full,
               list_transform(generate_series(0, n_full - 1), k ->
                   list_sum(list_transform(generate_series(1, 160),
                       j -> codes[k * 160 + j] * codes[k * 160 + j]))) AS e
        FROM audio WHERE n_full > 0
    )
    SELECT doc_id,
           CAST(n_full AS BIGINT) AS n_frames,
           CAST(list_sum(e) AS BIGINT) AS total_energy,
           CAST(list_max(e) AS BIGINT) AS peak_energy,
           sqrt(CAST(list_sum(e) AS DOUBLE) / (n_full * 160)) AS rms_overall
    FROM frames
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def media_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-energy analysis of audio payloads (operators/media.py::
    audio_frame_energy): 10 ms frames, integer sum-of-squares energy per
    frame, peak + total + one deterministic overall RMS — the
    silence/VAD gating signal, closing per-modality coverage (image:
    phash/thumbnail, video: frame sampling, audio: frame energy)."""
    from data_ingestion_lambda_spark.operators.media import audio_frame_energy

    media = attach_media_columns(t(spark, sf_dir, "documents"))
    return audio_frame_energy(media)


@register(
    "media_shot_signal",
    oracle=f"""
    WITH video AS (
        SELECT doc_id, text, length(text) // {FRAME_BYTES} AS n_full
        FROM documents WHERE {_SQL_KIND} = 'video'
    ),
    fr AS (
        SELECT doc_id, i,
               list_transform(
                   string_split(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES}), ''),
                   c -> CAST(ascii(c) AS BIGINT)) AS codes
        FROM video, UNNEST(generate_series(0, n_full - 1)) AS u(i)
        WHERE n_full > 0
    ),
    d AS (
        SELECT a.doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, {FRAME_BYTES}),
                       j -> abs(a.codes[j] - b.codes[j]))),
                   (p, q) -> p + q) AS diff
        FROM fr a JOIN fr b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    )
    SELECT v.doc_id,
           CAST(v.n_full AS BIGINT) AS n_frames,
           CAST(COUNT(d.diff) AS BIGINT) AS n_boundaries,
           CAST(COALESCE(SUM(d.diff), 0) AS BIGINT) AS total_diff,
           CAST(COALESCE(MAX(d.diff), 0) AS BIGINT) AS max_diff,
           CAST(COALESCE(MIN(d.diff), 0) AS BIGINT) AS min_diff
    FROM video v LEFT JOIN d ON v.doc_id = d.doc_id
    WHERE v.n_full > 0
    GROUP BY v.doc_id, v.n_full
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def media_shot_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary signal per video: L1 frame-difference energy stats
    over consecutive frame pairs (operators/media.py::frame_diff_stats —
    numpy inside Arrow batches, exact integers). The DuckDB twin replays
    the byte arithmetic from the text payload, pinning the whole
    decode→diff→rollup pipeline cross-engine. Completes the video lane:
    frame sampling gives the frames, this gives the cut structure a
    video-curation pipeline segments on."""
    media = attach_media_columns(t(spark, sf_dir, "documents"))
    return frame_diff_stats(media)
