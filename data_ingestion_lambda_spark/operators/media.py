"""Multimodal columns: opaque binary payloads + typed metadata (SURVEY §2.11).

The reference has no media handling; the north star requires image/audio/
video as first-class columns of a 100 TB training-data pipeline. The Spark
shape is:

- payload: ``BinaryType`` — opaque bytes, never interpreted by Catalyst;
- metadata: a typed ``StructType`` column (kind + per-kind fields) so
  filters/pruning/partitioning run on metadata WITHOUT touching payloads
  (predicate pushdown on `meta.kind` skips whole row groups; the binary
  column is only decoded inside the UDF stage);
- decode / feature-extract / frame-sample: Arrow-batched ``mapInPandas``
  — payload bytes reach Python as zero-copy Arrow buffers, one batch at a
  time, so executor memory is bounded by batch size, not file size.

The actual codec work (PIL/librosa/cv2) is STUBBED — those libraries are
not in this container. The stubs fail loudly (NotImplementedError) while
``byte_features`` / ``sample_frames`` exercise the real plumbing (schema,
batching, variable-row-count output) with deterministic integer
arithmetic that an external oracle can replay.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

P = 1_000_000_007  # shared polynomial-hash modulus (plans/llm_ops.py)

KINDS = ("image", "audio", "video")

# One struct, per-kind nullable fields — the lake-friendly layout: a single
# table holds all modalities; readers filter on meta.kind and Catalyst
# prunes the untouched fields.
MEDIA_META = (
    "struct(kind, width, height, channels, sample_rate, duration_ms, fps, n_frames)"
)


def attach_media_columns(documents: DataFrame) -> DataFrame:
    """Derive a multimodal table from `documents`: payload = UTF-8 bytes of
    the text (a deterministic stand-in for real media bytes), kind cycled
    by doc_id, and per-kind metadata derived arithmetically.

    In production this frame comes from ``spark.read.format('binaryFile')``
    or a parquet lake with the same (payload, meta) layout; everything
    downstream is identical.
    """
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    n_bytes = F.length("text")  # ASCII corpus: bytes == chars
    is_k = {k: kind == k for k in KINDS}
    d = documents.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        kind.alias("kind"),
        F.when(is_k["image"], 64 + F.col("n_chars") % 192).alias("width"),
        F.when(is_k["image"], 64 + F.col("doc_id") % 128).alias("height"),
        F.when(is_k["image"], F.lit(3)).alias("channels"),
        F.when(is_k["audio"], F.lit(16000)).alias("sample_rate"),
        F.when(is_k["audio"], F.col("n_chars") * 10).alias("duration_ms"),
        F.when(is_k["video"], F.lit(24)).alias("fps"),
        F.when(is_k["video"], F.floor(n_bytes / 64)).alias("n_frames"),
    )
    return d.select("doc_id", "payload", F.expr(MEDIA_META).alias("meta"))


# ---------------------------------------------------------------------------
# decode stubs — real codecs are not available in this environment
# ---------------------------------------------------------------------------


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB: decode an image payload to an HxWxC uint8 array."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow; not installed in this environment. "
            "The Spark-side plumbing (binary column → mapInPandas batch) is "
            "exercised by byte_features()."
        ) from e
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


def decode_audio(payload: bytes) -> "np.ndarray":
    """STUB: decode an audio payload to a float32 waveform."""
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "audio decode requires soundfile/librosa; not installed here."
        ) from e
    raise NotImplementedError("wire soundfile.read(io.BytesIO(payload)) here")


def decode_video_frames(payload: bytes, stride: int) -> "Iterator[np.ndarray]":
    """STUB: decode every ``stride``-th video frame."""
    try:
        import cv2  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "video decode requires opencv; not installed here. Frame "
            "*sampling* plumbing is exercised by sample_frames()."
        ) from e
    raise NotImplementedError("wire cv2.VideoCapture here")


# ---------------------------------------------------------------------------
# real plumbing, deterministic arithmetic
# ---------------------------------------------------------------------------

BYTE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("last_byte", LongType()),
        StructField("byte_sum_mod", LongType()),
        StructField("n_distinct_bytes", LongType()),
    ]
)


def byte_features(media: DataFrame) -> DataFrame:
    """Feature-extract over the opaque payload: the decode-stage shape
    (binary in, fixed-width feature vector out) with a deterministic
    'decoder' — per-payload byte statistics via numpy over Arrow buffers."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                if len(b) == 0:
                    # One empty payload must not fail the whole query.
                    # Mirror the oracle exactly (verified in DuckDB):
                    # ascii(substr('',1,1)) = 0, string_split('','') = ['']
                    # → distinct count 1, sums 0.
                    rows.append((doc_id, 0, 0, 0, 0, 1))
                    continue
                rows.append(
                    (
                        doc_id,
                        len(b),
                        int(b[0]),
                        int(b[-1]),
                        int(b.sum() % P),
                        int(len(np.unique(b))),
                    )
                )
            yield pd.DataFrame(rows, columns=BYTE_FEATURES_SCHEMA.fieldNames())

    return media.select("doc_id", "payload").mapInPandas(
        extract, schema=BYTE_FEATURES_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("offset", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)

FRAME_BYTES = 64


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame-sample the video payloads: one output row per FRAME_BYTES
    slice — the variable-fan-out decode shape (one input row → n_frames
    rows). Checksum = polynomial hash of the slice (exact integers,
    engine-portable)."""
    video = media.filter(F.col("meta.kind") == "video")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_full = len(payload) // FRAME_BYTES
                for i in range(n_full):
                    chunk = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    h = 0
                    for byte in chunk:
                        h = (h * 31 + byte) % P
                    rows.append((doc_id, i, i * FRAME_BYTES, h))
            yield pd.DataFrame(rows, columns=FRAME_SCHEMA.fieldNames())

    return video.select("doc_id", "payload").mapInPandas(frames, schema=FRAME_SCHEMA)


THUMB = 32  # thumbnail side for the deterministic resize

DECODE_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("thumb_w", LongType()),
        StructField("thumb_h", LongType()),
        StructField("thumb_checksum", LongType()),
        StructField("sum_c0", LongType()),
        StructField("sum_c1", LongType()),
        StructField("sum_c2", LongType()),
    ]
)


def decode_resize_thumbnail(media: DataFrame) -> DataFrame:
    """Deterministic fake image codec + nearest-neighbor resize — the REAL
    decode-stage pipeline (payload bytes → pixel array → resample →
    features) with an arithmetic codec instead of PIL, so the whole path
    is exercisable and oracle-checkable in this container.

    Codec: pixel (r, q, ch) of the meta.width × meta.height × channels
    image is payload byte ((r*width + q)*channels + ch) mod n_bytes (the
    payload tiles the image plane). Resize: nearest-neighbor to a
    THUMB×THUMB thumbnail — source row floor(r*height/THUMB), source col
    floor(q*width/THUMB), the classic integer NN grid. Features: rolling
    polynomial checksum over the thumbnail in row-major (r, q, ch) order
    plus exact per-channel byte sums (means = sum/1024 are derived
    downstream; keeping integer sums keeps the cross-engine hash exact).

    Scale: identical plumbing to a real decoder — Arrow batches in,
    numpy gather per row, fixed-width feature rows out; swapping in PIL
    changes only the body of the per-row function.
    """
    # Undecodable rows are filtered Spark-side (predicate reaches the
    # scan): a media table straight from binaryFile ingestion carries
    # NULL dimensions until a decode stage fills them (sources/
    # binary_source.py::media_table_from_binary) — one such row must not
    # fail the job.
    imgs = media.filter(
        (F.col("meta.kind") == "image")
        & F.col("meta.width").isNotNull()
        & F.col("meta.height").isNotNull()
        & F.col("meta.channels").isNotNull()
        & (F.col("meta.channels") > 0)
    ).select("doc_id", "payload", "meta.width", "meta.height", "meta.channels")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, width, height, channels in zip(
                pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"], pdf["channels"]
            ):
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(b)
                if n == 0:
                    rows.append((doc_id, THUMB, THUMB, 0, 0, 0, 0))
                    continue
                w, h, c = int(width), int(height), int(channels)
                rr = (np.arange(THUMB) * h) // THUMB  # source rows
                qq = (np.arange(THUMB) * w) // THUMB  # source cols
                base = rr[:, None] * w + qq[None, :]  # THUMB x THUMB
                idx = (base[:, :, None] * c + np.arange(c)[None, None, :]) % n
                sample = b[idx]  # THUMB x THUMB x c
                flat = sample.reshape(-1)
                hsh = 0
                for v in flat.tolist():
                    hsh = (hsh * 31 + v) % P
                # Pad/truncate to the 3-channel output shape: grayscale
                # fills sum_c1/sum_c2 with 0, >3-channel (e.g. RGBA) drops
                # the extras — no per-row crash on unusual channel counts.
                sums = sample.reshape(-1, c).sum(axis=0)
                s3 = [int(sums[k]) if k < c else 0 for k in range(3)]
                rows.append((doc_id, THUMB, THUMB, hsh, s3[0], s3[1], s3[2]))
            yield pd.DataFrame(rows, columns=DECODE_RESIZE_SCHEMA.fieldNames())

    return imgs.mapInPandas(decode, schema=DECODE_RESIZE_SCHEMA)


PHASH_SIDE = 8  # average-hash grid

PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_set_bits", LongType()),
        StructField("b0", LongType()),
        StructField("b1", LongType()),
        StructField("b2", LongType()),
        StructField("b3", LongType()),
    ]
)


def perceptual_hash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash of the image payloads: 8x8 nearest-neighbor
    downsample of channel 0, one bit per cell set iff the cell exceeds the
    grid mean, emitted as four 16-bit blocks (b0..b3) — the image twin of
    the SimHash text fingerprint, and directly banding-ready: Hamming <= 3
    between two hashes guarantees an exact match on at least one block
    (pigeonhole), so image near-dup candidates come from four equi-joins,
    never an all-pairs pass.

    All-integer mean test (pixel * 64 > sum) — no division, so the bits
    are bit-identical in any engine replaying the same index arithmetic."""
    imgs = media.filter(
        (F.col("meta.kind") == "image")
        & F.col("meta.width").isNotNull()
        & F.col("meta.height").isNotNull()
        & F.col("meta.channels").isNotNull()
        & (F.col("meta.channels") > 0)
    ).select("doc_id", "payload", "meta.width", "meta.height", "meta.channels")

    side = PHASH_SIDE

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, width, height, channels in zip(
                pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"], pdf["channels"]
            ):
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(b)
                if n == 0:
                    rows.append((doc_id, 0, 0, 0, 0, 0))
                    continue
                w, h, c = int(width), int(height), int(channels)
                rr = (np.arange(side) * h) // side
                qq = (np.arange(side) * w) // side
                base = rr[:, None] * w + qq[None, :]
                pix = b[(base * c) % n]  # channel 0, 8x8
                flat = pix.reshape(-1)
                total = int(flat.sum())
                bits = (flat * (side * side) > total).astype(np.int64)
                blocks = [
                    int(sum(int(bits[16 * k + j]) << j for j in range(16)))
                    for k in range(4)
                ]
                rows.append((doc_id, int(bits.sum()), *blocks))
            yield pd.DataFrame(rows, columns=PHASH_SCHEMA.fieldNames())

    return imgs.mapInPandas(phash, schema=PHASH_SCHEMA)


AUDIO_FRAME_SAMPLES = 160  # 10 ms at the 16 kHz metadata rate, 1 byte/sample

AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("total_energy", LongType()),
        StructField("peak_energy", LongType()),
        StructField("rms_overall", DoubleType()),
    ]
)


def audio_frame_energy(media: DataFrame) -> DataFrame:
    """Per-frame energy analysis of the audio payloads: 10 ms frames
    (AUDIO_FRAME_SAMPLES bytes at the metadata sample rate), energy =
    integer sum of squared samples — the silence/VAD gating signal an
    audio curation pipeline thresholds on. Integer energies keep the
    cross-engine hash exact; the single float (overall RMS) is ONE
    division + ONE sqrt on exact integers per doc — a per-frame RMS sum
    would reassociate float additions and break the oracle hash.

    Same Arrow-batched mapInPandas plumbing as the image/video lanes —
    this closes per-modality coverage (image: phash/thumbnail, video:
    frame sampling, audio: frame energy)."""
    audio = media.filter(F.col("meta.kind") == "audio")

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n_full = len(b) // AUDIO_FRAME_SAMPLES
                if n_full == 0:
                    # sub-frame payload: no full frame to analyze — same
                    # drop convention as video sample_frames
                    continue
                frames = b[: n_full * AUDIO_FRAME_SAMPLES].reshape(
                    n_full, AUDIO_FRAME_SAMPLES
                )
                e = (frames * frames).sum(axis=1)
                total = int(e.sum())
                rows.append(
                    (
                        doc_id,
                        int(n_full),
                        total,
                        int(e.max()),
                        float(np.sqrt(total / (n_full * AUDIO_FRAME_SAMPLES))),
                    )
                )
            yield pd.DataFrame(rows, columns=AUDIO_ENERGY_SCHEMA.fieldNames())

    return audio.select("doc_id", "payload").mapInPandas(
        energy, schema=AUDIO_ENERGY_SCHEMA
    )


SHOT_SIGNAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_boundaries", LongType()),
        StructField("total_diff", LongType()),
        StructField("max_diff", LongType()),
        StructField("min_diff", LongType()),
    ]
)


def frame_diff_stats(media: DataFrame) -> DataFrame:
    """Shot-boundary signal over video payloads: per consecutive frame
    pair, the L1 difference energy (sum over bytes of |a - b| — exact
    integers), rolled up to per-video stats. A real shot detector
    thresholds exactly this series; the threshold is downstream policy,
    so the operator ships the signal, not a verdict. numpy-vectorized
    inside Arrow batches: the per-video work is one reshape + one
    abs-diff over a frames x FRAME_BYTES int matrix, no per-byte Python."""
    video = media.filter(F.col("meta.kind") == "video")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_full = len(payload) // FRAME_BYTES
                if n_full == 0:
                    continue
                arr = (
                    np.frombuffer(bytes(payload), dtype=np.uint8)[
                        : n_full * FRAME_BYTES
                    ]
                    .reshape(n_full, FRAME_BYTES)
                    .astype(np.int64)
                )
                diffs = np.abs(arr[1:] - arr[:-1]).sum(axis=1)
                rows.append(
                    (
                        doc_id,
                        n_full,
                        len(diffs),
                        int(diffs.sum()) if len(diffs) else 0,
                        int(diffs.max()) if len(diffs) else 0,
                        int(diffs.min()) if len(diffs) else 0,
                    )
                )
            yield pd.DataFrame(rows, columns=SHOT_SIGNAL_SCHEMA.fieldNames())

    return video.select("doc_id", "payload").mapInPandas(
        stats, schema=SHOT_SIGNAL_SCHEMA
    )


_JPEG_SCAN_CAP = 65536  # bounded SOF scan: dims past 64 KiB -> quarantine NULL
# SOF0..SOF15 carry frame dimensions, EXCEPT the non-frame markers that
# share the range: DHT (C4), JPG (C8), DAC (CC). (ITU T.81 table B.1)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _jpeg_sof_dims(b) -> tuple:
    """(width, height) from a JPEG payload's SOF marker, or (None, None)
    for non-JPEG / truncated / desynced / over-cap payloads. Stdlib byte
    walk, bounded by ``_JPEG_SCAN_CAP`` — markers are (0xFF, type,
    2-byte big-endian length) segments; dimensions live in the first
    start-of-frame segment, which the spec puts before the entropy-coded
    scan data (SOS)."""
    if b is None:
        return (None, None)
    b = bytes(b)
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return (None, None)
    cap = min(len(b), _JPEG_SCAN_CAP)
    pos = 2
    while pos + 1 < cap:
        if b[pos] != 0xFF:
            return (None, None)  # desynced: quarantine, don't guess
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone markers
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF: no dims
            return (None, None)
        if pos + 4 > cap:
            return (None, None)  # truncated segment header
        seglen = (b[pos + 2] << 8) | b[pos + 3]
        if seglen < 2:
            return (None, None)
        if marker in _JPEG_SOF:
            # segment: len(2) precision(1) height(2) width(2) ...
            if seglen < 7 or pos + 9 > len(b):
                return (None, None)
            height = (b[pos + 5] << 8) | b[pos + 6]
            width = (b[pos + 7] << 8) | b[pos + 8]
            return (width, height)
        pos += 2 + seglen
    return (None, None)  # scan cap or clean end without a SOF


def parse_image_headers(media: DataFrame, content_col: str = "content") -> DataFrame:
    """Container-level image metadata WITHOUT any codec — the one image
    operation that is fully real in this container, because image
    dimensions live in the container header, not in the compressed
    payload:

    - PNG: 8-byte signature, then the IHDR chunk — width/height are
      big-endian uint32 at offsets 16 and 20 (PNG spec §11.2.2);
    - GIF: 6-byte signature (GIF87a/GIF89a), then LITTLE-endian uint16
      width/height at offsets 6 and 8;
    - BMP: 'BM' + file size, then a DIB header whose SIZE field (bytes
      14-17 LE) is gated explicitly (ADVICE r9: a 'BM' signature alone
      says nothing about layout): BITMAPINFOHEADER-family sizes
      (40/52/56/64/108/124) carry SIGNED int32 width/height at offsets
      18 and 22; the 12-byte BITMAPCOREHEADER carries uint16 dims at
      offsets 18 and 20; any other DIB size quarantines to NULL;
    - JPEG (r10): dimensions hide in a variable-offset SOF marker, so
      this one format goes through the Arrow-batched pandas path
      (``_jpeg_sof_dims`` — stdlib byte walk per payload, scan capped
      at ``_JPEG_SCAN_CAP`` bytes, NULL on truncation/desync/overrun).
      Full pixel decode stays behind the loud ``decode_image`` gate.

    The fixed-offset formats run as codegen byte arithmetic over the
    binary column (substring slices the BINARY, hex + conv() turn the
    slice into an integer, little-endian orders recompose per byte), so
    a 100 TB binaryFile scan sniffs formats and dimensions in the scan
    stage with zero Python; only the JPEG branch pays one vectorized
    Arrow round-trip, and its Python body exits on the first two bytes
    for every non-JPEG payload.

    Returns (•, format, width, height) with NULLs for unrecognized or
    truncated payloads — a quarantine filter downstream, same contract
    as the CSV source's corrupt-record column."""
    c = F.col(content_col)

    def be32(off: int) -> Column:
        # big-endian uint32 from 4 bytes at 1-based offset
        return F.conv(F.hex(F.expr(f"substring({content_col}, {off}, 4)")), 16, 10).cast("long")

    def le16(off: int) -> Column:
        b1 = F.conv(F.hex(F.expr(f"substring({content_col}, {off}, 1)")), 16, 10).cast("long")
        b2 = F.conv(F.hex(F.expr(f"substring({content_col}, {off + 1}, 1)")), 16, 10).cast("long")
        return b1 + b2 * 256

    def le32(off: int) -> Column:
        return le16(off) + le16(off + 2) * 65536

    png = F.hex(F.expr(f"substring({content_col}, 1, 8)")) == "89504E470D0A1A0A"
    gif = F.expr(f"substring({content_col}, 1, 4)").cast("string").startswith("GIF8")
    jpeg = F.hex(F.expr(f"substring({content_col}, 1, 2)")) == "FFD8"
    long_enough = F.length(c) >= 26
    # DIB header size field (1-based offset 15, little-endian uint32)
    # distinguishes the BMP layouts; unknown sizes -> NULL quarantine.
    dib = le32(15)
    bmp_info = (
        (F.hex(F.expr(f"substring({content_col}, 1, 2)")) == "424D")
        & long_enough
        & dib.isin(40, 52, 56, 64, 108, 124)
    )
    bmp_core = (
        (F.hex(F.expr(f"substring({content_col}, 1, 2)")) == "424D")
        & (F.length(c) >= 22)
        & (dib == 12)
    )

    jpeg_dims = F.pandas_udf(
        lambda s: pd.DataFrame(
            [_jpeg_sof_dims(v) for v in s], columns=["width", "height"]
        ),
        "width long, height long",
    )
    # One select materializes the struct so the UDF is planned exactly
    # once (referencing the call twice would duplicate the Arrow stage).
    # Only the SOF-scan window crosses into Python: _jpeg_sof_dims never
    # reads past _JPEG_SCAN_CAP (+9 bytes of trailing segment header),
    # so shipping full multi-MB payloads through Arrow would be pure
    # transfer waste at the 100 TB binaryFile scan (review r10).
    scan_window = F.expr(f"substring({content_col}, 1, {_JPEG_SCAN_CAP + 16})")
    staged = media.select("*", jpeg_dims(scan_window).alias("_jpeg"))
    jw, jh = F.col("_jpeg.width"), F.col("_jpeg.height")

    fmt = (
        F.when(png & long_enough, F.lit("png"))
        .when(gif & (F.length(c) >= 10), F.lit("gif"))
        .when(bmp_info | bmp_core, F.lit("bmp"))
        .when(jpeg & jw.isNotNull(), F.lit("jpeg"))
    )
    def le32_signed(off: int) -> Column:
        # BITMAPINFOHEADER width/height are SIGNED int32; a negative
        # biHeight means top-down row order — the pixel dimension is the
        # magnitude (review r9: the unsigned read turned -600 into ~4.29e9)
        u = le32(off)
        return F.when(u >= 2_147_483_648, F.lit(4_294_967_296) - u).otherwise(u)

    width = (
        F.when(png & long_enough, be32(17))
        .when(gif & (F.length(c) >= 10), le16(7))
        .when(bmp_info, le32_signed(19))
        .when(bmp_core, le16(19))
        .when(jpeg, jw)
    )
    height = (
        F.when(png & long_enough, be32(21))
        .when(gif & (F.length(c) >= 10), le16(9))
        .when(bmp_info, le32_signed(23))
        .when(bmp_core, le16(21))
        .when(jpeg, jh)
    )
    return staged.select(
        *media.columns,
        fmt.alias("format"),
        width.alias("width"),
        height.alias("height"),
    )
