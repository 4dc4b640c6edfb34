"""Avro Object Container File source on the Spark 4 Python DataSource
API — closing the repo's LAST documented data-format gap (SURVEY §2.11
"Known environment gaps": the spark-avro jar is not bundled and the
container has no Python avro lib) with stdlib-only code, the exact
pattern that closed the XML gap in ``sources/xml_source.py``.

A user of the reference pipeline with a Kafka+Avro feed lands OCF files
on the object store; after ``register_avro_source(spark)`` they read
them as ``spark.read.format("avroocf").load(path)`` — schema comes from
the file's own embedded header (Avro is self-describing), or an explicit
``.schema(...)`` projects/renames nothing: it must match the embedded
record's field names, and is validated field-by-field.

Format coverage (the OCF spec is public and small):
- Header: magic ``Obj\\x01``, metadata map carrying ``avro.schema``
  (JSON) and ``avro.codec``, 16-byte sync marker.
- Codecs: ``null`` and ``deflate`` (raw DEFLATE via ``zlib`` with
  wbits=-15 — the spec's "deflate" is RFC 1951 without zlib headers).
- Types: null, boolean, int, long, float, double, string, bytes, enum
  (→ string), fixed (→ binary), record (→ struct), array, map
  (string-keyed), and unions of ``["null", T]`` (→ nullable T).
  Logical types (date, timestamp-*) decode as their UNDERLYING
  primitive by default — re-interpreting them as zoned timestamps is
  the caller's decision, not the codec's (the catalog's
  ts-normalization discipline); ``option("logicalTypes", "native")``
  opts into date → DateType and timestamp-micros/-millis →
  TimestampType (tz-aware UTC, per the Avro spec's UTC adjustment).
- Multi-branch non-null unions are refused loudly BY DEFAULT
  (PERMISSIVE nulling them would silently drop data);
  ``option("unions", "variant")`` (r10, VERDICT r9 #5) opts into
  decoding them as Spark VARIANT columns carrying the AVRO JSON
  ENCODING of the union value (spec §JSON Encoding: ``null`` for the
  null branch, ``{"<type-or-name>": value}`` otherwise — bytes/fixed
  hex-encoded, records as field-name objects), so a real-world Kafka
  schema with ``["null","string","long"]`` fields ingests with values
  extractable via ``variant_get(col, '$.long', 'long')`` etc.

Error stance mirrors the XML source: ``mode=failfast`` (default here —
binary corruption should not yield silent nulls) raises naming the file
and offset; ``mode=permissive`` recovers: a corrupt PAYLOAD skips that
block exactly; a clean frame with a wrong sync marker drops only the
unverified block and continues in place; truncation/varint damage
rescans for the next sync marker (counting resync EVENTS — exact block
counts need boundaries) and a markerless tail ends the file.

Scale: ``partitions()`` lists the path once on the driver (planning
metadata only) and returns one InputPartition per FILE — a
1000-executor cluster decodes 1000 files concurrently; each reader
holds one file's bytes plus one decompressed block (OCF drops are
block-rotated many-small-files, the same layout note as the XML
source). Listing and byte reads route through ``sources/fsio.py``
(r10, VERDICT r9 #1): plain OS paths stay on ``glob``/``open``, and
``scheme://`` URIs — the reference's own S3 layout
(src/s3_processor.py:87, one get_object per file) — resolve via
pyarrow.fs, which works in executor-side Python workers where the JVM
Hadoop FS API does not exist. Unsupported schemes still fail loudly
naming the JVM-side spark-avro alternative.

The module also ships a minimal WRITER (``write_ocf``) used by the
fixture lane and tests — encoding is the mirror of decoding and keeping
both here means the round-trip property (write → read == identity) is
testable without any third-party lib.

Reference parity: the reference ingests CSV/JSON via pandas readers
(src/s3_processor.py:1-210); Avro is extension surface for the same
ingest contract.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import struct
import zlib
from collections.abc import Iterator

from data_ingestion_lambda_spark.sources import fsio

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
    VariantType,
    VariantVal,
)

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

_MAGIC = b"Obj\x01"
_SYNC = b"\x00dils-avro-sync\x00"  # deterministic writer sync marker (16 bytes)
assert len(_SYNC) == 16


# ---------------------------------------------------------------------------
# Binary decoding (Avro spec: zigzag varints, length-prefixed bytes, LE IEEE)
# ---------------------------------------------------------------------------


class _Cursor:
    """Byte cursor over one buffer; every primitive read advances it."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.buf)

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError(f"avroocf: truncated read of {n} bytes at offset {self.pos}")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            byte = self.buf[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 63:
                raise ValueError(f"avroocf: varint overflow at offset {self.pos}")
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        return self.take(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")

    def read_float(self) -> float:
        return struct.unpack("<f", self.take(4))[0]

    def read_double(self) -> float:
        return struct.unpack("<d", self.take(8))[0]

    def read_boolean(self) -> bool:
        return self.take(1) != b"\x00"


def _skip_blocks_read(cur: _Cursor, read_item) -> list:
    """Avro array/map block sequence: count (negative → abs count then
    byte size), items, ..., 0 terminator."""
    out = []
    while True:
        count = cur.read_long()
        if count == 0:
            return out
        if count < 0:
            count = -count
            cur.read_long()  # block byte size — we decode items anyway
        for _ in range(count):
            out.append(read_item(cur))


# ---------------------------------------------------------------------------
# Schema-driven decode plan: avro JSON schema → (decode fn, spark type)
# ---------------------------------------------------------------------------


def _json_default(v):
    """json.dumps fallback for decoded values that aren't JSON-native:
    bytes/fixed hex-encode, temporal values (logicalTypes=native inside
    a union branch) ISO-format."""
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    raise TypeError(f"avroocf: cannot JSON-encode {type(v).__name__}")


def _fullname(schema: dict, enclosing_ns: str | None) -> str:
    """Spec §Names fullname resolution for a named type: a dotted name
    IS the fullname; otherwise the explicit ``namespace`` attribute
    applies, and failing that the namespace is INHERITED from the
    most-tightly-enclosing named schema (review r10: a bare-named
    record nested inside a namespaced one has the enclosing
    namespace's fullname)."""
    name = schema["name"]
    if "." in name:
        return name
    ns = schema.get("namespace", enclosing_ns)
    return f"{ns}.{name}" if ns else name


def _branch_tag(schema, enclosing_ns: str | None = None) -> str:
    """The Avro JSON-encoding tag for a union branch: the type name for
    primitives/array/map, the FULLNAME (namespace.name, spec §Names,
    incl. namespace inheritance) for named types — the JSON encoding
    tags named branches by fullname, and two same-named records in
    different namespaces must not collide into one tag (review r10)."""
    if isinstance(schema, str):
        return schema
    if schema.get("name") is None:
        return schema["type"]
    return _fullname(schema, enclosing_ns)


def _json_encoder(schema):
    """decoded-value → JSON-encodable, following the shape the decoder
    produces for ``schema`` (records decode as TUPLES, so the encoder
    restores field names; maps/arrays recurse; bytes hex-encode)."""
    if isinstance(schema, str):
        return lambda v: v
    if isinstance(schema, list):
        branches = [b for b in schema if b != "null"]
        if len(branches) != 1:
            raise ValueError(
                "avroocf: a multi-branch union NESTED inside another "
                "union branch is not supported by unions=variant"
            )
        enc = _json_encoder(branches[0])
        return lambda v: None if v is None else enc(v)
    t = schema["type"]
    if t == "record":
        field_encs = [(f["name"], _json_encoder(f["type"])) for f in schema["fields"]]

        def enc_record(v, _fe=field_encs):
            return {name: e(x) for (name, e), x in zip(_fe, v)}

        return enc_record
    if t == "array":
        item = _json_encoder(schema["items"])
        return lambda v, _e=item: [_e(x) for x in v]
    if t == "map":
        val = _json_encoder(schema["values"])
        return lambda v, _e=val: {k: _e(x) for k, x in v.items()}
    return lambda v: v  # enum (str), fixed/bytes via _json_default, primitives


def _plan(
    schema, *, logical: str = "raw", unions: str = "refuse", ns: str | None = None
) -> tuple:
    """Returns (decode(cursor) -> python value, spark DataType).

    ``logical="raw"`` (default) decodes logical types as their
    UNDERLYING primitive (date → int days, timestamp-micros → long) —
    re-interpretation is the caller's decision, matching the catalog's
    ts-normalization discipline. ``logical="native"`` maps the common
    Kafka-feed logical types to real Spark types: ``date`` → DateType,
    ``timestamp-micros``/``timestamp-millis`` (UTC-adjusted per the
    Avro spec) → TimestampType as tz-aware UTC datetimes."""
    if isinstance(schema, str):
        prim = {
            "null": (lambda c: None, StringType()),  # standalone null: typed string
            "boolean": (_Cursor.read_boolean, BooleanType()),
            "int": (_Cursor.read_long, IntegerType()),
            "long": (_Cursor.read_long, LongType()),
            "float": (_Cursor.read_float, FloatType()),
            "double": (_Cursor.read_double, DoubleType()),
            "string": (_Cursor.read_string, StringType()),
            "bytes": (_Cursor.read_bytes, BinaryType()),
        }
        if schema not in prim:
            raise ValueError(f"avroocf: unsupported named-type reference {schema!r}")
        return prim[schema]
    if isinstance(schema, list):  # union
        branches = [b for b in schema if b != "null"]
        if len(branches) == 1 and "null" in schema:
            null_idx = schema.index("null")
            dec, typ = _plan(branches[0], logical=logical, unions=unions, ns=ns)

            def read_union(cur, _null_idx=null_idx, _dec=dec):
                return None if cur.read_long() == _null_idx else _dec(cur)

            return read_union, typ
        if unions != "variant":
            raise ValueError(
                "avroocf: only ['null', T] unions are supported by "
                f"default (got {schema!r}) — silently nulling a "
                "multi-branch union would drop data; opt into "
                "option('unions', 'variant') to decode it as a Spark "
                "VARIANT column carrying the Avro JSON encoding"
            )
        # unions=variant: decode the taken branch, wrap it in the Avro
        # JSON encoding ({"<tag>": value}; null branch -> NULL), parse
        # into a Spark VARIANT value.
        decs = []
        for b in schema:
            if b == "null":
                decs.append(None)
            else:
                dec, _typ = _plan(b, logical=logical, unions=unions, ns=ns)
                decs.append((dec, _branch_tag(b, ns), _json_encoder(b)))

        def read_union_variant(cur, _decs=decs):
            i = cur.read_long()
            if not 0 <= i < len(_decs):
                raise ValueError(f"avroocf: union index {i} out of range")
            entry = _decs[i]
            if entry is None:
                return None
            dec, tag, enc = entry
            return VariantVal.parseJson(
                json.dumps({tag: enc(dec(cur))}, default=_json_default)
            )

        return read_union_variant, VariantType()
    # dict-typed schemas
    t = schema["type"]
    if t in ("null", "boolean", "int", "long", "float", "double", "string", "bytes"):
        lt = schema.get("logicalType")
        if logical == "native" and lt == "date" and t == "int":
            return (
                lambda cur: _EPOCH_DATE + _dt.timedelta(days=cur.read_long()),
                DateType(),
            )
        if logical == "native" and lt in ("timestamp-micros", "timestamp-millis"):
            scale = 1 if lt == "timestamp-micros" else 1000

            def read_ts(cur, _scale=scale):
                return _EPOCH_TS + _dt.timedelta(microseconds=cur.read_long() * _scale)

            return read_ts, TimestampType()
        return _plan(t)  # otherwise: decode as the underlying primitive
    if t == "enum":
        symbols = list(schema["symbols"])

        def read_enum(cur, _symbols=symbols):
            i = cur.read_long()
            if not 0 <= i < len(_symbols):
                raise ValueError(f"avroocf: enum index {i} out of range")
            return _symbols[i]

        return read_enum, StringType()
    if t == "fixed":
        size = int(schema["size"])
        return (lambda cur, _n=size: cur.take(_n)), BinaryType()
    if t == "array":
        item_dec, item_typ = _plan(
            schema["items"], logical=logical, unions=unions, ns=ns
        )
        return (
            lambda cur, _d=item_dec: _skip_blocks_read(cur, _d),
            ArrayType(item_typ),
        )
    if t == "map":
        val_dec, val_typ = _plan(
            schema["values"], logical=logical, unions=unions, ns=ns
        )

        def read_map(cur, _d=val_dec):
            return dict(
                _skip_blocks_read(cur, lambda c: (c.read_string(), _d(c)))
            )

        return read_map, MapType(StringType(), val_typ)
    if t == "record":
        # children inherit this record's namespace (spec §Names)
        child_ns = _fullname(schema, ns).rsplit(".", 1)[0] if "." in _fullname(schema, ns) else None
        fields = [
            (f["name"], *_plan(f["type"], logical=logical, unions=unions, ns=child_ns))
            for f in schema["fields"]
        ]

        def read_record(cur, _fields=fields):
            return tuple(dec(cur) for _, dec, _t in _fields)

        spark_fields = [StructField(n, typ, True) for n, _d, typ in fields]
        return read_record, StructType(spark_fields)
    raise ValueError(f"avroocf: unsupported avro type {t!r}")


def _read_header(fh) -> tuple[dict, str, bytes, _Cursor]:
    """Parse one OCF header → (avro schema dict, codec, sync marker,
    cursor positioned at the first data block)."""
    if fh.read(4) != _MAGIC:
        raise ValueError("avroocf: bad magic — not an Avro Object Container File")
    # The metadata map's byte length is unknown upfront, so buffer the
    # rest of the file and walk it with one cursor; read_ocf continues
    # from the same cursor into the data blocks.
    cur = _Cursor(fh.read())
    meta: dict[str, bytes] = {}
    while True:
        count = cur.read_long()
        if count == 0:
            break
        if count < 0:
            count = -count
            cur.read_long()
        for _ in range(count):
            key = cur.read_string()
            meta[key] = cur.read_bytes()
    sync = cur.take(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"avroocf: unsupported codec {codec!r} (null/deflate)")
    return schema, codec, sync, cur


def _frame_plausible(buf: bytes, pos: int, sync: bytes) -> bool:
    """True iff ``pos`` sits at a clean block boundary: exact EOF, or a
    frame (count, size, payload) whose end is immediately followed by
    the file's sync marker. Used to decide whether an in-place resume
    after a marker mismatch is trustworthy (ADVICE r9: a corrupted SIZE
    varint that still lands in-bounds produces the same mismatch with
    the cursor at a garbage offset — resuming there would cascade)."""
    if pos >= len(buf):
        return True
    probe = _Cursor(buf)
    probe.pos = pos
    try:
        count = probe.read_long()
        size = probe.read_long()
    except Exception:  # noqa: BLE001 — any decode failure = implausible
        return False
    if count < 0 or size < 0:
        return False
    end = probe.pos + size
    return end + 16 <= len(buf) and buf[end : end + 16] == sync


def read_ocf(
    path: str,
    *,
    failfast: bool = True,
    logical: str = "raw",
    unions: str = "refuse",
) -> tuple[StructType, list[tuple], int]:
    """Decode one OCF file → (spark schema, rows, skipped_block_count).

    Public so tests and non-Spark callers can round-trip without a
    session; the DataSource reader below is a thin wrapper.
    """
    schema, codec, sync, cur = _read_header(io.BytesIO(fsio.read_bytes(path)))
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("avroocf: top-level schema must be a record")
    decode, spark_type = _plan(schema, logical=logical, unions=unions)
    rows: list[tuple] = []
    skipped = 0
    while not cur.eof():
        block_start = cur.pos
        try:
            try:
                count = cur.read_long()
            except (EOFError, IndexError):
                break  # trailing bytes short of a block's count — EOF
            size = cur.read_long()
            payload = cur.take(size)
            marker = cur.take(16)
            if marker != sync:
                raise ValueError(
                    f"avroocf: sync marker mismatch in {path} at offset {cur.pos}"
                )
        except Exception as exc:  # noqa: BLE001 — FRAMING corruption
            # (the count read is inside this handler too, ADVICE r9: a
            # corrupt count varint — e.g. ValueError('varint overflow')
            # — is framing damage like any other, not a whole-file abort)
            if failfast:
                raise ValueError(
                    f"avroocf: unreadable block framing in {path} at "
                    f"offset {block_start}: {exc}"
                ) from exc
            # permissive resync (review r9): the sync marker exists so a
            # reader can recover block BOUNDARIES after corruption.
            skipped += 1
            if (
                isinstance(exc, ValueError)
                and "sync marker mismatch" in str(exc)
                and _frame_plausible(cur.buf, cur.pos, sync)
            ):
                # the block FRAMED cleanly and only its marker is wrong:
                # cur.pos sits at a VERIFIED next-block boundary (the
                # plausibility probe — ADVICE r9 — distinguishes a
                # damaged marker from a damaged size varint that merely
                # LOOKS like one), so the following blocks are
                # recoverable in place (only this unverified block drops)
                continue
            # truncation / varint damage / implausible resume: the
            # boundary itself is lost — scan the remaining bytes for the
            # next marker and resume past it; no further marker ends the
            # file. skipped counts RESYNC EVENTS here (exact block
            # counts need boundaries).
            nxt = cur.buf.find(sync, block_start + 1)
            if nxt < 0:
                break
            cur.pos = nxt + 16
            continue
        try:
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            block = _Cursor(payload)
            block_rows = [decode(block) for _ in range(count)]
        except Exception as exc:  # noqa: BLE001 — payload corruption
            if failfast:
                raise ValueError(
                    f"avroocf: undecodable block in {path} "
                    f"(count={count}, size={size}): {exc}"
                ) from exc
            skipped += 1
            continue
        rows.extend(block_rows)
    return spark_type, rows, skipped


# ---------------------------------------------------------------------------
# Minimal writer — fixture/test mirror of the decoder
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(value, schema) -> bytes:
    if isinstance(schema, str):
        if schema == "null":
            return b""
        if schema == "boolean":
            return b"\x01" if value else b"\x00"
        if schema in ("int", "long"):
            return _zigzag(int(value))
        if schema == "float":
            return struct.pack("<f", value)
        if schema == "double":
            return struct.pack("<d", value)
        if schema == "string":
            raw = value.encode("utf-8")
            return _zigzag(len(raw)) + raw
        if schema == "bytes":
            return _zigzag(len(value)) + bytes(value)
        raise ValueError(f"write_ocf: unsupported type {schema!r}")
    if isinstance(schema, list):  # union
        branches = [b for b in schema if b != "null"]
        if value is None:
            return _zigzag(schema.index("null"))
        if len(branches) == 1:
            return _zigzag(schema.index(branches[0])) + _encode(value, branches[0])
        # multi-branch (fixture writer for the unions=variant tests):
        # pick the first branch matching the python value's type
        def _matches(b) -> bool:
            if isinstance(b, dict):
                b = b["type"]
            return (
                (b == "boolean" and isinstance(value, bool))
                or (b in ("long", "int") and isinstance(value, int)
                    and not isinstance(value, bool))
                or (b in ("double", "float") and isinstance(value, float))
                or (b in ("string", "enum") and isinstance(value, str))
                or (b in ("bytes", "fixed") and isinstance(value, (bytes, bytearray)))
                or (b == "array" and isinstance(value, list))
                or (b == "map" and isinstance(value, dict))
                or (b == "record" and isinstance(value, tuple))
            )

        for b in schema:
            if b != "null" and _matches(b):
                return _zigzag(schema.index(b)) + _encode(value, b)
        raise ValueError(
            f"write_ocf: no union branch in {schema!r} matches "
            f"{type(value).__name__}"
        )
    t = schema["type"]
    if t in ("null", "boolean", "int", "long", "float", "double", "string", "bytes"):
        return _encode(value, t)
    if t == "enum":
        return _zigzag(schema["symbols"].index(value))
    if t == "fixed":
        assert len(value) == schema["size"]
        return bytes(value)
    if t == "array":
        if not value:
            return _zigzag(0)
        body = b"".join(_encode(v, schema["items"]) for v in value)
        return _zigzag(len(value)) + body + _zigzag(0)
    if t == "map":
        if not value:
            return _zigzag(0)
        body = b"".join(
            _encode(k, "string") + _encode(v, schema["values"])
            for k, v in value.items()
        )
        return _zigzag(len(value)) + body + _zigzag(0)
    if t == "record":
        return b"".join(
            _encode(value[i], f["type"]) for i, f in enumerate(schema["fields"])
        )
    raise ValueError(f"write_ocf: unsupported avro type {t!r}")


def write_ocf(
    path: str,
    schema: dict,
    rows: list[tuple],
    *,
    codec: str = "null",
    rows_per_block: int = 64,
) -> None:
    """Write rows (tuples in record-field order) as one OCF file."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"write_ocf: unsupported codec {codec!r}")
    buf = io.BytesIO()
    buf.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, sort_keys=True).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    buf.write(_zigzag(len(meta)))
    for k, v in sorted(meta.items()):
        kb = k.encode("utf-8")
        buf.write(_zigzag(len(kb)) + kb + _zigzag(len(v)) + v)
    buf.write(_zigzag(0))
    buf.write(_SYNC)
    for start in range(0, len(rows), rows_per_block):
        chunk = rows[start : start + rows_per_block]
        payload = b"".join(_encode(r, schema) for r in chunk)
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = comp.compress(payload) + comp.flush()
        buf.write(_zigzag(len(chunk)) + _zigzag(len(payload)) + payload + _SYNC)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


# ---------------------------------------------------------------------------
# Spark DataSource
# ---------------------------------------------------------------------------


class _AvroFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _unions_option(options) -> str:
    v = options.get("unions", "refuse").lower()
    if v not in ("refuse", "variant"):
        raise ValueError(
            f"avroocf: unions={v!r} (refuse = only ['null', T] unions; "
            "variant = multi-branch unions as VARIANT of the Avro JSON "
            "encoding)"
        )
    return v


def _logical_option(options) -> str:
    v = options.get("logicalTypes", "raw").lower()
    if v not in ("raw", "native"):
        raise ValueError(
            f"avroocf: logicalTypes={v!r} (raw = underlying primitives, "
            "native = date/timestamp-* as Spark date/timestamp)"
        )
    return v


def _resolve_path(options) -> str:
    path = options.get("path")
    if not path:
        raise ValueError("avroocf: the `path` option is required")
    return path


class _AvroOcfReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self._path = _resolve_path(options)
        self._failfast = options.get("mode", "failfast").lower() != "permissive"
        self._logical = _logical_option(options)
        self._unions = _unions_option(options)
        self._schema = schema

    def partitions(self):
        # fsio routes plain paths via glob and scheme'd URIs via
        # pyarrow.fs; the returned entries are fully-qualified, so
        # read() re-resolves them executor-side with no driver context.
        return [_AvroFilePartition(p) for p in fsio.list_files(self._path, "avro")]

    def read(self, partition: _AvroFilePartition) -> Iterator[tuple]:
        file_schema, rows, _skipped = read_ocf(
            partition.path,
            failfast=self._failfast,
            logical=self._logical,
            unions=self._unions,
        )
        # Field validation, names AND types (review r9 — names alone let
        # a type-mismatched explicit .schema() surface later as an opaque
        # executor-side conversion error): the planned schema must match
        # what this file's embedded record decodes to.
        want = [(f.name, f.dataType.simpleString()) for f in self._schema.fields]
        have = [(f.name, f.dataType.simpleString()) for f in file_schema.fields]
        if want != have:
            raise ValueError(
                f"avroocf: field mismatch in {partition.path}: "
                f"file decodes to {have}, plan expects {want}"
            )
        yield from rows


class AvroOcfDataSource(DataSource):
    """``spark.read.format("avroocf").load(path)`` after
    ``register_avro_source(spark)``. Schema is inferred from the FIRST
    file's embedded header (one driver-side header read — Avro is
    self-describing); an explicit ``.schema(...)`` must name the same
    fields and is validated per file."""

    @classmethod
    def name(cls) -> str:
        return "avroocf"

    def schema(self) -> StructType:
        files = fsio.list_files(_resolve_path(self.options), "avro")
        avro_schema, _codec, _sync, _cur = _read_header(
            io.BytesIO(fsio.read_bytes(files[0]))
        )
        _decode, spark_type = _plan(
            avro_schema,
            logical=_logical_option(self.options),
            unions=_unions_option(self.options),
        )
        if not isinstance(spark_type, StructType):
            raise ValueError("avroocf: top-level schema must be a record")
        return spark_type

    def reader(self, schema: StructType) -> _AvroOcfReader:
        return _AvroOcfReader(self.options, schema)


def register_avro_source(spark) -> None:
    spark.dataSource.register(AvroOcfDataSource)
