"""Avro OCF source (sources/avro_source.py): write→read round-trip over
the whole supported type surface, both codecs, short tail blocks,
failfast vs permissive corruption handling, sync-marker verification,
schema inference from the embedded header, explicit-schema validation,
multi-branch-union refusal, and one InputPartition per file."""

from __future__ import annotations

import copy
import json

import pytest

from data_ingestion_lambda_spark.sources.avro_source import (
    read_ocf,
    register_avro_source,
    write_ocf,
)

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "flag", "type": "boolean"},
        {"name": "small", "type": "int"},
        {"name": "ratio", "type": "double"},
        {"name": "f32", "type": "float"},
        {"name": "label", "type": "string"},
        {"name": "blob", "type": "bytes"},
        {"name": "maybe", "type": ["null", "long"]},
        {
            "name": "color",
            "type": {"type": "enum", "name": "col", "symbols": ["red", "green"]},
        },
        {"name": "nums", "type": {"type": "array", "items": "long"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {
            "name": "point",
            "type": {
                "type": "record",
                "name": "pt",
                "fields": [
                    {"name": "x", "type": "long"},
                    {"name": "y", "type": "long"},
                ],
            },
        },
    ],
}


def _rows(n: int) -> list[tuple]:
    out = []
    for i in range(n):
        # negatives exercise zigzag's sign bit; empty array/map exercise
        # the zero-block encoding
        out.append(
            (
                i - 3,
                i % 2 == 0,
                -i,
                (i % 8) / 8.0,
                float(i % 4),
                f"s{i}",
                bytes([i % 251]),
                None if i % 3 == 0 else i * 100,
                ["red", "green"][i % 2],
                [] if i % 5 == 0 else [i, -i, 7],
                {} if i % 4 == 0 else {"a": i, "b": -i},
                (i, 2 * i),
            )
        )
    return out


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_all_types_both_codecs(tmp_path, codec):
    rows = _rows(23)
    path = str(tmp_path / "t.avro")
    write_ocf(path, SCHEMA, rows, codec=codec, rows_per_block=7)  # tail block of 2
    schema, got, skipped = read_ocf(path)
    assert skipped == 0
    assert [f.name for f in schema.fields] == [f["name"] for f in SCHEMA["fields"]]
    assert got == rows


def test_spark_read_infers_schema_and_partitions(spark, tmp_path):
    rows = _rows(11)
    write_ocf(str(tmp_path / "a.avro"), SCHEMA, rows[:6], codec="null")
    write_ocf(str(tmp_path / "b.avro"), SCHEMA, rows[6:], codec="deflate")
    register_avro_source(spark)
    df = spark.read.format("avroocf").option("path", str(tmp_path)).load()
    assert df.rdd.getNumPartitions() == 2  # one per file
    assert df.count() == 11
    got = {r.id: r for r in df.collect()}
    assert got[-3].maybe is None and got[-2].maybe == 100
    assert got[-3].point.x == 0 and got[-2].point.y == 2
    assert got[-3].nums == [] and got[-2].attrs == {"a": 1, "b": -1}
    # dyadic double survives exactly
    assert got[2].ratio == 5 / 8  # id=2 is i=5 -> (5%8)/8, dyadic-exact


def test_explicit_schema_mismatch_refused(spark, tmp_path):
    small = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "id", "type": "long"}],
    }
    write_ocf(str(tmp_path / "a.avro"), small, [(1,), (2,)])
    register_avro_source(spark)
    df = (
        spark.read.format("avroocf")
        .schema("wrong long")
        .option("path", str(tmp_path))
        .load()
    )
    with pytest.raises(Exception, match="field mismatch"):
        df.collect()


def test_corrupt_block_failfast_vs_permissive(tmp_path):
    small = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "s", "type": "string"}],
    }
    path = str(tmp_path / "c.avro")
    write_ocf(path, small, [("aa",), ("bb",)], rows_per_block=1, codec="deflate")
    raw = bytearray(open(path, "rb").read())
    # corrupt the LAST deflate payload: flip bytes just before the final
    # sync marker (16 sync + payload sits before it)
    raw[-20:-16] = b"\xff\xff\xff\xff"
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="undecodable block"):
        read_ocf(path, failfast=True)
    _schema, rows, skipped = read_ocf(path, failfast=False)
    assert rows == [("aa",)] and skipped == 1


def test_sync_marker_mismatch_raises(tmp_path):
    small = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    path = str(tmp_path / "s.avro")
    write_ocf(path, small, [(1,)], rows_per_block=1)
    raw = bytearray(open(path, "rb").read())
    raw[-1] ^= 0xFF  # trailing sync byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sync marker mismatch"):
        read_ocf(path)


def test_multi_branch_union_refused(tmp_path):
    bad = copy.deepcopy(SCHEMA)
    bad["fields"] = [{"name": "u", "type": ["null", "long", "string"]}]
    path = str(tmp_path / "u.avro")
    # hand-write the header only; _plan refuses before any block decode
    write_header_only = bytearray(b"Obj\x01")
    meta = json.dumps(bad).encode()
    from data_ingestion_lambda_spark.sources.avro_source import _SYNC, _zigzag

    write_header_only += _zigzag(1)
    for k, v in [("avro.schema", meta)]:
        kb = k.encode()
        write_header_only += _zigzag(len(kb)) + kb + _zigzag(len(v)) + v
    write_header_only += _zigzag(0) + _SYNC
    open(path, "wb").write(bytes(write_header_only))
    with pytest.raises(ValueError, match="null', T"):
        read_ocf(path)


def test_multi_branch_union_variant_opt_in(spark, tmp_path):
    """VERDICT r9 #5: option('unions','variant') decodes multi-branch
    unions as VARIANT columns carrying the Avro JSON encoding — values
    extractable via variant_get; the loud refusal stays the default."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "u2", "type": ["string", "long"]},  # no-null 2-branch
            {"name": "u3", "type": ["null", "string", "long"]},  # 3-branch
        ],
    }
    rows = [
        (1, "hello", None),
        (2, 42, "tagged"),
        (3, "x", 77),
    ]
    path = str(tmp_path / "u.avro")
    write_ocf(path, schema, rows)

    # default: refused loudly, naming the opt-in
    with pytest.raises(ValueError, match="unions=variant|unions', 'variant"):
        read_ocf(path)
    # direct read: VariantVal values in the Avro JSON encoding
    vschema, got, skipped = read_ocf(path, unions="variant")
    assert skipped == 0
    assert [f.dataType.simpleString() for f in vschema.fields] == [
        "bigint",
        "variant",
        "variant",
    ]
    assert str(got[0][1]) == '{"string":"hello"}' and got[0][2] is None
    assert str(got[1][1]) == '{"long":42}' and str(got[1][2]) == '{"string":"tagged"}'

    # end-to-end through Spark: variant_get on each branch path
    register_avro_source(spark)
    df = (
        spark.read.format("avroocf")
        .option("path", str(tmp_path))
        .option("unions", "variant")
        .load()
    )
    out = {
        r.id: (r.s2, r.l2, r.s3, r.l3)
        for r in df.selectExpr(
            "id",
            "variant_get(u2, '$.string', 'string') as s2",
            "variant_get(u2, '$.long', 'long') as l2",
            "variant_get(u3, '$.string', 'string') as s3",
            "variant_get(u3, '$.long', 'long') as l3",
        ).collect()
    }
    assert out[1] == ("hello", None, None, None)
    assert out[2] == (None, 42, "tagged", None)
    assert out[3] == ("x", None, None, 77)
    # bogus option value is refused at plan time
    with pytest.raises(Exception, match="unions"):
        (
            spark.read.format("avroocf")
            .option("path", str(tmp_path))
            .option("unions", "bogus")
            .load()
        )


def test_union_variant_named_and_bytes_branches(tmp_path):
    """Named-type branches tag by NAME, bytes branches hex-encode, and
    record branches restore field names (the decoder yields tuples)."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {
                "name": "u",
                "type": [
                    "null",
                    "bytes",
                    {
                        "type": "record",
                        "name": "pt",
                        "fields": [
                            {"name": "x", "type": "long"},
                            {"name": "y", "type": ["null", "string"]},
                        ],
                    },
                ],
            }
        ],
    }
    path = str(tmp_path / "n.avro")
    write_ocf(path, schema, [(b"\x00\xff",), ((5, "lbl"),), (None,)])
    _schema, got, _ = read_ocf(path, unions="variant")
    assert str(got[0][0]) == '{"bytes":"00ff"}'
    assert str(got[1][0]) == '{"pt":{"x":5,"y":"lbl"}}'
    assert got[2][0] is None


def test_bad_magic_and_unknown_codec(tmp_path):
    path = str(tmp_path / "m.avro")
    open(path, "wb").write(b"PAR1not-avro")
    with pytest.raises(ValueError, match="bad magic"):
        read_ocf(path)
    with pytest.raises(ValueError, match="unsupported codec"):
        write_ocf(str(tmp_path / "z.avro"), SCHEMA, [], codec="snappy")


def test_logical_types_raw_vs_native(spark, tmp_path):
    """date / timestamp-micros logical types: raw (default) yields the
    underlying ints; logicalTypes=native yields Spark DATE/TIMESTAMP
    columns with the UTC interpretation the Avro spec mandates."""
    import datetime as dt

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
            {
                "name": "maybe_ts",
                "type": [
                    "null",
                    {"type": "long", "logicalType": "timestamp-micros"},
                ],
            },
        ],
    }
    day = (dt.date(2025, 5, 9) - dt.date(1970, 1, 1)).days
    us = int(
        dt.datetime(2025, 5, 9, 12, 0, 0, tzinfo=dt.timezone.utc).timestamp() * 1e6
    )
    path = str(tmp_path / "lt.avro")
    write_ocf(path, schema, [(day, us, None), (day + 1, us + 1, us)])
    # raw: underlying primitives
    raw_schema, raw_rows, _ = read_ocf(path)
    assert raw_rows[0] == (day, us, None)
    assert [f.dataType.simpleString() for f in raw_schema.fields] == [
        "int",
        "bigint",
        "bigint",
    ]
    # native: real temporal types, end-to-end through Spark
    register_avro_source(spark)
    df = (
        spark.read.format("avroocf")
        .option("path", str(tmp_path))
        .option("logicalTypes", "native")
        .load()
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "date",
        "timestamp",
        "timestamp",
    ]
    rows = sorted(df.collect(), key=lambda r: r.d)
    assert rows[0].d == dt.date(2025, 5, 9)
    assert rows[0].ts == dt.datetime(2025, 5, 9, 12, 0, 0)  # session TZ is UTC
    assert rows[0].maybe_ts is None and rows[1].maybe_ts is not None
    with pytest.raises(Exception, match="logicalTypes"):
        (
            spark.read.format("avroocf")
            .option("path", str(tmp_path))
            .option("logicalTypes", "bogus")
            .load()
        )


def test_permissive_resyncs_past_framing_corruption(tmp_path):
    """Review r9: permissive mode must survive FRAMING damage, not just
    payload damage — a mangled sync marker mid-file resyncs to the next
    marker (skipping one block), and a truncated tail ends the read
    instead of raising."""
    small = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    path = str(tmp_path / "f.avro")
    write_ocf(path, small, [(1,), (2,), (3,)], rows_per_block=1)
    raw = bytearray(open(path, "rb").read())
    # three 1-row blocks, each ending in the 16-byte sync; occurrence 0
    # is the HEADER's copy, so mangle occurrence 1 (the first block's
    # marker) — the reader must resync at the second block's marker and
    # still deliver rows 2 and 3
    header_sync = raw.find(b"\x00dils-avro-sync\x00")
    first_block_sync = raw.find(b"\x00dils-avro-sync\x00", header_sync + 16)
    raw[first_block_sync : first_block_sync + 4] = b"\xde\xad\xbe\xef"
    open(path, "wb").write(bytes(raw))
    _schema, rows, skipped = read_ocf(path, failfast=False)
    assert rows == [(2,), (3,)] and skipped == 1
    with pytest.raises(ValueError, match="sync marker mismatch"):
        read_ocf(path, failfast=True)

    # truncation mid-block: permissive stops cleanly, failfast raises
    write_ocf(path, small, [(1,), (2,)], rows_per_block=1)
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[:-10])  # cut into the last block
    _schema, rows, skipped = read_ocf(path, failfast=False)
    assert rows == [(1,)] and skipped == 1
    with pytest.raises(ValueError, match="unreadable block framing"):
        read_ocf(path, failfast=True)


def _three_block_file(tmp_path) -> tuple[str, int]:
    """One long-field row per block, three blocks; returns (path, offset
    of the first block) for byte surgery. Block layout at offset b:
    count varint (1B), size varint (1B), payload (1B), sync (16B)."""
    small = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    path = str(tmp_path / "g.avro")
    write_ocf(path, small, [(1,), (2,), (3,)], rows_per_block=1)
    raw = open(path, "rb").read()
    from data_ingestion_lambda_spark.sources.avro_source import _SYNC

    return path, raw.find(_SYNC) + 16


def test_permissive_corrupt_size_varint_rescans(tmp_path):
    """ADVICE r9 #4: a corrupted SIZE varint that still lands in-bounds
    produces a sync-marker mismatch with the cursor at a GARBAGE offset.
    The in-place resume must be refused (frame-plausibility probe) and
    recovery must go through the sync-marker rescan — one resync event,
    blocks 2 and 3 delivered."""
    path, b1 = _three_block_file(tmp_path)
    raw = bytearray(open(path, "rb").read())
    raw[b1 + 1] = 0x14  # size 1 -> 10 (zigzag): frame overlaps the sync
    open(path, "wb").write(bytes(raw))
    _schema, rows, skipped = read_ocf(path, failfast=False)
    assert rows == [(2,), (3,)] and skipped == 1
    with pytest.raises(ValueError, match="unreadable block framing"):
        read_ocf(path, failfast=True)


def test_permissive_corrupt_count_varint_rescans(tmp_path):
    """ADVICE r9 #1: a corrupt COUNT varint (overflowing continuation
    bytes) is framing damage like any other — permissive mode rescans
    for the next sync marker instead of aborting the whole file read."""
    path, b1 = _three_block_file(tmp_path)
    raw = bytearray(open(path, "rb").read())
    b2 = b1 + 19  # second block's count byte
    raw[b2:b2] = b"\xff" * 11  # unterminated varint -> overflow
    open(path, "wb").write(bytes(raw))
    _schema, rows, skipped = read_ocf(path, failfast=False)
    # block 2's boundary is lost (resync lands past its sync marker);
    # blocks 1 and 3 survive, one resync event counted
    assert rows == [(1,), (3,)] and skipped == 1
    with pytest.raises(ValueError, match="varint overflow"):
        read_ocf(path, failfast=True)


def test_explicit_schema_type_mismatch_refused(spark, tmp_path):
    """Review r9: an explicit .schema() with matching NAMES but wrong
    TYPES must be refused at the source, not surface as an opaque
    executor-side conversion error."""
    small = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    write_ocf(str(tmp_path / "a.avro"), small, [(1,), (2,)])
    register_avro_source(spark)
    df = (
        spark.read.format("avroocf")
        .schema("x string")  # right name, wrong type
        .load(str(tmp_path))
    )
    with pytest.raises(Exception, match="field mismatch"):
        df.collect()


def test_union_named_branch_tagged_by_fullname(tmp_path):
    """Review r10: the Avro JSON encoding tags named union branches by
    FULLNAME (spec §Names) — a namespaced record must encode as
    {"com.x.R": ...}, not {"R": ...}, and a name that is already a
    fullname must not be double-prefixed."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {
                "name": "u",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "R",
                        "namespace": "com.x",
                        "fields": [{"name": "v", "type": "long"}],
                    },
                    "string",
                ],
            },
            {
                "name": "e",
                "type": [
                    "null",
                    {
                        "type": "enum",
                        "name": "com.y.E",  # fullname in name, no namespace key
                        "symbols": ["A", "B"],
                    },
                ],
            },
        ],
    }
    rows = [((5,), "A"), (None, None), ("plain", "B")]
    path = str(tmp_path / "named.avro")
    write_ocf(path, schema, rows)
    _, got, skipped = read_ocf(path, unions="variant")
    assert skipped == 0
    assert str(got[0][0]) == '{"com.x.R":{"v":5}}'
    assert got[1][0] is None and got[1][1] is None
    assert str(got[2][0]) == '{"string":"plain"}'
    # 2-branch ['null', named] stays a plain typed column, not variant
    assert got[0][1] == "A" and got[2][1] == "B"


def test_union_branch_inherits_enclosing_namespace(tmp_path):
    """Review r10: a bare-named record inside a namespaced record has
    fullname <enclosing-ns>.<name> per spec §Names — the variant tag
    must inherit, not fall back to the bare name."""
    schema = {
        "type": "record",
        "name": "outer",
        "namespace": "com.x",
        "fields": [
            {
                "name": "u",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "Inner",  # no namespace key: inherits com.x
                        "fields": [{"name": "v", "type": "long"}],
                    },
                    "string",
                ],
            }
        ],
    }
    rows = [((7,),), (None,), ("s",)]
    path = str(tmp_path / "inherit.avro")
    write_ocf(path, schema, rows)
    _, got, skipped = read_ocf(path, unions="variant")
    assert skipped == 0
    assert str(got[0][0]) == '{"com.x.Inner":{"v":7}}'
    assert got[1][0] is None
    assert str(got[2][0]) == '{"string":"s"}'
