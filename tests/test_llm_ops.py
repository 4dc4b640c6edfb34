"""Unit tests for LLM-pipeline operators: multimodal plumbing, block ANN,
and the arithmetic contracts the DuckDB oracles rely on."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.operators.ann import block_cosine_topk
from data_ingestion_lambda_spark.operators.media import (
    FRAME_BYTES,
    P,
    attach_media_columns,
    byte_features,
    decode_audio,
    decode_image,
    decode_video_frames,
    sample_frames,
)
from data_ingestion_lambda_spark.plans._util import t

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    # not cached: the cache manager would substitute the InMemoryRelation
    # into every matching plan, defeating the scan-pruning assertion below
    return attach_media_columns(t(spark, SF_SMOKE, "documents"))


def test_documents_are_ascii(spark):
    """The multimodal oracles equate UTF-8 bytes with codepoints; that is
    only valid while the corpus is pure ASCII."""
    max_cp = (
        t(spark, SF_SMOKE, "documents")
        .select(F.array_max(F.transform(F.split("text", ""), F.ascii)).alias("m"))
        .agg(F.max("m"))
        .first()[0]
    )
    assert max_cp < 128


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta_fields = {f.name for f in media.schema["meta"].dataType.fields}
    assert {"kind", "width", "sample_rate", "fps", "n_frames"} <= meta_fields
    kinds = {r["kind"] for r in media.select(F.col("meta.kind").alias("kind")).distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_metadata_scan_prunes_payload(spark):
    """Metadata-only queries must not read the text/payload bytes: nested
    schema pruning reduces the parquet ReadSchema to doc_id alone
    (kind is derived from doc_id; an uncached frame, since caching
    materializes every column by design)."""
    fresh = attach_media_columns(t(spark, SF_SMOKE, "documents"))
    plan = (
        fresh.select("meta.kind")
        .groupBy("kind")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_byte_features_match_python(media):
    rows = byte_features(media).orderBy("doc_id").limit(5).collect()
    src = {r["doc_id"]: bytes(r["payload"]) for r in media.orderBy("doc_id").limit(5).collect()}
    for r in rows:
        b = src[r["doc_id"]]
        assert r["n_bytes"] == len(b)
        assert r["first_byte"] == b[0]
        assert r["last_byte"] == b[-1]
        assert r["byte_sum_mod"] == sum(b) % P
        assert r["n_distinct_bytes"] == len(set(b))


def test_frame_sample_fanout(media):
    frames = sample_frames(media)
    got = frames.groupBy("doc_id").count()
    want = media.filter(F.col("meta.kind") == "video").select(
        "doc_id", (F.length("payload") / FRAME_BYTES).cast("long").alias("n")
    ).filter(F.col("n") > 0)
    joined = want.join(got, "doc_id", "full_outer").filter(
        (F.col("n").isNull()) | (F.col("count").isNull()) | (F.col("n") != F.col("count"))
    )
    assert joined.count() == 0
    one = frames.filter(F.col("frame_no") == 1).first()
    assert one["offset"] == FRAME_BYTES


def test_decode_stubs_fail_loudly():
    for fn in (decode_image, decode_audio):
        with pytest.raises(NotImplementedError):
            fn(b"\x00")
    with pytest.raises(NotImplementedError):
        decode_video_frames(b"\x00", 2)


def test_block_ann_matches_bruteforce(spark):
    """Block-matrix Pandas-UDF top-k == exact numpy brute force."""
    emb = t(spark, SF_SMOKE, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    queries = [(int(ids[i]), list(mat[i])) for i in range(3)]

    got = block_cosine_topk(emb, queries, k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))

    sims = np.round(mat @ mat[:3].T, 6)
    for j, (qid, _) in enumerate(queries):
        col = sims[:, j].copy()
        col[ids == qid] = -np.inf
        order = np.lexsort((ids, -col))[:4]
        want = [(rank + 1, int(ids[i])) for rank, i in enumerate(order)]
        assert sorted(by_q[qid]) == want


def test_shingle_df_cap_scale_aware():
    """The n-gram dedup DF cap is a coded knob, not prose: clamped at the
    legacy 100 for every gate-SF corpus (results unchanged at small N),
    decaying as sqrt(1/N) past the 5000-doc reference so inverted-index
    candidate volume grows as sqrt(N) instead of linearly, floored at 20
    (true near-dup shingles are rarer than any plausible floor). The
    DuckDB oracle derives the identical threshold from the same COUNT(*)."""
    import duckdb

    from data_ingestion_lambda_spark.plans.llm_ops import (
        _SQL_SHINGLE_DF_CAP,
        shingle_df_cap,
    )

    # gate SFs (500 / 5000 docs) keep the legacy constant
    assert shingle_df_cap(500) == 100
    assert shingle_df_cap(5000) == 100
    # decay decade: 10x -> 32, 30x -> 20 (floored), 100x -> 20
    assert shingle_df_cap(50_000) == 32
    assert shingle_df_cap(150_000) == 20
    assert shingle_df_cap(500_000) == 20
    # monotone non-increasing in N
    caps = [shingle_df_cap(n) for n in range(1000, 200_001, 1000)]
    assert all(a >= b for a, b in zip(caps, caps[1:]))
    # the oracle's inline-SQL formula agrees exactly with the Python one
    sql = _SQL_SHINGLE_DF_CAP.replace("COUNT(*)", "n").replace("FROM documents", "")
    for n in (500, 5000, 6000, 12_345, 50_000, 124_999, 125_000, 500_000):
        got = duckdb.sql(sql.replace(" n)", f" {n})")).fetchone()[0]
        assert got == shingle_df_cap(n), n
