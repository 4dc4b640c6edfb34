"""Invariants of context-length chunking (plans/llm_ops.py::text_chunk_documents).

The oracle pins cross-engine equality; these tests pin the SEMANTICS a
training pipeline depends on: losslessness (de-overlapped chunks
reconstruct the exact token stream), the overlap contract between
consecutive full chunks, and the per-chunk length bound.
"""

from __future__ import annotations

from collections import defaultdict

from data_ingestion_lambda_spark.plans.llm_ops import (
    _CHUNK_STRIDE,
    _CHUNK_TOKENS,
    text_chunk_documents,
)

from .conftest import SF_SMOKE


def test_chunks_reconstruct_token_stream_and_respect_bounds(spark):
    docs = {
        r.doc_id: r.text.strip().split()
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    by_doc: dict[int, dict[int, object]] = defaultdict(dict)
    for r in text_chunk_documents(spark, SF_SMOKE).collect():
        by_doc[r.doc_id][r.chunk_id] = r
    assert set(by_doc) == set(docs), "every document must be chunked"
    overlap = _CHUNK_TOKENS - _CHUNK_STRIDE
    for doc_id, toks in docs.items():
        chunks = by_doc[doc_id]
        n = len(toks)
        # a chunk starts at every stride multiple strictly below n
        want_ids = list(range((n + _CHUNK_STRIDE - 1) // _CHUNK_STRIDE))
        assert sorted(chunks) == want_ids
        rebuilt: list[str] = []
        covered = 0
        for cid in want_ids:
            c = chunks[cid]
            ctoks = c.chunk_text.split(" ") if c.chunk_text else []
            assert c.start_token == cid * _CHUNK_STRIDE
            assert c.chunk_tokens == len(ctoks) <= _CHUNK_TOKENS
            # each chunk is the exact window of the source stream
            assert ctoks == toks[c.start_token : c.start_token + _CHUNK_TOKENS]
            # consecutive FULL chunks share exactly `overlap` tokens
            if cid > 0:
                prev = chunks[cid - 1].chunk_text.split(" ")
                if len(prev) == _CHUNK_TOKENS and len(ctoks) >= overlap:
                    assert prev[_CHUNK_STRIDE:] == ctoks[:overlap]
            # de-overlap by coverage position (a short chunk 0 can still be
            # followed by a fully-contained tail chunk when STRIDE < n < CHUNK)
            skip = max(0, covered - c.start_token)
            rebuilt.extend(ctoks[skip:])
            covered = max(covered, c.start_token + len(ctoks))
        # losslessness: de-overlapped concatenation is the original stream
        assert rebuilt == toks
