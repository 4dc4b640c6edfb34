"""Block-matrix ANN: Arrow-batched Pandas-UDF cosine top-k.

The Catalyst higher-order-function path (plans/similarity.py) is ideal for
a handful of query vectors — everything stays in codegen. Once the query
set grows (Q in the hundreds+), per-row lambda evaluation does Q×d work
per candidate row in expression trees; the right shape is a *block matrix
product*: each Arrow batch of candidates becomes an N×d float64 matrix,
multiplied against the broadcast Q×d query matrix with one BLAS call.

Scale design (100 TB):
- candidates NEVER shuffle: `mapInPandas` runs inside the scan stage, so
  per-executor cost is (rows/executor) × Q × d FLOPs at BLAS speed.
- per-batch top-k pruning means only partitions × Q × k small triples
  (query_id, neighbor_id, cosine) reach the final window — the shuffle is
  O(k·Q·partitions) regardless of table size.
- the query matrix rides the UDF closure (driver → executor once per
  task); bounded by Q×d doubles. For Q beyond broadcast size, switch to
  an IVF pre-partition (bucket join on coarse centroid id) before this.

Determinism contract: scores are rounded to 6 dp inside the UDF and the
global top-k orders by (rounded score desc, neighbor_id asc) — a total
order, so per-batch pruning with the same order is lossless, and the
DuckDB oracle (sequential list_sum + round) agrees despite BLAS summing
in a different order (fp error ~1e-15 « rounding grain 1e-6).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RESULT_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("cosine", DoubleType()),
    ]
)


def block_cosine_topk(
    candidates: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Top-k cosine neighbors for every query vector, block-matrix style.

    ``queries`` is a driver-side list of (query_id, vector) — bounded by
    design (see module docstring). Self-matches (neighbor_id == query_id)
    are excluded.
    """
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            scores = np.round(m @ qnorm.T, round_dp)  # N×Q
            # exclude self-matches before pruning
            scores[ids[:, None] == qids[None, :]] = -np.inf
            n = scores.shape[0]
            out_q, out_n, out_c = [], [], []
            for j in range(len(qids)):
                col = scores[:, j]
                if n > k:
                    # total order (score desc, neighbor asc) → lossless
                    # per-batch prune under the same global order
                    idx = np.lexsort((ids, -col))[:k]
                else:
                    idx = np.arange(n)
                keep = col[idx] > -np.inf
                idx = idx[keep]
                out_q.append(np.full(len(idx), qids[j]))
                out_n.append(ids[idx])
                out_c.append(col[idx])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    scored = candidates.select(id_col, vec_col).mapInPandas(
        score_batches, schema=RESULT_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
