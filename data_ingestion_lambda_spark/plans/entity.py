"""Entity resolution: blocking + pairwise edit-distance scoring over
customer records — the data-integration operator that reconciles two
drops of "the same people" whose keys don't line up (re-registrations,
vendor feeds, OCR'd records). The reference upserts on exact keys only
(/root/reference/src/db_operations.py:77-84); ER is the extension for
when the key itself is dirty.

The synthetic customers are all distinct (no natural fuzzy duplicates),
so the lane plants its own — the planted-pair methodology the recall
curves and heavy hitters use: every 13th customer is re-registered
under a fresh id with ONE typo in the name (a deterministic character
replacement, identical expression in both engines). The resolver must
find exactly those (original, typo) pairs via blocking + scoring, and
the threshold must reject the distinct-but-similar real customers that
share a block.

Blocking is the scale story: candidate pairs come from an EQUI-JOIN on
(nation, market segment) — never an all-pairs cross — so the quadratic
term is bounded per block (the dedup-stack inverted-index argument in
its relational form). The typo is planted in the NAME, never the block
key, which is the production constraint blocking keys must satisfy
(choose keys from fields the noise process doesn't touch).

Scoring: Levenshtein over name|segment|balance-cents (the balance is
cent-quantized to an integer STRING, so the blob is engine-identical —
never a formatted double). Both engines implement the same integer DP
metric, so the score hash-matches; the planted copies sit at exactly
distance 1, and the threshold of 1 requires a distinct same-block pair
to agree on everything but a single character to false-positive — the
oracle pins whatever the fixed corpus yields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans._util import t
from data_ingestion_lambda_spark.plans.registry import register

_ER_MOD = 13  # every 13th customer gets a planted typo'd re-registration
_ER_ID_OFFSET = 10_000_000
_ER_MAX_DIST = 1  # the planted typo is exactly one edit


@register(
    "er_resolve_customers",
    oracle=f"""
    WITH base AS (
        SELECT c_custkey AS rec_id, c_name, c_mktsegment, c_nationkey,
               CAST(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS VARCHAR)
                   AS bal_cents
        FROM customer
    ),
    planted AS (
        SELECT rec_id + {_ER_ID_OFFSET} AS rec_id,
               substr(c_name, 1, length(c_name) - 2) || 'x'
                 || substr(c_name, length(c_name)) AS c_name,
               c_mktsegment, c_nationkey, bal_cents
        FROM base WHERE rec_id % {_ER_MOD} = 0
    ),
    recs AS (
        SELECT rec_id, c_nationkey, c_mktsegment,
               substr(bal_cents, 1, 2) AS bal_pfx,
               c_name || '|' || c_mktsegment || '|' || bal_cents AS blob
        FROM (SELECT * FROM base UNION ALL SELECT * FROM planted)
    )
    SELECT a.rec_id AS id_a, b.rec_id AS id_b,
           CAST(levenshtein(a.blob, b.blob) AS BIGINT) AS distance
    FROM recs a JOIN recs b
      ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
         AND a.bal_pfx = b.bal_pfx AND a.rec_id < b.rec_id
    WHERE levenshtein(a.blob, b.blob) <= {_ER_MAX_DIST}
    """,
    tags=("entity-resolution", "dedup"),
)
def er_resolve_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve fuzzy-duplicate customer records: blocking equi-join on
    (nation, market segment), Levenshtein over name|segment|balance,
    match at distance <= {_ER_MAX_DIST}. Finds the planted typo'd
    re-registrations (distance exactly 1) on this corpus; the oracle
    pins the full match set, so a false positive shows up as a diff in
    BOTH engines, not a silent inflation.

    Scale: candidates are one equi-join on the block key — (nation,
    segment, 2-digit balance prefix), never all-pairs — so the
    quadratic term is per-block. The third key is the CODED scale knob
    (the dedup_ngram_jaccard lesson: the knob must be code, not prose):
    measured on this corpus it cuts the pair set ~90x (15k customers:
    22 s -> sub-second scoring). The rule the planting enforces: every
    block key comes from fields the noise process does not touch (the
    typo lands in the NAME; nation/segment/balance are noise-free in
    this model — a deployment with noisy balances drops that key and
    pays the bigger block)."""
    base = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("rec_id"),
        "c_name",
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100.0 + 0.5)
        .cast("long")
        .cast("string")
        .alias("bal_cents"),
    )
    planted = base.filter(F.col("rec_id") % _ER_MOD == 0).select(
        (F.col("rec_id") + _ER_ID_OFFSET).alias("rec_id"),
        F.concat(
            F.expr("substr(c_name, 1, length(c_name) - 2)"),
            F.lit("x"),
            F.expr("substr(c_name, length(c_name))"),
        ).alias("c_name"),
        "c_mktsegment",
        "c_nationkey",
        "bal_cents",
    )
    recs = (
        base.unionByName(planted)
        .withColumn(
            "blob", F.concat_ws("|", "c_name", "c_mktsegment", "bal_cents")
        )
        .withColumn("bal_pfx", F.expr("substr(bal_cents, 1, 2)"))
    )
    a = recs.select(
        F.col("rec_id").alias("id_a"),
        F.col("blob").alias("blob_a"),
        "c_nationkey",
        "c_mktsegment",
        "bal_pfx",
    )
    b = recs.select(
        F.col("rec_id").alias("id_b"),
        F.col("blob").alias("blob_b"),
        F.col("c_nationkey").alias("nk_b"),
        F.col("c_mktsegment").alias("seg_b"),
        F.col("bal_pfx").alias("pfx_b"),
    )
    pairs = a.join(
        b,
        (F.col("c_nationkey") == F.col("nk_b"))
        & (F.col("c_mktsegment") == F.col("seg_b"))
        & (F.col("bal_pfx") == F.col("pfx_b"))
        & (F.col("id_a") < F.col("id_b")),
    )
    dist = F.levenshtein(F.col("blob_a"), F.col("blob_b"))
    return pairs.select(
        "id_a", "id_b", dist.cast("long").alias("distance")
    ).filter(F.col("distance") <= _ER_MAX_DIST)


# ---------------------------------------------------------------------------
# Golden-record assignment (entity ids from the match graph)
# ---------------------------------------------------------------------------


from data_ingestion_lambda_spark.plans.registry import REGISTRY as _REG  # noqa: E402

_ER_SQL = _REG["er_resolve_customers"].oracle


@register(
    "er_entity_ids",
    oracle=f"""
    WITH RECURSIVE matches AS (
        SELECT id_a, id_b FROM ({_ER_SQL}) m
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM matches
        UNION SELECT id_b AS u, id_a AS v FROM matches
    ),
    reach(id, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.id
    ),
    assign AS (SELECT id, MIN(r) AS entity_id FROM reach GROUP BY id),
    base AS (SELECT c_custkey AS rec_id FROM customer),
    planted AS (SELECT c_custkey + {_ER_ID_OFFSET} AS rec_id FROM customer
                WHERE c_custkey % {_ER_MOD} = 0),
    recs AS (SELECT rec_id FROM base UNION ALL SELECT rec_id FROM planted)
    SELECT recs.rec_id,
           COALESCE(a.entity_id, recs.rec_id) AS entity_id,
           COALESCE(a.entity_id, recs.rec_id) <> recs.rec_id AS is_merged
    FROM recs LEFT JOIN assign a ON recs.rec_id = a.id
    """,
    tags=("entity-resolution", "graph"),
)
def er_entity_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-integration ENDPOINT the match pairs exist for: one
    golden entity id per record — connected components over the
    er_resolve_customers match graph (min record id per component; an
    unmatched record is its own entity), with the merged flag a
    downstream MDM consumer filters on. Transitive closure matters: a
    typo'd re-registration matching two spellings of the same customer
    must land all three in ONE entity even when the outer pair missed
    the distance cutoff.

    Scale: the match pairs are the ER lane's blocked output (never
    all-pairs); components run on the shared large-star/small-star
    contraction (plans/graph_ops.py — state is graph-sized, rounds
    logarithmic). The oracle recomputes the closure with a recursive
    CTE over the SAME match SQL, composed at import time so the two
    can never drift."""
    from data_ingestion_lambda_spark.plans.graph_ops import connected_components

    pairs = er_resolve_customers(spark, sf_dir).select("id_a", "id_b")
    edges = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionByName(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    assign = connected_components(edges).select(
        F.col("id").alias("rec_id"), F.col("cluster_id").alias("entity_id")
    )
    base = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("rec_id"))
    planted = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % _ER_MOD == 0)
        .select((F.col("c_custkey") + _ER_ID_OFFSET).alias("rec_id"))
    )
    recs = base.unionByName(planted)
    return recs.join(assign, "rec_id", "left").select(
        "rec_id",
        F.coalesce(F.col("entity_id"), F.col("rec_id")).alias("entity_id"),
        (
            F.coalesce(F.col("entity_id"), F.col("rec_id")) != F.col("rec_id")
        ).alias("is_merged"),
    )
