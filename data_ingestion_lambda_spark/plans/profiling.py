"""Data-quality profiling: per-column statistics in one declarative pass.

The first thing a pipeline owner runs against a new 100 TB drop is a
profile — null rates, cardinalities, value ranges — to decide whether the
data is even worth ingesting and which columns can key joins or partitions.
The reference has no analog (it checks column *presence* only,
`/root/reference/src/db_operations.py:65-72`); this is the EXT data-quality
surface a production engine ships.

Scale notes:
- TWO single-row ``agg``s over the same scan, cross-joined (a
  1-row × 1-row join — bounded by construction), NOT one combined agg.
  The split is deliberate: min/max over string columns forces
  SortAggregate (string agg buffers aren't UnsafeRow-mutable, so the
  hash path is unavailable), and in a combined agg that sort-based
  cascade runs over the COUNT(DISTINCT) Expand's n_aggs-fold row blowup
  — measured 17-25 s vs ~4 s split at sf0.1. Split, the Expand feeds
  only long-buffered distinct counters (hash-aggregate-able) and the
  string min/max sorts only the unexpanded input.
- The exact COUNT(DISTINCT) per column plans through Catalyst's Expand
  (one replicated row per distinct-aggregate) — the textbook exact plan,
  fine to a few dozen columns. At 100 TB swap ``F.count_distinct`` for
  ``F.approx_count_distinct`` (HLL, one pass, no Expand); the oracle twin
  is exact, which is exactly why the approx variant is NOT oracle-checked
  here (sketches don't hash-match across engines).
- The unpivot to one-row-per-column happens AFTER aggregation — it
  reshapes a single driver-sized row, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans._util import t
from data_ingestion_lambda_spark.plans.registry import register

_PROFILE_TABLE = "lineitem"
_PROFILE_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
)


def profile_columns(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """One-pass per-column profile: non-null / null / exact-distinct counts
    and min/max rendered as strings (native-type ordering, cast at the end —
    string-cast-then-min would mis-order numerics)."""
    basic = []
    for c in cols:
        basic += [
            F.count(c).alias(f"{c}__nn"),
            (F.count("*") - F.count(c)).alias(f"{c}__nl"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    # Distinct counts in their own agg so the Expand blowup stays on the
    # hash-aggregate path (see module docstring); 1-row × 1-row cross join.
    dist = df.agg(*[F.count_distinct(F.col(c)).alias(f"{c}__nd") for c in cols])
    one = df.agg(*basic).crossJoin(dist)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nn").alias("n_nonnull"),
                F.col(f"{c}__nl").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_value"),
                F.col(f"{c}__mx").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def _sql_profile(table: str, cols: tuple[str, ...]) -> str:
    selects = [
        f"""
        SELECT '{c}' AS column_name,
               COUNT({c}) AS n_nonnull,
               COUNT(*) - COUNT({c}) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(selects)


@register(
    "profile_table",
    oracle=_sql_profile(_PROFILE_TABLE, _PROFILE_COLS),
    tags=("quality", "profiling"),
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the lineitem fact table — null rates, exact
    cardinalities, value ranges (see module docstring for the one-pass
    plan and the 100 TB approx-distinct swap)."""
    return profile_columns(t(spark, sf_dir, _PROFILE_TABLE), _PROFILE_COLS)


_SKEW_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")
_SKEW_TOPK = 5


@register(
    "profile_key_skew",
    oracle=f"""
    WITH freq AS (
        {" UNION ALL ".join(
            f'''SELECT '{k}' AS key_col, CAST({k} AS BIGINT) AS key_value,
                       CAST(COUNT(*) AS BIGINT) AS n_rows
                FROM {_PROFILE_TABLE} GROUP BY {k}'''
            for k in _SKEW_KEYS
        )}
    ),
    stats AS (
        SELECT key_col,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(n_rows) AS BIGINT) AS max_rows,
               CAST(SUM(n_rows) AS BIGINT) AS total_rows
        FROM freq GROUP BY key_col
    ),
    ranked AS (
        SELECT key_col, key_value, n_rows,
               ROW_NUMBER() OVER (PARTITION BY key_col
                                  ORDER BY n_rows DESC, key_value) AS rk
        FROM freq
    )
    SELECT r.key_col, r.rk AS rank, r.key_value, r.n_rows,
           s.n_keys, s.max_rows,
           CAST(s.max_rows AS DOUBLE) * s.n_keys / s.total_rows
               AS skew_factor
    FROM ranked r JOIN stats s ON r.key_col = s.key_col
    WHERE r.rk <= {_SKEW_TOPK}
    """,
    tags=("quality", "profiling"),
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: per candidate key, the top
    {_SKEW_TOPK} heaviest values and a skew factor (max key frequency
    over the uniform expectation, = max_rows x n_keys / total_rows; 1.0
    means perfectly uniform, >> 1 means one reducer eats a hot key). This
    is the table a pipeline owner reads BEFORE choosing between a plain
    shuffle join, AQE skew splitting, and the salted rewrite
    (`join_salted_skew`) — the repo ships the remedies; this ships the
    measurement that picks one.

    Scale: one per-key groupBy each (map-side combined counts — the
    frequency table is keys-sized, not rows-sized), then a keys-sized
    window for the top-k and a 3-row stats join. Nothing touches payload
    columns."""
    li = t(spark, sf_dir, _PROFILE_TABLE)
    freqs = None
    for k in _SKEW_KEYS:
        f = li.groupBy(F.col(k).cast("long").alias("key_value")).agg(
            F.count("*").alias("n_rows")
        )
        f = f.select(F.lit(k).alias("key_col"), "key_value", "n_rows")
        freqs = f if freqs is None else freqs.unionByName(f)
    stats = freqs.groupBy("key_col").agg(
        F.count("*").alias("n_keys"),
        F.max("n_rows").alias("max_rows"),
        F.sum("n_rows").alias("total_rows"),
    )
    w = Window.partitionBy("key_col").orderBy(F.desc("n_rows"), F.asc("key_value"))
    ranked = freqs.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= _SKEW_TOPK
    )
    return ranked.join(F.broadcast(stats), "key_col").select(
        "key_col",
        F.col("rank").cast("long").alias("rank"),
        "key_value",
        "n_rows",
        "n_keys",
        "max_rows",
        (
            F.col("max_rows").cast("double")
            * F.col("n_keys")
            / F.col("total_rows")
        ).alias("skew_factor"),
    )


_HIST_COL = "l_extendedprice"
_HIST_BUCKETS = 16


@register(
    "profile_numeric_histogram",
    oracle=f"""
    WITH b AS (
        SELECT MIN({_HIST_COL}) AS lo, MAX({_HIST_COL}) AS hi
        FROM {_PROFILE_TABLE}
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(v) AS bucket_min,
           MAX(v) AS bucket_max
    FROM (
        SELECT least(CAST(FLOOR(({_HIST_COL} - lo) * {_HIST_BUCKETS} / (hi - lo))
                          AS BIGINT), {_HIST_BUCKETS - 1}) AS bucket,
               {_HIST_COL} AS v
        FROM {_PROFILE_TABLE}, b
    )
    GROUP BY bucket
    """,
    tags=("quality", "profiling"),
)
def profile_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of a numeric column — the distribution view a
    profile's min/max can't give (is the column uniform, clustered, or
    dominated by a spike the optimizer's stats should know about).
    Bounds come from a broadcast 1-row aggregate (the resample idiom);
    the bucket id is pure arithmetic on the row, so the histogram is one
    scan + one bucket-keyed aggregation with map-side combine. The top
    edge folds into the last bucket (least(..., buckets-1)), matching
    both engines exactly — bucket arithmetic is floor() on the same
    double expression, IEEE-identical.

    At 100 TB this shape is exactly how column statistics get built:
    bounded output (#buckets rows), no sort, one pass."""
    li = t(spark, sf_dir, _PROFILE_TABLE)
    b = li.agg(
        F.min(_HIST_COL).alias("lo"), F.max(_HIST_COL).alias("hi")
    )
    bucket = F.least(
        F.floor(
            (F.col(_HIST_COL) - F.col("lo"))
            * F.lit(_HIST_BUCKETS)
            / (F.col("hi") - F.col("lo"))
        ).cast("long"),
        F.lit(_HIST_BUCKETS - 1),
    )
    return (
        li.crossJoin(F.broadcast(b))
        .select(bucket.alias("bucket"), F.col(_HIST_COL).alias("v"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("v").alias("bucket_min"),
            F.max("v").alias("bucket_max"),
        )
    )


@register(
    "profile_table_approx",
    # Deliberately NO oracle: the approx profile uses HyperLogLog distinct
    # counts (approx_count_distinct), and sketches do not hash-match across
    # engines — the driver records the weaker rows-only check, which is the
    # honest contract for a sketch. The exact twin (profile_table, directly
    # above in the registry) carries the full value-hash evidence for the
    # shared plan skeleton.
    oracle=None,
    tags=("quality", "profiling", "approx"),
)
def profile_table_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variant of profile_table, shipped rather than only
    documented: HyperLogLog distinct counts (one pass, NO Catalyst Expand
    — at a few dozen columns the exact plan's n_aggs-fold row replication
    is the scan's dominant cost; the sketch removes it entirely) combined
    with the same null/min/max profile. Same output schema as
    profile_table, so the two are drop-in swaps; rsd 5% default."""
    li = t(spark, sf_dir, _PROFILE_TABLE)
    cols = _PROFILE_COLS
    basic = []
    for c in cols:
        basic += [
            F.count(c).alias(f"{c}__nn"),
            (F.count("*") - F.count(c)).alias(f"{c}__nl"),
            F.approx_count_distinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    one = li.agg(*basic)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nn").alias("n_nonnull"),
                F.col(f"{c}__nl").alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct_approx"),
                F.col(f"{c}__mn").alias("min_value"),
                F.col(f"{c}__mx").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


_RI_EDGES = (
    # (fact table, fk col, dim table, pk col)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
)


@register(
    "profile_referential_integrity",
    oracle=f"""
    {" UNION ALL ".join(
        f'''SELECT '{ft}.{fk} -> {dt}.{pk}' AS edge,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) FILTER (WHERE {fk} IS NULL) AS BIGINT)
                       AS n_null_fk,
                   CAST(COUNT(*) FILTER (
                        WHERE {fk} IS NOT NULL
                          AND {fk} NOT IN (SELECT {pk} FROM {dt})) AS BIGINT)
                       AS n_orphans
            FROM {ft}'''
        for ft, fk, dt, pk in _RI_EDGES
    )}
    """,
    tags=("quality", "profiling"),
)
def profile_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: per FK edge,
    row count, NULL-FK count, and ORPHAN count (non-null FK with no
    matching dimension key) — the join-safety check run on a new drop
    before any star query is trusted (an orphaned FK silently drops rows
    from every inner join downstream; this table says where and how
    many). The reference validates column *presence* only
    (/root/reference/src/db_operations.py:65-72); this is the
    row-level contract.

    Scale: each edge is one left-anti join of the fact's distinct-ish FK
    column against the dimension key — dimension sides broadcast when
    bounded (Catalyst decides), fact side streams; counts combine
    map-side. Five edges = five independent scans that AQE schedules
    concurrently; nothing touches payload columns."""
    parts = []
    for ft, fk, dt, pk in _RI_EDGES:
        fact = t(spark, sf_dir, ft).select(F.col(fk).alias("fkv"))
        dim = t(spark, sf_dir, dt).select(F.col(pk).alias("pkv"))
        orphans = (
            fact.filter(F.col("fkv").isNotNull())
            .join(dim, F.col("fkv") == F.col("pkv"), "left_anti")
            .agg(F.count("*").alias("n_orphans"))
        )
        base = fact.agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("fkv").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_fk"),
        )
        parts.append(
            base.crossJoin(orphans).select(
                F.lit(f"{ft}.{fk} -> {dt}.{pk}").alias("edge"),
                F.col("n_rows").cast("long"),
                "n_null_fk",
                F.col("n_orphans").cast("long"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_QUANT_COL = "l_extendedprice"
_QUANT_GROUP = "l_returnflag"
_QUANT_PS = (25, 50, 75, 95, 99)


@register(
    "profile_numeric_quantiles",
    oracle=f"""
    WITH c AS (
        SELECT {_QUANT_GROUP} AS grp,
               CAST(FLOOR({_QUANT_COL} * 100.0 + 0.5) AS BIGINT) AS cents
        FROM {_PROFILE_TABLE}
    ),
    hist AS (SELECT grp, cents, COUNT(*) AS cnt FROM c GROUP BY 1, 2),
    n AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n_rows FROM hist GROUP BY 1),
    cum AS (
        SELECT grp, cents, cnt,
               SUM(cnt) OVER (PARTITION BY grp ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist
    )
    SELECT cum.grp AS {_QUANT_GROUP}, n.n_rows,
           {", ".join(
               f"CAST(MIN(CASE WHEN cum.cum * 100 >= n.n_rows * {p} "
               f"THEN cum.cents END) AS BIGINT) AS p{p}_cents"
               for p in _QUANT_PS
           )}
    FROM cum JOIN n USING (grp)
    GROUP BY cum.grp, n.n_rows
    """,
    tags=("quality", "profiling"),
)
def profile_numeric_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile profile (p25/p50/p75/p95/p99 of line price per
    return flag) using the distributed integer-bucket histogram recipe
    the round-6 percentile lane established (events_interarrival_hist /
    events_anomaly_mad_hist), applied to the PROFILING suite: this is
    how column statistics with quantiles get built at 100 TB — exact at
    cent resolution, all-integer (hash-stable), and with NO task ever
    holding more than one group's bucket counts.

    Scale: one (group, cents) rollup with map-side combine; the
    cumulative window partitions by group over BUCKET rows, whose count
    is bounded by the VALUE DOMAIN in cents — independent of row count
    (a price column spanning $0-$100k has <= 10^7 buckets no matter how
    many trillion rows carry it). Type-1 lower quantiles: the smallest
    bucket whose cumulative count covers p% of the group's rows."""
    c = t(spark, sf_dir, _PROFILE_TABLE).select(
        F.col(_QUANT_GROUP).alias("grp"),
        F.floor(F.col(_QUANT_COL) * 100.0 + 0.5).cast("long").alias("cents"),
    )
    hist = c.groupBy("grp", "cents").agg(F.count("*").alias("cnt"))
    n = hist.groupBy("grp").agg(F.sum("cnt").cast("long").alias("n_rows"))
    w = (
        Window.partitionBy("grp")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    return (
        cum.join(F.broadcast(n), "grp")
        .groupBy("grp", "n_rows")
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum") * 100 >= F.col("n_rows") * p, F.col("cents")
                    )
                )
                .cast("long")
                .alias(f"p{p}_cents")
                for p in _QUANT_PS
            ]
        )
        .select(
            F.col("grp").alias(_QUANT_GROUP),
            "n_rows",
            *[f"p{p}_cents" for p in _QUANT_PS],
        )
    )


# ---------------------------------------------------------------------------
# Exact-moment Pearson correlation (engine-deterministic corr())
# ---------------------------------------------------------------------------


@register(
    "profile_correlation_exact",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS grp,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y,
               CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS z
        FROM lineitem
    ),
    m AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
               SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(z * z) AS szz,
               SUM(x * y) AS sxy, SUM(x * z) AS sxz
        FROM v GROUP BY grp
    )
    SELECT grp AS l_returnflag, n AS n_rows,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_price,
           CAST(n * sxz - sx * sz AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS corr_qty_discount
    FROM m
    """,
    tags=("profiling",),
)
def profile_correlation_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag Pearson correlation of quantity vs price-cents and
    quantity vs discount-percent — the feature-redundancy screen a
    pipeline owner runs before training on tabular columns (|r| ~ 1 means
    one column is the other in disguise; this corpus draws price
    independently of quantity, so all six group r's sit near 0 — the
    screen's "keep both columns" verdict).

    Determinism: built-in corr() accumulates doubles in partition order —
    never hash-comparable across engines. Instead every co-moment (Σx,
    Σxy, Σy², ...) is an EXACT integer aggregate over integer-quantized
    values (quantity integral; price half-up-rounded to cents; discount
    to percent) — Spark sums them as decimal(38,0) (BIGINT·BIGINT
    products overflow 8 bytes at ~1e19; Σcents² passes that near 1e7
    rows), DuckDB as HUGEINT. The closed form r = (nΣxy − ΣxΣy) /
    (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) then runs in doubles: each term is one
    decimal→double conversion (round-to-nearest in both engines), and
    sqrt/multiply/divide are single correctly-rounded IEEE ops evaluated
    in the same written order — bit-identical results.

    Scale: ONE map-side-combinable aggregation over the scan (10 integer
    moments per group), one exchange on the 3-value group key; the moment
    matrix never materializes rows."""
    li = t(spark, sf_dir, "lineitem")
    DEC38 = "decimal(38,0)"
    v = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long").alias("y"),
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long").alias("z"),
    )

    def dsum38(c) -> F.Column:
        return F.sum(c.cast(DEC38))

    m = v.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        dsum38(F.col("x")).alias("sx"),
        dsum38(F.col("y")).alias("sy"),
        dsum38(F.col("z")).alias("sz"),
        dsum38(F.col("x") * F.col("x")).alias("sxx"),
        dsum38(F.col("y") * F.col("y")).alias("syy"),
        dsum38(F.col("z") * F.col("z")).alias("szz"),
        dsum38(F.col("x") * F.col("y")).alias("sxy"),
        dsum38(F.col("x") * F.col("z")).alias("sxz"),
    )

    def r(sab: str, sa: str, sb: str, saa: str, sbb: str) -> F.Column:
        n = F.col("n").cast(DEC38)
        num = (n * F.col(sab) - F.col(sa) * F.col(sb)).cast("double")
        ta = (n * F.col(saa) - F.col(sa) * F.col(sa)).cast("double")
        tb = (n * F.col(sbb) - F.col(sb) * F.col(sb)).cast("double")
        return num / (F.sqrt(ta) * F.sqrt(tb))

    return m.select(
        F.col("grp").alias("l_returnflag"),
        F.col("n").alias("n_rows"),
        r("sxy", "sx", "sy", "sxx", "syy").alias("corr_qty_price"),
        r("sxz", "sx", "sz", "sxx", "szz").alias("corr_qty_discount"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit screen (synthetic / fabricated numeric detection)
# ---------------------------------------------------------------------------

# log10(1 + 1/d) as fixed literals: both engines compare against the SAME
# double constant, so no transcendental is ever *computed* in-plan. The
# oracle spells them with an e0 exponent suffix — a bare decimal literal
# parses as DECIMAL(18,17) in DuckDB and the decimal->double conversion
# lands one ulp off the correctly-rounded parse Python/Spark use.
_BENFORD_PCT = {
    1: 0.30102999566398120,
    2: 0.17609125905568124,
    3: 0.12493873660829993,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}

_BENFORD_COL = "l_extendedprice"


@register(
    "profile_benford_first_digit",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(FLOOR({_BENFORD_COL} * 100.0 + 0.5) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM lineitem
        WHERE {_BENFORD_COL} > 0
    ),
    counts AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits GROUP BY digit),
    total AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM counts),
    bp(digit, benford_pct) AS (VALUES
        {', '.join(f'({d}, {p!r}e0)' for d, p in _BENFORD_PCT.items())})
    SELECT c.digit, c.n_obs,
           CAST(c.n_obs AS DOUBLE) / t.n AS obs_pct,
           b.benford_pct,
           CAST(c.n_obs AS DOUBLE) / t.n / b.benford_pct AS benford_ratio
    FROM counts c CROSS JOIN total t JOIN bp b ON b.digit = c.digit
    """,
    tags=("profiling", "quality"),
)
def profile_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of the money column against
    Benford's law — the classic fabricated-data screen: organically-grown
    amounts follow log10(1+1/d); uniform or hand-synthesized generators
    (like this corpus's) sit near benford_ratio 1/(9·benford_pct) per
    digit instead, and a ratio far from 1 flags the column for review
    before it trains anything.

    Determinism: the digit is extracted through exact integer/string ops
    (half-up cents, cast to string, first char — no log10 in-plan); the
    Benford reference shares one literal table of double constants; the
    two ratios are single IEEE divisions off exact integers. The 9-row
    reference joins AFTER aggregation — it touches digit rows, not data.

    Scale: one groupBy over a 9-value key with map-side combine + a
    broadcast of one total row; nothing else."""
    li = t(spark, sf_dir, "lineitem")
    digits = (
        li.where(F.col(_BENFORD_COL) > 0)
        .select(
            F.substring(
                F.floor(F.col(_BENFORD_COL) * 100.0 + 0.5).cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
    )
    counts = digits.groupBy("digit").agg(F.count("*").alias("n_obs"))
    total = counts.agg(F.sum("n_obs").alias("n"))
    bp = counts.sparkSession.createDataFrame(
        [(d, p) for d, p in _BENFORD_PCT.items()], "digit long, benford_pct double"
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .join(F.broadcast(bp), "digit")
        .select(
            "digit",
            "n_obs",
            (F.col("n_obs").cast("double") / F.col("n")).alias("obs_pct"),
            "benford_pct",
            (F.col("n_obs").cast("double") / F.col("n") / F.col("benford_pct")).alias(
                "benford_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Functional-dependency / candidate-key discovery
# ---------------------------------------------------------------------------

# Candidate (determinant -> dependent) pairs to screen on orders. A real
# profiler enumerates pairs; the fixed list keeps the oracle literal and
# covers the three outcomes (key-backed FD holds / FD fails narrowly /
# FD fails broadly).
_FD_PAIRS = (
    ("o_orderkey", "o_custkey"),
    ("o_custkey", "o_orderstatus"),
    ("o_orderdate", "o_orderpriority"),
)


def _fd_oracle_one(lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_distinct,
           CAST(SUM(n_rhs) AS BIGINT) AS n_pairs_distinct,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_lhs,
           SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
    FROM (SELECT {lhs}, CAST(COUNT(DISTINCT {rhs}) AS BIGINT) AS n_rhs
          FROM orders GROUP BY {lhs})
    """


@register(
    "profile_functional_dependencies",
    oracle=" UNION ALL ".join(_fd_oracle_one(a, b) for a, b in _FD_PAIRS),
    tags=("profiling",),
)
def profile_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency screen over candidate column pairs: does
    A uniquely determine B? The discovery step behind key inference,
    normalization, and join-safety checks (an FD that holds means B can
    ride a dimension keyed by A instead of repeating per row; a
    violating lhs count says how broken a SUPPOSED key is). Covers a
    key-backed FD that holds and two that fail.

    Determinism: pure exact counts — per-lhs distinct-rhs cardinality,
    then three integer aggregates; no floating point at all.

    Scale: one groupBy per screened pair on the determinant key
    (map-side combine; the distinct runs inside the per-key group), then
    the violation count collapses the key rows. Pairs are screened
    independently — a production profiler fans the pair list out; each
    pair's cost is one exchange over its key cardinality."""
    o = t(spark, sf_dir, "orders")
    outs = []
    for lhs, rhs in _FD_PAIRS:
        per_key = o.groupBy(lhs).agg(F.count_distinct(F.col(rhs)).alias("n_rhs"))
        viol = F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
        outs.append(
            per_key.agg(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.count("*").alias("n_lhs_distinct"),
                F.sum("n_rhs").alias("n_pairs_distinct"),
                viol.cast("long").alias("n_violating_lhs"),
                (viol == 0).alias("fd_holds"),
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out


# ---------------------------------------------------------------------------
# Inclusion-dependency discovery (FK hypothesis testing)
# ---------------------------------------------------------------------------

_IND_PAIRS = (
    # (lhs table, lhs col, rhs table, rhs col) — directed: lhs ⊆ rhs?
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("part", "p_partkey", "lineitem", "l_partkey"),
    ("customer", "c_nationkey", "supplier", "s_nationkey"),
)


@register(
    "profile_inclusion_dependencies",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{lt}.{lc} -> {rt}.{rc}' AS candidate,
           (SELECT CAST(COUNT(DISTINCT {lc}) AS BIGINT) FROM {lt}) AS n_lhs_distinct,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT DISTINCT {lc} FROM {lt} WHERE {lc} IS NOT NULL) v
            WHERE v.{lc} IN (SELECT {rc} FROM {rt})) AS n_contained,
           CAST((SELECT CAST(COUNT(*) AS BIGINT)
                 FROM (SELECT DISTINCT {lc} FROM {lt} WHERE {lc} IS NOT NULL) v
                 WHERE v.{lc} IN (SELECT {rc} FROM {rt})) AS DOUBLE)
             / (SELECT COUNT(DISTINCT {lc}) FROM {lt}) AS containment,
           (SELECT COUNT(DISTINCT {lc}) FROM {lt}) =
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT DISTINCT {lc} FROM {lt} WHERE {lc} IS NOT NULL) v
            WHERE v.{lc} IN (SELECT {rc} FROM {rt})) AS is_inclusion
    """
        for lt, lc, rt, rc in _IND_PAIRS
    ),
    tags=("profiling", "quality"),
)
def profile_inclusion_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency discovery: for each directed column-pair
    hypothesis "every LHS value appears in RHS", the distinct-value
    containment fraction and the yes/no verdict — with
    profile_unique_key_candidates (keys), profile_functional_dependencies
    (intra-table FDs), and profile_referential_integrity (row-level
    orphans on KNOWN edges), this completes schema inference over an
    undocumented drop: keys ∘ inclusions ⇒ the FK graph a MERGE/join
    plan needs. Both directions of each edge are tested — asymmetry is
    the signal (every order line has an order, but customers without
    orders exist).

    Determinism: distinct counts are exact integers; containment is one
    integer-ratio division.

    Scale: each hypothesis reduces BOTH sides to distinct values
    map-side (partial aggregate before any exchange), then left-semi
    joins distinct-vs-distinct — key-cardinality rows, never row
    volume; dimension-sized sides broadcast (Catalyst decides). The
    pair list is fixed and small; hypotheses are independent scans AQE
    schedules concurrently."""
    parts = []
    for lt, lc, rt, rc in _IND_PAIRS:
        lhs = (
            t(spark, sf_dir, lt)
            .select(F.col(lc).alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
        )
        rhs = t(spark, sf_dir, rt).select(F.col(rc).alias("rv")).distinct()
        nl = lhs.agg(F.count("*").cast("long").alias("n_lhs_distinct"))
        nc = lhs.join(rhs, F.col("v") == F.col("rv"), "left_semi").agg(
            F.count("*").cast("long").alias("n_contained")
        )
        parts.append(
            nl.crossJoin(nc).select(
                F.lit(f"{lt}.{lc} -> {rt}.{rc}").alias("candidate"),
                "n_lhs_distinct",
                "n_contained",
                (F.col("n_contained").cast("double") / F.col("n_lhs_distinct")).alias(
                    "containment"
                ),
                (F.col("n_lhs_distinct") == F.col("n_contained")).alias("is_inclusion"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Heavy hitters: exact baseline + mergeable Misra-Gries sketch gauge
# ---------------------------------------------------------------------------

# The synthetic tables are deliberately uniform (no key exceeds any
# useful support threshold), so the lane plants its own skew — the
# planted-pair methodology the MinHash/embedding recall curves use:
# event_id % 10 < 3 collapses 30% of the stream onto two hot items
# (hot_0 at 20%, hot_1 at 10%); the rest stays a singleton tail, giving
# a domain of ~0.7N items that dwarfs the sketch budget. Deterministic
# in both engines from event_id alone.
_HH_ITEM_SQL = """
        SELECT CASE WHEN event_id % 10 < 3
                    THEN 'hot_' || CAST(event_id % 2 AS VARCHAR)
                    ELSE 'c' || CAST(event_id AS VARCHAR) END AS item
        FROM events
"""

# support threshold phi = 1/20 of the stream (20 * cnt > N), matched to
# the sketch budget below so presence of every true heavy hitter is a
# THEOREM, not a tuning outcome.
_HH_EXACT_SQL = f"""
    WITH items AS ({_HH_ITEM_SQL}),
    c AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt FROM items GROUP BY item),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM items)
    SELECT item, cnt, CAST(cnt AS DOUBLE) / (SELECT n FROM t) AS share
    FROM c WHERE 20 * cnt > (SELECT n FROM t)
"""

_HH_K = 19  # counters; epsilon = 1/(K+1) = the 5% support threshold


def _hh_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        F.when(
            F.col("event_id") % 10 < 3,
            F.concat(F.lit("hot_"), (F.col("event_id") % 2).cast("string")),
        )
        .otherwise(F.concat(F.lit("c"), F.col("event_id").cast("string")))
        .alias("item")
    )


def _hh_exact_counts(items: DataFrame) -> DataFrame:
    counts = items.groupBy("item").agg(F.count("*").cast("long").alias("cnt"))
    total = items.agg(F.count("*").cast("long").alias("n"))
    return counts.crossJoin(F.broadcast(total)).filter(
        F.lit(20) * F.col("cnt") > F.col("n")
    )


@register(
    "profile_heavy_hitters",
    oracle=_HH_EXACT_SQL,
    tags=("profiling", "events"),
)
def profile_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: items carrying > 1/20 of the (planted-skew)
    stream, with exact counts and shares. The baseline the sketch lane
    gauges against — and at 100 TB the shape to AVOID when the item
    domain is huge: the groupBy shuffles one row per DISTINCT item
    (~0.7N here), which is exactly the cost profile_heavy_hitters_mg
    replaces with a constant-size summary per partition.

    Determinism: integer threshold compare (20*cnt > N, no division);
    share is one final double division."""
    items = _hh_items(spark, sf_dir)
    return _hh_exact_counts(items).select(
        "item",
        "cnt",
        (F.col("cnt").cast("double") / F.col("n").cast("double")).alias("share"),
    )


def _mg_partials_fold(chunks):
    """Per-partition batched Misra-Gries with K counters. The counters
    live as an int64 Series indexed by item — the chunk merge (concat +
    groupby-sum) and the (K+1)th-largest reduction (np.partition) both
    stay in C, so the fold's Python cost is per-CHUNK, not per-item.
    Each reduction subtracts the (K+1)th largest value from every
    counter and drops the non-positive, removing >= (K+1) x subtracted
    mass — the step the N/(K+1) undercount bound charges against."""
    import numpy as np
    import pandas as pd

    k = _HH_K
    counters = pd.Series(dtype="int64")
    for pdf in chunks:
        vc = pdf["item"].value_counts()
        counters = (
            pd.concat([counters, vc]).groupby(level=0).sum()
            if len(counters)
            else vc.astype("int64")
        )
        if len(counters) > k:
            vals = counters.to_numpy()
            kth = np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1]
            counters = counters[counters > kth] - kth
    yield pd.DataFrame(
        {"item": counters.index.astype(str), "cnt": counters.to_numpy()}
    )


def mg_sketch(items: DataFrame) -> DataFrame:
    """The full distributed Misra-Gries pipeline over an (item) frame:
    per-partition folds, per-item counter sum, and Agarwal et al.'s
    merge step (subtract the global (K+1)th largest, keep positive).
    Shared by the registered gauge lane and the adversarial-partitioning
    tests, so there is exactly one sketch implementation to trust. The
    one global window runs over the <= K x |partitions| summary —
    bounded by design, never by data volume."""
    partials = items.mapInPandas(_mg_partials_fold, "item string, cnt long")
    summed = partials.groupBy("item").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    w = Window.orderBy(F.desc("cnt"), "item")
    ranked = summed.withColumn("rn", F.row_number().over(w))
    sub = ranked.filter(F.col("rn") == _HH_K + 1).agg(
        F.coalesce(F.max("cnt"), F.lit(0)).cast("long").alias("sub")
    )
    return (
        ranked.crossJoin(F.broadcast(sub))
        .select("item", (F.col("cnt") - F.col("sub")).alias("g"))
        .filter(F.col("g") > 0)
    )


@register(
    "profile_heavy_hitters_mg",
    oracle=f"""
    WITH hh AS ({_HH_EXACT_SQL})
    SELECT item, cnt, TRUE AS found, TRUE AS lower_bound_ok FROM hh
    """,
    tags=("profiling", "events", "sketch"),
)
def profile_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Misra-Gries heavy-hitter sketch, verified against the
    exact baseline through the recall-gauge idiom (the HLL/MinHash
    pattern): the OUTPUT is one row per TRUE heavy hitter with two
    booleans the mergeable-summaries theorem guarantees — `found` (the
    item survived in the merged sketch) and `lower_bound_ok` (its merged
    counter underestimates by at most N/(K+1)). Sketch CONTENT depends
    on partition order and can't hash-match an engine twin; these
    guarantees are partition-order-FREE, so the oracle states them as
    literals and a sketch bug breaks the hash.

    Mergeable summaries (Agarwal, Cormode, Huang, Phillips, Wei, Yi —
    PODS'12): per-partition batched Misra-Gries with K=19 counters
    (Arrow-batched mapInPandas, counters merged across a partition's
    chunks with one (K+1)th-largest subtraction per chunk), merged by
    summing counters per item and subtracting the global (K+1)th
    largest. Total undercount <= N/(K+1) = 5% of the stream, so every
    item above the 5% support threshold MUST survive with a counter
    within the bound (hot_0 at 20%, hot_1 at 10% — both clear it with
    margin).

    Scale: the whole point at 100 TB — the exact plan shuffles ~|domain|
    rows; this shuffles <= K rows PER PARTITION (a few KB each),
    whatever the domain size. The final reduce runs over <= K x
    |partitions| summary rows (the one global window is bounded by that
    summary size, never by data; same boundedness argument as the
    histogram coarse-offset windows)."""
    sketch = mg_sketch(_hh_items(spark, sf_dir))
    exact = _hh_exact_counts(_hh_items(spark, sf_dir))
    return (
        exact.join(sketch, "item", "left")
        .select(
            "item",
            "cnt",
            F.col("g").isNotNull().alias("found"),
            (
                F.coalesce(F.col("g"), F.lit(0))
                >= F.col("cnt") - F.floor(F.col("n") / 20).cast("long")
            ).alias("lower_bound_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (the no-undercount dual of Misra-Gries)
# ---------------------------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 512  # buckets per row
_CMS_A = 2654435761  # Knuth multiplicative constant (shared with sampling)
_CMS_B = 40503
_CMS_P = 1000000007

# Bucket for (item-hash ph, row j): ((ph + j*B) * A % P) % W. The additive
# j-shift keeps every intermediate under (P + dB)*A < 2.7e18 < 2^63 —
# the overflow-safe discipline from feature_negative_sampling.
_SQL_CMS_BUCKET = (
    f"((({{ph}} + {{j}} * {_CMS_B}) * {_CMS_A}) % {_CMS_P}) % {_CMS_W}"
)


def cms_counters(items: DataFrame) -> DataFrame:
    """The full Count-Min table over an (item) frame: (j, bucket, cnt)
    with d={_CMS_D} rows x w={_CMS_W} buckets. Purely additive — the CMS
    of a union is the cell-wise SUM of the parts' tables, which is what
    makes the maintained form (operators/cms_store.py) exact under any
    batch split. Deterministic: the item hash is the repo's polynomial
    string hash (no engine-specific murmur), buckets are pure integer
    arithmetic. One map-side-combinable aggregate over d rows per item
    occurrence; the table is d*w rows regardless of stream size."""
    from data_ingestion_lambda_spark.plans.llm_ops import polyhash

    ph = polyhash(F.col("item"))
    return (
        items.select(ph.alias("ph"))
        .select(
            "ph",
            F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j"),
        )
        .select(
            "j",
            (
                ((F.col("ph") + F.col("j") * _CMS_B) * _CMS_A % _CMS_P) % _CMS_W
            ).alias("bucket"),
        )
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(items: DataFrame, counters: DataFrame) -> DataFrame:
    """Point estimates for distinct query items against a counter table:
    est = min over rows j of the item's bucket counter. Never
    undercounts (the item's own occurrences are in every probed cell) —
    the exact dual of Misra-Gries, which never OVERcounts. Query cost:
    |items| x d lookup rows joined against the d*w table (broadcast).

    The counter join is LEFT with absent cells read as 0: the grid
    stores only touched cells, so a never-ingested query item (all its
    cells absent) must answer est=0 — an inner join would DROP it from
    the output, and an item with only SOME empty cells would min() over
    the nonzero subset and overestimate a count the sketch provably
    knows is zero."""
    from data_ingestion_lambda_spark.plans.llm_ops import polyhash

    probes = (
        items.select("item").distinct()
        .select("item", polyhash(F.col("item")).alias("ph"))
        .select(
            "item",
            F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("j"),
            "ph",
        )
        .select(
            "item",
            "j",
            (
                ((F.col("ph") + F.col("j") * _CMS_B) * _CMS_A % _CMS_P) % _CMS_W
            ).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


_CMS_BUCKET_OF = _SQL_CMS_BUCKET.format(ph="ph", j="j.j")
_CMS_SQL_PH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(item, ''), c -> CAST(ascii(c) AS BIGINT))), "
    f"(a, b) -> (a * 31 + b) % {_CMS_P})"
)


@register(
    "profile_heavy_hitters_cms",
    oracle=f"""
    WITH items AS ({_HH_ITEM_SQL}),
    hashed AS (SELECT item, {_CMS_SQL_PH} AS ph FROM items),
    cells AS (
        SELECT j.j AS j, {_CMS_BUCKET_OF} AS bucket
        FROM hashed, (SELECT UNNEST(generate_series(0, {_CMS_D - 1})) AS j) j
    ),
    counters AS (
        SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cells GROUP BY j, bucket
    ),
    hh AS ({_HH_EXACT_SQL}),
    probes AS (
        SELECT hh.item, hh.cnt AS true_cnt, j.j AS j,
               {_SQL_CMS_BUCKET.format(ph=_CMS_SQL_PH.replace('item', 'hh.item'), j='j.j')} AS bucket
        FROM hh, (SELECT UNNEST(generate_series(0, {_CMS_D - 1})) AS j) j
    )
    SELECT item, true_cnt AS cnt,
           CAST(MIN(counters.cnt) AS BIGINT) AS est,
           CAST(MIN(counters.cnt) - true_cnt AS BIGINT) AS overcount,
           MIN(counters.cnt) >= true_cnt AS lower_bound_ok
    FROM probes JOIN counters USING (j, bucket)
    GROUP BY item, true_cnt
    """,
    tags=("profiling", "events", "sketch"),
)
def profile_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch estimates for the true heavy hitters — the
    NO-UNDERCOUNT dual of profile_heavy_hitters_mg (MG never
    overcounts, CMS never undercounts; production monitors run both and
    bracket the truth). Unlike the MG and HLL lanes, nothing here is
    engine-divergent: the sketch is d x w integer cells under the
    repo's polynomial string hash, so the DuckDB twin reproduces the
    ENTIRE table bit-for-bit and this lane value-hash-matches — a
    sketch lane with a full oracle, not a rows-only allowlist entry.

    Output: one row per true heavy hitter (from the exact baseline)
    with its exact count, CMS estimate, measured overcount (collision
    mass in the item's least-loaded cell), and the theorem boolean
    est >= cnt. Budget note: d={_CMS_D}, w={_CMS_W} gives expected
    collision mass ~N/w per cell; the planted 0.7N-singleton tail makes
    the overcount column genuinely nonzero, so the gauge is not
    vacuous.

    Scale: counters aggregate map-side to d*w rows regardless of
    stream size; the probe side is |hh| x d rows joined against the
    broadcast counter table. The counter table is also ADDITIVE across
    batches — operators/cms_store.py maintains it incrementally."""
    items = _hh_items(spark, sf_dir)
    counters = cms_counters(items)
    hh = _hh_exact_counts(items).select("item", "cnt")
    est = cms_estimate(hh, counters)
    return hh.join(est, "item").select(
        "item",
        "cnt",
        "est",
        (F.col("est") - F.col("cnt")).cast("long").alias("overcount"),
        (F.col("est") >= F.col("cnt")).alias("lower_bound_ok"),
    )


# ---------------------------------------------------------------------------
# Completeness drift (daily null-rate monitoring)
# ---------------------------------------------------------------------------


@register(
    "profile_null_drift_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT) AS n_null_value,
               CAST(count(*) FILTER (WHERE props IS NULL) AS BIGINT) AS n_null_props
        FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT day, n_rows, n_null_value, n_null_props,
           CAST(n_null_value AS DOUBLE) / n_rows AS value_null_rate,
           CAST(n_null_value AS DOUBLE) / n_rows
             - LAG(CAST(n_null_value AS DOUBLE) / n_rows)
                 OVER (ORDER BY day) AS value_null_rate_delta
    FROM daily
    """,
    tags=("profiling", "events", "quality"),
)
def profile_null_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness DRIFT: per-day null counts and null rate for the
    nullable event columns, with the day-over-day rate delta — the
    monitoring view that catches a producer silently dropping a field
    (profile_table reports completeness as one static number; an
    upstream regression shows up as a STEP in this series long before
    it moves the corpus-wide rate). The distribution-drift monitor's
    sibling for presence instead of values.

    Determinism: integer counts; the rate is one IEEE division and the
    delta one subtraction of two such rates computed identically on
    both sides (same division first, then subtract — written order
    matters and matches the oracle).

    Scale: volume collapses at the per-day rollup (map-side
    combinable); the lag window runs over |days| rows — calendar-
    bounded, the drift family's profile."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count(F.when(F.col("value").isNull(), 1))
            .cast("long")
            .alias("n_null_value"),
            F.count(F.when(F.col("props").isNull(), 1))
            .cast("long")
            .alias("n_null_props"),
        )
    )
    rate = F.col("n_null_value").cast("double") / F.col("n_rows")
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "n_rows",
        "n_null_value",
        "n_null_props",
        rate.alias("value_null_rate"),
        (rate - F.lag(rate).over(w)).alias("value_null_rate_delta"),
    )


@register(
    "profile_contract_violations",
    oracle="""
    SELECT 'orders.o_orderkey is unique' AS constr,
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
    FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'customer.c_custkey is not null',
           CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_custkey IS NULL
    UNION ALL
    SELECT 'orders.o_custkey references customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE o.o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem.l_orderkey references orders',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE l.l_orderkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem.l_quantity in (0, 100]',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_quantity IS NULL OR l_quantity <= 0 OR l_quantity > 100
    UNION ALL
    SELECT 'lineitem.l_discount in [0, 1]',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_discount IS NULL OR l_discount < 0 OR l_discount > 1
    UNION ALL
    SELECT 'orders.o_orderdate is not null',
           CAST(COUNT(*) AS BIGINT) FROM orders WHERE o_orderdate IS NULL
    UNION ALL
    SELECT 'events.event_type in catalog',
           CAST(COUNT(*) AS BIGINT)
    FROM events
    WHERE event_type IS NULL
       OR event_type NOT IN ('view', 'click', 'signup', 'purchase', 'error')
    """,
    tags=("profiling", "contract"),
)
def profile_contract_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract suite — the dbt-tests / Great Expectations gate as
    ONE query: every declared constraint (uniqueness, not-null,
    referential integrity, value ranges, categorical domains) evaluated
    to a violation COUNT, unioned into a (constraint, n_violations)
    report a CI gate asserts is all-zeros. The complement of the
    discovery-direction profilers (profile_table finds what the data
    looks like; this enforces what it MUST look like) and the suite
    form of profile_referential_integrity's single FK check.

    Scale: each branch is one aggregate over one table — uniqueness is
    a keyed count (map-side combinable), FK checks are anti-join
    aggregates (AQE broadcasts the smaller key side), range/domain
    checks collapse in the scan stage. Branches over different tables
    parallelize as independent stages; nothing is row-output (the
    report is |constraints| rows), so the gate costs one pass over the
    audited columns regardless of corpus size. A violations DRILL-DOWN
    would re-run a single branch without the aggregate — deliberately
    not materialized here to keep the gate cheap."""
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    lineitem = t(spark, sf_dir, "lineitem")
    events = t(spark, sf_dir, "events")

    def row(name: str, n: DataFrame) -> DataFrame:
        return n.select(
            F.lit(name).alias("constr"), F.col("n").cast("long").alias("n_violations")
        )

    dup_orders = (
        orders.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("n"))
    )
    null_cust = customer.filter(F.col("c_custkey").isNull()).agg(
        F.count("*").alias("n")
    )
    orphan_orders = (
        orders.filter(F.col("o_custkey").isNotNull())
        .join(customer, orders.o_custkey == customer.c_custkey, "left_anti")
        .agg(F.count("*").alias("n"))
    )
    orphan_lines = (
        lineitem.filter(F.col("l_orderkey").isNotNull())
        .join(orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("n"))
    )
    qty_range = lineitem.filter(
        F.col("l_quantity").isNull()
        | (F.col("l_quantity") <= 0)
        | (F.col("l_quantity") > 100)
    ).agg(F.count("*").alias("n"))
    disc_range = lineitem.filter(
        F.col("l_discount").isNull()
        | (F.col("l_discount") < 0)
        | (F.col("l_discount") > 1)
    ).agg(F.count("*").alias("n"))
    null_odate = orders.filter(F.col("o_orderdate").isNull()).agg(
        F.count("*").alias("n")
    )
    bad_types = events.filter(
        F.col("event_type").isNull()
        | ~F.col("event_type").isin("view", "click", "signup", "purchase", "error")
    ).agg(F.count("*").alias("n"))

    return (
        row("orders.o_orderkey is unique", dup_orders)
        .unionAll(row("customer.c_custkey is not null", null_cust))
        .unionAll(row("orders.o_custkey references customer", orphan_orders))
        .unionAll(row("lineitem.l_orderkey references orders", orphan_lines))
        .unionAll(row("lineitem.l_quantity in (0, 100]", qty_range))
        .unionAll(row("lineitem.l_discount in [0, 1]", disc_range))
        .unionAll(row("orders.o_orderdate is not null", null_odate))
        .unionAll(row("events.event_type in catalog", bad_types))
    )


@register(
    "eval_binary_auc",
    oracle="""
    WITH scored AS (
        SELECT n_chars AS score,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM documents
    ),
    by_score AS (
        SELECT score,
               CAST(SUM(label) AS BIGINT) AS n_pos,
               CAST(SUM(1 - label) AS BIGINT) AS n_neg
        FROM scored GROUP BY score
    ),
    walked AS (
        SELECT n_pos, n_neg,
               CAST(COALESCE(SUM(n_neg) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_neg_below
        FROM by_score
    ),
    tot AS (
        SELECT CAST(SUM(n_pos) AS BIGINT) AS p,
               CAST(SUM(n_neg) AS BIGINT) AS n,
               CAST(SUM(n_pos * (2 * cum_neg_below + n_neg)) AS BIGINT)
                   AS auc_num_x2
        FROM walked
    )
    SELECT p AS n_pos, n AS n_neg, auc_num_x2,
           (2 * p * n) AS auc_den_x2,
           CASE WHEN p > 0 AND n > 0
                THEN CAST(auc_num_x2 AS DOUBLE) / (2.0 * p * n)
           END AS auc
    FROM tot
    """,
    tags=("profiling", "eval"),
)
def eval_binary_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed ROC-AUC WITHOUT a global sort — the evaluation
    metric every scored-corpus pipeline reports (is the quality/dedup/
    importance score actually separating the classes?), computed by the
    rank-sum identity aggregated over DISTINCT SCORE VALUES:

        AUC = [ sum over score s of n_pos(s) * (neg_below(s) + n_neg(s)/2) ]
              / (n_pos * n_neg)

    i.e. P(score_pos > score_neg) + P(tie)/2, with ties handled exactly
    (the n_neg(s)/2 mid-rank term — scaled x2 so everything stays
    INTEGER until the one final IEEE division; the exact numerator and
    denominator are also emitted, so a consumer can compose AUCs or
    verify the division). Demo scoring: n_chars as the score, lang='en'
    as the label — the metric machinery is what's under test, not the
    toy scorer.

    Scale: rows collapse to one (score, n_pos, n_neg) row per DISTINCT
    score in a map-side-combinable aggregate; the cumulative walk runs
    over those score-domain-bounded rows (the repo's histogram-quantile
    discipline — a continuous score would be bucketed first, same as
    profile_numeric_quantiles), and the final fold is one scalar row.
    Never sorts, shuffles or ranks the raw corpus."""
    d = t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    by_score = d.groupBy("score").agg(
        F.sum("label").cast("long").alias("n_pos"),
        F.sum(1 - F.col("label")).cast("long").alias("n_neg"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    walked = by_score.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(w), F.lit(0)).cast("long").alias(
            "cum_neg_below"
        ),
    )
    return (
        walked.agg(
            F.sum("n_pos").cast("long").alias("p"),
            F.sum("n_neg").cast("long").alias("n"),
            F.sum(
                F.col("n_pos") * (2 * F.col("cum_neg_below") + F.col("n_neg"))
            )
            .cast("long")
            .alias("auc_num_x2"),
        )
        .select(
            F.col("p").alias("n_pos"),
            F.col("n").alias("n_neg"),
            "auc_num_x2",
            (2 * F.col("p") * F.col("n")).alias("auc_den_x2"),
            F.when(
                (F.col("p") > 0) & (F.col("n") > 0),
                F.col("auc_num_x2").cast("double")
                / (F.lit(2.0) * F.col("p") * F.col("n")),
            ).alias("auc"),
        )
    )


@register(
    "eval_precision_recall_curve",
    oracle="""
    WITH scored AS (
        SELECT n_chars AS score,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM documents
    ),
    by_score AS (
        SELECT score,
               CAST(SUM(label) AS BIGINT) AS n_pos,
               CAST(SUM(1 - label) AS BIGINT) AS n_neg
        FROM scored GROUP BY score
    ),
    tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS p FROM by_score),
    walked AS (
        SELECT score AS threshold,
               CAST(SUM(n_pos) OVER (ORDER BY score DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS tp,
               CAST(SUM(n_neg) OVER (ORDER BY score DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS fp
        FROM by_score
    )
    SELECT threshold, tp, fp, (p - tp) AS fn,
           (tp * 1000000000) // (tp + fp) AS precision_ppb,
           CASE WHEN p > 0 THEN (tp * 1000000000) // p END AS recall_ppb,
           CASE WHEN 2 * tp + fp + (p - tp) > 0
                THEN (2 * tp * 1000000000) // (2 * tp + fp + (p - tp))
           END AS f1_ppb
    FROM walked CROSS JOIN tot
    """,
    tags=("profiling", "eval"),
)
def eval_precision_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full precision/recall/F1 curve — one row per DISTINCT score
    threshold (predict positive when score >= threshold), the table a
    filter-tuning pass reads to pick its operating point. Counts come
    from ONE cumulative walk over the distinct-score aggregate (ordered
    high-to-low: tp/fp at threshold t are the positives/negatives at or
    above t); precision, recall and F1 quantize to integer ppb with
    single integer divisions (F1's 2PR/(P+R) reduces to the integer
    ratio 2tp/(2tp+fp+fn) — no rational-of-rationals). tp >= 1 on every
    row (the row's own score contributes), so no division guard is
    needed on precision; p > 0 whenever any positive exists.

    Scale: the same distinct-score discipline as eval_binary_auc — raw
    rows collapse map-side to score-domain rows, the walk and output
    are score-domain-bounded, nothing global touches the corpus. The
    total-positives scalar is computed IN-PLAN as a cross-joined 1-row
    broadcast (the oracle's own ``tot`` CTE shape) rather than a
    driver collect over a persisted aggregate — no action before
    return, no InMemoryRelation pinned past it (ADVICE r9), and
    Spark's exchange reuse shares the one ``by_score`` shuffle between
    the walk and the total."""
    d = t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    by_score = d.groupBy("score").agg(
        F.sum("label").cast("long").alias("n_pos"),
        F.sum(1 - F.col("label")).cast("long").alias("n_neg"),
    )
    tot = by_score.agg(F.sum("n_pos").cast("long").alias("p"))
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walked = by_score.select(
        F.col("score").alias("threshold"),
        F.sum("n_pos").over(w).cast("long").alias("tp"),
        F.sum("n_neg").over(w).cast("long").alias("fp"),
    )
    return walked.crossJoin(F.broadcast(tot)).select(
        "threshold",
        "tp",
        "fp",
        (F.col("p") - F.col("tp")).alias("fn"),
        F.expr("(tp * 1000000000) div (tp + fp)").alias("precision_ppb"),
        F.expr("IF(p > 0, (tp * 1000000000) div p, NULL)").alias("recall_ppb"),
        F.expr(
            "IF(2 * tp + fp + (p - tp) > 0,"
            " (2 * tp * 1000000000) div (2 * tp + fp + (p - tp)), NULL)"
        ).alias("f1_ppb"),
    )


_CAL_BUCKETS = 10  # reliability-diagram deciles over the score range


@register(
    "eval_calibration_bins",
    oracle=f"""
    WITH scored AS (
        SELECT n_chars AS score,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM documents
    ),
    rng AS (
        SELECT MIN(score) AS lo, MAX(score) AS hi FROM scored
    ),
    binned AS (
        SELECT LEAST(CAST(((score - lo) * {_CAL_BUCKETS}) // (hi - lo + 1)
                     AS BIGINT), {_CAL_BUCKETS - 1}) AS bin,
               label, score
        FROM scored CROSS JOIN rng
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST((SUM(label) * 1000000000) // COUNT(*) AS BIGINT)
               AS observed_rate_ppb,
           CAST(SUM(score) AS BIGINT) AS score_sum,
           CAST(SUM(score) AS DOUBLE) / COUNT(*) AS mean_score
    FROM binned GROUP BY bin
    """,
    tags=("profiling", "eval"),
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram — the third leg of the eval family (AUC
    measures ranking, the PR curve measures the operating point, this
    measures CALIBRATION): equal-width score bins with observed
    positive rate vs mean score per bin; a calibrated scorer's bins lie
    on the diagonal. Bin assignment is pure integer arithmetic over the
    [min, max] range collected as TWO scalars (hi−lo+1 in the divisor
    keeps the max in the last bin without a float epsilon); the
    observed rate quantizes to ppb by one integer division; mean score
    is one IEEE division of exact integer sums.

    Scale: one scalar-range pass, then one map-side-combinable
    {_CAL_BUCKETS}-row aggregate — scan-bounded, output constant."""
    d = t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    lo, hi = (int(x) for x in d.agg(F.min("score"), F.max("score")).collect()[0])
    return (
        d.select(
            F.least(
                F.expr(
                    f"((score - {lo}) * {_CAL_BUCKETS}) div ({hi} - {lo} + 1)"
                ),
                F.lit(_CAL_BUCKETS - 1).cast("long"),
            ).alias("bin"),
            "label",
            "score",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("label").cast("long").alias("n_pos"),
            F.expr("(sum(label) * 1000000000) div count(*)").alias(
                "observed_rate_ppb"
            ),
            F.sum("score").cast("long").alias("score_sum"),
            (F.sum("score").cast("double") / F.count("*")).alias("mean_score"),
        )
    )


@register(
    "profile_freshness_daily",
    oracle="""
    WITH days AS (
        SELECT CAST(ts AS DATE) AS day,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        FROM events WHERE ts IS NOT NULL
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(ts_us) AS BIGINT) AS last_event_us,
           CAST((epoch_us(CAST(day + INTERVAL 1 DAY AS TIMESTAMP)) - 1)
                - MAX(ts_us) AS BIGINT) AS tail_gap_us,
           CAST(MIN(ts_us) - epoch_us(CAST(day AS TIMESTAMP)) AS BIGINT)
               AS head_gap_us,
           ((epoch_us(CAST(day + INTERVAL 1 DAY AS TIMESTAMP)) - 1)
                - MAX(ts_us)) >= 3600000000 AS tail_gap_over_1h
    FROM days GROUP BY day
    """,
    tags=("profiling", "monitoring"),
)
def profile_freshness_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness / delivery-lag monitor — the operational check a
    scheduled ingest runs before declaring a day complete: per day, the
    last event's distance from day end (a large tail gap on a CLOSED
    day means the producer stopped early or a late file is still
    missing — the reference's missing-dates backfill exists for exactly
    this) and the first event's distance from day start (a large head
    gap on the CURRENT day means delivery is behind). Pure integer
    epoch-µs arithmetic; the boolean flags a tail gap over an hour.

    Scale: one map-side-combinable day rollup — calendar-bounded
    output, scan-bounded cost, no window at all."""
    day = F.to_date("ts")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    day_start = F.unix_micros(day.cast("timestamp"))
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(day.alias("day"), us.alias("ts_us"), day_start.alias("day_us"))
    )
    day_end = F.col("day_us") + F.lit(86_400_000_000 - 1)
    return (
        e.groupBy("day", "day_us")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max("ts_us").cast("long").alias("last_event_us"),
            F.min("ts_us").cast("long").alias("first_event_us"),
        )
        .select(
            "day",
            "n_events",
            "last_event_us",
            (day_end - F.col("last_event_us")).cast("long").alias("tail_gap_us"),
            (F.col("first_event_us") - F.col("day_us"))
            .cast("long")
            .alias("head_gap_us"),
            ((day_end - F.col("last_event_us")) >= 3_600_000_000).alias(
                "tail_gap_over_1h"
            ),
        )
    )


@register(
    "profile_json_keys",
    oracle="""
    WITH nn AS (SELECT props FROM events WHERE props IS NOT NULL),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM nn),
    ex AS (SELECT props, UNNEST(json_keys(props)) AS k FROM nn)
    SELECT k AS json_key,
           CAST(COUNT(*) AS BIGINT) AS n_present,
           CAST(COUNT(DISTINCT json_extract_string(props, '$.' || k))
                AS BIGINT) AS n_distinct_values,
           CAST((COUNT(*) * 1000000000) // n_rows AS BIGINT)
               AS presence_ppb
    FROM ex CROSS JOIN tot
    GROUP BY k, n_rows
    """,
    tags=("profiling", "semistructured"),
)
def profile_json_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema DISCOVERY over the ``props`` JSON column —
    the first question against an untyped payload column: which keys
    exist, in what share of rows, with how many distinct values (the
    input to promoting a key to a real column, the reverse of
    scalar_variant's fixed-path extraction). Keys explode via
    json_object_keys and values extract through a DYNAMIC path
    (concat('$.', k)) — no schema declared anywhere, which is the
    point. Presence share quantizes to ppb by one integer division.

    Scale: one map-side-combinable (key)-keyed aggregate over the
    exploded keys; output is key-vocabulary-bounded. The distinct-value
    count shuffles (key, value-string) pairs — swap for
    approx_count_distinct at 100 TB if the value domain explodes, the
    profile_table discipline."""
    nn = t(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    n_rows = nn.count()
    ex = nn.select(
        "props", F.explode(F.json_object_keys("props")).alias("k")
    ).select(
        "k",
        F.expr("get_json_object(props, concat('$.', k))").alias("v"),
    )
    return ex.groupBy("k").agg(
        F.count("*").cast("long").alias("n_present"),
        F.countDistinct("v").cast("long").alias("n_distinct_values"),
        F.expr(f"(count(*) * 1000000000) div {n_rows}").alias("presence_ppb"),
    ).select(
        F.col("k").alias("json_key"),
        "n_present",
        "n_distinct_values",
        "presence_ppb",
    )


@register(
    "eval_regression_metrics",
    oracle="""
    WITH o AS (
        SELECT o_orderpriority AS grp,
               CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    gm AS (
        SELECT grp,
               CAST(SUM(cents) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
                   AS pred_cents
        FROM o GROUP BY grp
    ),
    tot AS (
        SELECT CAST(SUM(cents) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
                   AS mean_cents
        FROM o
    ),
    e AS (
        SELECT o.cents - gm.pred_cents AS err,
               o.cents - tot.mean_cents AS dev
        FROM o JOIN gm USING (grp) CROSS JOIN tot
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ABS(err)) AS BIGINT) AS sae_cents,
               SUM(CAST(err AS HUGEINT) * err) AS ssres,
               SUM(CAST(dev AS HUGEINT) * dev) AS sstot
        FROM e
    )
    SELECT n, sae_cents,
           CAST(sae_cents AS DOUBLE) / n AS mae_cents,
           CAST(ssres AS DOUBLE) / n AS mse_cents2,
           SQRT(CAST(ssres AS DOUBLE) / n) AS rmse_cents,
           CASE WHEN sstot > 0
                THEN 1.0 - CAST(ssres AS DOUBLE) / CAST(sstot AS DOUBLE)
           END AS r2
    FROM agg
    """,
    tags=("profiling", "eval"),
)
def eval_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-error metrics (MAE / MSE / RMSE / R²) — completing the
    eval family (r10): classification has AUC/PR/calibration, a scored
    REGRESSOR reports these. Demo model: the per-o_orderpriority GROUP
    MEAN of order value (the simplest predictor — R² is then exactly
    ANOVA's between-groups explained variance); the metric machinery is
    what's under test, the predictor is a stand-in for any upstream
    model's prediction column.

    Determinism discipline: values are exact integer cents, group and
    global means are floored integer divisions, |err| sums to BIGINT,
    and the squared sums use decimal(38,0)/HUGEINT (the drift monitor's
    wide-integer idiom — err² × 1e12 rows passes 2^63). Every exported
    double is produced by the IDENTICAL IEEE sequence in both engines:
    integer → double casts (round-to-nearest of the same integer), one
    division, and sqrt (correctly rounded per IEEE-754). No float
    accumulation anywhere.

    Scale: one groupBy over the priority dim (≤5 rows, broadcast back),
    the global mean as a cross-joined 1-row broadcast (no driver
    collect), one map-side-combinable final aggregate; output is ONE
    row."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    gm = o.groupBy("grp").agg(
        F.expr("CAST(SUM(cents) AS BIGINT) div COUNT(*)").alias("pred_cents")
    )
    tot = o.agg(
        F.expr("CAST(SUM(cents) AS BIGINT) div COUNT(*)").alias("mean_cents")
    )
    e = (
        o.join(F.broadcast(gm), "grp")
        .crossJoin(F.broadcast(tot))
        .select(
            (F.col("cents") - F.col("pred_cents")).alias("err"),
            (F.col("cents") - F.col("mean_cents")).alias("dev"),
        )
    )
    agg = e.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.abs(F.col("err"))).cast("long").alias("sae_cents"),
        F.sum(F.expr("CAST(err AS DECIMAL(19,0)) * err")).alias("ssres"),
        F.sum(F.expr("CAST(dev AS DECIMAL(19,0)) * dev")).alias("sstot"),
    )
    return agg.select(
        "n",
        "sae_cents",
        (F.col("sae_cents").cast("double") / F.col("n")).alias("mae_cents"),
        (F.col("ssres").cast("double") / F.col("n")).alias("mse_cents2"),
        F.sqrt(F.col("ssres").cast("double") / F.col("n")).alias("rmse_cents"),
        F.when(
            F.col("sstot") > 0,
            F.lit(1.0) - F.col("ssres").cast("double") / F.col("sstot").cast("double"),
        ).alias("r2"),
    )


@register(
    "eval_rank_correlation",
    oracle="""
    WITH s AS (
        SELECT n_chars AS a,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS b
        FROM documents
    ),
    ra AS (
        SELECT a,
               2 * CAST(COALESCE(SUM(cnt) OVER (ORDER BY a
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) + cnt + 1 AS r2x
        FROM (SELECT a, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY a) t
    ),
    rb AS (
        SELECT b,
               2 * CAST(COALESCE(SUM(cnt) OVER (ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) + cnt + 1 AS r2y
        FROM (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY b) t
    ),
    j AS (SELECT r2x, r2y FROM s JOIN ra USING (a) JOIN rb USING (b)),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r2x) AS BIGINT) AS sx,
               CAST(SUM(r2y) AS BIGINT) AS sy,
               SUM(CAST(r2x AS HUGEINT) * r2y) AS sxy,
               SUM(CAST(r2x AS HUGEINT) * r2x) AS sxx,
               SUM(CAST(r2y AS HUGEINT) * r2y) AS syy
        FROM j
    )
    SELECT n, sx AS rank_sum_a_x2, sy AS rank_sum_b_x2,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           END AS spearman_rho
    FROM agg
    """,
    tags=("profiling", "eval"),
)
def eval_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between two document scorers (demo:
    n_chars vs whitespace token count) — the scorer-agreement check a
    curation pipeline runs before swapping one quality signal for a
    cheaper one. Tie handling is EXACT: average ranks over distinct
    values, kept integer by the ×2 scaling (avg rank of a tie group =
    cum_below + (cnt+1)/2, so 2·rank = 2·cum_below + cnt + 1), and
    Spearman is computed as Pearson over the scaled ranks (the 6Σd²
    shortcut is biased under ties; scaling both variables by 2 leaves
    the correlation unchanged). Rank-sum invariant Σ(2·rank) = n(n+1)
    is emitted for both scorers as an in-row audit.

    Determinism: the five co-moment sums are exact integers in
    decimal(38,0)/HUGEINT (rank ≤ 2n, products ≤ 4n² — wide-integer
    territory at 1e12 rows); the final rho is the identical IEEE
    sequence in both engines (integer→double casts, multiplies,
    subtracts, two correctly-rounded sqrts, one division).

    Scale: ranks come from cumulative counts over the DISTINCT-VALUE
    aggregates (score-domain-bounded, the eval_binary_auc discipline —
    gate-allowlisted with that bound); docs join the two rank tables by
    value (broadcast at any realistic score domain) and everything else
    is one map-side-combinable aggregate to ONE row."""
    s = t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("a"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("b"),
    )

    def ranks(col: str, out: str) -> DataFrame:
        cnts = s.groupBy(col).agg(F.count("*").cast("long").alias("cnt"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return cnts.select(
            col,
            (
                2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
                + F.col("cnt")
                + 1
            ).cast("long").alias(out),
        )

    j = s.join(F.broadcast(ranks("a", "r2x")), "a").join(
        F.broadcast(ranks("b", "r2y")), "b"
    )
    agg = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r2x").cast("long").alias("sx"),
        F.sum("r2y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(r2x AS DECIMAL(19,0)) * r2y")).alias("sxy"),
        F.sum(F.expr("CAST(r2x AS DECIMAL(19,0)) * r2x")).alias("sxx"),
        F.sum(F.expr("CAST(r2y AS DECIMAL(19,0)) * r2y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    varx = nd * F.col("sxx").cast("double") - sxd * sxd
    vary = nd * F.col("syy").cast("double") - syd * syd
    return agg.select(
        "n",
        F.col("sx").alias("rank_sum_a_x2"),
        F.col("sy").alias("rank_sum_b_x2"),
        F.when(
            (varx > 0) & (vary > 0),
            (nd * F.col("sxy").cast("double") - sxd * syd)
            / (F.sqrt(varx) * F.sqrt(vary)),
        ).alias("spearman_rho"),
    )


from data_ingestion_lambda_spark.plans.registry import REGISTRY as _REG  # noqa: E402


@register(
    "eval_cohens_kappa",
    oracle="",  # composed below from text_language_id's registered SQL
    tags=("profiling", "eval"),
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the corpus's lang labels and the
    ``text_language_id`` classifier — chance-corrected agreement, the
    honest upgrade of raw accuracy when classes are imbalanced (the
    confusion-matrix lane ``text_lang_confusion`` shows WHERE they
    disagree; kappa says whether the agreement beats chance at all).

    Exact arithmetic: with confusion counts n_ij, kappa =
    (n·Σdiag − Σ_k row_k·col_k) / (n² − Σ_k row_k·col_k) — numerator
    and denominator are exact wide integers (decimal(38,0)/HUGEINT: n²
    passes 2^63 at 1e12 docs), observed agreement quantizes to ppb by
    one integer division, and kappa is one IEEE division of the two
    integer-derived doubles — identical in both engines.

    Scale: predictions come from the classifier's own expression
    (oracle composed from its REGISTERED SQL, no drift); ONE classifier
    scan reduces to the ≤|langs|² confusion cells, which are collected
    and finished in exact driver arithmetic (the Shapley/Markov/BT
    constant-grid pattern — the earlier three-branch DataFrame plan
    re-ran the classifier scan per branch, measured 3 FileScans with
    zero ReusedExchange; review r10)."""
    from data_ingestion_lambda_spark.plans.llm_ops import text_language_id

    scored = text_language_id(spark, sf_dir).select("lang", "pred_lang")
    cells = [
        (r.lang, r.pred_lang, r.n_docs)
        for r in scored.groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .collect()  # <=|langs|^2 grid
    ]
    n = sum(c for _, _, c in cells)
    row_n: dict[str, int] = {}
    col_n: dict[str, int] = {}
    for a, p, c in cells:
        row_n[a] = row_n.get(a, 0) + c
        col_n[p] = col_n.get(p, 0) + c
    # SQL semantics exactly (review r10): an empty slice aggregates to
    # one all-NULL row, and NULL labels never satisfy `lang =
    # pred_lang` nor the pe marginal join — Python's None == None and
    # dict lookup by None would both silently COUNT them
    if not cells:
        return spark.createDataFrame(
            [(None, None, None, None)],
            "n_docs long, n_agree long, po_ppb long, kappa double",
        )
    n_agree = sum(c for a, p, c in cells if a is not None and a == p)
    # SUM-over-empty-join semantics (review r11): when no actual label
    # ever appears as a prediction, the oracle's pe marginal join is
    # empty and its SUM is NULL, so kappa is NULL — mirror that instead
    # of computing pe=0 (which would yield kappa 0.0)
    overlap = [
        lang
        for lang in row_n
        if lang is not None and lang in col_n and col_n[lang] is not None
    ]
    if not overlap:
        kappa = None
    else:
        pe = sum(row_n[lang] * col_n[lang] for lang in overlap)
        # the identical IEEE sequence as the oracle: integer->double
        # casts, one multiply-subtract each side, one division
        denom = float(n) * float(n) - float(pe)
        kappa = (
            (float(n) * float(n_agree) - float(pe)) / denom
            if denom != 0
            else None
        )
    return spark.createDataFrame(
        [(n, n_agree, n_agree * 10**9 // n, kappa)],
        "n_docs long, n_agree long, po_ppb long, kappa double",
    )


def _kappa_oracle() -> str:
    lid = _REG["text_language_id"].oracle
    return f"""
    WITH scored AS (SELECT lang, pred_lang FROM ({lid}) t),
    cells AS (SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM scored GROUP BY lang, pred_lang),
    rw AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS row_n
           FROM cells GROUP BY lang),
    cl AS (SELECT pred_lang, CAST(SUM(n_docs) AS BIGINT) AS col_n
           FROM cells GROUP BY pred_lang),
    pe AS (SELECT SUM(CAST(row_n AS HUGEINT) * col_n) AS pe_num
           FROM rw JOIN cl ON rw.lang = cl.pred_lang),
    agg AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN lang = pred_lang THEN n_docs
                                 ELSE 0 END) AS BIGINT) AS n_agree
            FROM cells)
    SELECT n AS n_docs, n_agree,
           (n_agree * 1000000000) // n AS po_ppb,
           CASE WHEN CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     - CAST(pe_num AS DOUBLE) <> 0
                THEN (CAST(n AS DOUBLE) * CAST(n_agree AS DOUBLE)
                      - CAST(pe_num AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                        - CAST(pe_num AS DOUBLE))
           END AS kappa
    FROM agg CROSS JOIN pe
    """


from dataclasses import replace as _replace  # noqa: E402

_REG["eval_cohens_kappa"] = _replace(
    _REG["eval_cohens_kappa"], oracle=_kappa_oracle()
)


@register(
    "profile_ks_statistic",
    oracle="""
    WITH a AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS ca
               FROM documents WHERE lang = 'en' GROUP BY v),
    b AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cb
          FROM documents WHERE lang <> 'en' GROUP BY v),
    m AS (SELECT COALESCE(a.v, b.v) AS v,
                 COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
          FROM a FULL OUTER JOIN b ON a.v = b.v),
    na AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a FROM m),
    nb AS (SELECT CAST(SUM(cb) AS BIGINT) AS n_b FROM m),
    walked AS (
        SELECT CAST(SUM(ca) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cuma,
               CAST(SUM(cb) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cumb
        FROM m
    )
    SELECT n_a, n_b,
           CAST(MAX(ABS(CAST(cuma AS HUGEINT) * n_b
                        - CAST(cumb AS HUGEINT) * n_a)) AS DOUBLE)
           / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS ks_d
    FROM walked CROSS JOIN na CROSS JOIN nb
    GROUP BY n_a, n_b
    """,
    tags=("profiling", "eval"),
)
def profile_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the length
    distributions of the lang='en' slice and the rest — the
    distribution-shift gate a curation pipeline runs between a training
    slice and a holdout (or yesterday's corpus and today's): D =
    max_v |F_a(v) − F_b(v)|, the strongest simple test that two samples
    came from the same distribution.

    Exact arithmetic: per-value counts full-outer-merge on the value,
    cumulative counts walk the DISTINCT-VALUE rows, and the supremum is
    computed on the CROSS-SCALED integers |cum_a·n_b − cum_b·n_a|
    (exact in decimal(38,0)/HUGEINT — the products pass 2^63 at 1e12
    rows per side), so the max is decided on integers; D is ONE IEEE
    division of the exact max by n_a·n_b. Sample totals are cross-joined
    1-row broadcasts — no driver collect.

    Scale: everything after the two map-side-combinable per-value
    aggregates is value-domain-bounded (the eval_binary_auc discipline
    — a continuous score would bucket first); gate-allowlisted with
    that bound."""
    d = t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("v"), (F.col("lang") == "en").alias("is_a")
    )
    m = d.groupBy("v").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(1)).cast("long").alias("cb"),
    )
    tot = m.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    walked = m.select(
        F.sum("ca").over(w).cast("long").alias("cuma"),
        F.sum("cb").over(w).cast("long").alias("cumb"),
    )
    return (
        walked.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(
            (
                F.max(
                    F.abs(
                        F.expr("CAST(cuma AS DECIMAL(19,0)) * n_b")
                        - F.expr("CAST(cumb AS DECIMAL(19,0)) * n_a")
                    )
                ).cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("ks_d")
        )
        .select("n_a", "n_b", "ks_d")
    )


@register(
    "profile_chi_square",
    oracle="""
    WITH e AS (
        SELECT event_type AS a,
               ((CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) % 7)
                + 7) % 7 AS b
        FROM events
    ),
    obs AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o FROM e GROUP BY a, b),
    rows_ AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY a),
    cols_ AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY b),
    cells AS (
        SELECT r.a, cl.b, r.r, cl.c, CAST(COALESCE(obs.o, 0) AS BIGINT) AS o
        FROM rows_ r CROSS JOIN cols_ cl
        LEFT JOIN obs ON obs.a = r.a AND obs.b = cl.b
    ),
    tot AS (
        SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS nr,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS nc
        FROM obs
    ),
    nd AS (
        SELECT (CAST(c.o AS HUGEINT) * t.n - CAST(c.r AS HUGEINT) * c.c)
               * (CAST(c.o AS HUGEINT) * t.n - CAST(c.r AS HUGEINT) * c.c)
                   AS num,
               CAST(t.n AS HUGEINT) * c.r * c.c AS den
        FROM cells c CROSS JOIN tot t
    ),
    contrib AS (
        SELECT num // den * 1000000000 + num % den * 1000000000 // den
                   AS ppb
        FROM nd
    )
    SELECT t.n,
           CAST((t.nr - 1) * (t.nc - 1) AS BIGINT) AS dof,
           CAST(SUM(ppb) AS BIGINT) AS chi2_ppb,
           SQRT(CAST(SUM(ppb) AS DOUBLE)
                / CAST(1000000000 * t.n
                       * CASE WHEN t.nr < t.nc THEN t.nr - 1 ELSE t.nc - 1 END
                       AS DOUBLE)) AS cramers_v
    FROM contrib CROSS JOIN tot t
    GROUP BY t.n, t.nr, t.nc
    """,
    tags=("profiling", "stats"),
)
def profile_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence + Cramér's V between two
    categorical columns (event_type × day-of-week) — the categorical
    drift/association monitor beside the numeric KS statistic
    (profile_ks_statistic): "did the traffic mix change across
    weekdays?" is the first question a pipeline owner asks when a
    distribution gate trips. The day-of-week is derived portably as
    days-since-epoch mod 7 (engine DAYOFWEEK conventions differ); the
    oracle wraps its `%` as ((d % 7) + 7) % 7 because DuckDB's `%`
    follows the dividend's sign while Spark's pmod is always
    non-negative — without the wrap, any event dated before the
    2024-01-01 anchor would bucket differently per engine.

    Determinism discipline: chi² = Σ (O·N − R·C)² / (N·R·C) over the
    FULL r×c grid — the contingency table is completed with O = 0 cells
    (rows_ × cols_ left-joined with the observed counts; review r10: a
    category that vanishes from part of the domain contributes E =
    R·C/N per missing cell, exactly the signal an independence test
    exists to catch). Each cell's contribution is floor-quantized to
    integer ppb via the split division num div den · 1e9 + (num mod
    den) · 1e9 div den — algebraically floor(num·1e9/den) but every
    intermediate stays inside decimal(38,0)/HUGEINT up to N ≈ 3·10⁹
    per profiled slice (the naive num·1e9 overflows at N ≈ 2·10⁷);
    integer sums are order-independent, so the statistic hash-matches
    across engines. Spark's `div` on decimal operands returns LONG —
    safe here because both quotients are ≤ N·1e9 < 2⁶³. Cramér's V is
    then ONE double division + sqrt of exact integers (the
    eval_regression_metrics IEEE discipline).

    Scale: one map-side-combinable groupBy(a, b) over the scan; the
    grid completion, marginals and wide arithmetic run on the ≤
    |types|×7 cell table; output is ONE row."""
    e = t(spark, sf_dir, "events").select(
        F.col("event_type").alias("a"),
        F.pmod(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")),
            F.lit(7),
        )
        .cast("long")
        .alias("b"),
    )
    obs = e.groupBy("a", "b").agg(F.count("*").cast("long").alias("o"))
    rows_ = obs.groupBy("a").agg(F.sum("o").cast("long").alias("r"))
    cols_ = obs.groupBy("b").agg(F.sum("o").cast("long").alias("c"))
    tot = obs.agg(
        F.sum("o").cast("long").alias("n"),
        F.count_distinct("a").cast("long").alias("nr"),
        F.count_distinct("b").cast("long").alias("nc"),
    )
    grid = (
        rows_.crossJoin(cols_)
        .join(F.broadcast(obs), ["a", "b"], "left")
        .select(
            "r", "c", F.coalesce("o", F.lit(0)).cast("long").alias("o")
        )
    )
    contrib = (
        grid.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "(CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)"
                " * (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)"
            ).alias("num"),
            F.expr("CAST(n AS DECIMAL(38,0)) * r * c").alias("den"),
            "n",
            "nr",
            "nc",
        )
        .select(
            F.expr(
                "num div den * 1000000000 + num % den * 1000000000 div den"
            ).alias("ppb"),
            "n",
            "nr",
            "nc",
        )
    )
    return contrib.groupBy("n", "nr", "nc").agg(
        F.sum("ppb").cast("long").alias("chi2_ppb")
    ).select(
        "n",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        "chi2_ppb",
        F.sqrt(
            F.col("chi2_ppb").cast("double")
            / (
                F.lit(1000000000).cast("decimal(38,0)")
                * F.col("n")
                * F.when(F.col("nr") < F.col("nc"), F.col("nr") - 1).otherwise(
                    F.col("nc") - 1
                )
            ).cast("double")
        ).alias("cramers_v"),
    )


_BT_K = 8  # MM iterations (Hunter 2004); convergence is geometric


def _bt_iter_ctes() -> str:
    """Unrolled K-round Bradley-Terry MM iteration (three CTEs per
    round) — the DuckDB twin of the builder's integer iteration,
    generated from the same K so the two cannot drift. All arithmetic
    is integer floor-division at 1e18 scale (HUGEINT in DuckDB, exact
    ints in the builder's driver loop)."""
    steps = []
    for r in range(1, _BT_K + 1):
        steps.append(f"""
    d{r} AS (
        SELECT m.a AS item,
               SUM(CAST(m.n AS HUGEINT) * 1000000000000000000
                   // (pa.p + pb.p)) AS dd
        FROM mat m
        JOIN p{r - 1} pa ON pa.item = m.a
        JOIN p{r - 1} pb ON pb.item = m.b
        WHERE m.n > 0 AND pa.p + pb.p > 0
        GROUP BY m.a
    ),
    r{r} AS MATERIALIZED (
        SELECT w.item,
               CASE WHEN COALESCE(d.dd, 0) > 0 AND w.w > 0
                    THEN CAST(w.w AS HUGEINT) * 1000000000000000000 // d.dd
                    ELSE CAST(0 AS HUGEINT) END AS raw
        FROM wtot w LEFT JOIN d{r} d ON d.item = w.item
    ),
    p{r} AS MATERIALIZED (
        SELECT item,
               CAST(CASE WHEN (SELECT SUM(raw) FROM r{r}) > 0
                         THEN raw * 1000000000
                              // (SELECT SUM(raw) FROM r{r})
                         ELSE 0 END AS BIGINT) AS p
        FROM r{r}
    )""")
    return ",".join(steps)


@register(
    "eval_bradley_terry",
    oracle=f"""
    WITH e AS MATERIALIZED (
        SELECT user_id, CAST(ts AS DATE) AS d, event_type,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    ud AS MATERIALIZED (
        SELECT user_id, d, event_type, CAST(SUM(cents) AS BIGINT) AS c
        FROM e GROUP BY user_id, d, event_type
    ),
    wins AS MATERIALIZED (
        SELECT a.event_type AS w, b.event_type AS l,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ud a
        JOIN ud b ON a.user_id = b.user_id AND a.d = b.d
                 AND a.event_type <> b.event_type AND a.c > b.c
        GROUP BY a.event_type, b.event_type
    ),
    items AS MATERIALIZED (SELECT DISTINCT event_type AS item FROM e),
    mat AS MATERIALIZED (
        SELECT i.item AS a, j.item AS b,
               CAST(COALESCE(wab.cnt, 0) + COALESCE(wba.cnt, 0) AS BIGINT)
                   AS n
        FROM items i JOIN items j ON i.item <> j.item
        LEFT JOIN wins wab ON wab.w = i.item AND wab.l = j.item
        LEFT JOIN wins wba ON wba.w = j.item AND wba.l = i.item
    ),
    wtot AS MATERIALIZED (
        SELECT i.item, CAST(COALESCE(SUM(wins.cnt), 0) AS BIGINT) AS w
        FROM items i LEFT JOIN wins ON wins.w = i.item
        GROUP BY i.item
    ),
    nit AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM items),
    p0 AS MATERIALIZED (
        SELECT item, CAST(1000000000 // k AS BIGINT) AS p
        FROM items CROSS JOIN nit
    ),
    {_bt_iter_ctes()},
    ncomp AS (
        SELECT a AS item, CAST(SUM(n) AS BIGINT) AS comparisons
        FROM mat GROUP BY a
    )
    SELECT w.item, w.w AS wins, nc.comparisons,
           p.p AS strength_ppb,
           CAST(ROW_NUMBER() OVER (ORDER BY p.p DESC, w.item ASC) AS BIGINT)
               AS rank
    FROM wtot w
    JOIN p{_BT_K} p ON p.item = w.item
    JOIN ncomp nc ON nc.item = w.item
    """,
    tags=("profiling", "eval"),
)
def eval_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference-strength fit via Hunter's MM algorithm
    (Hunter, Annals of Statistics 2004 — the standard pairwise-
    preference model behind RLHF reward-data analysis, Elo-style
    leaderboards and LMSYS-style arena ratings). Demo comparisons: per
    (user, day), event type A "beats" B when A's summed value is
    strictly larger — a stand-in for any (winner, loser) preference
    pair such as A/B human judgments over model responses; the fit
    machinery is what's under test.

    Algorithm: p_i ← W_i / Σ_j n_ij/(p_i + p_j), normalized each round
    (K = _BT_K rounds, geometric convergence). Determinism discipline:
    the iteration runs on the ≤|items|² win matrix in EXACT INTEGER
    arithmetic at 1e18 scale with floor divisions and a 1e9-ppb
    normalize — the builder iterates Python bigints on the collected
    grid (the Shapley/Markov driver-constant pattern), the oracle runs
    the IDENTICAL unrolled arithmetic as _BT_K generated CTE rounds
    (``_bt_iter_ctes``), so the strengths hash-match bit-for-bit.

    Scale: the heavy work is one groupBy(user, day, type) over the
    events scan plus a per-user-day self-join bounded by |types|² rows
    per user-day; everything after aggregates to ≤|items|² integers —
    collected and iterated driver-side in microseconds (the .collect()
    is a constant-size grid, never data)."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        "event_type",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    ud = e.groupBy("user_id", "d", "event_type").agg(
        F.sum("cents").cast("long").alias("c")
    )
    a, b = ud.alias("a"), ud.alias("b")
    wins = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.d") == F.col("b.d"))
            & (F.col("a.event_type") != F.col("b.event_type"))
            & (F.col("a.c") > F.col("b.c")),
        )
        .groupBy(
            F.col("a.event_type").alias("w"), F.col("b.event_type").alias("l")
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    cnt = {(r.w, r.l): r.cnt for r in wins.collect()}  # <=|items|^2 grid
    # items = ALL distinct event types, not just those forming win
    # pairs — the oracle's items CTE includes comparison-less types
    # (strength 0 rows), and k = |items| enters p0's floor division,
    # so a mismatched item set would perturb EVERY strength (review
    # r10; latent at this SF where every type forms pairs)
    all_items = [r.item for r in e.select(F.col("event_type").alias("item")).distinct().collect()]
    return spark.createDataFrame(
        bt_fit(cnt, items=all_items),
        "item string, wins long, comparisons long, strength_ppb long, rank long",
    )


def bt_fit(
    cnt: dict[tuple[str, str], int], items: list[str] | None = None
) -> list[tuple]:
    """The driver-side MM iteration on the collected (winner, loser) →
    count grid — factored out so the integer arithmetic is unit-testable
    without a corpus (zero-win items, missing pairs, tie ranks). Exact
    Python bigints; mirrors the oracle's generated CTE rounds
    term-for-term (same floor divisions, same order-independent sums).
    ``items`` is the FULL item universe (comparison-less items get
    strength 0 and still count toward k); defaults to the items seen in
    ``cnt``."""
    items = sorted(items) if items is not None else sorted(
        {i for pair in cnt for i in pair}
    )
    if not items:
        return []
    wtot = {i: sum(c for (w, _), c in cnt.items() if w == i) for i in items}
    n = {
        (i, j): cnt.get((i, j), 0) + cnt.get((j, i), 0)
        for i in items
        for j in items
        if i != j
    }
    k = len(items)
    p = {i: 10**9 // k for i in items}
    for _ in range(_BT_K):
        dd: dict[str, int] = {}
        for (i, j), nv in n.items():
            if nv > 0 and p[i] + p[j] > 0:
                dd[i] = dd.get(i, 0) + nv * 10**18 // (p[i] + p[j])
        raw = {
            i: (wtot[i] * 10**18 // dd[i]) if dd.get(i, 0) > 0 and wtot[i] > 0 else 0
            for i in items
        }
        s = sum(raw.values())
        if s == 0:  # no comparisons anywhere -> all strengths 0
            p = {i: 0 for i in items}
            break
        p = {i: raw[i] * 10**9 // s for i in items}
    comparisons = {i: sum(nv for (a_, _), nv in n.items() if a_ == i) for i in items}
    ranked = sorted(items, key=lambda i: (-p[i], i))
    return [
        (i, wtot[i], comparisons[i], p[i], ranked.index(i) + 1) for i in items
    ]


def _centroid_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantized nearest-centroid classifier over embeddings as a
    (vec_id, actual, pred) frame — the Spark twin of
    ``_CENTROID_PRED_SQL``, shared by eval_confusion_multiclass and
    eval_mcnemar. Centroids: floored integer means per dimension from a
    narrow posexplode rollup, re-assembled per label and BROADCAST;
    classification: one codegen zip_with/aggregate scan; argmin
    tie-breaks (distance, label)."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding,"
            " e -> CAST(FLOOR(e * 1000000.0D + 0.5D) AS BIGINT))"
        ).alias("qv"),
    )
    ex = emb.select(
        "vec_id", "label", F.posexplode("qv").alias("dim", "v")
    )
    cent = (
        ex.groupBy(F.col("label").alias("cand"), "dim")
        .agg(F.expr("CAST(SUM(v) div COUNT(*) AS BIGINT)").alias("c"))
        .groupBy("cand")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, c))), s -> s.c)"
            ).alias("cvec")
        )
    )
    dist = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "cand",
        F.expr(
            "aggregate(zip_with(qv, cvec, (a, b) -> (a - b) * (a - b)),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("d2"),
    )
    return dist.groupBy("vec_id", F.col("label").alias("actual")).agg(
        F.min(F.struct("d2", "cand")).getField("cand").alias("pred")
    )


# The quantized nearest-centroid classifier over embeddings, as a
# standalone (vec_id, actual, pred) SELECT — shared by
# eval_confusion_multiclass and eval_mcnemar so the predictor cannot
# drift between the metric lanes that grade it.
_CENTROID_PRED_SQL = """
    WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   e -> CAST(FLOOR(e * 1000000.0 + 0.5) AS BIGINT)) AS qv
        FROM embeddings
    ),
    ex AS (
        SELECT vec_id, label, CAST(t.i AS BIGINT) AS dim, qv[t.i] AS v
        FROM q CROSS JOIN
             (SELECT UNNEST(generate_series(1, 64)) AS i) t
    ),
    cent AS (
        SELECT label AS cand, dim,
               CAST(SUM(v) // COUNT(*) AS BIGINT) AS c
        FROM ex GROUP BY label, dim
    ),
    dist AS (
        SELECT e.vec_id, e.label, c.cand,
               CAST(SUM((e.v - c.c) * (e.v - c.c)) AS BIGINT) AS d2
        FROM ex e JOIN cent c ON c.dim = e.dim
        GROUP BY e.vec_id, e.label, c.cand
    ),
    ranked AS (
        SELECT vec_id, label, cand,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2 ASC, cand ASC) AS rn
        FROM dist
    )
    SELECT vec_id, label AS actual, cand AS pred FROM ranked WHERE rn = 1
"""


@register(
    "eval_confusion_multiclass",
    oracle=f"""
    WITH conf AS ({_CENTROID_PRED_SQL}),
    classes AS (SELECT DISTINCT label AS cls FROM embeddings),
    per AS (
        SELECT c.cls,
               CAST(COALESCE(nt.n_true, 0) AS BIGINT) AS n_true,
               CAST(COALESCE(np.n_pred, 0) AS BIGINT) AS n_pred,
               CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp
        FROM classes c
        LEFT JOIN (SELECT actual AS cls, COUNT(*) AS n_true
                   FROM conf GROUP BY actual) nt ON nt.cls = c.cls
        LEFT JOIN (SELECT pred AS cls, COUNT(*) AS n_pred
                   FROM conf GROUP BY pred) np ON np.cls = c.cls
        LEFT JOIN (SELECT actual AS cls, COUNT(*) AS tp
                   FROM conf WHERE actual = pred GROUP BY actual) tp
               ON tp.cls = c.cls
    ),
    m AS (
        SELECT cls, n_true, n_pred, tp,
               CASE WHEN n_pred > 0
                    THEN tp * 1000000000 // n_pred ELSE 0 END AS precision_ppb,
               CASE WHEN n_true > 0
                    THEN tp * 1000000000 // n_true ELSE 0 END AS recall_ppb
        FROM per
    ),
    f AS (
        SELECT *,
               CASE WHEN precision_ppb + recall_ppb > 0
                    THEN 2 * precision_ppb * recall_ppb
                         // (precision_ppb + recall_ppb)
                    ELSE 0 END AS f1_ppb
        FROM m
    )
    SELECT cls AS label, n_true, n_pred, tp,
           CAST(precision_ppb AS BIGINT) AS precision_ppb,
           CAST(recall_ppb AS BIGINT) AS recall_ppb,
           CAST(f1_ppb AS BIGINT) AS f1_ppb,
           CAST(SUM(f1_ppb) OVER () // COUNT(*) OVER () AS BIGINT)
               AS macro_f1_ppb,
           CAST(SUM(tp) OVER () * 1000000000 // SUM(n_true) OVER () AS BIGINT)
               AS micro_accuracy_ppb
    FROM f
    """,
    tags=("profiling", "eval"),
)
def eval_confusion_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass confusion-matrix metrics — per-class precision /
    recall / F1 plus macro-F1 and micro accuracy — completing the eval
    family's classification side (AUC/PR/calibration are binary-score
    metrics; a LABELED corpus reports these). Demo model: quantized
    nearest-label-centroid over the embeddings table (the simplest
    classifier whose per-class quality is non-trivial); the metric
    machinery is what's under test, the predictor stands in for any
    upstream model's predicted-label column.

    Determinism discipline: embeddings are quantized to exact integers
    (floor(e·1e6 + 0.5) — float→double is exact, so the quantization is
    engine-identical), centroids are floored integer means per
    dimension, distances are exact integer Σ(q−c)², argmin tie-breaks
    by (distance, label), and every exported metric is an integer-ppb
    ratio — no float accumulation anywhere, the lane hash-matches.

    Scale: centroids come from a narrow posexplode + groupBy(label,
    dim) — |labels|×64 cells, re-assembled into per-label arrays and
    BROADCAST; classification is then one scan with a JVM-codegen
    zip_with/aggregate distance per (vector, label) — linear in
    |vectors|·|labels|, no shuffle of the vectors; the confusion matrix
    and class metrics aggregate |labels|²-bounded frames."""
    conf = _centroid_predictions(spark, sf_dir)
    classes = (
        t(spark, sf_dir, "embeddings")
        .select(F.col("label").alias("cls"))
        .distinct()
    )
    nt = conf.groupBy(F.col("actual").alias("cls")).agg(
        F.count("*").cast("long").alias("n_true")
    )
    np_ = conf.groupBy(F.col("pred").alias("cls")).agg(
        F.count("*").cast("long").alias("n_pred")
    )
    tp = (
        conf.filter(F.col("actual") == F.col("pred"))
        .groupBy(F.col("actual").alias("cls"))
        .agg(F.count("*").cast("long").alias("tp"))
    )
    per = (
        classes.join(nt, "cls", "left")
        .join(np_, "cls", "left")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    m = per.select(
        "*",
        F.when(
            F.col("n_pred") > 0,
            F.expr("tp * 1000000000 div n_pred"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("precision_ppb"),
        F.when(
            F.col("n_true") > 0,
            F.expr("tp * 1000000000 div n_true"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("recall_ppb"),
    )
    f = m.select(
        "*",
        F.when(
            F.col("precision_ppb") + F.col("recall_ppb") > 0,
            F.expr(
                "2 * precision_ppb * recall_ppb"
                " div (precision_ppb + recall_ppb)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("f1_ppb"),
    )
    return f.select(
        F.col("cls").alias("label"),
        "n_true",
        "n_pred",
        "tp",
        "precision_ppb",
        "recall_ppb",
        "f1_ppb",
        F.expr("SUM(f1_ppb) OVER () div COUNT(*) OVER ()")
        .cast("long")
        .alias("macro_f1_ppb"),
        F.expr("SUM(tp) OVER () * 1000000000 div SUM(n_true) OVER ()")
        .cast("long")
        .alias("micro_accuracy_ppb"),
    )


@register(
    "eval_mcnemar",
    oracle=f"""
    WITH conf AS ({_CENTROID_PRED_SQL}),
    maj AS (
        SELECT label AS maj_label FROM
            (SELECT label, COUNT(*) AS cnt FROM embeddings GROUP BY label)
        ORDER BY cnt DESC, label ASC LIMIT 1
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(CASE WHEN pred = actual THEN 1 ELSE 0 END)
                   AS BIGINT) AS a_correct,
               CAST(SUM(CASE WHEN actual = maj_label THEN 1 ELSE 0 END)
                   AS BIGINT) AS b_correct,
               CAST(SUM(CASE WHEN pred = actual AND actual <> maj_label
                             THEN 1 ELSE 0 END) AS BIGINT) AS b_disc,
               CAST(SUM(CASE WHEN pred <> actual AND actual = maj_label
                             THEN 1 ELSE 0 END) AS BIGINT) AS c_disc,
               CAST(MAX(maj_label) AS BIGINT) AS maj_label
        FROM conf CROSS JOIN maj
    )
    SELECT n_vecs, a_correct, b_correct, b_disc, c_disc, maj_label,
           CASE WHEN b_disc + c_disc > 0
                THEN CAST(CAST(b_disc - c_disc AS HUGEINT)
                          * (b_disc - c_disc) * 1000000000
                          // (b_disc + c_disc) AS BIGINT)
           END AS mcnemar_ppb
    FROM agg
    """,
    tags=("profiling", "eval"),
)
def eval_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired classifier decisions — "is classifier A
    actually better than classifier B on the SAME items?", the question
    raw accuracy deltas can't answer because the two error sets
    overlap. Pairs the quantized nearest-centroid embedding classifier
    (``_centroid_predictions`` — the same predictor
    eval_confusion_multiclass grades, composed so it cannot drift)
    against the majority-label baseline (predict the most common label
    — the floor any classifier must beat). Only the DISCORDANT pairs
    carry signal: b = A right where B wrong, c = A wrong where B right,
    statistic = (b − c)²/(b + c) (~χ²₁ under H0, no continuity
    correction — stated, not hidden). A text-classifier pairing was
    tried first and measured ZERO discordance on this corpus (the
    synthetic non-en documents carry no foreign marker words, so every
    text classifier degenerates to the majority class) — a McNemar
    demo needs classifiers that actually disagree, and the centroid
    classifier beats majority ~41% vs ~12%.

    Determinism discipline: the majority label is picked by (count
    DESC, label ASC) — a total order, no arbitrary tie; b, c are exact
    integer counts and the statistic is floor-quantized to integer ppb
    with a decimal(38,0)/HUGEINT square ((b−c)²·1e9 ≤ n²·1e9, inside 38
    digits to n ~ 3·10⁹ per slice).

    Scale: the classifier is the confusion lane's broadcast-centroid
    scan; the majority pick is a |labels|-row aggregate broadcast back
    as one row; b/c/n are one map-side-combinable aggregate; output is
    ONE row."""
    conf = _centroid_predictions(spark, sf_dir)
    maj = (
        t(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("label"))
        .limit(1)
        .select(F.col("label").alias("maj_label"))
    )
    flags = conf.crossJoin(F.broadcast(maj))
    agg = flags.agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum(F.when(F.col("pred") == F.col("actual"), 1).otherwise(0))
        .cast("long")
        .alias("a_correct"),
        F.sum(F.when(F.col("actual") == F.col("maj_label"), 1).otherwise(0))
        .cast("long")
        .alias("b_correct"),
        F.sum(
            F.when(
                (F.col("pred") == F.col("actual"))
                & (F.col("actual") != F.col("maj_label")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("b_disc"),
        F.sum(
            F.when(
                (F.col("pred") != F.col("actual"))
                & (F.col("actual") == F.col("maj_label")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("c_disc"),
        F.max("maj_label").cast("long").alias("maj_label"),
    )
    return agg.select(
        "n_vecs",
        "a_correct",
        "b_correct",
        "b_disc",
        "c_disc",
        "maj_label",
        F.when(
            F.col("b_disc") + F.col("c_disc") > 0,
            F.expr(
                "CAST(b_disc - c_disc AS DECIMAL(38,0))"
                " * (b_disc - c_disc) * 1000000000"
                " div (b_disc + c_disc)"
            ),
        )
        .cast("long")
        .alias("mcnemar_ppb"),
    )


_K_ANON = 5  # the k-anonymity audit threshold; a knob in production
_L_DIV = 3  # the l-diversity audit threshold; a knob in production


def _privacy_audit_rollup(
    g, threshold: int, thr_name: str, measure: str, ngroups_name: str, min_name: str
):
    """One-row privacy audit over a per-QI-group frame ``g`` carrying
    ``sz`` (group size) and ``measure`` (the flagged statistic: ``sz``
    itself for k-anonymity, distinct-sensitive count for l-diversity) —
    shared by both lanes so threshold/overflow fixes cannot drift
    (review r10). The row-count products route through decimal(38,0) —
    rows_at_risk·1e9 passes 2^63 inside the 100 TB envelope (the
    sibling-lane wide-integer discipline; the oracles use HUGEINT)."""
    return g.agg(
        F.lit(threshold).cast("long").alias(thr_name),
        F.sum("sz").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.when(F.col(measure) < threshold, 1).otherwise(0))
        .cast("long")
        .alias(ngroups_name),
        F.sum(F.when(F.col(measure) < threshold, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min(measure).cast("long").alias(min_name),
        F.expr(
            f"CAST(SUM(CASE WHEN {measure} < {threshold} THEN sz ELSE 0 END)"
            " AS DECIMAL(38,0)) * 1000000000 div SUM(sz)"
        )
        .cast("long")
        .alias("risk_ppb"),
    )


def _privacy_audit_sql(
    qi_select: str, threshold: int, thr_name: str, measure_sql: str,
    measure: str, ngroups_name: str, min_name: str,
) -> str:
    """The DuckDB twin of ``_privacy_audit_rollup`` — generated from the
    same parameters so the two lanes' oracles share one definition."""
    return f"""
    WITH q AS ({qi_select}),
    g AS ({measure_sql}),
    a AS (
        SELECT CAST({threshold} AS BIGINT) AS {thr_name},
               CAST(SUM(sz) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN {measure} < {threshold} THEN 1 ELSE 0 END)
                   AS BIGINT) AS {ngroups_name},
               CAST(SUM(CASE WHEN {measure} < {threshold} THEN sz ELSE 0 END)
                   AS BIGINT) AS rows_at_risk,
               CAST(MIN({measure}) AS BIGINT) AS {min_name},
               CAST(CAST(SUM(CASE WHEN {measure} < {threshold} THEN sz
                                  ELSE 0 END) AS HUGEINT)
                    * 1000000000 // SUM(sz) AS BIGINT) AS risk_ppb
        FROM g
    )
    SELECT * FROM a
    """


@register(
    "profile_k_anonymity",
    oracle=_privacy_audit_sql(
        qi_select="""
        SELECT c_nationkey AS qi1, c_mktsegment AS qi2,
               CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS qi3
        FROM customer""",
        threshold=_K_ANON,
        thr_name="k",
        measure_sql="""
        SELECT qi1, qi2, qi3, CAST(COUNT(*) AS BIGINT) AS sz
        FROM q GROUP BY qi1, qi2, qi3""",
        measure="sz",
        ngroups_name="n_violating_groups",
        min_name="min_group_size",
    ),
    tags=("profiling", "governance"),
)
def profile_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple — the governance
    measurement BEFORE a release decision, completing the privacy
    surface beside the PII scrub (redact direct identifiers) and
    right-to-be-forgotten erasure (delete on request): a row is
    re-identifiable when its quasi-identifier combination (here nation
    × market segment × $1000 balance bucket) is shared by fewer than k
    individuals. Emits the violating-group count, rows at risk and the
    risk fraction (integer ppb) — the numbers a reviewer checks against
    policy, not a pass/fail the engine decides.

    Determinism discipline: the balance bucket is FLOOR(x/1000) on the
    exact double (one IEEE division, identical both engines); all
    counts exact integers; risk_ppb one integer floor-division in
    decimal(38,0)/HUGEINT (rows_at_risk·1e9 passes 2^63 at the 100 TB
    envelope). The rollup and its SQL twin come from ONE parameterized
    pair of helpers shared with profile_l_diversity.

    Scale: ONE map-side-combinable groupBy over the quasi-identifier
    tuple (the same shape as any distinct-count profile), then a
    single-row aggregate over group sizes — group count is bounded by
    the QI domain, never row count; output is ONE row."""
    q = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("qi1"),
        F.col("c_mktsegment").alias("qi2"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("qi3"),
    )
    g = q.groupBy("qi1", "qi2", "qi3").agg(
        F.count("*").cast("long").alias("sz")
    )
    return _privacy_audit_rollup(
        g, _K_ANON, "k", "sz", "n_violating_groups", "min_group_size"
    )


@register(
    "profile_l_diversity",
    oracle=_privacy_audit_sql(
        qi_select="""
        SELECT c_nationkey AS qi1,
               CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS qi2,
               c_mktsegment AS sens
        FROM customer""",
        threshold=_L_DIV,
        thr_name="l",
        measure_sql="""
        SELECT qi1, qi2,
               CAST(COUNT(*) AS BIGINT) AS sz,
               CAST(COUNT(DISTINCT sens) AS BIGINT) AS l_distinct
        FROM q GROUP BY qi1, qi2""",
        measure="l_distinct",
        ngroups_name="n_homogeneous_groups",
        min_name="min_l",
    ),
    tags=("profiling", "governance"),
)
def profile_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's necessary companion
    (Machanavajjhala et al. 2007): a group can satisfy k-anonymity yet
    still leak its SENSITIVE attribute when every member shares one
    value (the homogeneity attack — "all five patients in that QI group
    have the same diagnosis"). Per quasi-identifier group (nation ×
    $1000 balance bucket) the audit counts DISTINCT sensitive values
    (market segment as the stand-in sensitive column) and flags groups
    below l; emits group/row exposure and the integer-ppb risk fraction
    alongside ``profile_k_anonymity``'s re-identification numbers. Both
    lanes share ONE parameterized rollup + oracle-template pair.

    Determinism discipline: identical to the k-anonymity lane — one
    IEEE division for the bucket, exact integer counts (COUNT DISTINCT
    is exact, not a sketch), the ppb floor-division in
    decimal(38,0)/HUGEINT.

    Scale: ONE groupBy over the QI tuple with a distinct-count
    aggregate (Catalyst plans the Expand — at 100 TB swap to
    approx_count_distinct per the profile_table note, trading exactness
    the audit may not be allowed to trade), then a single-row rollup
    over the QI-domain-bounded group table; output is ONE row."""
    q = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("qi1"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("qi2"),
        F.col("c_mktsegment").alias("sens"),
    )
    g = q.groupBy("qi1", "qi2").agg(
        F.count("*").cast("long").alias("sz"),
        F.count_distinct("sens").cast("long").alias("l_distinct"),
    )
    return _privacy_audit_rollup(
        g, _L_DIV, "l", "l_distinct", "n_homogeneous_groups", "min_l"
    )


_T_CLOSE_PPB = 200_000_000  # t = 0.20; a knob in production


@register(
    "profile_t_closeness",
    oracle=f"""
    WITH q AS (
        SELECT c_nationkey AS qi1,
               CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS qi2,
               c_mktsegment AS sens
        FROM customer
    ),
    cells AS (
        SELECT qi1, qi2, sens, CAST(COUNT(*) AS BIGINT) AS n_gs
        FROM q GROUP BY qi1, qi2, sens
    ),
    gtot AS (SELECT qi1, qi2, CAST(SUM(n_gs) AS BIGINT) AS n_g
             FROM cells GROUP BY qi1, qi2),
    stot AS (SELECT sens, CAST(SUM(n_gs) AS BIGINT) AS n_s
             FROM cells GROUP BY sens),
    tot AS (SELECT CAST(SUM(n_gs) AS BIGINT) AS n FROM cells),
    grid AS (
        SELECT g.qi1, g.qi2, g.n_g, s.sens, s.n_s,
               CAST(COALESCE(c.n_gs, 0) AS BIGINT) AS n_gs
        FROM gtot g CROSS JOIN stot s
        LEFT JOIN cells c ON c.qi1 = g.qi1 AND c.qi2 = g.qi2
                         AND c.sens = s.sens
    ),
    per_group AS (
        SELECT qi1, qi2, n_g,
               CAST(SUM(ABS(CAST(n_gs AS HUGEINT) * t.n
                            - CAST(n_g AS HUGEINT) * n_s))
                    * 1000000000
                    // (2 * CAST(n_g AS HUGEINT) * t.n) AS BIGINT)
                   AS dist_ppb
        FROM grid CROSS JOIN tot t
        GROUP BY qi1, qi2, n_g, t.n
    )
    SELECT CAST({_T_CLOSE_PPB} AS BIGINT) AS t_ppb,
           CAST(SUM(n_g) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MAX(dist_ppb) AS BIGINT) AS max_dist_ppb,
           CAST(SUM(CASE WHEN dist_ppb > {_T_CLOSE_PPB} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_groups_over_t,
           CAST(SUM(CASE WHEN dist_ppb > {_T_CLOSE_PPB} THEN n_g ELSE 0 END)
               AS BIGINT) AS rows_at_risk,
           CAST(CAST(SUM(CASE WHEN dist_ppb > {_T_CLOSE_PPB} THEN n_g
                              ELSE 0 END) AS HUGEINT)
                * 1000000000 // SUM(n_g) AS BIGINT) AS risk_ppb
    FROM per_group
    """,
    tags=("profiling", "governance"),
)
def profile_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third of the classic release-audit trio
    (Li, Li & Venkatasubramanian 2007): l-diversity can be satisfied by
    a group whose sensitive DISTRIBUTION still differs sharply from the
    corpus (skewness attack — "that QI group is 90% one segment where
    the corpus is 20%"), so this lane measures each quasi-identifier
    group's distance to the GLOBAL sensitive distribution and flags
    groups beyond t. The sensitive attribute is categorical, so the
    distance is total variational (½ Σ|p_group − p_global| — the
    t-closeness metric for unordered domains; EMD over an ordered
    domain is its generalization).

    Determinism discipline: the distance is exact rational arithmetic
    on the common denominator — per group Σ_s |n_gs·N − n_g·n_s| is an
    exact integer (Python bigints driver-side, HUGEINT in the oracle),
    divided ONCE by 2·n_g·N into integer ppb (floor) — so max/threshold
    comparisons hash-match; the audit row uses the same exact floor
    arithmetic.

    Scale: ONE (QI, sens) rollup off the scan — the first DataFrame
    plan recomputed it per marginal branch (measured: 4 FileScans, zero
    ReusedExchange — the eval_cohens_kappa defect class; review r10) —
    collected and finished in exact driver arithmetic (the
    Shapley/Markov/kappa constant-grid pattern): the grid is bounded by
    |QI domain| × |sensitive domain| (value-domain buckets × nations ×
    segments — never rows), so the collect is a domain-sized constant,
    and the marginals/distances/audit are integer walks over it. The
    shared ``_privacy_audit_rollup`` is a DataFrame-side helper; this
    lane's audit row is driver-side by design, with the SAME floor
    arithmetic the oracle template uses."""
    q = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("qi1"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("qi2"),
        F.col("c_mktsegment").alias("sens"),
    )
    cells = [
        ((r.qi1, r.qi2), r.sens, r.n_gs)
        for r in q.groupBy("qi1", "qi2", "sens")
        .agg(F.count("*").cast("long").alias("n_gs"))
        .collect()  # |QI domain| x |sens| grid — domain-bounded
    ]
    return spark.createDataFrame(
        [t_closeness_audit(cells, _T_CLOSE_PPB)],
        "t_ppb long, n_rows long, n_groups long, max_dist_ppb long,"
        " n_groups_over_t long, rows_at_risk long, risk_ppb long",
    )


def t_closeness_audit(
    cells: list[tuple], t_ppb: int
) -> tuple:
    """Driver-side t-closeness arithmetic on the collected (group, sens,
    count) grid — factored out so the exact bigint walk is unit-testable
    on planted distributions (mirrors the oracle's floor arithmetic
    term-for-term)."""
    n_g: dict[tuple, int] = {}
    n_s: dict[str, int] = {}
    grid: dict[tuple, dict[str, int]] = {}
    for g_, s_, c_ in cells:
        n_g[g_] = n_g.get(g_, 0) + c_
        n_s[s_] = n_s.get(s_, 0) + c_
        grid.setdefault(g_, {})[s_] = c_
    n = sum(n_s.values())
    dist_ppb = {
        g_: sum(
            abs(grid[g_].get(s_, 0) * n - n_g[g_] * ns) for s_, ns in n_s.items()
        )
        * 10**9
        // (2 * n_g[g_] * n)
        for g_ in n_g
    }
    over = [g_ for g_, d in dist_ppb.items() if d > t_ppb]
    rows_at_risk = sum(n_g[g_] for g_ in over)
    if not cells:
        # SUM-over-empty SQL semantics (review r11): the oracle's
        # ungrouped aggregate over an empty per_group yields NULL for
        # every SUM/MAX and 0 only for COUNT(*) — mirror that rather
        # than returning zeros
        return (t_ppb, None, 0, None, None, None, None)
    return (
        t_ppb,
        n,
        len(n_g),
        max(dist_ppb.values()),
        len(over),
        rows_at_risk,
        rows_at_risk * 10**9 // n if n else None,
    )
