"""Duplicate-cluster connected components over LSH candidate pairs.

Near-dup pair generation (``dedup_minhash_lsh``) yields edges; real corpus
dedup needs the *transitive closure* — if A~B and B~C, all three are one
duplicate cluster and a single canonical document survives. That closure is
connected components on the pair graph.

Algorithm: alternating **large-star / small-star** contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", ACM SoCC 2014) — the
shuffle-native CC algorithm. Each round is a groupBy + join over the edge
list; the edge set converges to stars centered at each component's minimum
id in O(log^2 n) rounds, independent of component diameter. Naive min-label
propagation needs O(diameter) rounds — a 1M-hop chain of near-dups (common
in boilerplate-heavy crawls) would take 1M shuffles; star contraction takes
~40.

Scale notes (100 TB):
- State per round is the edge list only (two longs per edge); document
  text/signatures never enter the iteration.
- Each round eagerly localCheckpoints its (small) edge list, so both
  lineage and the logical plan stay O(1) and a round's shuffle reads the
  materialized previous round, not the whole upstream LSH pipeline.
- Convergence is detected with a count()+exceptAll emptiness check — a
  driver-side *aggregate* (one long per round), never a data collect.
- Rounds are capped; the cap is a correctness guard (raise, don't return
  partial clusters).

Reference has no analog (459-line ingest pipeline); this extends SURVEY
§2.11's dedup suite to full-pipeline semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_lambda_spark.plans._util import t
from data_ingestion_lambda_spark.plans.llm_ops import MINHASH_PAIRS_ORACLE, dedup_minhash_lsh
from data_ingestion_lambda_spark.plans.registry import REGISTRY, pin, register

_MAX_ROUNDS = 40  # >> log^2(n) for any realistic corpus

# Edge rows per partition for the iteration state (two longs + overhead
# ≈ 16 B/row → ~64 MB partitions). The LSH pair graph is orders of
# magnitude smaller than the corpus, so without this the per-round stages
# inherit the corpus-sized shuffle partition count and scheduling overhead
# dominates (localCheckpoint materializes the pre-AQE plan, so AQE's
# coalescing never sees the iteration's tiny stages).
_EDGES_PER_PARTITION = 4_000_000


def _edge_parts(spark: SparkSession, n_edges: int) -> int:
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(cap, (n_edges + _EDGES_PER_PARTITION - 1) // _EDGES_PER_PARTITION))


def _neighbors(edges: DataFrame) -> DataFrame:
    """Undirected neighbor view of a directed edge list."""
    return edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))


# Both stars compute per-node neighborhood minima with a WINDOW min over
# the neighbor view rather than groupBy+join: the join would co-locate all
# of a node's neighbor rows in one partition anyway (identical skew
# profile), but the window does it in ONE shuffle where groupBy+re-join
# takes two — at 100 TB each star round saves a full pass over the edge
# list. Deduplication happens once per round (in small_star), not per star.


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to min(N(u) ∪ {u})."""
    w = Window.partitionBy("u")
    nb = _neighbors(edges).withColumn("m", F.least(F.min("v").over(w), F.col("u")))
    return (
        nb.where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor v <= u (and u itself) to min(N≤(u) ∪ {u})."""
    w = Window.partitionBy("u")
    nb = (
        _neighbors(edges)
        .where(F.col("v") <= F.col("u"))
        .withColumn("m", F.least(F.min("v").over(w), F.col("u")))
    )
    linked = nb.select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_link = nb.select(F.col("u"), F.col("m").alias("v"))
    return linked.union(self_link).where(F.col("u") != F.col("v")).distinct()


def _canonical(edges: DataFrame) -> DataFrame:
    return edges.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()


def connected_components(edges: DataFrame) -> DataFrame:
    """(u, v) edge list -> (id, cluster_id) for every node in an edge.

    cluster_id is the minimum node id of the component — deterministic and
    engine-independent, so a DuckDB recursive CTE can replicate it exactly.
    """
    # localCheckpoint (eager) after every round — NOT just persist. A star
    # round references its input ~24x (neighbor unions × joins × the
    # convergence compare), so with plain persist the *logical plan* grows
    # 24^round copies of the upstream pipeline and Catalyst re-analyzes all
    # of it each round (persist caches execution, not planning) — measured
    # 53 s for round 2 at sf0.01 vs 0.3 s checkpointed. Checkpointing cuts
    # the plan to a leaf; the dropped round-(n-1) blocks are GC'd by the
    # ContextCleaner once unreferenced.
    spark = edges.sparkSession
    cur = edges.where(F.col("u") != F.col("v")).distinct().localCheckpoint()
    n_cur = cur.count()
    # coalesce (narrow, no shuffle) the checkpointed state to a size-derived
    # partition count so each round's ~6 stages schedule O(state) tasks,
    # not O(corpus-shuffle-partitions) tasks; n from the previous round is
    # the estimate (edge count is non-increasing under star contraction).
    cur = cur.coalesce(_edge_parts(spark, n_cur))
    for _ in range(_MAX_ROUNDS):
        nxt = _small_star(_large_star(cur)).localCheckpoint().coalesce(
            _edge_parts(spark, n_cur)
        )
        n_next = nxt.count()
        stable = n_next == n_cur and _canonical(nxt).exceptAll(_canonical(cur)).isEmpty()
        cur, n_cur = nxt, n_next
        if stable:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {_MAX_ROUNDS} rounds")
    # Converged state is a star per component: center = component min.
    nb = _neighbors(cur)
    assign = nb.groupBy("u").agg(F.min("v").alias("mn")).select(
        F.col("u").alias("id"), F.least("mn", "u").alias("cluster_id")
    )
    return assign


def cluster_flags(docs: DataFrame, assign: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, is_duplicate) for every doc in ``docs`` given a
    connected_components assignment: docs in no pair are singleton clusters;
    is_duplicate marks the non-canonical (non-minimum-id) members."""
    return docs.join(assign, docs.doc_id == assign.id, "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        (F.coalesce("cluster_id", "doc_id") != F.col("doc_id")).alias("is_duplicate"),
    )


@register(
    "dedup_cluster_assign",
    oracle=f"""
    WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(id, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.id
    ),
    assign AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
    SELECT d.doc_id,
           COALESCE(a.cluster_id, d.doc_id) AS cluster_id,
           CAST(COALESCE(a.cluster_id, d.doc_id) <> d.doc_id AS BOOLEAN) AS is_duplicate
    FROM documents d LEFT JOIN assign a ON d.doc_id = a.id
    """,
    tags=("llm", "dedup", "graph"),
)
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's duplicate-cluster id (component min over the
    MinHash-LSH pair graph); docs in no pair are their own singleton
    cluster. ``is_duplicate`` marks the non-canonical members — the rows a
    training pipeline drops.

    The DuckDB oracle computes the same closure with a recursive CTE
    (transitive min-reachability) — feasible at sf0.01; the Spark side's
    star contraction is the form that scales.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    assign = connected_components(edges)
    docs = t(spark, sf_dir, "documents").select("doc_id")
    out = cluster_flags(docs, assign)
    return out


@register(
    "dedup_cluster_sizes",
    oracle=f"""
    WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(id, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.id
    ),
    assign AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
    SELECT cluster_id, COUNT(*) AS cluster_size
    FROM assign GROUP BY cluster_id HAVING COUNT(*) > 1
    """,
    tags=("llm", "dedup", "graph"),
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size of every non-trivial duplicate cluster — the dedup audit metric
    (how much of the corpus collapses, and into how many survivors)."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    assign = connected_components(edges)
    return (
        assign.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"))
        .where(F.col("cluster_size") > 1)
    )


# ---------------------------------------------------------------------------
# End-to-end curation decision (dedup x quality x repetition)
# ---------------------------------------------------------------------------

# Thresholds chosen against the corpus distribution (sf0.01: dup_2gram
# median 0.028 / max 0.133; top_1gram median 0.093 / max 0.30) so the
# filter genuinely splits the data. Fractions are exact-integer divisions,
# so threshold comparisons are bit-identical across engines.
_MAX_DUP_2GRAM = 0.05
_MAX_TOP_1GRAM = 0.2

_REP_ORACLE = REGISTRY["text_repetition_signals"].oracle
_QUAL_ORACLE = REGISTRY["text_quality_score"].oracle


@register(
    "corpus_keep_decision",
    oracle=f"""
    WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(id, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.id
    ),
    assign AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    rep AS ({_REP_ORACLE}),
    qual AS ({_QUAL_ORACLE}),
    flags AS (
        SELECT d.doc_id,
               COALESCE(a.cluster_id, d.doc_id) <> d.doc_id AS is_duplicate,
               q.passes_quality,
               (r.dup_2gram_frac > {_MAX_DUP_2GRAM}
                OR r.top_1gram_frac > {_MAX_TOP_1GRAM}) AS is_repetitive
        FROM documents d
        LEFT JOIN assign a ON d.doc_id = a.id
        JOIN rep r ON d.doc_id = r.doc_id
        JOIN qual q ON d.doc_id = q.doc_id
    )
    SELECT doc_id,
           (NOT is_duplicate AND passes_quality AND NOT is_repetitive) AS keep,
           CASE WHEN is_duplicate THEN 'duplicate'
                WHEN NOT passes_quality THEN 'quality'
                WHEN is_repetitive THEN 'repetition' END AS drop_reason
    FROM flags
    """,
    tags=("llm", "dedup", "text"),
)
def corpus_keep_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline's terminal operator: one keep/drop verdict per
    document composed from near-dup clustering (transitive, canonical-min
    survives), the heuristic quality gate, and Gopher-style repetition
    thresholds — precedence duplicate > quality > repetition.

    Scale: three doc-keyed aggregates joined on doc_id (each upstream is
    shuffle-bounded as documented in its own operator); the join is
    co-partitioned on the same key, no payload text moves.
    """
    from data_ingestion_lambda_spark.plans.llm_ops import (
        text_quality_score,
        text_repetition_signals,
    )

    rep = text_repetition_signals(spark, sf_dir).select(
        "doc_id", "dup_2gram_frac", "top_1gram_frac"
    )
    qual = text_quality_score(spark, sf_dir).select("doc_id", "passes_quality")
    clus = dedup_cluster_assign(spark, sf_dir).select("doc_id", "is_duplicate")
    return keep_verdict(clus, rep, qual)


def keep_verdict(clus: DataFrame, rep: DataFrame, qual: DataFrame) -> DataFrame:
    """corpus_keep_decision's verdict join over pre-built parts — the ONE
    place the keep/drop precedence (duplicate > quality > repetition)
    lives, so the capstone pipeline and the incremental runner can compose
    it from differently-sourced inputs (one-shot lanes vs maintained
    stores) without restating the thresholds. Inputs: clus (doc_id,
    is_duplicate), rep (doc_id, dup_2gram_frac, top_1gram_frac), qual
    (doc_id, passes_quality)."""
    j = clus.select("doc_id", "is_duplicate").join(rep, "doc_id").join(qual, "doc_id")
    is_rep = (F.col("dup_2gram_frac") > _MAX_DUP_2GRAM) | (
        F.col("top_1gram_frac") > _MAX_TOP_1GRAM
    )
    keep = ~F.col("is_duplicate") & F.col("passes_quality") & ~is_rep
    reason = (
        F.when(F.col("is_duplicate"), "duplicate")
        .when(~F.col("passes_quality"), "quality")
        .when(is_rep, "repetition")
    )
    return j.select("doc_id", keep.alias("keep"), reason.alias("drop_reason"))


# ---------------------------------------------------------------------------
# Fixed-point PageRank over the near-dup graph
# ---------------------------------------------------------------------------

_PR_SCALE = 1_000_000_000_000  # rank mass as integer units of 1e-12
_PR_ITERS = 3


def _pr_oracle() -> str:
    """Unrolled fixed-point PageRank twin. All arithmetic is BIGINT
    (``//`` floor division, exact associative sums), so both engines
    produce bit-identical ranks — no float reassociation anywhere."""
    cte = [
        f"pairs AS ({MINHASH_PAIRS_ORACLE})",
        "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs"
        " UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs)",
        "deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree"
        " FROM edges GROUP BY u)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg)",
        f"r0 AS (SELECT node, {_PR_SCALE} // n AS rank FROM deg, nn)",
    ]
    for k in range(1, _PR_ITERS + 1):
        cte.append(
            f"s{k} AS (SELECT e.u AS node, CAST(SUM(r.rank // d.degree) AS BIGINT) AS s"
            f" FROM edges e JOIN r{k - 1} r ON e.v = r.node"
            f" JOIN deg d ON e.v = d.node GROUP BY e.u)"
        )
        cte.append(
            f"r{k} AS (SELECT s{k}.node,"
            f" (15 * {_PR_SCALE}) // (100 * nn.n) + (85 * s{k}.s) // 100 AS rank"
            f" FROM s{k}, nn)"
        )
    return (
        "WITH " + ",\n".join(cte) + f"""
    SELECT d.node AS doc_id, d.degree,
           CAST(r{_PR_ITERS}.rank AS DOUBLE) / {_PR_SCALE} AS pagerank
    FROM deg d JOIN r{_PR_ITERS} ON d.node = r{_PR_ITERS}.node
    """
    )


@register(
    "dedup_graph_pagerank",
    oracle=_pr_oracle(),
    tags=("llm", "graph"),
)
def dedup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup candidate graph (damping 0.85, 3 unrolled
    iterations, restricted to nodes with at least one edge so there is no
    dangling mass): ranks the 'hub' documents that sit inside large
    duplicate neighborhoods — the curation signal for which template a
    boilerplate family radiates from, complementing the cluster sizes from
    dedup_cluster_sizes.

    Determinism: ranks live as BIGINT units of 1e-12 and every step is
    integer floor-division and exact integer sums — iterating in doubles
    would make the per-node neighbor sum order-dependent and break the
    oracle hash.

    Scale: state per iteration is one (node, rank) row per graph node;
    each iteration is one equi-join of the edge list against ranks plus a
    node-keyed aggregate. Edges and degrees are persisted once (the graph
    is orders of magnitude smaller than the corpus — signatures, never
    text). 3 iterations = 3 bounded shuffles, unrolled into one plan."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))).transform(pin)
    deg = edges.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("degree")
    ).transform(pin)
    nn = deg.agg(F.count("*").alias("n"))
    rank = (
        deg.crossJoin(F.broadcast(nn))
        .select("node", F.expr(f"{_PR_SCALE} div n").alias("rank"))
    )
    for _ in range(_PR_ITERS):
        share = rank.join(deg, "node").select(
            "node", F.expr("rank div degree").alias("share")
        )
        incoming = (
            edges.join(share, edges["v"] == share["node"])
            .groupBy(edges["u"].alias("node"))
            .agg(F.sum("share").alias("s"))
        )
        rank = incoming.crossJoin(F.broadcast(nn)).select(
            "node",
            (
                F.expr(f"(15 * {_PR_SCALE}) div (100 * n)")
                + F.expr("(85 * s) div 100")
            ).alias("rank"),
        )
    return deg.join(rank, "node").select(
        F.col("node").alias("doc_id"),
        "degree",
        (F.col("rank").cast("double") / F.lit(float(_PR_SCALE))).alias("pagerank"),
    )


# ---------------------------------------------------------------------------
# Triangle counting / local clustering over the near-dup graph
# ---------------------------------------------------------------------------


@register(
    "dedup_graph_triangles",
    oracle=f"""
    WITH pairs AS ({MINHASH_PAIRS_ORACLE}),
    e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
    tri AS (
        SELECT x.a, x.b, y.b AS c
        FROM e x JOIN e y ON y.a = x.b
                 JOIN e z ON z.a = x.a AND z.b = y.b
    ),
    tcnt AS (
        SELECT v AS doc_id, COUNT(*) AS n_triangles
        FROM (SELECT UNNEST([a, b, c]) AS v FROM tri) GROUP BY v
    ),
    deg AS (
        SELECT v AS doc_id, COUNT(*) AS degree
        FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v
    )
    SELECT doc_id,
           CAST(degree AS INTEGER) AS degree,
           CAST(COALESCE(n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN degree >= 2
                THEN 2.0 * COALESCE(n_triangles, 0) / (degree * (degree - 1))
                ELSE 0.0 END AS clustering_coeff
    FROM deg LEFT JOIN tcnt USING (doc_id)
    """,
    tags=("llm", "dedup", "graph"),
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + local clustering coefficient per document over the
    MinHash-LSH near-dup graph — the graph-shape audit next to connected
    components: a high-clustering neighborhood is a true duplicate clique
    (template spam), while a low-clustering hub is a chain of borderline
    matches that transitive closure is about to over-merge. Pipeline owners
    read this table before trusting cluster collapse.

    Algorithm: edges are canonically oriented (doc_a < doc_b), so each
    triangle a<b<c is enumerated EXACTLY once by the two-join pattern
    e(a,b) ⋈ e(b,c) ⋈ e(a,c); per-doc counts come from exploding the
    triangle's three corners.

    Scale: joins are edge-keyed equi-joins — never touches documents; at
    web scale the standard mitigation for hub skew is orienting edges by
    (degree, id) instead of raw id, which bounds every join fan-out by the
    graph's degeneracy; the id orientation here matches the oracle and the
    LSH graph's bounded candidate volume."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    # Persisted: three self-join references + the degree pass; edges are
    # two longs per row (graph-sized, not corpus-sized).
    e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).transform(pin)
    x = e.alias("x")
    y = e.alias("y")
    z = e.alias("z")
    tri = (
        x.join(y, F.col("y.a") == F.col("x.b"))
        .join(z, (F.col("z.a") == F.col("x.a")) & (F.col("z.b") == F.col("y.b")))
        .select(F.col("x.a").alias("a"), F.col("x.b").alias("b"), F.col("y.b").alias("c"))
    )
    tcnt = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_triangles"))
    )
    deg = (
        e.select(F.col("a").alias("doc_id"))
        .union(e.select(F.col("b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("degree"))
    )
    return deg.join(tcnt, "doc_id", "left").select(
        "doc_id",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.lit(2.0)
            * F.coalesce("n_triangles", F.lit(0))
            / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )


# ---------------------------------------------------------------------------
# Bounded-hop BFS: takedown / contamination blast radius
# ---------------------------------------------------------------------------

# Deterministic stand-in for an external flag list (DMCA takedowns, PII
# reports, eval-contamination hits): every 31st document (~3%). In
# production the seed set arrives as a table; the modulus keeps the
# oracle self-contained and — checked against the sf0.01 corpus — dense
# enough that seeds actually hit LSH pairs, so the registered row
# exercises hop > 0 (the planted near-dup graph has no chains, so hops
# 2-3 are pinned by the synthetic-graph pytest instead).
_BLAST_SEED_MOD = 31
# Propagation depth. Near-dup evidence decays fast with hops (a 3-hop
# neighbor shares no measured similarity with the seed), so deployments
# cap the radius instead of taking the full component — that full-closure
# variant is dedup_cluster_assign.
_BLAST_MAX_HOPS = 3


def bfs_hops(seeds: DataFrame, edges: DataFrame, max_hops: int) -> DataFrame:
    """(doc_id, hops): min-hop BFS distance from ``seeds`` (one ``doc_id``
    column) over undirected ``edges`` (``u``/``v`` longs), for every node
    within ``max_hops``; unreached nodes are absent.

    K-round frontier relaxation, unrolled because K is a small constant —
    each round joins the previous frontier against the edge list and
    distincts; a node's true BFS distance is the MIN round that reached
    it, taken in ONE final aggregate. No driver loop state: K static
    join/distinct rounds that Catalyst plans as one DAG.

    r14 (guide §2.4): the per-round left_anti against the accumulated
    reached set is gone — it cost an exchange+join per round and only
    pruned re-expansion of already-reached nodes, which the final
    GROUP BY MIN(hops) resolves identically (a frontier without the
    anti-join is still ⊆ the reachable set, so per-round work stays
    bounded by |reachable| x degree; the per-round DISTINCT — the part
    that prevents path-count explosion at scale — stays). Each round's
    frontier is eagerly localCheckpoint'ed (the connected_components
    idiom one function down): a level appears TWICE in the DAG (as the
    next round's input and in the final union), and un-materialized
    that re-executed every earlier round's join per level — measured
    6.2 s for the 3-hop lane at sf0.1 vs 1.9 s checkpointed (the
    anti-join original: 2.7 s).
    """
    edges = _neighbors(edges).transform(pin)
    spark = seeds.sparkSession
    # seeds are consumed twice (hop-0 level + round-1 frontier) and can be
    # an expensive subtree (the contamination lane's seeds are the whole
    # decontamination screen) — materialize them once. The size-derived
    # coalesce after each checkpoint is the connected_components idiom:
    # localCheckpoint materializes the pre-AQE plan, so without it every
    # later round schedules O(shuffle.partitions) tasks over a
    # frontier-sized state.
    seeds = seeds.select("doc_id").localCheckpoint()
    seeds = seeds.coalesce(_edge_parts(spark, seeds.count()))
    levels = [seeds.select("doc_id", F.lit(0).cast("bigint").alias("hops"))]
    frontier = seeds.select(F.col("doc_id").alias("id"))
    for k in range(1, max_hops + 1):
        frontier = (
            frontier.join(edges, frontier["id"] == edges["u"])
            .select(F.col("v").alias("id"))
            .distinct()
            .localCheckpoint()
        )
        frontier = frontier.coalesce(_edge_parts(spark, frontier.count()))
        levels.append(
            frontier.select(
                F.col("id").alias("doc_id"), F.lit(k).cast("bigint").alias("hops")
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out.groupBy("doc_id").agg(F.min("hops").alias("hops"))


@register(
    "graph_blast_radius",
    oracle=f"""
    WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    walk(id, hops) AS (
        SELECT doc_id, 0 FROM documents WHERE doc_id % {_BLAST_SEED_MOD} = 0
        UNION ALL
        SELECT e.v, w.hops + 1
        FROM walk w JOIN edges e ON e.u = w.id
        WHERE w.hops < {_BLAST_MAX_HOPS}
    )
    SELECT id AS doc_id, CAST(MIN(hops) AS BIGINT) AS hops
    FROM walk GROUP BY id
    """,
    tags=("llm", "dedup", "graph"),
)
def graph_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-hop BFS from a flagged-document seed set over the MinHash-LSH
    near-dup graph, capped at 3 hops — the takedown-propagation table:
    when a document is flagged (copyright takedown, PII report, eval
    contamination), its near-duplicates must be pulled too, and THEIR
    near-duplicates reviewed. ``hops`` is the review priority (0 = the
    flagged doc itself).

    Algorithm: bfs_hops() frontier relaxation (min-hop semantics pinned
    on a synthetic chain/min-path graph in tests/test_graph_ops.py —
    the sf0.01 LSH graph only exposes hops 0-1).

    Scale (100 TB): iteration state is (id, hop) pairs — never text or
    signatures; each round is an equi-join keyed on node id; frontier
    size is bounded by seed count x graph expansion, orders of magnitude
    under the corpus. The full-closure variant (unbounded hops) is
    dedup_cluster_assign's star contraction; bounded-K BFS is cheaper
    exactly because it never iterates to the component diameter.

    The DuckDB oracle walks the same graph with a depth-bounded
    recursive CTE and takes MIN(hops) — path enumeration is feasible at
    sf0.01; the Spark side's frontier relaxation is the form that
    scales."""
    d = t(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    seeds = d.select("doc_id").where(F.col("doc_id") % _BLAST_SEED_MOD == 0)
    return bfs_hops(seeds, edges, _BLAST_MAX_HOPS)


# Composed at import from the registered decontamination oracle — the same
# no-drift discipline the curation chain uses: the seed definition IS
# decontaminate_against_eval's output, never a re-statement of it.
_DECON_ORACLE = REGISTRY["decontaminate_against_eval"].oracle

# Contamination-closure depth: a contaminated doc's near-dups (hop 1) and
# THEIR near-dups (hop 2) are pulled; shared by the registered radius lane
# and the corpus-build capstone so the two sweeps can't disagree.
CONTAM_HOPS = 2


@register(
    "graph_contamination_radius",
    oracle=f"""
    WITH RECURSIVE decon AS ({_DECON_ORACLE}),
    pairs AS ({MINHASH_PAIRS_ORACLE}),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    walk(id, hops) AS (
        SELECT doc_id, 0 FROM decon WHERE contaminated
        UNION ALL
        SELECT e.v, w.hops + 1
        FROM walk w JOIN edges e ON e.u = w.id
        WHERE w.hops < {CONTAM_HOPS}
    )
    SELECT id AS doc_id, CAST(MIN(hops) AS BIGINT) AS hops
    FROM walk GROUP BY id
    """,
    tags=("llm", "dedup", "graph", "decontamination"),
)
def graph_contamination_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination sweep's second pass: eval-contaminated train
    docs (decontaminate_against_eval's verdicts — composed, not
    re-stated) PLUS every document within 2 near-dup hops of one. An
    n-gram screen only catches docs that share literal windows with the
    eval set; a near-duplicate of a contaminated doc carries the same
    leaked content with the overlapping window mutated away, and this
    closure is the standard fix (drop the whole similarity neighborhood,
    not just the textual hit). On the sf0.01 corpus: 5 seeds + 4
    hop-1 docs the screen alone misses.

    Scale: decon seeds are an equi-join of gram hashes (broadcast-able
    eval side), the radius is bfs_hops over the LSH pair graph —
    (id, hop) state, two unrolled equi-join rounds."""
    decon = REGISTRY["decontaminate_against_eval"].builder(spark, sf_dir)
    seeds = decon.where(F.col("contaminated")).select("doc_id")
    pairs = dedup_minhash_lsh(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    return bfs_hops(seeds, edges, CONTAM_HOPS)


_QUALITY_ORACLE = REGISTRY["text_quality_score"].oracle


@register(
    "dedup_canonical_by_quality",
    oracle=f"""
    WITH RECURSIVE pairs AS ({MINHASH_PAIRS_ORACLE}),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(id, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.id
    ),
    assign AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    qual AS ({_QUALITY_ORACLE}),
    ranked AS (
        SELECT a.cluster_id, a.doc_id, q.passes_quality, q.n_tokens,
               row_number() OVER (PARTITION BY a.cluster_id
                   ORDER BY q.passes_quality DESC, q.n_tokens DESC, a.doc_id ASC)
                   AS rn,
               COUNT(*) OVER (PARTITION BY a.cluster_id) AS n_members
        FROM assign a JOIN qual q USING (doc_id)
    )
    SELECT cluster_id, doc_id AS canonical_doc_id,
           CAST(n_members AS BIGINT) AS n_members,
           passes_quality AS canonical_passes,
           CAST(n_tokens AS BIGINT) AS canonical_n_tokens
    FROM ranked WHERE rn = 1 AND n_members > 1
    """,
    tags=("llm", "dedup", "graph", "curation"),
)
def dedup_canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection per duplicate cluster: the
    survivor of each non-trivial near-dup cluster is the member that
    passes the quality gate with the most tokens (tie-break doc_id) —
    the production dedup rule, versus dedup_cluster_assign's keep-min-id
    convention, which can keep a truncated or boilerplate copy while
    dropping the full document. Quality verdicts are
    text_quality_score's own (oracle composed, no drift).

    Determinism: rank keys are a boolean, an integer token count, and
    the id — no doubles in the ordering, so ties can't split on ulps.

    Scale: cluster assignment is the star-contraction CC (edges-only
    state); the rank is one window over cluster members — graph-sized,
    not corpus-sized; quality joins by doc id."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    assign = connected_components(edges).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    qual = REGISTRY["text_quality_score"].builder(spark, sf_dir).select(
        "doc_id", "passes_quality", "n_tokens"
    )
    wrank = Window.partitionBy("cluster_id").orderBy(
        F.col("passes_quality").desc(), F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    wcnt = Window.partitionBy("cluster_id")
    ranked = (
        assign.join(qual, "doc_id")
        .withColumn("rn", F.row_number().over(wrank))
        .withColumn("n_members", F.count("*").over(wcnt))
    )
    return ranked.where((F.col("rn") == 1) & (F.col("n_members") > 1)).select(
        "cluster_id",
        F.col("doc_id").alias("canonical_doc_id"),
        F.col("n_members").cast("long").alias("n_members"),
        F.col("passes_quality").alias("canonical_passes"),
        F.col("n_tokens").cast("long").alias("canonical_n_tokens"),
    )
