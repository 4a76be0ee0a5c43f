"""Similarity search over the `embeddings` table (north-star X2):
exact cosine top-k (the oracle-checkable baseline), LSH-bucketed ANN, and
IVF (inverted-file) search — the two scale paths. SURVEY.md §2.9.

Embeddings are unit-L2 (verified in tests), so cosine ≡ dot product.
Vectors stay `array<float>` end-to-end; math happens in double via native
higher-order functions — no UDF on the hot path.

Every query here carries a full DuckDB oracle (VERDICT r03 item 4
promoted the two ANN paths from rows-only):

- `similarity_ann_lsh`'s hash family is a set of PLANE LITERALS seeded at
  module import, not engine-internal state — so the oracle recomputes the
  exact same buckets/candidates/re-rank in SQL and the whole ANN output
  is value-checked, not just its recall.
- `similarity_ann_ivf` is EXACT IVF: centroid probing plus a
  triangle-inequality bound-expansion pass guarantees the true top-k
  (recall 1.0 by construction), so it shares `similarity_topk`'s oracle.
- `dedup_embedding_cosine` prunes with the same centroid bounds and keyed
  equi-joins on cell ids — no CartesianProduct in the plan.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..data import load_table, spread
from ..registry import query
from .linalg import dot

TOPK = 5
QUERY_MOD = 25  # deterministic query subset: vec_id % 25 == 0

DIM = 64
LSH_TABLES, LSH_PLANES = 4, 4

# The random-hyperplane family is data-independent and fixed at import:
# the SAME doubles become Spark literals and DuckDB array literals, so
# both engines compute identical projections (ordered sequential dot).
_rng = random.Random(42)
PLANES: list[list[list[float]]] = [
    [[_rng.gauss(0, 1) for _ in range(DIM)] for _ in range(LSH_PLANES)]
    for _ in range(LSH_TABLES)
]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


_EXACT_TOPK_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               list_dot_product(q.v, e.v) AS cos
        FROM q JOIN e ON q.vec_id <> e.vec_id),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored)
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk,
           ROUND(cos, 6) AS cos
    FROM ranked WHERE rnk <= {TOPK}
    """


@query("similarity_topk", oracle=_EXACT_TOPK_ORACLE)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 baseline: exact brute-force cosine top-k for a deterministic
    query subset. The query side is broadcast (it's k·dim doubles), so the
    corpus is scanned once with no shuffle until the per-query top-k
    window — the right exact-search shape at any corpus size; what does
    NOT scale is taking every vector as a query, which is why the ANN
    variants below exist."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 6).alias("cos"))
    )


def _kmeans_cells(e: DataFrame, n_cells: int):
    """Seeded KMeans cells + per-cell metadata for triangle-inequality
    pruning. Returns (assigned, meta) where assigned = (vec_id, v, cell)
    persisted and meta = list of (cell, center, radius): radius is the max
    distance from the centroid to any member, the quantity every bound
    below leans on. Collecting meta is O(n_cells) rows — the same
    driver-size class as the block-offset rank scheme, not a data
    collect. The OUTPUT of every caller is exact regardless of clustering
    quality; cells only steer pruning."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fe = e.withColumn("fv", array_to_vector(F.col("v")))
    km = KMeans(k=n_cells, seed=42, featuresCol="fv", predictionCol="cell")
    model = km.fit(fe)
    assigned = model.transform(fe).select("vec_id", "v", "cell").persist()

    centers = [list(map(float, c)) for c in model.clusterCenters()]
    centers_df = assigned.sparkSession.createDataFrame(
        [(ci, vec) for ci, vec in enumerate(centers)], "cell int, cv array<double>"
    )
    # ||x - c||^2 = ||x||^2 - 2 x·c + ||c||^2 ; x unit-norm
    cnorm2 = {ci: sum(x * x for x in vec) for ci, vec in enumerate(centers)}
    cn_df = assigned.sparkSession.createDataFrame(
        [(ci, n2) for ci, n2 in cnorm2.items()], "cell int, cnorm2 double"
    )
    radii_rows = (
        assigned.join(F.broadcast(centers_df), "cell")
        .join(F.broadcast(cn_df), "cell")
        .select(
            "cell",
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    F.lit(1.0) - 2.0 * dot(F.col("v"), F.col("cv")) + F.col("cnorm2"),
                )
            ).alias("d"),
        )
        .groupBy("cell")
        .agg(F.max("d").alias("radius"))
        .collect()
    )
    radius = {r["cell"]: float(r["radius"]) for r in radii_rows}
    meta = [(ci, centers[ci], radius.get(ci, 0.0)) for ci in range(len(centers))]
    return assigned, meta


def _plane_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"


def _bucket_sql(planes: list[list[float]]) -> str:
    terms = [
        f"(CASE WHEN list_dot_product(v, {_plane_sql(p)}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return " + ".join(terms)


_LSH_EB_SQL = "\n        UNION ALL ".join(
    f"SELECT vec_id, v, {t} AS tbl, {_bucket_sql(planes)} AS bucket FROM e"
    for t, planes in enumerate(PLANES)
)

_LSH_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    eb AS (
        {_LSH_EB_SQL}),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
        FROM eb q JOIN eb c ON q.tbl = c.tbl AND q.bucket = c.bucket
        WHERE q.vec_id % {QUERY_MOD} = 0 AND c.vec_id <> q.vec_id),
    scored AS (
        SELECT cand.query_id, cand.vec_id AS neighbor_id,
               list_dot_product(qe.v, ce.v) AS cos
        FROM cand
        JOIN e qe ON qe.vec_id = cand.query_id
        JOIN e ce ON ce.vec_id = cand.vec_id),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored)
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk,
           ROUND(cos, 6) AS cos
    FROM ranked WHERE rnk <= {TOPK}
    """


@query("similarity_ann_lsh", oracle=_LSH_ORACLE)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 scale path A: multi-table random-hyperplane LSH ({LSH_TABLES}
    tables × {LSH_PLANES} planes). Each vector gets one sign-bucket per
    table; a pair is a candidate if it collides in ANY table (union ≈ the
    OR-construction that drives recall up); exact cosine re-ranks
    candidates. All JVM expressions — the projection matrix is a literal
    folded into the plan, and because the hash family is those literals
    (module-level `PLANES`, seed 42) rather than engine state, the DuckDB
    oracle recomputes the identical buckets/candidates/re-rank: the full
    ANN output is value-checked, not merely row-counted. Recall quality is
    a separate, fixture-tested claim: ≥0.8 vs exact top-k on clustered
    data (tests/test_dedup_similarity.py); on THIS near-random testdata
    recall@5 ≈ 0.4-0.5 — the honest LSH floor when neighbors sit barely
    above the cos≈0.35 noise, tunable with more tables/planes."""
    e = _emb(spark, sf_dir)

    def bucket_of(vcol, planes):
        # per plane: sign(v·w) via zip_with+aggregate against an array
        # LITERAL — one plan node per plane instead of 64 inline terms,
        # so codegen stays shallow at any dim
        b = F.lit(0)
        for p_i, plane in enumerate(planes):
            w_arr = F.array(*[F.lit(x) for x in plane])
            proj = dot(vcol, w_arr)
            b = b + F.when(proj > 0, F.lit(1 << p_i)).otherwise(0)
        return b

    # (vec_id, table, bucket): one row per table — the OR-construction
    eb = e.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        bucket_of(F.col("v"), planes).alias("bucket"),
                    )
                    for t, planes in enumerate(PLANES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "v", "tb.tbl", "tb.bucket").persist()
    q_ids = eb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    # candidate pairs as IDS ONLY (dedupe before touching vectors — a
    # distinct over rows carrying the arrays would shuffle the payloads)
    cand_ids = (
        eb.select("vec_id", "tbl", "bucket")
        .join(F.broadcast(q_ids), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        cand_ids.join(e, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 6).alias("cos"))
    )


@query("similarity_ann_ivf", oracle=_EXACT_TOPK_ORACLE)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 scale path B, promoted to EXACT IVF (VERDICT r03 item 4):
    KMeans-partition the corpus (seeded), probe the nProbe closest
    centroids per query to get a candidate k-th score s_k, then a
    triangle-inequality bound-expansion pass scans every remaining cell
    whose upper bound q·c_i + r_i could still beat s_k. For unit vectors
    cos(q,x) ≤ q·c_i + ||x−c_i|| ≤ q·c_i + r_i, so any vector outside the
    scanned cells provably scores below the returned k-th value — recall
    is 1.0 by construction and the query shares `similarity_topk`'s exact
    oracle (the hash-equality promotion `dedup_minhash_verified`
    demonstrated). On clustered production data the expansion pass prunes
    most cells (tight radii); on this near-random fixture radii are wide
    and it degenerates to a full scan — the measured, documented price of
    exactness, paid through keyed equi-joins either way. At 100 TB the
    cell is also the file-partition unit, so pruned cells are pruned
    parquet partitions."""
    n_cells, n_probe = 16, 4
    e = _emb(spark, sf_dir)
    assigned, meta = _kmeans_cells(e, n_cells)
    sess = assigned.sparkSession
    cells_df = sess.createDataFrame(
        [(ci, vec, r) for ci, vec, r in meta],
        "cell int, cv array<double>, radius double",
    )
    q = assigned.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # per-(query, cell) upper bound: best possible cosine inside the cell
    bounds = q.crossJoin(F.broadcast(cells_df)).select(
        "query_id",
        "qv",
        "cell",
        (dot(F.col("qv"), F.col("cv")) + F.col("radius")).alias("ub"),
        dot(F.col("qv"), F.col("cv")).alias("cdist"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("cdist").desc(), F.col("cell"))
    probes = (
        bounds.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    probe_scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    wr = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    sk = (
        probe_scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOPK)
        .groupBy("query_id")
        .agg(F.min("cos").alias("sk_raw"), F.count("*").alias("n_cand"))
        .select(
            "query_id",
            F.when(F.col("n_cand") < TOPK, F.lit(-2.0))
            .otherwise(F.col("sk_raw"))
            .alias("sk"),
        )
    )
    # expansion: scan every cell that could still hold a >= s_k vector
    # (inclusive >= keeps boundary ties exact)
    expand = (
        bounds.join(F.broadcast(sk), "query_id")
        .filter(F.col("ub") >= F.col("sk"))
        .select("query_id", "qv", "cell")
    )
    scored = (
        assigned.join(F.broadcast(expand), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 6).alias("cos"))
    )


DEDUP_COS_THRESHOLD = 0.4
# cos >= t  <=>  ||a-b|| <= sqrt(2-2t) for unit vectors
_DEDUP_DIST = (2.0 - 2.0 * DEDUP_COS_THRESHOLD) ** 0.5


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.v, b.v), 6) AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) >= {DEDUP_COS_THRESHOLD}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.4), bucketed
    EXACT plan (VERDICT r03 item 3 — replaces the declared O(n²) cross
    join): KMeans cells + a centroid-distance allowlist of cell pairs.
    A qualifying pair has ||a−b|| ≤ sqrt(2−2t), and by the triangle
    inequality dist(a,b) ≥ ||c_i−c_j|| − r_i − r_j, so cell pairs whose
    centroids sit further apart than the threshold plus both radii can
    never produce a pair and are pruned BEFORE any vector comparison. The
    allowlist is O(cells²) rows computed driver-side from the collected
    centroid metadata and broadcast; vectors meet only through keyed
    equi-joins on cell ids — no CartesianProduct / NestedLoop anywhere in
    the plan (engine-wide audit now covers this query too). On clustered
    production embeddings most cell pairs prune; on this near-random
    fixture radii are wide so the allowlist stays dense — same exact
    output, measured and documented. At 1000 executors the cell id is the
    shuffle key; skew across mega-cells is handled by raising n_cells (or
    salting within a cell), not by changing the plan shape."""
    n_cells = 16
    e = _emb(spark, sf_dir)
    assigned, meta = _kmeans_cells(e, n_cells)

    def _dist(c1: list[float], c2: list[float]) -> float:
        return sum((x - y) ** 2 for x, y in zip(c1, c2)) ** 0.5

    # ordered cell-pair allowlist, both (i,j) and (j,i) for i != j: the
    # vec_a < vec_b filter dedups pairs that straddle two cells
    allowed = [
        (ci, cj)
        for ci, cveci, ri in meta
        for cj, cvecj, rj in meta
        if _dist(cveci, cvecj) - ri - rj <= _DEDUP_DIST + 1e-9
    ]
    allowed_df = assigned.sparkSession.createDataFrame(
        allowed, "cell_a int, cell_b int"
    )
    a = assigned.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("cell").alias("cell_a"),
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("cell").alias("cell_b"),
    )
    cos = dot(F.col("va"), F.col("vb"))
    return (
        a.join(F.broadcast(allowed_df), "cell_a")
        .join(b, "cell_b")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= DEDUP_COS_THRESHOLD)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
    )
