"""Similarity search over the `embeddings` table (north-star X2):
exact cosine top-k (the oracle-checkable baseline), LSH-bucketed ANN, and
IVF (inverted-file) ANN — the two scale paths. SURVEY.md §2.9.

Embeddings are unit-L2 (verified in tests), so cosine ≡ dot product.
Vectors stay `array<float>` end-to-end; math happens in double via native
higher-order functions — no UDF on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..data import load_table, spread
from ..registry import query
from .linalg import dot

TOPK = 5
QUERY_MOD = 25  # deterministic query subset: vec_id % 25 == 0


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


@query(
    "similarity_topk",
    oracle=f"""
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
    """,
)
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


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.v, b.v), 6) AS cos
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.4). Declared as
    the exact O(n²) form for oracle verification; the scale path is
    `similarity_ann_lsh`-style bucketing first, exact cosine only within
    buckets."""
    e = _emb(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    cos = dot(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= 0.4)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
    )


@query("similarity_ann_lsh")  # no oracle: LSH hash family is engine-specific
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 scale path A: multi-table random-hyperplane LSH (4 tables × 4
    planes). Each vector gets one sign-bucket per table; a pair is a
    candidate if it collides in ANY table (union ≈ the OR-construction
    that drives recall up); exact cosine re-ranks candidates. All JVM
    expressions — the projection matrix is a literal folded into the plan.
    Recall ≥0.8 vs exact top-k is asserted on a clustered fixture in
    tests/test_dedup_similarity.py; tune tables/planes for the
    recall-vs-candidates trade."""
    import random

    rng = random.Random(42)
    dim, n_tables, n_planes = 64, 4, 4
    tables = [
        [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]
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
                    for t, planes in enumerate(tables)
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


@query("similarity_ann_ivf")  # no oracle: kmeans assignment is engine-specific
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 scale path B: IVF — KMeans-partition the corpus (seeded), probe
    the nProbe closest centroids per query, exact cosine within probed
    cells only. The centroid table is tiny and broadcast; corpus cells are
    the unit of pruning (at 100 TB, also the unit of file partitioning, so
    probing prunes parquet partitions)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    n_cells, n_probe = 16, 4
    e = _emb(spark, sf_dir).withColumn("fv", array_to_vector(F.col("v")))
    km = KMeans(k=n_cells, seed=42, featuresCol="fv", predictionCol="cell")
    model = km.fit(e)
    assigned = model.transform(e).select("vec_id", "v", "cell").persist()

    centers = [list(map(float, c)) for c in model.clusterCenters()]
    centers_df = assigned.sparkSession.createDataFrame(
        [(ci, vec) for ci, vec in enumerate(centers)], "cell int, cv array<double>"
    )
    q = assigned.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # probe the n_probe nearest cells per query
    qc = q.crossJoin(F.broadcast(centers_df)).withColumn(
        "cdist", dot(F.col("qv"), F.col("cv"))
    )
    wq = W.partitionBy("query_id").orderBy(F.col("cdist").desc(), F.col("cell"))
    probes = (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    cand = assigned.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), dot(F.col("qv"), F.col("v")).alias("cos")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 6).alias("cos"))
    )
