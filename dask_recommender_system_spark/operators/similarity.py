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
    # Few, cheap iterations (r08, guide §1.2): every caller's OUTPUT is
    # exact by construction whatever the clustering quality (cells only
    # steer triangle-inequality pruning), so the default 20 Lloyd
    # iterations + multi-round k-means|| init bought ~25 driver-visible
    # jobs of pruning quality nothing downstream needs — on the
    # near-random fixture radii are wide either way (both docstrings
    # already documented the degenerate case). Seeded random init + 4
    # iterations keeps assignment deterministic.
    km = KMeans(
        k=n_cells,
        seed=42,
        maxIter=4,
        initMode="random",
        featuresCol="fv",
        predictionCol="cell",
    )
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
    salting within a cell), not by changing the plan shape.

    r08 addition — EXACT-DUP COLLAPSE BEFORE PAIRING: real corpora (and
    the 30x sweep's verbatim-replicated vectors) carry bit-identical
    embedding clumps, and a clump of size m contributes C(m,2) pairs to
    every bucket it lands in — the one blowup no metric pruning can cut
    (the 30x sweep measured a single straggler task grinding ~900x pair
    volume). Identical vectors need no search to pair, so the plan
    groups by the raw vector first, runs the cell-pruned near-dup
    search over DISTINCT vectors only, then expands each qualifying
    group pair (and each group's internal clique) in-row from the
    grouped id arrays. Output is bit-identical (cos of any member pair
    equals cos of the reps — the bits are the same); search work drops
    from O(n²) to O(distinct²) + output size. This is the standard
    production ladder: dedup_exact -> near-dup, fused into one plan."""
    n_cells = 16
    e = _emb(spark, sf_dir)
    groups = e.groupBy("v").agg(
        F.min("vec_id").alias("rep_id"),
        F.sort_array(F.collect_list("vec_id")).alias("ids"),
    )
    reps = groups.select(F.col("rep_id").alias("vec_id"), "v")
    # intra-group cliques: identical vectors pair iff self-dot >= T
    # (vectors are near-unit but the self-dot is computed, not assumed)
    intra = (
        groups.filter(F.size("ids") >= 2)
        .withColumn("cos", dot(F.col("v"), F.col("v")))
        .filter(F.col("cos") >= DEDUP_COS_THRESHOLD)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i+2, size(ids)), "
                    "y -> struct(x AS vec_a, y AS vec_b))))"
                )
            ).alias("p"),
            "cos",
        )
        .select("p.vec_a", "p.vec_b", F.round("cos", 6).alias("cos"))
    )
    assigned, meta = _kmeans_cells(reps, n_cells)

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
    rep_pairs = (
        a.join(F.broadcast(allowed_df), "cell_a")
        .join(b, "cell_b")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= DEDUP_COS_THRESHOLD)
        .select("vec_a", "vec_b", "cos")
    )
    # cross-group expansion: every member of group a pairs with every
    # member of group b at the reps' cos; in-row nested transform keeps
    # the expansion output-proportional (arrays are dup-clump-sized)
    cross = (
        rep_pairs.join(
            groups.select(
                F.col("rep_id").alias("vec_a"), F.col("ids").alias("ids_a")
            ),
            "vec_a",
        )
        .join(
            groups.select(
                F.col("rep_id").alias("vec_b"), F.col("ids").alias("ids_b")
            ),
            "vec_b",
        )
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids_a, x -> transform(ids_b, "
                    "y -> struct(least(x, y) AS vec_a, "
                    "greatest(x, y) AS vec_b))))"
                )
            ).alias("p"),
            "cos",
        )
        .select("p.vec_a", "p.vec_b", F.round("cos", 6).alias("cos"))
    )
    return cross.unionByName(intra)

# 16 subspaces x 16 centroids x 4 dims, Lloyd-trained on the 500-vector
# corpus sample (deterministic index-spread init, 60 iters, round 4dp).
PQR_BOOK = [
    [
        [0.0371, 0.0442, 0.0276, -0.2025],
        [-0.0199, -0.1098, 0.087, 0.1582],
        [-0.0009, 0.0144, -0.0736, 0.074],
        [-0.1272, -0.0449, -0.1467, -0.0995],
        [-0.1616, -0.1157, 0.0345, -0.0404],
        [0.1807, -0.0703, -0.0324, 0.0908],
        [0.1375, 0.0127, -0.0094, -0.08],
        [0.0832, 0.1348, -0.2182, -0.0021],
        [0.0954, -0.1799, 0.0546, -0.0567],
        [0.0995, 0.0853, 0.1738, 0.0159],
        [-0.1009, 0.1094, -0.0098, -0.1116],
        [-0.0549, -0.0155, 0.1689, -0.0514],
        [0.105, 0.0943, -0.0049, 0.1722],
        [0.0648, -0.1382, -0.1594, -0.0242],
        [-0.0529, 0.2236, 0.0659, 0.033],
        [-0.1603, 0.0264, -0.0423, 0.1562],
    ],
    [
        [0.1695, -0.113, -0.1469, 0.0044],
        [-0.1609, -0.1572, 0.0065, -0.0053],
        [-0.0335, -0.0631, 0.2054, 0.0331],
        [0.1391, 0.0867, 0.0852, -0.1135],
        [-0.0817, 0.0709, 0.0099, 0.1783],
        [-0.0571, -0.0385, -0.1693, 0.0945],
        [-0.196, 0.0734, -0.049, -0.0254],
        [-0.012, -0.0008, -0.0229, 0.0008],
        [0.0169, 0.1054, -0.2245, -0.0907],
        [0.0124, -0.049, -0.0124, -0.2031],
        [-0.065, 0.1768, 0.0027, -0.0508],
        [0.1303, -0.1227, 0.0552, 0.0558],
        [0.1279, 0.135, -0.1201, 0.0818],
        [0.1067, 0.043, 0.0195, 0.2058],
        [0.0387, 0.1935, 0.1613, 0.0423],
        [0.0301, -0.1964, -0.0128, 0.2068],
    ],
    [
        [0.1924, 0.0746, -0.0072, -0.0276],
        [-0.1175, -0.1916, 0.0121, 0.12],
        [-0.0526, -0.1885, 0.0186, -0.1044],
        [0.0953, -0.1539, 0.0019, 0.0577],
        [0.0131, 0.2208, 0.039, 0.0486],
        [-0.0487, 0.2492, -0.0747, -0.0587],
        [-0.1116, 0.0014, 0.1122, -0.0665],
        [-0.0285, 0.0787, 0.0432, 0.2626],
        [-0.039, 0.0389, -0.0414, -0.2102],
        [0.0474, 0.0309, 0.1588, 0.0362],
        [0.0626, 0.0083, -0.1258, 0.1027],
        [-0.1169, -0.0915, -0.1556, 0.0226],
        [0.08, -0.0808, -0.1028, -0.0833],
        [0.0996, -0.1046, 0.1709, -0.1286],
        [-0.1706, 0.044, 0.1576, 0.106],
        [-0.1259, 0.1024, -0.0976, 0.0849],
    ],
    [
        [-0.2036, -0.0723, 0.0607, -0.0418],
        [0.177, -0.0248, 0.1566, -0.0946],
        [-0.0665, 0.0125, -0.1565, 0.1681],
        [-0.0589, 0.0337, -0.034, 0.0139],
        [-0.0423, 0.085, 0.174, 0.1007],
        [0.0352, -0.1929, 0.0767, -0.023],
        [-0.0912, 0.011, -0.1694, -0.15],
        [-0.0711, -0.1717, -0.1318, 0.0026],
        [0.1528, -0.0818, -0.0338, 0.0407],
        [0.1818, 0.1368, 0.0177, 0.119],
        [0.0912, 0.0032, -0.159, -0.0126],
        [-0.128, 0.1993, 0.0162, -0.0819],
        [-0.0386, -0.0534, 0.058, -0.1948],
        [0.0338, -0.0591, 0.0378, 0.1555],
        [0.0196, 0.2129, -0.0451, 0.0725],
        [0.0488, 0.1023, 0.0578, -0.0963],
    ],
    [
        [0.0092, 0.1139, 0.0353, 0.1369],
        [-0.0986, -0.1819, 0.0167, -0.0359],
        [0.0557, -0.0475, -0.1013, -0.1487],
        [0.0447, -0.04, -0.0561, 0.0483],
        [0.018, 0.0638, 0.0889, -0.1348],
        [0.2079, 0.0742, -0.0302, -0.0604],
        [-0.1303, -0.0572, -0.0331, 0.1461],
        [-0.0052, 0.2388, 0.0025, -0.1061],
        [0.1128, 0.0257, 0.1933, 0.1057],
        [-0.1755, 0.0423, 0.0789, -0.0561],
        [-0.0177, -0.0926, 0.1562, 0.0314],
        [0.0633, -0.1784, -0.1567, 0.0807],
        [-0.1159, 0.1194, -0.0964, 0.0226],
        [0.1806, -0.1364, 0.0344, -0.0588],
        [-0.1507, -0.1728, -0.1797, -0.0782],
        [0.066, 0.0662, -0.1921, 0.1045],
    ],
    [
        [-0.0351, -0.1628, 0.0958, -0.1217],
        [0.1258, 0.0268, 0.1356, -0.1582],
        [-0.1391, 0.0713, -0.1113, -0.0924],
        [-0.1045, -0.0864, -0.0812, -0.0665],
        [0.1113, 0.0659, -0.1338, 0.0359],
        [0.0915, 0.0521, -0.0825, 0.2588],
        [0.0812, 0.1258, 0.1207, 0.0653],
        [0.118, 0.0019, -0.0785, -0.1678],
        [-0.006, 0.0286, 0.0144, -0.0162],
        [-0.0398, 0.2065, -0.0368, 0.0989],
        [-0.081, 0.1198, 0.1109, -0.1643],
        [0.0907, -0.0866, 0.1126, 0.0891],
        [-0.1433, 0.0824, 0.0956, 0.1749],
        [-0.1778, -0.0756, -0.0569, 0.1854],
        [0.0668, -0.14, -0.0892, 0.0446],
        [-0.1162, -0.0899, 0.0986, 0.0392],
    ],
    [
        [-0.058, 0.2203, 0.0833, -0.0531],
        [-0.2022, 0.0908, 0.0091, 0.064],
        [-0.0207, -0.0262, -0.1494, -0.1296],
        [0.0816, -0.1028, 0.1037, 0.1228],
        [0.046, -0.0887, -0.1194, 0.1926],
        [-0.0374, -0.0211, -0.1723, 0.068],
        [0.1486, 0.1229, 0.036, -0.1463],
        [-0.1391, -0.1119, -0.0394, 0.0535],
        [-0.1375, -0.0168, -0.004, -0.1922],
        [-0.0581, 0.1631, -0.1287, 0.0235],
        [0.1789, 0.0526, -0.0937, 0.109],
        [0.1162, 0.1736, 0.0968, 0.0579],
        [-0.0526, -0.0053, 0.1868, -0.0395],
        [0.0506, -0.1655, 0.039, -0.0547],
        [-0.0665, 0.0149, 0.0879, 0.2285],
        [0.0797, 0.0253, -0.0522, -0.0159],
    ],
    [
        [0.0865, 0.1256, 0.0416, 0.197],
        [0.0458, -0.0608, 0.1126, -0.2045],
        [0.0011, -0.1313, 0.0928, 0.1508],
        [-0.0678, -0.0793, -0.091, 0.1473],
        [-0.2142, -0.0606, -0.0081, -0.0818],
        [-0.1193, 0.1049, 0.0532, 0.1033],
        [-0.1168, 0.0755, 0.061, -0.1127],
        [-0.0018, 0.0259, 0.2016, -0.0035],
        [0.0242, -0.0943, 0.0145, -0.0401],
        [0.0882, 0.1561, 0.0572, -0.0967],
        [-0.1105, 0.0129, -0.2006, -0.0143],
        [0.0525, 0.0297, -0.0531, 0.0584],
        [0.0992, -0.016, -0.1323, -0.1597],
        [-0.0097, -0.2832, 0.0398, -0.0643],
        [0.2044, -0.0585, -0.0, 0.0059],
        [0.0017, 0.2071, -0.0987, 0.0142],
    ],
    [
        [-0.2428, -0.1221, -0.0037, 0.0583],
        [-0.0631, 0.0285, -0.0683, 0.1448],
        [-0.0937, -0.0676, -0.1059, -0.1416],
        [0.1361, 0.0703, -0.0964, 0.0978],
        [0.1098, -0.1129, 0.0357, -0.0018],
        [-0.1424, 0.1327, -0.0815, -0.0374],
        [-0.0374, -0.0813, 0.0978, 0.0815],
        [0.0643, 0.0927, 0.1525, 0.1372],
        [0.0043, -0.0248, 0.2374, -0.0967],
        [0.0433, -0.1596, -0.1419, -0.0307],
        [-0.1346, -0.0284, 0.0625, -0.1431],
        [0.0307, 0.3277, 0.0221, 0.0271],
        [0.009, 0.0488, -0.0327, -0.0592],
        [0.0613, -0.0823, -0.0237, 0.2384],
        [0.1394, -0.0644, 0.0219, -0.205],
        [0.1321, 0.1496, 0.0402, -0.0604],
    ],
    [
        [0.0224, -0.002, -0.0154, 0.0805],
        [0.0532, 0.0335, -0.1985, -0.0614],
        [0.0154, -0.0099, 0.1907, -0.179],
        [0.0345, 0.0853, 0.1573, 0.0725],
        [-0.1547, -0.0188, -0.0414, -0.3063],
        [-0.1893, -0.0765, 0.134, 0.0112],
        [-0.1267, 0.0995, -0.0787, 0.0019],
        [-0.0247, -0.1129, -0.0346, -0.1106],
        [0.0795, 0.2283, -0.0104, -0.099],
        [0.1586, 0.0964, -0.0662, 0.1332],
        [0.168, -0.0074, 0.0452, -0.0547],
        [-0.0032, -0.1236, 0.1071, 0.0833],
        [-0.1586, 0.1072, 0.0302, -0.1079],
        [-0.0598, -0.1353, -0.1337, 0.1491],
        [0.1341, -0.1934, -0.0769, 0.0284],
        [-0.0839, 0.1509, -0.0209, 0.1856],
    ],
    [
        [-0.0079, -0.1026, -0.1783, -0.035],
        [-0.044, -0.0807, -0.013, -0.2048],
        [0.1415, -0.0791, 0.0964, -0.0879],
        [0.1162, 0.0188, -0.0549, 0.1973],
        [0.0791, -0.0138, 0.1114, 0.1319],
        [-0.0477, -0.2006, 0.1158, -0.0415],
        [0.0373, 0.1104, 0.2147, -0.0276],
        [-0.0337, 0.1023, -0.129, 0.0618],
        [-0.0549, 0.0385, 0.0267, -0.0208],
        [0.0517, 0.0334, -0.0834, -0.2216],
        [-0.0843, 0.2221, -0.0157, -0.0797],
        [0.1039, -0.1534, -0.0194, 0.0286],
        [-0.1624, -0.0403, 0.1248, 0.0869],
        [0.1733, 0.1088, -0.0594, -0.0665],
        [-0.0732, -0.1238, -0.0723, 0.1672],
        [-0.1916, -0.0225, -0.0785, -0.0304],
    ],
    [
        [-0.0322, 0.1282, -0.0408, -0.1577],
        [0.137, -0.0098, 0.1339, 0.0309],
        [0.0927, 0.1998, 0.0386, 0.0079],
        [0.0177, 0.0238, -0.0347, 0.0543],
        [-0.1122, -0.1091, -0.1645, -0.071],
        [-0.1318, 0.0148, 0.1122, 0.0711],
        [-0.1132, 0.067, 0.1862, -0.1762],
        [0.109, -0.0421, -0.1615, 0.1398],
        [-0.0779, 0.067, -0.1372, 0.2163],
        [0.0347, 0.1364, 0.0765, 0.1559],
        [0.0247, -0.0614, 0.0219, -0.2475],
        [-0.0723, -0.1013, 0.0421, -0.0769],
        [-0.0217, -0.1677, -0.0337, 0.1668],
        [0.0734, -0.1868, 0.0345, -0.0373],
        [0.1442, 0.0561, -0.1203, -0.043],
        [-0.1642, 0.0719, -0.088, 0.0067],
    ],
    [
        [0.2068, -0.0755, -0.1001, 0.1756],
        [-0.1239, -0.1629, 0.1069, -0.035],
        [-0.1793, -0.0068, 0.0296, 0.136],
        [-0.1517, -0.0256, -0.0443, -0.0835],
        [0.1412, 0.0619, 0.0527, -0.0284],
        [0.1504, -0.1562, 0.0703, -0.0763],
        [-0.0366, 0.1237, 0.1451, 0.0992],
        [0.0207, -0.0507, 0.1105, 0.05],
        [0.0688, 0.055, -0.0536, -0.2234],
        [-0.1072, 0.1023, -0.1327, 0.0106],
        [-0.0043, 0.0138, -0.0786, 0.1609],
        [0.0563, -0.0053, -0.1226, -0.0543],
        [-0.0554, 0.065, 0.1384, -0.1565],
        [-0.0226, -0.2032, -0.0943, -0.0121],
        [0.0425, 0.2076, 0.0619, -0.0245],
        [0.0048, -0.1657, 0.246, 0.1304],
    ],
    [
        [0.0639, -0.0799, 0.0909, 0.1366],
        [0.0294, 0.0047, 0.0009, -0.0209],
        [0.2024, 0.0051, 0.0763, -0.0373],
        [-0.0554, 0.1079, 0.0457, -0.1422],
        [-0.2321, -0.0469, -0.0102, -0.0221],
        [-0.0251, 0.0945, -0.1683, -0.0574],
        [-0.0341, -0.0179, -0.1127, 0.157],
        [0.1607, 0.0437, -0.1301, 0.0258],
        [0.0389, 0.0855, 0.1652, -0.035],
        [0.0879, -0.1346, 0.121, -0.1307],
        [-0.067, -0.1571, -0.0456, -0.0931],
        [0.06, 0.1864, 0.0246, 0.0655],
        [0.092, -0.1465, -0.1062, 0.0059],
        [-0.0653, 0.0563, -0.1506, -0.2167],
        [-0.1277, 0.0936, 0.0532, 0.1082],
        [-0.1394, -0.0004, 0.2103, -0.0009],
    ],
    [
        [0.0738, 0.0162, -0.0523, -0.1782],
        [0.1618, 0.0058, 0.1246, -0.0008],
        [-0.1944, 0.041, 0.0795, -0.0033],
        [-0.0309, 0.2056, -0.1718, -0.0621],
        [0.0679, -0.1341, -0.0644, 0.0687],
        [0.0506, 0.1496, 0.0616, -0.0579],
        [-0.0086, -0.1565, 0.1043, 0.0152],
        [-0.0422, 0.0668, 0.0836, 0.1723],
        [-0.0398, 0.0159, 0.2132, -0.0562],
        [-0.1216, -0.1162, -0.0208, -0.0663],
        [0.103, -0.1029, 0.0311, 0.1989],
        [0.0595, -0.2038, -0.0081, -0.1262],
        [0.1566, 0.0358, -0.0746, 0.0605],
        [-0.1277, 0.0316, -0.0258, -0.1671],
        [-0.0042, -0.0943, -0.2165, -0.0264],
        [-0.0704, 0.0152, -0.1046, 0.0941],
    ],
    [
        [-0.1086, -0.0596, 0.0642, -0.2235],
        [-0.1376, -0.137, -0.1261, -0.0536],
        [0.0747, -0.0726, 0.1311, 0.0971],
        [-0.1791, 0.0593, -0.0726, 0.0056],
        [0.0233, 0.0501, -0.1654, -0.1391],
        [-0.0567, -0.0637, 0.1994, -0.044],
        [-0.0847, 0.0198, 0.046, 0.1411],
        [-0.0014, 0.013, 0.0178, -0.0755],
        [-0.0355, -0.2106, 0.0756, 0.0162],
        [0.0021, 0.1711, -0.0955, 0.0416],
        [0.0011, 0.1875, 0.0306, -0.1232],
        [0.0757, 0.1515, 0.1421, 0.0528],
        [0.1294, 0.0229, -0.0494, 0.2255],
        [0.058, -0.116, -0.0993, 0.0978],
        [0.1599, -0.1318, 0.0007, -0.1163],
        [0.1848, 0.0469, -0.0752, 0.0047],
    ],
]

# --- PQ-ADC candidate generation + exact re-rank (X252) -------------------
# The re-rank pipeline uses its OWN trained codebook (above): retrieval
# needs quantization fidelity (16 x 4-dim subspaces, 16 centroids each =
# 64-bit codes), while embedding_pq_quantize (operators/extended.py)
# keeps its small 16-bit random book as the compression-plumbing demo.
# Regenerating PQR_BOOK is a correctness change: every code, candidate
# pool, and the oracle move with it.

PQR_M, PQR_K, PQR_SUBDIM = 16, 16, 4
PQ_TOPC = 50  # ADC candidate pool per query before exact re-rank


def _pqr_cb_sql(m: int) -> str:
    """Subspace m's codebook as a DuckDB list-of-lists literal."""
    return (
        "["
        + ", ".join(
            "[" + ", ".join(repr(x) for x in PQR_BOOK[m][c]) + "]"
            for c in range(PQR_K)
        )
        + "]"
    )


def _pqr_dists_lambda_sql(vec: str, m: int) -> str:
    """list of the 16 squared subvector-to-centroid distances — each an
    explicit fixed-order 4-term chain inside the list_transform lambda,
    so both engines add in identical textual order."""
    terms = " + ".join(
        f"({vec}[{m * PQR_SUBDIM + i + 1}] - c[{i + 1}])"
        f" * ({vec}[{m * PQR_SUBDIM + i + 1}] - c[{i + 1}])"
        for i in range(PQR_SUBDIM)
    )
    return f"list_transform({_pqr_cb_sql(m)}, c -> {terms})"


def _pq_rerank_oracle() -> str:
    code_cols = ", ".join(
        f"CAST(list_position(d_{m}, list_min(d_{m})) - 1 AS INT) AS code_{m}"
        for m in range(PQR_M)
    )
    dist_cols = ", ".join(
        f"{_pqr_dists_lambda_sql('v', m)} AS d_{m}" for m in range(PQR_M)
    )
    qd_cols = ", ".join(
        f"{_pqr_dists_lambda_sql('v', m)} AS qd_{m}" for m in range(PQR_M)
    )
    adist = " + ".join(f"q.qd_{m}[c.code_{m} + 1]" for m in range(PQR_M))
    exact = " + ".join(
        f"(qv[{j + 1}] - v[{j + 1}]) * (qv[{j + 1}] - v[{j + 1}])"
        for j in range(PQR_M * PQR_SUBDIM)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    dists AS (SELECT vec_id, v, {dist_cols} FROM e),
    codes AS (SELECT vec_id, v, {code_cols} FROM dists),
    q AS (SELECT vec_id AS query_id, v AS qv, {qd_cols} FROM e
          WHERE vec_id % {QUERY_MOD} = 0),
    pairs AS (
        SELECT q.query_id, c.vec_id, c.v, q.qv, {adist} AS adist
        FROM codes c JOIN q ON c.vec_id <> q.query_id),
    cand AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY adist, vec_id) AS crnk
            FROM pairs)
        WHERE crnk <= {PQ_TOPC}),
    rr AS (SELECT query_id, vec_id, adist, {exact} AS dist FROM cand),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dist, vec_id) AS rnk
        FROM rr)
    SELECT query_id, vec_id AS neighbor_id, CAST(rnk AS BIGINT) AS rnk,
           ROUND(adist, 6) AS approx_dist, ROUND(dist, 6) AS exact_dist
    FROM ranked WHERE rnk <= {TOPK}
    """


def _pqr_cb_col(m: int) -> "F.Column":
    return F.array(
        *[
            F.array(*[F.lit(float(x)) for x in PQR_BOOK[m][c]])
            for c in range(PQR_K)
        ]
    )


def _pqr_dists_col(vec_col: str, m: int) -> "F.Column":
    """array<double>[16] of squared subvector-to-centroid distances —
    the same explicit 4-term fixed-order chain as the oracle lambda."""

    def sq(c):
        t = None
        for i in range(PQR_SUBDIM):
            d = F.element_at(F.col(vec_col), m * PQR_SUBDIM + i + 1) - F.element_at(
                c, i + 1
            )
            t = d * d if t is None else t + d * d
        return t

    return F.transform(_pqr_cb_col(m), sq)


@query("similarity_pq_rerank", oracle=_pq_rerank_oracle())
def similarity_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X252: the production ANN retrieval stack end-to-end — PQ codes
    from the Lloyd-trained literal codebook scanned with ASYMMETRIC
    DISTANCE COMPUTATION (Jégou et al.'s ADC: query stays full-precision,
    corpus is 64-bit codes) to a top-{PQ_TOPC} candidate pool, then an
    exact squared-L2 re-rank of the pool to the final top-{TOPK}. This is
    what FAISS/ScaNN execute at serving time; at billion scale the ADC
    pass reads 8 bytes/vector instead of 256 (with IVF cell pruning
    composing in front — similarity_ann_ivf). Both stages are
    value-checked: subspace distances are explicit fixed-order 4-term
    chains inside higher-order-function lambdas (HOFs keep generated
    code bounded — the fully unrolled form blew whole-stage codegen's
    64 KB method limit), the argmin is array_position(min) with its
    lowest-index tiebreak, the ADC sum is an in-row LUT probe
    qd[code+1], and the re-rank is the zip_with/aggregate left fold
    (bit-equal to the oracle's explicit left-associated 64-term chain).
    Candidate recall vs the exact search is test-gated. Physical shape:
    corpus codes in-row (scan-speed), queries broadcast with their
    16×16 LUTs, candidate cut a query-keyed window over corpus-scan
    output, re-rank window over {PQ_TOPC}·|queries| rows."""
    e = _emb(spark, sf_dir)
    corpus = e.select(
        "vec_id",
        "v",
        *[
            (
                F.array_position(
                    _pqr_dists_col("v", m), F.array_min(_pqr_dists_col("v", m))
                )
                - 1
            )
            .cast("int")
            .alias(f"code_{m}")
            for m in range(PQR_M)
        ],
    )
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        *[_pqr_dists_col("v", m).alias(f"qd_{m}") for m in range(PQR_M)],
    )
    pairs = corpus.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    adist = None
    for m in range(PQR_M):
        term = F.element_at(F.col(f"qd_{m}"), F.col(f"code_{m}") + 1)
        adist = term if adist is None else adist + term
    wc = W.partitionBy("query_id").orderBy(F.col("adist"), F.col("vec_id"))
    cand = (
        pairs.withColumn("adist", adist)
        .withColumn("crnk", F.row_number().over(wc))
        .filter(F.col("crnk") <= PQ_TOPC)
    )
    dist = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wk = W.partitionBy("query_id").orderBy(F.col("dist"), F.col("vec_id"))
    return (
        cand.withColumn("dist", dist)
        .withColumn("rnk", F.row_number().over(wk).cast("long"))
        .filter(F.col("rnk") <= TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rnk",
            F.round("adist", 6).alias("approx_dist"),
            F.round("dist", 6).alias("exact_dist"),
        )
    )


KNN_K = 5  # neighbors voting in the leave-one-out classifier
KNN_QUERY_MOD = 5  # deterministic query subset: vec_id % 5 == 0


@query(
    "knn_classifier_eval",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
               FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % {KNN_QUERY_MOD} = 0),
    scored AS (
        SELECT q.vec_id AS query_id, q.label AS true_label,
               e.vec_id AS neighbor_id, e.label AS n_label,
               list_dot_product(q.v, e.v) AS cos
        FROM q JOIN e ON q.vec_id <> e.vec_id),
    nn AS (
        SELECT query_id, true_label, n_label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored),
    votes AS (
        SELECT query_id, true_label, n_label,
               CAST(COUNT(*) AS BIGINT) AS n_votes
        FROM nn WHERE rnk <= {KNN_K}
        GROUP BY 1, 2, 3),
    pred AS (
        SELECT query_id, true_label, n_label AS pred_label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY n_votes DESC, n_label) AS vr
        FROM votes
        QUALIFY vr = 1)
    SELECT CAST(true_label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           ROUND(CAST(SUM(CASE WHEN pred_label = true_label
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS accuracy
    FROM pred GROUP BY 1
    ORDER BY label
    """,
)
def knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X301: leave-one-out k-NN classification accuracy over the
    embedding labels — the evaluation that says whether an embedding
    space is USEFUL (labels cluster) rather than merely indexed, the
    standard probe run before shipping vectors to an ANN index; uses
    the `label` column the similarity family otherwise ignores. Each
    query vector (deterministic vec_id % {KNN_QUERY_MOD} subset) takes
    its {KNN_K} nearest neighbors by exact cosine (bit-identical
    ordered dot, neighbor-id tiebreak), votes are integer counts with
    majority ties broken toward the smallest label, and per-label
    accuracy is a single division of exact integers. Pinned (tests):
    predictions are deterministic, per-label counts are consistent,
    and — the honest finding — accuracy sits AT the label prior on
    this fixture (its labels are independent of the vectors), which is
    exactly what the harness exists to detect before anyone ships
    such a space behind an ANN index. Plan: query side broadcast
    (similarity_topk's exact-search shape — k·dim doubles), ONE corpus
    scan, per-query top-k window, two bounded rollups. At 100 TB the
    all-queries case hands off to the ANN variants; THIS op is the
    eval harness that certifies them."""
    e = _emb(spark, sf_dir).join(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "label"),
        "vec_id",
    )
    q = e.filter(F.col("vec_id") % KNN_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("true_label"),
    )
    scored = e.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "true_label",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        dot(F.col("qv"), F.col("v")).alias("cos"),
    )
    w_q = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    nn = scored.withColumn("rnk", F.row_number().over(w_q)).filter(
        F.col("rnk") <= KNN_K
    )
    votes = nn.groupBy("query_id", "true_label", "n_label").agg(
        F.count("*").alias("n_votes")
    )
    w_v = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("n_label")
    )
    pred = (
        votes.withColumn("vr", F.row_number().over(w_v))
        .filter(F.col("vr") == 1)
        .select("query_id", "true_label", F.col("n_label").alias("pred_label"))
    )
    return (
        pred.groupBy(F.col("true_label").cast("long").alias("label"))
        .agg(
            F.count("*").alias("n_queries"),
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
            ).cast("long").alias("n_correct"),
        )
        .select(
            "label",
            "n_queries",
            "n_correct",
            F.round(
                F.col("n_correct").cast("double") / F.col("n_queries"), 6
            ).alias("accuracy"),
        )
        .orderBy("label")
    )


@query(
    "embedding_outlier_flags",
    oracle="""
    WITH u AS (
        SELECT vec_id, label,
               UNNEST(range(len(embedding))) AS pos,
               CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS q
        FROM embeddings),
    cen AS (
        SELECT label, pos,
               CAST(SUM(q) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c
        FROM u GROUP BY 1, 2),
    d AS (
        SELECT u.vec_id, u.label,
               CAST(SUM((u.q - cen.c) * (u.q - cen.c)) AS BIGINT)
                   AS dist_sq
        FROM u JOIN cen ON u.label = cen.label AND u.pos = cen.pos
        GROUP BY 1, 2),
    g AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(dist_sq) AS BIGINT) AS sum_dist_sq
        FROM d GROUP BY 1)
    SELECT d.vec_id, d.label, d.dist_sq, g.n, g.sum_dist_sq,
           CAST(CASE WHEN g.n * d.dist_sq > 4 * g.sum_dist_sq
                     THEN 1 ELSE 0 END AS INT) AS is_outlier,
           ROUND(CASE WHEN g.sum_dist_sq > 0
                      THEN CAST(g.n AS DOUBLE) * d.dist_sq / g.sum_dist_sq
                      ELSE 0 END, 6) AS dist_ratio
    FROM d JOIN g USING (label)
    ORDER BY d.vec_id
    """,
)
def embedding_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X337: embedding-space outlier detection — flag vectors far from
    their label's centroid (the mislabeled-example / corrupted-payload
    screen an embedding-curation pipeline runs before training). The
    float trap is double: centroids are divisions and distances are
    64-term float sums whose add order differs across engines — so the
    whole query is INTEGER: components quantize to micro-units
    (round(v*1e6) — float32 widens to double exactly, one correctly-
    rounded multiply, identical BIGINT both engines), centroids are
    truncated integer means (S DIV n — toward-zero in both engines,
    including negatives), and dist^2 = Sigma (q-c)^2 is an exact
    BIGINT (order-free). The outlier rule is the integer cross-
    multiplication n*dist^2 > 4*sum(dist^2) (i.e. 4x the label's mean
    squared distance); dist_ratio is the one float, a division of
    emitted integers rounded 6. Plan: one posexplode (64x narrow
    rows), one (label,pos)-keyed centroid agg joined back (25-row
    broadcast x 64 dims), one vec-keyed reduce, one 10-row label agg.
    At 100 TB every shuffle is keyed; the centroid table is
    |labels|x|dims| — broadcast-sized by construction."""
    e = load_table(spark, sf_dir, "embeddings")
    u = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "label",
        "pos",
        F.round(F.col("v").cast("double") * 1000000).cast("long").alias("q"),
    )
    cen = u.groupBy("label", "pos").agg(
        F.expr("SUM(q) DIV COUNT(*)").alias("c")
    )
    d = (
        u.join(F.broadcast(cen), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
            .cast("long")
            .alias("dist_sq")
        )
    )
    g = d.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dist_sq").cast("long").alias("sum_dist_sq"),
    )
    return (
        d.join(F.broadcast(g), "label")
        .select(
            "vec_id",
            "label",
            "dist_sq",
            "n",
            "sum_dist_sq",
            (F.col("n") * F.col("dist_sq") > 4 * F.col("sum_dist_sq"))
            .cast("int")
            .alias("is_outlier"),
            F.round(
                F.when(
                    F.col("sum_dist_sq") > 0,
                    F.col("n").cast("double")
                    * F.col("dist_sq")
                    / F.col("sum_dist_sq"),
                ).otherwise(0.0),
                6,
            ).alias("dist_ratio"),
        )
        .orderBy("vec_id")
    )


TRUNC_DIM = 16


@query(
    "embedding_truncation_overlap",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id % {QUERY_MOD} = 0),
    -- score both similarities once into a SKINNY materialized pair table
    -- (ids + two doubles); ordering a window by the raw
    -- list_dot_product(...) expression made DuckDB carry both 64-dim
    -- vectors through two |q|x|e| window sorts (>80 GB spill at the 10x
    -- sweep). Same scores, same ties, same rows.
    pairs AS MATERIALIZED (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               list_dot_product(q.v, e.v) AS s_full,
               list_dot_product(q.v[1:{TRUNC_DIM}],
                                e.v[1:{TRUNC_DIM}]) AS s_trunc
        FROM q JOIN e ON q.vec_id <> e.vec_id),
    full_r AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY s_full DESC, neighbor_id) AS rnk
        FROM pairs),
    trunc_r AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY s_trunc DESC, neighbor_id) AS rnk
        FROM pairs),
    f AS (SELECT query_id, neighbor_id FROM full_r WHERE rnk <= {TOPK}),
    t AS (SELECT query_id, neighbor_id FROM trunc_r WHERE rnk <= {TOPK}),
    o AS (
        SELECT f.query_id, CAST(COUNT(t.neighbor_id) AS BIGINT) AS overlap
        FROM f LEFT JOIN t ON f.query_id = t.query_id
                          AND f.neighbor_id = t.neighbor_id
        GROUP BY 1)
    SELECT query_id, overlap,
           CAST({TOPK} AS BIGINT) AS k,
           ROUND(CAST(overlap AS DOUBLE) / {TOPK}, 6) AS recall_at_k
    FROM o ORDER BY query_id
    """,
)
def embedding_truncation_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X338: Matryoshka-truncation retrieval evaluation — how much of
    the exact top-{TOPK} survives when the 64-dim embedding is
    truncated to its first {TRUNC_DIM} dims (the MRL deployment
    question: can the cheap prefix serve first-stage retrieval?).
    Recall@k per query = |top-k(full) ∩ top-k(truncated)| / k. Both
    rankings are exact brute-force over the broadcast query subset
    (similarity_topk's shape, twice — the truncated leg's dot product
    runs on array slices, still native higher-order functions, no
    UDF); ranks break ties on neighbor_id so both engines sort
    identically; the overlap is an INTEGER count from a keyed set
    join, and recall is its division by k, rounded 6. On the synthetic
    gaussian-ish fixture truncation destroys most of the ranking
    (prefix dims carry 1/4 of the norm) — the test pins recall
    strictly below 1 on average but above the random-chance floor.
    At 100 TB: the expensive legs are the same broadcast-probe scans
    as X2; the eval itself is |queries|x k rows."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def topk(score) -> DataFrame:
        scored = e.join(
            F.broadcast(q), F.col("vec_id") != F.col("query_id")
        ).select(
            "query_id", F.col("vec_id").alias("neighbor_id"), score.alias("s")
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("s").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOPK)
            .select("query_id", "neighbor_id")
        )

    full = topk(dot(F.col("qv"), F.col("v")))
    trunc = topk(
        dot(
            F.slice(F.col("qv"), 1, TRUNC_DIM),
            F.slice(F.col("v"), 1, TRUNC_DIM),
        )
    )
    o = (
        full.join(
            trunc.withColumn("hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("overlap"))
    )
    return o.select(
        "query_id",
        "overlap",
        F.lit(TOPK).cast("long").alias("k"),
        F.round(F.col("overlap").cast("double") / TOPK, 6).alias(
            "recall_at_k"
        ),
    ).orderBy("query_id")
