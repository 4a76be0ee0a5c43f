"""Graph operators (SURVEY.md §2.9 round-3 addition X69): weighted
PageRank over the item co-occurrence graph. Complements the neighborhood
(item_cf_similarity) and factor (models/) recommenders with the classic
graph-centrality item-importance signal, and complements dedup_clusters'
connected components as the second iterative graph algorithm — same
join+agg-per-round shape, same per-round localCheckpoint lineage
discipline (``operators/dedup.py`` min_label_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..registry import query

PR_ITERS = 5
PR_DAMP = 0.85


def _pagerank_oracle() -> str:
    """Fixed-iteration PageRank as chained CTEs — one CTE per iteration
    (standard SQL forbids aggregation in a recursive term, so a fixed
    unroll is the portable form of the loop the Spark side runs)."""
    parts = [
        f"""
WITH lines AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
edges AS (SELECT a.p AS u, b.p AS v, CAST(COUNT(*) AS DOUBLE) AS w
          FROM lines a JOIN lines b ON a.o = b.o AND a.p <> b.p
          GROUP BY a.p, b.p),
deg AS (SELECT u, SUM(w) AS dw FROM edges GROUP BY u),
en AS (SELECT e.u, e.v, e.w / d.dw AS wn FROM edges e JOIN deg d ON e.u = d.u),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
pr0 AS (SELECT u AS node, 1.0 / nn.n AS r FROM deg, nn)"""
    ]
    for it in range(PR_ITERS):
        parts.append(
            f""",
pr{it + 1} AS (
  SELECT en.v AS node,
         (1 - {PR_DAMP}) / nn.n + {PR_DAMP} * SUM(pr{it}.r * en.wn) AS r
  FROM en JOIN pr{it} ON en.u = pr{it}.node CROSS JOIN nn
  GROUP BY en.v, nn.n
)"""
        )
    parts.append(
        f"""
SELECT pr{PR_ITERS}.node, ROUND(pr{PR_ITERS}.r * nn.n, 6) AS rank_rel
FROM pr{PR_ITERS} CROSS JOIN nn"""
    )
    return "".join(parts)


@query("pagerank_items", oracle=_pagerank_oracle())
def pagerank_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X69: weighted PageRank over the item co-purchase graph
    ({PR_ITERS} iterations, damping {PR_DAMP}) — emitted as rank relative
    to uniform (r·n, so values sit near 1.0 with full 6-decimal
    resolution instead of collapsing toward 1/n as the catalog grows).

    Graph build is the item_cf pattern: per-order item sets are bounded
    (order size), so edges come from an in-row double explode — never an
    item-keyed self-join. The graph is symmetric by construction, so
    there are no dangling nodes and the node set is closed under
    iteration — the (1-d)/n teleport needs no dangling-mass correction.
    Each iteration is ONE u-keyed join (ranks ⋈ normalized edges) + ONE
    v-keyed agg, with an eager localCheckpoint pinning lineage depth at
    O(1) — the same per-round discipline as min_label_components
    (dedup.py) and the training epochs (models/base.py). The
    driver-side scalars are n (one count) and the loop bound; ranks
    never leave the cluster."""
    lines = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    grp = lines.groupBy("o").agg(F.collect_set("p").alias("ps"))
    e = (
        grp.select(F.explode("ps").alias("u"), "ps")
        .select("u", F.explode("ps").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    edges = e.groupBy("u", "v").agg(F.count("*").cast("double").alias("w"))
    deg = edges.groupBy("u").agg(F.sum("w").alias("dw"))
    p = spark.sparkContext.defaultParallelism
    en = (
        edges.join(deg, "u")
        .select("u", "v", (F.col("w") / F.col("dw")).alias("wn"))
        # hash-partition on the iteration join key BEFORE the checkpoint:
        # localCheckpoint preserves outputPartitioning, so every iteration
        # joins against co-located edges and only the |nodes|-row ranks
        # table moves. At bench scale AQE broadcasts ranks and this is
        # timing-neutral (measured); at 10⁹ nodes ranks cannot broadcast
        # and this is the difference between shuffling the edge table
        # once vs once per iteration.
        .repartition(p, "u")
        .localCheckpoint(eager=True)  # reused every iteration
    )
    n = float(deg.count())
    ranks = deg.select(F.col("u").alias("node"), F.lit(1.0 / n).alias("r"))
    for _ in range(PR_ITERS):
        ranks = (
            en.join(ranks, en["u"] == ranks["node"])
            .groupBy(F.col("v").alias("node2"))
            .agg(
                (
                    F.lit((1 - PR_DAMP) / n)
                    + PR_DAMP * F.sum(F.col("r") * F.col("wn"))
                ).alias("r")
            )
            .select(F.col("node2").alias("node"), "r")
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round(F.col("r") * n, 6).alias("rank_rel"))
