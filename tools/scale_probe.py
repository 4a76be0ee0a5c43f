"""sf1 scale probe (VERDICT r03 item 8): synthesize a 10x copy of the
sf0.1 testdata, run the training loop and the ten heaviest bench
operators at both scales in one session, and record per-query times plus
the sf1/sf0.1 ratio in BENCH_sf1.json. The design claim under test is
linear scaling: no probed query may take more than ~10x its sf0.1 time
on 10x the data (ratio <= 10 with headroom noted per query).

Data synthesis (testdata stays read-only; the copy lives in /tmp):
every fact table is unioned 10 times with key-domain offsets that
preserve join integrity (custkey/orderkey/partkey/suppkey shift
together; dims nation/region stay single). Document TEXT is re-tokened
per copy (every token gets a per-copy suffix) so the corpus scales the
way a real 10x crawl does — new vocabulary, no cross-copy duplicate
pairs — otherwise replication would plant 10-deep exact-dup clusters
and quadratic candidate blowups that say nothing about real scaling.
Embedding ids shift by a multiple of 25 so the vec_id % 25 query subset
keeps the same density.

    python tools/scale_probe.py          # builds /tmp/drs_sf1 if absent
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/drs_sf1")
COPIES = 10

# the ten heaviest round-3 bench queries (BENCH_local r03, training
# segments excluded — those are probed separately below)
PROBE_QUERIES = [
    "pagerank_items",
    "dedup_sorted_neighborhood",
    "graph_triangle_stats",
    "item_cf_similarity",
    "als_implicit_epoch",
    "ranking_metrics_at_k",
    "bootstrap_ci",
    "doc_similarity_sparse",
    "auc_roc",
    "dedup_levenshtein_verified",
    # round-4 heavy family (VERDICT r04 item 4) — appended, order-stable.
    # The two multimodal entries run on the round-5 64-bit/4x16-band
    # aHash; documents DO scale 10x here (per-copy re-tokened text), so
    # their ratios measure the banding fix directly.
    "multimodal_image_ahash",
    "multimodal_dup_clusters",
    "bin_pack_next_fit",
    "ngram_novelty_score",
    "label_propagation_communities",
    "personalized_pagerank",
    "mmr_rerank",
    "stream_join_left_outer",
    "blocking_quality_eval",
]

FUNK_EPOCHS = 5
FUNK_K = 30


def _offset(maxval: int, mult: int = 1) -> int:
    off = maxval + 1
    return ((off + mult - 1) // mult) * mult


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(f"{DST}/_DONE"):
        return
    os.makedirs(DST, exist_ok=True)

    mx = {}
    for t, c in [
        ("customer", "c_custkey"), ("orders", "o_orderkey"),
        ("part", "p_partkey"), ("supplier", "s_suppkey"),
        ("events", "event_id"), ("events", "user_id"),
        ("documents", "doc_id"), ("embeddings", "vec_id"),
    ]:
        mx[c] = spark.read.parquet(f"{SRC}/{t}.parquet").agg(
            F.max(c).alias("m")
        ).first()["m"]
    off = {
        "c_custkey": _offset(mx["c_custkey"]),
        "o_orderkey": _offset(mx["o_orderkey"]),
        "p_partkey": _offset(mx["p_partkey"]),
        "s_suppkey": _offset(mx["s_suppkey"]),
        "event_id": _offset(mx["event_id"]),
        "user_id": _offset(mx["user_id"]),
        "doc_id": _offset(mx["doc_id"]),
        "vec_id": _offset(mx["vec_id"], mult=25),
    }

    shifts: dict[str, dict[str, str]] = {
        "customer": {"c_custkey": "c_custkey"},
        "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
        "lineitem": {
            "l_orderkey": "o_orderkey",
            "l_partkey": "p_partkey",
            "l_suppkey": "s_suppkey",
        },
        "part": {"p_partkey": "p_partkey"},
        "supplier": {"s_suppkey": "s_suppkey"},
        "events": {"event_id": "event_id", "user_id": "user_id"},
        "documents": {"doc_id": "doc_id"},
        "embeddings": {"vec_id": "vec_id"},
    }

    for t in ("nation", "region"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )

    for t, cols in shifts.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for k in range(COPIES):
            c = base
            for col, dom in cols.items():
                c = c.withColumn(col, (F.col(col) + F.lit(k * off[dom])).cast("long"))
            if t == "documents" and k > 0:
                # fresh vocabulary per copy: every token gets a copy tag,
                # preserving within-copy dedup structure while keeping
                # cross-copy Jaccard at zero (see module docstring)
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", rf"$1x{k}")
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"built {t}", flush=True)

    open(f"{DST}/_DONE", "w").write("ok\n")


def main() -> None:
    from dask_recommender_system_spark.data import load_table, ratings_from_df
    from dask_recommender_system_spark.models import FunkSVD
    from dask_recommender_system_spark.registry import REGISTRY, load_all_operators
    from dask_recommender_system_spark.session import get_spark

    load_all_operators()
    spark = get_spark("drs-scale-probe")
    spark.read.parquet(f"{SRC}/region.parquet").count()  # warmup
    build_sf1(spark)

    results: dict[str, dict] = {}
    for name in PROBE_QUERIES:
        row: dict = {}
        for label, d in (("sf0.1", SRC), ("sf1", DST)):
            t0 = time.perf_counter()
            n = REGISTRY[name].fn(spark, d).count()
            row[label] = round(time.perf_counter() - t0, 3)
            row[f"{label}_rows"] = n
            spark.catalog.clearCache()
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        results[name] = row
        print(name, row, flush=True)

    train: dict[str, dict] = {}
    for label, d in (("sf0.1", SRC), ("sf1", DST)):
        r = ratings_from_df(
            load_table(spark, d, "lineitem"), load_table(spark, d, "orders")
        )
        n_ratings = r.count()
        m = FunkSVD(n_factors=FUNK_K, lr=0.001, reg=0.001, epochs=FUNK_EPOCHS)
        t0 = time.perf_counter()
        m.fit(r, user_col="user_id", item_col="item_id", rating_col="rating")
        total = time.perf_counter() - t0
        tail = m.epoch_times[1:]
        epoch_s = sum(tail) / len(tail)
        train[label] = {
            "n_ratings": n_ratings,
            "fit_total_s": round(total, 3),
            "epoch_s": round(epoch_s, 3),
            "ratings_per_s_per_epoch": round(n_ratings / epoch_s),
        }
        print(label, train[label], flush=True)

    out = {
        "metric": "sf1_scale_probe",
        "copies": COPIES,
        "queries": results,
        "training": train,
        "training_epoch_ratio": round(
            train["sf1"]["epoch_s"] / train["sf0.1"]["epoch_s"], 2
        ),
        "max_query_ratio": round(max(r["ratio"] for r in results.values()), 2),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_sf1.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
