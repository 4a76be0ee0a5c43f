"""Recall/property tests for the approximate dedup & ANN operators
(SURVEY.md §7.5(5)): the LSH paths are measured against the exact
oracles — on testdata where it exists, and on constructed fixtures where
the testdata has no planted structure."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from dask_recommender_system_spark.registry import REGISTRY, load_all_operators

load_all_operators()


@pytest.mark.slow
def test_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    """MinHash candidates must recover most exact Jaccard≥0.5 pairs (at
    0.5 the MinHash S-curve with 8 tables is near-certain; the declared
    query uses a 0.8 distance threshold = 0.2 similarity floor)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
        if r["jaccard"] >= 0.5
    }
    mh = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["dedup_minhash"].fn(spark, sf_dir).collect()
    }
    if exact:
        recall = len(exact & mh) / len(exact)
        assert recall >= 0.9, f"minhash recall {recall} over {len(exact)} pairs"


@pytest.mark.slow
def test_simhash_finds_exact_duplicates(spark, sf_dir):
    """Exact duplicates have identical simhash → hamming 0 → must appear."""
    dup_groups = (
        REGISTRY["dedup_exact"].fn(spark, sf_dir).filter(F.col("n_copies") > 1)
    )
    n_dup_groups = dup_groups.count()
    sh = REGISTRY["dedup_simhash"].fn(spark, sf_dir)
    zero = sh.filter(F.col("hamming") == 0).count()
    if n_dup_groups:
        assert zero >= n_dup_groups


def _clustered_vectors(n_clusters=10, per_cluster=30, dim=64, seed=7):
    rng = random.Random(seed)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = [rng.gauss(0, 1) for _ in range(dim)]
        norm = sum(x * x for x in center) ** 0.5
        center = [x / norm for x in center]
        for _ in range(per_cluster):
            v = [x + rng.gauss(0, 0.05) for x in center]
            n = sum(x * x for x in v) ** 0.5
            rows.append((vid, [x / n for x in v], c))
            vid += 1
    return rows


@pytest.mark.slow
def test_ann_recall_on_clustered_fixture(spark, tmp_path):
    """On data with real cluster structure (FIXTURES.md §4 shape), both
    ANN paths must reach ≥0.8 recall@5 vs exact brute force."""
    rows = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path / "annfix")
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["similarity_topk"].fn(spark, d).collect()
    }
    assert exact
    for name in ("similarity_ann_lsh", "similarity_ann_ivf"):
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in REGISTRY[name].fn(spark, d).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, f"{name} recall {recall}"


@pytest.mark.slow
def test_exact_ivf_equals_brute_force(spark, tmp_path):
    """similarity_ann_ivf is EXACT by construction (probe + triangle-
    inequality bound expansion): on the clustered fixture its full output
    must EQUAL the brute-force top-k — not merely reach a recall bound."""
    rows = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path / "ivfexact")
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    exact = {tuple(r) for r in REGISTRY["similarity_topk"].fn(spark, d).collect()}
    ivf = {tuple(r) for r in REGISTRY["similarity_ann_ivf"].fn(spark, d).collect()}
    assert exact and ivf == exact


@pytest.mark.slow
def test_bucketed_cosine_dedup_equals_brute_force(spark, tmp_path):
    """dedup_embedding_cosine's cell-pair pruning is exact (triangle
    inequality): the bucketed plan must return every >=0.4 pair the naive
    O(n^2) scan finds — on clustered data, where intra-cluster pairs all
    fire the threshold."""
    rows = _clustered_vectors(n_clusters=6, per_cluster=20)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path / "cosdedup")
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    from dask_recommender_system_spark.operators.linalg import dot

    e = (
        spark.read.parquet(f"{d}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    brute = {
        (r["vec_a"], r["vec_b"])
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(dot(F.col("va"), F.col("vb")) >= 0.4)
        .collect()
    }
    bucketed = {
        (r["vec_a"], r["vec_b"])
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, d).collect()
    }
    assert brute and bucketed == brute
