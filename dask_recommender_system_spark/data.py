"""Schema-explicit table loaders for the testdata star schema, plus the
derived ``ratings`` view the recommender operators run on.

The reference's data model is a 4-column ratings table
``(user, item, rating, time)`` loaded positionally from header-less CSV
(``run_als.py:8``: ``pd.read_csv(path, names=["item","user","rating","time"])``).
The driver testdata has no ratings table, so we derive an equivalent
interactions table from ``orders ⋈ lineitem``: user = o_custkey,
item = l_partkey, rating in 1..5 derived deterministically from quantity,
time = l_shipdate. The derivation is pure SQL so every downstream operator
stays oracle-checkable.

All parquet reads rely on the parquet footer schema (schema-on-read is
exact for parquet); CSV/JSONL sources in ``sources/`` are schema-explicit
(never ``inferSchema`` — SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan (SURVEY.md S4). Column pruning + predicate pushdown are
    handled by Catalyst; callers select/filter on the returned frame.

    ``events.ts`` has been generated as both TIMESTAMP(NANOS) (which Spark
    refuses by default — read as int64 nanos via the legacy conf) and
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Normalize both to a
    microsecond session-tz TimestampType — sessions pin UTC, so this is a
    wall-clock-preserving relabel and DuckDB's epoch() agrees."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a session-tz TimestampType
    whatever the parquet wire type was — int64 nanos (legacy conf) or
    TIMESTAMP_NTZ micros. Shared by the batch loader and the streaming
    reader so the two can never desynchronize when the testdata encoding
    changes again (it already flipped nanos → micros once)."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition IFF the input has fewer partitions than the
    cluster has slots. A parquet scan parallelizes at row-group granularity,
    so a small single-row-group table (documents/embeddings at low SF) lands
    in ONE task — and any CPU-heavy narrow stage downstream (shingling,
    per-vector math) serializes. At 100 TB inputs already arrive in
    thousands of row groups and this is a no-op; the guard means we never
    pay an unnecessary full-payload shuffle."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# interaction_id layout: high bits keep the ordinal (orderkey, linenumber)
# pair; the low 32 bits are a content hash that restores UNIQUENESS — the
# round-6 testdata generator emits up to ~20% duplicate
# (l_orderkey, l_linenumber) pairs (600k sf0.1 rows, 456,861 distinct),
# which silently broke the FIXTURES.md "interaction_id is the unique
# tiebreak" rule: every window ordered by it was deterministic only while
# both engines happened to stable-sort the same single-file scan order
# (the sf1 directory-layout sweep caught it — CORRECTNESS_sf1 round 6).
# (l_partkey, l_suppkey, FLOOR(l_quantity)) is unique WITHIN a duplicate
# group at every SF, and all-integer, so the hash input needs no float
# formatting and is portable across engines. 2^32 low bits keep the
# composite under 2^63 up to ~10^9 orders; within-group collision odds are
# ~(group_size^2 / 2^33) per group — negligible, and a collision would only
# reintroduce one tie, visible in both engines identically.
_TIE_MOD = 4_294_967_296  # 2^32

# 60-bit md5 prefix as exact BIGINT digit arithmetic (same construction as
# operators/dedup.py h60_sql — duplicated here because operators import
# this module; 16^14 = 2^56 so every term and the sum stay exact).
_H60_POWERS = [16 ** (14 - i) for i in range(15)]


def _h60_duck(expr: str) -> str:
    powers = ", ".join(str(p) for p in _H60_POWERS)
    return (
        "CAST(list_sum(list_transform(range(15), i -> "
        f"(strpos('0123456789abcdef', substr(md5({expr}), CAST(i + 1 AS INT), 1)) - 1)"
        f" * [{powers}][i + 1])) AS BIGINT)"
    )


_TIE_EXPR_DUCK = _h60_duck(
    "CONCAT(l.l_partkey, '|', l.l_suppkey, '|', CAST(FLOOR(l.l_quantity) AS BIGINT))"
)

# DuckDB body of the ratings derivation — the oracle twin of
# :func:`ratings_from_df` (interpolated into every recommender oracle).
# DuckDB-dialect only since the list_transform hash landed; the Spark side
# is the DataFrame derivation below, kept expression-for-expression in sync.
RATINGS_SQL = f"""
SELECT o.o_custkey AS user_id,
       l.l_partkey AS item_id,
       CAST(1 + CAST(FLOOR(l.l_quantity) AS BIGINT) % 5 AS DOUBLE) AS rating,
       l.l_shipdate AS ts,
       (l.l_orderkey * 10 + l.l_linenumber) * {_TIE_MOD}
           + ({_TIE_EXPR_DUCK} % {_TIE_MOD}) AS interaction_id
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


def ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's COO-form ratings table (SURVEY.md §1.1): the relational
    equivalent of the reference's ``sparse.COO`` user×item matrix
    (``models/als.py:51``) — triples, never densified (SURVEY.md §1.4).

    orders→lineitem is a 1:N equi-join on the orderkey; at 100 TB this is a
    co-partitioned sort-merge join (both sides hash-shuffled on orderkey,
    AQE handles skew); at testdata scale AQE turns it into a broadcast."""
    return ratings_from_df(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )


# Manual escape hatch on top of the mechanical source hash below (e.g. a
# semantics change that lives outside ratings_from_df's source text).
_RATINGS_CACHE_VERSION = 1


def _derivation_hash() -> str:
    """Mechanical staleness key for the ratings derivation (ADVICE r07):
    hash of ratings_from_df's SOURCE plus the tie-break constants it
    closes over — an edit to the derivation self-invalidates every cache
    without anyone remembering to bump _RATINGS_CACHE_VERSION."""
    import hashlib
    import inspect

    src = inspect.getsource(ratings_from_df)
    return hashlib.md5(
        f"{_RATINGS_CACHE_VERSION}|{_TIE_MOD}|{src}".encode()
    ).hexdigest()[:8]


def _ratings_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of the ratings view's inputs (lineitem+orders
    listings: relative path + size + mtime_ns) plus the derivation hash —
    the cache key for :func:`ratings_cached`, so regenerated testdata or a
    changed derivation re-materializes instead of replaying stale rows."""
    import hashlib
    import os

    h = hashlib.md5(f"v{_derivation_hash()}|{sf_dir}".encode())
    for t in ("lineitem", "orders"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            for root, _dirs, files in sorted(os.walk(p)):
                for fn in sorted(files):
                    # relative path, not basename: two layouts whose part
                    # files share names but sit in different subdirs must
                    # not collide (matches _stage_fingerprint's discipline
                    # in streaming/windows.py)
                    rel = os.path.relpath(os.path.join(root, fn), p)
                    st = os.stat(os.path.join(root, fn))
                    h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns};".encode())
        else:
            st = os.stat(p)
            h.update(f"{t}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:16]


def ratings_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive-once-materialize form of :func:`ratings` — the 100 TB answer
    to the md5-per-row cost of the content-hash ``interaction_id``
    (SCALE.md: a derived view consumed by many queries is materialized
    once, not recomputed per consumer; the round-6 determinism fix made
    every re-derivation pay an md5 per row, which tripled
    join_predict_lookup's bench time purely in view prep). First call per
    dataset content writes the view to a fingerprint-keyed parquet under
    /tmp via write-to-temp + atomic rename (concurrent workers can't race
    the overwrite; the rename loser reads the winner's complete copy);
    every later call is a plain parquet scan. Values are identical to
    :func:`ratings` — parquet round-trips BIGINT/DOUBLE/DATE exactly."""
    import hashlib
    import os
    import shutil
    import uuid

    # per-dataset-PATH namespace: stale generations of the same dataset
    # can be pruned without touching a concurrently-used cache for a
    # different sf_dir (parallel sf0.01 + sf1 sweeps share this /tmp root)
    ns = f"/tmp/drs_ratings_cache/{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    fp = _ratings_fingerprint(sf_dir)
    stage = f"{ns}/{fp}"
    if not os.path.exists(f"{stage}/_SUCCESS"):
        tmp = f"{stage}.tmp_{uuid.uuid4().hex[:8]}"
        ratings(spark, sf_dir).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, stage)
            # publish succeeded: prune stale sibling generations of THIS
            # dataset (ADVICE r07 — fingerprints otherwise accumulate one
            # dir per touched content, unboundedly). Only fully published
            # dirs; a concurrent writer's .tmp_* staging dirs are left
            # alone.
            for sib in os.listdir(ns):
                sp = os.path.join(ns, sib)
                if (
                    sib != fp
                    and ".tmp_" not in sib
                    and os.path.exists(os.path.join(sp, "_SUCCESS"))
                ):
                    shutil.rmtree(sp, ignore_errors=True)
        except OSError:
            # Only the lost-the-race case is recoverable (the winner's
            # complete copy is in place); any other rename failure (EXDEV,
            # permissions) must surface HERE, not as a confusing
            # missing-path error from the read below. (ADVICE r07)
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(f"{stage}/_SUCCESS"):
                raise
    return spark.read.parquet(stage)


def ratings_from_df(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Same derivation as :func:`ratings` from already-loaded frames.
    ``interaction_id`` must stay expression-for-expression in sync with
    ``RATINGS_SQL`` above (the oracles recompute it)."""
    l, o = lineitem.alias("l"), orders.alias("o")
    tie = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("l.l_partkey"),
                        F.col("l.l_suppkey"),
                        F.floor("l.l_quantity").cast("bigint"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _TIE_MOD
    )
    return (
        l.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"))
        .select(
            F.col("o.o_custkey").alias("user_id"),
            F.col("l.l_partkey").alias("item_id"),
            (1 + F.floor("l.l_quantity").cast("bigint") % 5).cast("double").alias("rating"),
            F.col("l.l_shipdate").alias("ts"),
            (
                (F.col("l.l_orderkey") * 10 + F.col("l.l_linenumber")) * F.lit(_TIE_MOD)
                + tie
            ).alias("interaction_id"),
        )
    )
