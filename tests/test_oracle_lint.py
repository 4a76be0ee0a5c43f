"""Oracle output-typing lint (VERDICT r02 item 3).

DuckDB types a plain or windowed ``SUM(BIGINT)`` as HUGEINT; pandas
materializes HUGEINT as float64/object, and the driver's strict value hash
then diverges from Spark's int64 output even when every value is identical.
This bug class cost a red gate row in BOTH prior rounds
(``json_extract_props`` r1, ``pack_sequences`` r2), each time because one
oracle column missed its CAST.

Instead of grepping SQL text, this lint asks DuckDB itself: bind (not
execute) every registered oracle against the test views and fail on any
output column whose declared type cannot round-trip through pandas with the
dtype Spark produces. Adding a new oracle with an uncast HUGEINT-producing
aggregate fails here immediately, before it ever reaches the driver.
"""

from __future__ import annotations

from dask_recommender_system_spark.registry import all_oracles
from .oracle_util import duckdb_con

# Types that pandas cannot materialize as a plain int64/float64/str column
# identical to Spark's:
#  - HUGEINT/UHUGEINT (int128): -> float64 or object, hash-diverges from
#    Spark's int64 (the two historical reds).
#  - DECIMAL: -> object of decimal.Decimal, str()-normalizes differently
#    from Spark's double.
FORBIDDEN_TYPE_SUBSTRINGS = ("HUGEINT", "DECIMAL")


def test_no_oracle_emits_unportable_types(sf_dir):
    con = duckdb_con(sf_dir)
    offenders: list[str] = []
    for name, sql in all_oracles().items():
        rel = con.sql(sql)  # lazy relation: binds + types, no execution
        for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
            if any(s in typ.upper() for s in FORBIDDEN_TYPE_SUBSTRINGS):
                offenders.append(f"{name}.{col}: {typ} (add a CAST)")
    assert not offenders, (
        "oracle columns with pandas-unportable DuckDB types "
        "(CAST them to BIGINT/DOUBLE):\n" + "\n".join(offenders)
    )


def test_comparator_rejects_dtype_class_mismatch():
    """VERDICT r07 item 2: oracle_util.compare must fail when the Spark
    and oracle frames disagree on a column's dtype CLASS (int vs float vs
    decimal vs bool/str), because the driver's value hash distinguishes
    10 from 10.0 while normalize() used to coerce each frame per its own
    dtype and silently pass (the recs_intra_list_diversity r07 red row:
    DuckDB integer `/` is true division, so `n*(n-1)/2` came back DOUBLE
    against the engine's BIGINT)."""
    import decimal

    import pandas as pd

    from .oracle_util import compare

    ints = pd.DataFrame({"k": [1, 2], "total_pairs": [10, 3]})
    doubles = pd.DataFrame({"k": [1, 2], "total_pairs": [10.0, 3.0]})
    problems = compare(ints, doubles, "seeded")
    assert any("dtype class" in p and "total_pairs" in p for p in problems), problems

    # negative control: identical classes (and values) pass
    assert compare(ints, ints.copy(), "seeded_ok") == []

    # bool vs int and decimal vs float are also distinct classes
    bools = pd.DataFrame({"k": [1, 2], "flag": [True, False]})
    as_int = pd.DataFrame({"k": [1, 2], "flag": [1, 0]})
    assert any("dtype class" in p for p in compare(bools, as_int, "seeded_bool"))
    decs = pd.DataFrame(
        {"k": [1, 2], "v": [decimal.Decimal("1.50"), decimal.Decimal("2.25")]}
    )
    floats = pd.DataFrame({"k": [1, 2], "v": [1.50, 2.25]})
    assert any("dtype class" in p for p in compare(decs, floats, "seeded_dec"))
