"""Paired A/B: spark.sql.join.preferSortMergeJoin true vs false
(+ AQE shuffled-hash rewrite threshold) over the join-heavy bench
queries, interleaved in ONE session so host noise hits both arms
equally (the r15 methodology). Noop sink per guide §1.4.

Usage: python tools/ab_join_pref_r15.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthea_etl_spark.plans import all_queries  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402

QUERIES = [
    "q16_join_chain_revenue",
    "q27_star_mart",
    "q59_asof_join",
    "q61_tpch_q3",
    "q62_tpch_q5",
    "q86_tpch_q10",
    "q91_tpch_q18",
    "q105_tpch_q9",
    "q110_tpch_q21",
    "q33_minhash_lsh_candidates",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("ab_join_pref_r15")
    reg = all_queries()
    # warm
    reg["q18_groupby_count"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, dict[str, list[float]]] = {}
    for name in QUERIES:
        fn = reg[name].fn
        arms = (
            ("smj", "true", "0"),        # default planner + no AQE rewrite
            ("aqe", "true", "64MB"),     # SMJ planner, AQE runtime rewrite
            ("shj", "false", "64MB"),    # planner prefers shuffled hash
        )
        walls: dict[str, list[float]] = {a: [] for a, _, _ in arms}
        for _ in range(reps):
            for arm, pref, thresh in arms:
                spark.conf.set("spark.sql.join.preferSortMergeJoin", pref)
                spark.conf.set(
                    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                    thresh,
                )
                spark.sparkContext.setJobDescription(f"ab {name} {arm}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls[arm].append(round(time.time() - t0, 3))
        out[name] = walls
        print(
            name
            + ": "
            + " ".join(f"{a} best {min(walls[a]):.3f}" for a, _, _ in arms),
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
