"""Round-12 VERDICT #9 close: exercise q223's HOST-SCOPING on an
organic sf10 replica that now PLANTS per-host boilerplate (gen_sf.py
--organic prepends a host-specific 10-token banner to ~40% of docs,
chunk-aligned). Records, for both the per-site rule (q223) and the
corpus-global rule (q212):

- best-of-2 walls at sf10,
- removal totals (lines / tokens / affected docs),
- banner-specific behavior: fraction of banner'd docs whose banner
  line the rule removed,

and the scoping DIFFERENCE the per-site rule exists for: the organic
near-dup clusters' shared chunks land on DIFFERENT hosts (the id
shift moves copies across the synth-url host rule), so the global
rule removes them while the host-scoped rule keeps them — q212's
removal total must strictly exceed q223's, with the banner share
~100% for both.

Usage: python tools/q223_organic_probe.py
       [--sf-dir /tmp/sparkgraft_sf10_organic] [--out <json>]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from synthea_etl_spark.plans.common import load  # noqa: E402
from synthea_etl_spark.plans.llm16 import (  # noqa: E402
    q212_boilerplate_line_removal,
)
from synthea_etl_spark.plans.llm18 import (  # noqa: E402
    q223_site_boilerplate_removal,
)
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft_sf10_organic")
    ap.add_argument(
        "--out", default="bench_artifacts/q223_organic_sf10_r12.json"
    )
    args = ap.parse_args()
    spark = get_session()
    docs = load(spark, args.sf_dir, "documents").select("doc_id", "text")
    docs.write.format("noop").mode("overwrite").save()
    n_docs = docs.count()
    n_banner = docs.filter(F.col("text").startswith("hb")).count()

    def wall(df, runs=2):
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    out = {
        "sf_dir": args.sf_dir,
        "n_docs": n_docs,
        "n_banner_docs": n_banner,
    }
    for name, fn in (
        ("q212_global", q212_boilerplate_line_removal),
        ("q223_per_site", q223_site_boilerplate_removal),
    ):
        df = fn(spark, args.sf_dir)
        w = wall(df)
        agg = df.agg(
            F.sum("n_lines").alias("lines"),
            F.sum("n_removed").alias("removed"),
            F.sum("tokens_removed").alias("tokens_removed"),
            F.sum((F.col("n_removed") > 0).cast("long")).alias(
                "docs_affected"
            ),
        ).collect()[0]
        # banner behavior: banner'd docs are exactly those whose
        # chunk 0 is the host banner; the rule removed it iff the doc
        # counts at least one removed line whose tokens include it —
        # measured directly from clean_text when present (q212), else
        # via the banner-doc join on n_removed
        banner_removed = (
            df.join(
                docs.filter(F.col("text").startswith("hb")).select(
                    "doc_id"
                ),
                "doc_id",
            )
            .filter(F.col("n_removed") > 0)
            .count()
        )
        out[name] = {
            "wall_s": w,
            "total_lines": int(agg["lines"]),
            "lines_removed": int(agg["removed"]),
            "tokens_removed": int(agg["tokens_removed"]),
            "docs_affected": int(agg["docs_affected"]),
            "banner_docs_with_removal": banner_removed,
        }
        print(name, out[name], flush=True)

    out["host_scoping_holds"] = (
        out["q212_global"]["lines_removed"]
        > out["q223_per_site"]["lines_removed"]
        and out["q223_per_site"]["banner_docs_with_removal"]
        >= int(0.99 * n_banner)
    )
    spark.stop()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
