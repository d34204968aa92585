"""Phase decomposition of q226_crawl_training_pipeline (VERDICT r15
item 6): replicate the pipeline's checkpoint boundaries inline and
time each materialization, attributing the wall to (a) the WARC/HTML
Python leg, (b) the boilerplate-frequency join + reassembly, (c) the
dedup/quality/split pass, (d) the near-dup banding leg, (e) annealing
+ assembly.

Usage: python tools/phase_q226_r16.py [--sf-dir ...] [--reps 3]
       [--out bench_artifacts/phase_q226_r16.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="bench_artifacts/phase_q226_r16.json")
    args = ap.parse_args()
    spark = get_session("phase_q226_r16")

    # replicate q226's internals with timing marks by monkeypatching
    # localCheckpoint call sites is fragile; instead, time the whole
    # query and the cumulative prefixes exposed by re-running with the
    # same seed frames. Simpler and honest: time the FULL query and
    # each stage-0/1 sub-pipeline built exactly as q226 builds it.
    import pyspark.sql.functions as F

    import synthea_etl_spark.operators.dedup as D
    import synthea_etl_spark.operators.text as T
    from synthea_etl_spark.operators.text import html_to_text
    from synthea_etl_spark.operators.util import rebalance_by_key
    from synthea_etl_spark.operators.warc import encode_warc_gz, warc_records
    from synthea_etl_spark.plans import all_queries
    from synthea_etl_spark.plans.llm19 import _LINE_W

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    def build(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                page = (
                    "<html><head><script>track();</script></head>"
                    f"<body><h1></h1><p>{text}</p></body></html>"
                )
                payloads.append(
                    encode_warc_gz(
                        [
                            {
                                "type": "response",
                                "uri": f"http://crawl.test/{int(doc_id)}",
                                "payload": page.encode("utf-8"),
                            }
                        ]
                    )
                )
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    runs = []
    for rep in range(args.reps):
        t: dict[str, float] = {}
        t0 = time.time()
        shaped = rebalance_by_key(docs, "doc_id").mapInPandas(
            build, schema="id long, payload binary"
        )
        shaped.write.format("noop").mode("overwrite").save()
        t["a_warc_encode_only"] = round(time.time() - t0, 3)

        t0 = time.time()
        pages = (
            warc_records(shaped)
            .filter(F.col("warc_type") == "response")
            .select(
                F.col("id").alias("doc_id"),
                html_to_text(F.col("payload_text")).alias("text"),
            )
        )
        pages.write.format("noop").mode("overwrite").save()
        t["b_warc_roundtrip_html"] = round(time.time() - t0, 3)

        t0 = time.time()
        lines = T.chunk_by_tokens(pages, window=_LINE_W, overlap=0).select(
            F.col("id").alias("doc_id"),
            F.col("chunk_idx").alias("line_idx"),
            F.col("chunk_tokens").alias("line_tokens"),
            F.col("chunk_text").alias("line_text"),
            F.md5("chunk_text").alias("fp"),
        )
        lines.write.format("noop").mode("overwrite").save()
        t["c_plus_chunk_lines"] = round(time.time() - t0, 3)

        # the minhash leg on curated-survivor-sized text, isolated
        t0 = time.time()
        sig = D.minhash_signature(docs, "text", "doc_id", 32, 3)
        D.lsh_candidates(sig, "doc_id", 32, 8).write.format("noop").mode(
            "overwrite"
        ).save()
        t["d_minhash_lsh_fullcorpus"] = round(time.time() - t0, 3)

        t0 = time.time()
        all_queries()["q226_crawl_training_pipeline"].fn(
            spark, args.sf_dir
        ).write.format("noop").mode("overwrite").save()
        t["e_full_q226"] = round(time.time() - t0, 3)
        runs.append(t)
        print(rep, json.dumps(t), flush=True)
    with open(args.out, "w") as f:
        json.dump({"sf_dir": args.sf_dir, "runs": runs}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
