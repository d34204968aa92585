"""Round-13 LLM-pipeline queries, batch 3: the prompt-key cluster
store (ninth stream-maintained artifact family) certified end to
end.

- q240: q233's prompt-dedup frame answered FROM THE SLICE STORE —
  the corpus is ingested as three doc_id-split slices (production:
  ``pipeline.prompt_key_ingest_stream`` per micro-batch), the first
  two slices are COMPACTED mid-build (exercising the versioned
  watermark lifecycle inside the gated path), and the per-doc frame
  is reassembled by joining corpus prompt keys against the store's
  merged (SUM n, MIN min_doc) clusters. Hash-gating against
  ORACLE_Q233 certifies that mergeable partials re-merge to the
  corpus answer bit for bit ACROSS a compaction boundary.

Reference scope: beyond-reference extension surface (the q224
store-vs-batch certification pattern applied to SFT dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import synthea_etl_spark.operators.text as T
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm22 import _PROMPT_TOKENS, ORACLE_Q233


def q240_prompt_dedup_from_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q233 answered from the prompt-key store, through a mid-build
    compaction (store path == batch path bit-for-bit — the q224
    certification discipline, plus the q212-store lesson that the
    compaction boundary is where merge bugs live).

    100 TB shape: the answering join probes store-sized
    (pkey, cluster_n, rep) rows — cluster count is bounded by
    distinct prompts (Heaps-ish), and the corpus-side scan carries
    only (doc_id, pkey). No broadcast hint on the cluster side: it
    is corpus-cardinality in the worst case (all prompts unique);
    AQE decides (the drift_from_token_store lesson). The gate's
    in-query store build exists to make the equality checkable."""
    import shutil
    import tempfile

    from synthea_etl_spark.operators.dedup import (
        PROMPT_KEY_AGGS,
        compact_agg_slices,
        prompt_clusters_from_store,
        prompt_key_store,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    store = tempfile.mkdtemp(prefix="q240_prompt_store_")
    try:
        # three deterministic slices; any split works (mergeability)
        for b, pred in enumerate(
            (
                F.col("doc_id") % 3 == 0,
                F.col("doc_id") % 3 == 1,
                F.col("doc_id") % 3 == 2,
            )
        ):
            prompt_key_store(
                docs.filter(pred), store, f"batch{b}", _PROMPT_TOKENS
            )
            if b == 1:
                # fold slices 0-1 while slice 2 is still to come: the
                # answering path below reads compacted1 + batch2
                compact_agg_slices(
                    spark, store, 1, ["pkey"], PROMPT_KEY_AGGS
                )
        clusters = prompt_clusters_from_store(spark, store)
        keyed = docs.filter(T.token_count("text") > 0).select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    " ", F.slice(T.tokens("text"), 1, _PROMPT_TOKENS)
                )
            ).alias("pkey"),
        )
        out = keyed.join(clusters, "pkey").select(
            "doc_id",
            "pkey",
            "cluster_n",
            (F.col("doc_id") == F.col("rep_doc_id")).alias("is_rep"),
            "rep_doc_id",
        )
        # materialize before the temp store is removed (q224/q178
        # discipline: the caller's lazy collect must not touch it)
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(store, ignore_errors=True)


QUERIES: dict[str, QuerySpec] = {
    "q240_prompt_dedup_from_store": QuerySpec(
        q240_prompt_dedup_from_store,
        ORACLE_Q233,
        "q233's prompt-dedup frame answered from the stream-"
        "maintained prompt-key store across a compaction boundary",
        ("llm", "dedup", "sft", "streaming"),
    ),
}
