"""Sequence packing for LLM training-data pipelines (beyond-reference
surface; BASELINE.json north star).

GPT-style packing concatenates the token stream in a stable document
order and cuts it every ``budget`` tokens; a document belongs to the
pack where it STARTS (documents may straddle pack boundaries — the
training loader handles the split, the pipeline only needs stable pack
assignment and start offsets).

That reduces to a global exclusive cumulative sum of token counts in
document order — done scalably by util.distributed_cumsum (deterministic
range shards + per-shard windows + a driver-side prefix of shard
totals; no single-partition window anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea_etl_spark.operators.text import token_count
from synthea_etl_spark.operators.util import distributed_cumsum


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int = 2048,
) -> DataFrame:
    """Assign each document a pack id and start offset in the
    concatenated token stream (order = ``id_col`` ascending, which must
    be unique — ties would make the running sum order-dependent).

    Returns (id, n_tokens, start_offset, pack_id, pack_offset):
    ``pack_id = start_offset // budget`` and ``pack_offset`` is the
    document's position within its pack. Empty documents pack with
    zero width (they consume no budget)."""
    with_counts = df.select(
        F.col(id_col), token_count(text_col).cast("long").alias("n_tokens")
    )
    cum = distributed_cumsum(
        with_counts, id_col, "n_tokens", out_col="start_offset", exclusive=True
    )
    return cum.select(
        id_col,
        "n_tokens",
        "start_offset",
        (F.col("start_offset") / budget).cast("long").alias("pack_id"),
        (F.col("start_offset") % budget).cast("long").alias("pack_offset"),
    )
