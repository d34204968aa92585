"""Heavy-hitter detection with bounded memory: Misra-Gries sketch +
exact verify.

The naive heavy-hitter query (groupBy key HAVING count >= t) shuffles
every distinct key. At 100 TB with billions of keys that's the whole
point of failure: the aggregation state is as big as the key space.
The two-phase design here bounds state to k counters per partition:

1. **Sketch**: each partition folds its rows into a k-counter
   Misra-Gries summary (mapInPandas; per-batch ``value_counts`` is
   vectorized C, then an MG-merge of the batch histogram into the
   running summary — the Agarwal et al. mergeable-summaries form, which
   preserves the MG guarantee). Any key with global frequency > N/k is
   GUARANTEED to survive in at least one partition's summary.
2. **Verify**: the candidate union (at most k x partitions keys —
   sketch-sized, broadcastable) is counted EXACTLY with a broadcast
   semi join + one aggregation over candidates only.

For threshold t > N/k the result is therefore EXACT (superset from the
sketch, then exact counts) — which is what makes it oracle-checkable
against a plain GROUP BY HAVING, unlike a lossy-count estimate.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict, batch: dict, k: int) -> dict:
    """Merge a batch histogram into an MG summary, keeping <= k
    counters: add shared keys, insert new ones, then subtract the
    (k+1)-th largest count from everything and drop non-positives."""
    for key, c in batch.items():
        counters[key] = counters.get(key, 0) + int(c)
    if len(counters) > k:
        dec = sorted(counters.values(), reverse=True)[k]
        counters = {key: c - dec for key, c in counters.items() if c - dec > 0}
    return counters


def mg_candidates(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned: every key whose
    global count exceeds N/k is present. State is k counters per
    partition regardless of the key cardinality."""
    field = df.schema[key_col]
    out_schema = f"{key_col} {field.dataType.simpleString()}"

    def summarize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in it:
            batch = pdf[key_col].value_counts().to_dict()
            counters = _mg_merge(counters, batch, k)
        yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(summarize, out_schema).distinct()


def heavy_hitters(
    df: DataFrame, key_col: str, threshold: int, k: int = 256
) -> DataFrame:
    """Exact keys with count >= threshold, computed with sketch-bounded
    state. Caller must ensure threshold > N/k for the completeness
    guarantee (e.g. k >= 2 * N/threshold); the verify pass is exact, so
    precision is always 100%."""
    cands = mg_candidates(df, key_col, k)
    return (
        df.join(F.broadcast(cands), on=key_col, how="left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )
