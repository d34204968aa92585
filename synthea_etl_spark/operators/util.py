"""Shared operator utilities.

``rebalance_by_key`` addresses a scan-parallelism hazard for
explode-heavy operators (MinHash shingling, SimHash token votes,
n-gram Jaccard): the CPU cost is dominated by post-explode hashing,
whose parallelism is inherited from the *scan* (file splits / row
groups), not from the data size after explode. When the input arrives
in fewer partitions than the session's shuffle parallelism (one small
file locally; a handful of giant row groups at scale), the 100-1000x
exploded work runs on a handful of cores.

The fix is a hash repartition of the COMPACT pre-explode rows by the
document key, with an explicit partition count so AQE does not coalesce
the (byte-wise tiny) shuffle back down — the point is CPU spread, not
byte balance. Because the rows are hash-distributed by the same key the
downstream ``groupBy(key)`` requires, Catalyst reuses the partitioning
and the exploded data itself never shuffles. When the scan is already
wide (the normal case on a cluster reading many files), this is a
no-op — no shuffle is added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shuffle_parallelism(df: DataFrame) -> int:
    """The session's target shuffle parallelism (fallback 200)."""
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return 200


def rebalance_by_key(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-repartition ``df`` by ``key_col`` iff the input has fewer
    partitions than half the shuffle parallelism; otherwise pass
    through unchanged (never adds a shuffle to an already-wide scan)."""
    target = shuffle_parallelism(df)
    n_in = df.rdd.getNumPartitions()
    if n_in * 2 >= target:
        return df
    return df.repartition(target, F.col(key_col))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_expr,
    n_salt: int,
    sums: dict[str, object] | None = None,
    count_alias: str | None = None,
) -> DataFrame:
    """Skew-resistant two-phase aggregation.

    When a groupBy key is heavily skewed (a handful of keys own most
    rows), the final-aggregation task for a hot key can be 1000x its
    siblings. Salting splits each key into ``n_salt`` sub-groups for
    the first (wide) aggregation, then combines the per-salt partials
    in a second, tiny aggregation — two shuffles, both balanced, and
    results identical to the direct groupBy because SUM and COUNT
    re-aggregate exactly (callers pass decimal-cast columns for
    float-exactness, see plans/common.dsum).

    ``sums`` maps output alias -> column expression to SUM;
    ``count_alias`` adds a row count. AQE's skew-join splitting does
    not cover single-stage aggregation skew — this operator is the
    explicit fix."""
    sums = sums or {}
    salted = df.withColumn("_salt", F.pmod(salt_expr, F.lit(n_salt)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(a) for a, c in sums.items()],
        F.count(F.lit(1)).alias("_cnt"),
    )
    final = [F.sum(a).alias(a) for a in sums]
    if count_alias:
        final.append(F.sum("_cnt").alias(count_alias))
    return partial.groupBy(*keys).agg(*final)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    salt_expr,
    n_salt: int,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big/skewed side gets a salt from
    one of ITS columns (any well-distributed expression — an id hash),
    the other side is replicated n_salt times, and the join runs on
    (keys + salt). A hot key's rows now spread over n_salt reducers
    instead of one. Results are identical to the plain join; cost is
    n_salt-fold replication of the right side — use when the right
    side is too big to broadcast but n_salt copies still beat one
    straggler task. (AQE's skew-join split handles many cases at
    runtime; explicit salting is for skew you KNOW about, and for
    aggregation-after-join pipelines where AQE's split boundaries
    don't help.)"""
    l = left.withColumn("_salt", F.pmod(salt_expr, F.lit(n_salt)))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l.join(r, on=[*key_cols, "_salt"], how=how).drop("_salt")
