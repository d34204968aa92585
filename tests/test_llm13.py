"""Round-10 tests: IVF index rollover (the remediation half of the
index-ops story) and the operator-bounded recall-eval sampling knob.
"""

from __future__ import annotations

import json as _json

import numpy as np
import pytest

import synthea_etl_spark.operators.similarity as S


@pytest.fixture()
def vec_corpus(spark):
    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(150)]
    return vecs, spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )


def _key(r):
    return (r.cluster, r.neighbor_id, tuple(r.cv))


def test_rollover_equals_fresh_rebuild(spark, tmp_path, vec_corpus):
    """The core invariant the round-9 VERDICT asked for:
    ``rollover(index, C') == ivf_index(corpus, C')`` row-for-row —
    with a LLOYD-REFINED retrain (the production path; the gate's
    q204 covers the seed-only closed form). The retrain runs FROM
    THE STORE, so the equality also certifies that the store losslessly
    carries the corpus vectors."""
    vecs, corpus = vec_corpus
    index_path = str(tmp_path / "index")
    c1 = S.ivf_train_centroids(
        corpus, "vec_id", "embedding", n_centroids=8, lloyd_iters=1
    )
    S.ivf_index(corpus, c1).write.parquet(index_path)

    c2 = S.ivf_index_rollover(
        spark, index_path, n_centroids=5, lloyd_iters=1
    )
    rolled = spark.read.parquet(index_path)
    fresh = S.ivf_index(corpus, c2)
    assert sorted(map(_key, rolled.collect())) == sorted(
        map(_key, fresh.collect())
    )
    # and the retrained quantizer matches one trained on the corpus
    # directly (store ids/vectors == corpus ids/vectors) up to the
    # order-dependence of Lloyd's float mean — the store is read with
    # different partitioning, so F.avg partials combine in a different
    # order (last-ulp differences only; the seed-only closed form is
    # hash-exact and gated as q204)
    c2_direct = S.ivf_train_centroids(
        corpus, "vec_id", "embedding", n_centroids=5, lloyd_iters=1
    )
    assert np.allclose(np.array(c2), np.array(c2_direct), atol=1e-12)


def test_rollover_explicit_centroids_and_swap_atomicity(
    spark, tmp_path, vec_corpus
):
    """Passing new_centroids skips the retrain; the publish is the
    write_swap discipline (no __tmp sibling left behind, old
    generation fully replaced) and the centroid table round-trips."""
    import os

    vecs, corpus = vec_corpus
    index_path = str(tmp_path / "index")
    cent_path = str(tmp_path / "centroids")
    c1 = S.ivf_train_centroids(
        corpus, "vec_id", "embedding", n_centroids=8, lloyd_iters=0
    )
    S.ivf_index(corpus, c1).write.parquet(index_path)

    new_c = [list(v) for _, v in vecs[:4]]
    got = S.ivf_index_rollover(
        spark, index_path, new_centroids=new_c, centroids_path=cent_path
    )
    assert got == new_c
    assert S.load_centroids(spark, cent_path) == new_c
    assert not os.path.exists(index_path + "__tmp")
    rolled = spark.read.parquet(index_path)
    assert sorted(map(_key, rolled.collect())) == sorted(
        map(_key, S.ivf_index(corpus, new_c).collect())
    )
    # every row re-assigned under the 4-cell quantizer
    assert {r.cluster for r in rolled.select("cluster").distinct().collect()} <= set(range(4))


def test_stream_resumes_against_rolled_index(spark, tmp_path):
    """The stream-compatibility contract from the VERDICT ask:
    ann_index_ingest_stream ingests two batches under quantizer A;
    rollover re-assigns the stored partitions under retrained
    quantizer B (batch_id layout preserved through the swap); the
    RESTARTED stream — handed B — ingests a third batch, and the
    accumulated index equals a batch rebuild of the full corpus
    under B. Also pins the replay contract post-rollover: a replayed
    batch partition rewrite is a no-op."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from synthea_etl_spark.pipeline import ann_index_ingest_stream

    landing = tmp_path / "landing"
    index = tmp_path / "index"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    rng = np.random.RandomState(43)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(150)]
    corpus = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    cA = [list(v) for _, v in vecs[:6]]

    def land(name, rows):
        (landing / name).write_text(
            "\n".join(
                _json.dumps({"vec_id": i, "embedding": v}) for i, v in rows
            )
        )

    def run(centroids):
        ann_index_ingest_stream(
            spark, str(landing), str(index), str(ckpt), schema, centroids
        ).awaitTermination(120)

    land("b0.json", vecs[:60])
    run(cA)
    land("b1.json", vecs[60:100])
    run(cA)

    # drift remediation between stream runs
    cB = S.ivf_index_rollover(
        spark, str(index), n_centroids=4, lloyd_iters=1
    )
    # batch_id partition layout survived the swap
    assert {
        r.batch_id
        for r in spark.read.parquet(str(index))
        .select("batch_id")
        .distinct()
        .collect()
    } == {0, 1}

    land("b2.json", vecs[100:])
    run(cB)  # restarted stream resumes from checkpoint with B

    streamed = spark.read.parquet(str(index)).drop("batch_id")
    rebuilt = S.ivf_index(corpus, cB)
    assert sorted(map(_key, streamed.collect())) == sorted(
        map(_key, rebuilt.collect())
    )

    # replayed batch 1 (now under B) rewrites its own partition: no-op
    full = spark.read.parquet(str(index))
    b1 = spark.createDataFrame(
        full.filter("batch_id = 1").collect(), full.schema
    )
    (
        b1.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(str(index))
    )
    again = spark.read.parquet(str(index)).drop("batch_id")
    assert sorted(map(_key, again.collect())) == sorted(
        map(_key, rebuilt.collect())
    )
    # probes against the maintained index rank identically to the
    # rebuild (fresh read: the replay rewrite replaced batch 1's files)
    current = spark.read.parquet(str(index)).drop("batch_id")
    queries = corpus.filter(F.col("vec_id") < 8)
    rk = lambda df: sorted(  # noqa: E731
        (r.query_id, r.rank, r.neighbor_id, r.sim) for r in df.collect()
    )
    assert rk(
        S.knn_ann_ivf_grouped_probe(current, cB, queries, k=3, n_probe=2)
    ) == rk(S.knn_ann_ivf_grouped_probe(rebuilt, cB, queries, k=3, n_probe=2))


def test_recall_eval_sampling_is_a_subset_and_fraction1_is_identity(
    spark,
):
    """sample_fraction=1.0 must be the EXACT q202/q203 report (the
    unchanged-gate-hash requirement), and a sampled report must be
    exactly the full report restricted to sampled-id pairs — the
    md5-threshold selection commutes with the eval."""
    from pyspark.sql import functions as F

    from synthea_etl_spark.plans.llm12 import (
        _md5_sample,
        minhash_recall_eval,
    )

    docs = spark.createDataFrame(
        [
            (i, f"tok{i % 7} tok{(i + 1) % 7} tok{(i + 2) % 7} shared text body")
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    full = minhash_recall_eval(docs, sample_fraction=1.0)
    key = lambda r: (r.id_a, r.id_b, r.jaccard, r.caught)  # noqa: E731
    # fraction >= 1 returns the identical plan (no filter node)
    assert sorted(map(key, full.collect())) == sorted(
        map(key, minhash_recall_eval(docs).collect())
    )

    frac = 0.4
    sampled_ids = {
        r.doc_id for r in _md5_sample(docs, "doc_id", frac).collect()
    }
    assert 0 < len(sampled_ids) < 40
    got = minhash_recall_eval(docs, sample_fraction=frac)
    expect = full.filter(
        F.col("id_a").isin(sampled_ids) & F.col("id_b").isin(sampled_ids)
    )
    assert sorted(map(key, got.collect())) == sorted(
        map(key, expect.collect())
    )


def test_write_versioned_pointer_swap_has_no_absence_window(
    spark, tmp_path
):
    """round-10 ADVICE close: a reader that resolved the pointer
    BEFORE a publish keeps a fully-readable path AFTER the publish
    (old versions are never deleted), and a post-publish resolve
    sees the new data. Contrast write_swap, whose rmtree->rename
    leaves a path-not-found window."""
    from synthea_etl_spark.operators.scd2 import (
        read_current,
        write_versioned,
    )

    root = str(tmp_path / "dim")
    v1 = write_versioned(
        spark.createDataFrame([(1, "a")], "id long, val string"), root
    )
    old = read_current(root)
    assert old == v1
    v2 = write_versioned(
        spark.createDataFrame([(2, "b")], "id long, val string"), root
    )
    # the pre-publish resolution is STILL fully readable
    assert [r.val for r in spark.read.parquet(old).collect()] == ["a"]
    # and a fresh resolution sees the new version
    new = read_current(root)
    assert new == v2 and new != old
    assert [r.val for r in spark.read.parquet(new).collect()] == ["b"]
    # partitioned layout survives versioned publish too
    v3 = write_versioned(
        spark.createDataFrame(
            [(3, 0, "c"), (4, 1, "d")],
            "id long, batch_id long, val string",
        ),
        root,
        partition_by=["batch_id"],
    )
    import os

    assert read_current(root) == v3
    assert sorted(
        d for d in os.listdir(v3) if d.startswith("batch_id=")
    ) == ["batch_id=0", "batch_id=1"]


def test_version_reservation_is_atomic_and_skips_taken_numbers(
    spark, tmp_path
):
    """round-11 ADVICE close: a concurrently-reserved version number
    (simulated by pre-creating the v=<n> dir another publisher's
    os.mkdir just won) is skipped — the second publisher lands in a
    DISTINCT directory, never interleaving data into the same one."""
    import os

    from synthea_etl_spark.operators.scd2 import (
        read_current,
        write_versioned,
    )

    root = str(tmp_path / "dim")
    write_versioned(
        spark.createDataFrame([(1, "a")], "id long, val string"), root
    )
    # another publisher reserved v=2 and is still writing into it
    os.mkdir(os.path.join(root, "v=2"))
    v3 = write_versioned(
        spark.createDataFrame([(3, "c")], "id long, val string"), root
    )
    assert v3.endswith("v=3")
    assert read_current(root) == v3
    assert [r.val for r in spark.read.parquet(v3).collect()] == ["c"]
    # the in-flight reservation was not touched
    assert os.listdir(os.path.join(root, "v=2")) == []


def test_prune_versions_grace_and_inflight_guard(spark, tmp_path):
    """prune_versions deletes superseded versions only after the
    read-grace on the pointer flip, never the current version, and
    never a fresh (possibly in-flight) reservation."""
    import os
    import time

    from synthea_etl_spark.operators.scd2 import (
        prune_versions,
        read_current,
        write_versioned,
    )

    root = str(tmp_path / "dim")
    for i, v in enumerate(["a", "b", "c"]):
        write_versioned(
            spark.createDataFrame([(i, v)], "id long, val string"), root
        )
    cur = read_current(root)
    assert cur.endswith("v=3")
    # everything published moments ago: a long grace prunes nothing
    # (each superseded version is judged by the age of the flip that
    # superseded it — the next version's dir mtime)
    assert prune_versions(root, grace_s=3600) == []
    # backdate the whole history past the grace; an in-flight
    # publish (reservation carrying .INPROGRESS) must SURVIVE even
    # though its dir is old — nested part writes never refresh it
    past = time.time() - 100
    os.utime(os.path.join(root, "_CURRENT"), (past, past))
    for d in ("v=1", "v=2", "v=3"):
        os.utime(os.path.join(root, d), (past, past))
    os.mkdir(os.path.join(root, "v=9"))
    open(os.path.join(root, "v=9", ".INPROGRESS"), "w").close()
    os.utime(os.path.join(root, "v=9"), (past, past))
    pruned = prune_versions(root, grace_s=50)
    assert sorted(os.path.basename(p) for p in pruned) == ["v=1", "v=2"]
    assert os.path.isdir(os.path.join(root, "v=9"))
    assert [r.val for r in spark.read.parquet(cur).collect()] == ["c"]
    # a CRASHED publish (stale marker) is reclaimed only via the
    # explicit abandon bound
    assert prune_versions(root, grace_s=50) == []
    os.utime(os.path.join(root, "v=9", ".INPROGRESS"), (past, past))
    assert [
        os.path.basename(p)
        for p in prune_versions(root, grace_s=50, abandon_s=50)
    ] == ["v=9"]


def test_reservation_is_born_marked_and_flip_precedes_unmark(
    spark, tmp_path
):
    """round-12 ADVICE close (reservation race): the v=<n> dir must
    never be observable WITHOUT its .INPROGRESS marker before it is
    current — the old mkdir-then-create-marker window let a
    concurrent prune rmtree a fresh reservation. Now the marker is
    staged in a hidden .reserve temp dir that is atomically RENAMED
    to v=<n>, and _flip_current removes the marker only AFTER the
    pointer flip (an unmarked dir above _CURRENT was equally
    prunable in the old order)."""
    import os

    from synthea_etl_spark.operators.scd2 import (
        _flip_current,
        _reserve_version,
        prune_versions,
        read_current,
        write_versioned,
    )

    root = str(tmp_path / "dim")
    write_versioned(
        spark.createDataFrame([(1, "a")], "id long, val string"), root
    )
    # reserve the next version: marker present from birth, no temp
    # leftovers
    vpath, nxt = _reserve_version(root)
    assert os.path.exists(os.path.join(vpath, ".INPROGRESS"))
    assert not [d for d in os.listdir(root) if d.startswith(".reserve-")]
    # an aggressive zero-grace prune between reservation and publish
    # must not touch the reservation (this is the exact ADVICE race)
    past = __import__("time").time() - 100
    os.utime(os.path.join(root, "_CURRENT"), (past, past))
    os.utime(os.path.join(root, "v=1"), (past, past))
    os.utime(vpath, (past, past))
    assert prune_versions(root, grace_s=0) == []
    # publish: data lands, flip makes it current, marker cleared
    spark.createDataFrame([(2, "b")], "id long, val string").write.mode(
        "append"
    ).parquet(vpath)
    _flip_current(root, nxt)
    assert read_current(root) == vpath
    assert not os.path.exists(os.path.join(vpath, ".INPROGRESS"))
    # a crashed reservation (temp dir that never renamed) is
    # reclaimed only via the abandon bound
    crashed = os.path.join(root, ".reserve-deadbeef")
    os.mkdir(crashed)
    open(os.path.join(crashed, ".INPROGRESS"), "w").close()
    os.utime(crashed, (past, past))
    assert prune_versions(root, grace_s=0) in ([], [os.path.join(root, "v=1")])
    assert os.path.isdir(crashed)
    assert crashed in prune_versions(root, grace_s=0, abandon_s=50)
    assert not os.path.isdir(crashed)


def test_write_versioned_parts_publishes_pair_in_one_flip(
    spark, tmp_path
):
    """Multi-artifact publish: both parts land under ONE version and
    one pointer flip; a reader holding the old version keeps a
    consistent PAIR (both halves from the same version)."""
    import os

    from synthea_etl_spark.operators.scd2 import (
        read_current,
        write_versioned_parts,
    )

    root = str(tmp_path / "pair")
    write_versioned_parts(
        {
            "index": spark.createDataFrame(
                [(1, 0)], "id long, batch_id long"
            ),
            "centroids": spark.createDataFrame([(0, [0.0])],
                                               "cid int, c array<double>"),
        },
        root,
        partition_by={"index": ["batch_id"]},
    )
    old = read_current(root)
    write_versioned_parts(
        {
            "index": spark.createDataFrame(
                [(2, 1)], "id long, batch_id long"
            ),
            "centroids": spark.createDataFrame([(0, [1.0])],
                                               "cid int, c array<double>"),
        },
        root,
    )
    # old pair: both halves still readable and mutually consistent
    assert [r.id for r in
            spark.read.parquet(os.path.join(old, "index")).collect()] == [1]
    assert spark.read.parquet(
        os.path.join(old, "centroids")
    ).collect()[0].c == [0.0]
    new = read_current(root)
    assert new != old
    assert [r.id for r in
            spark.read.parquet(os.path.join(new, "index")).collect()] == [2]
    # partitioned layout survived in the versioned part
    assert any(
        d.startswith("batch_id=") for d in os.listdir(os.path.join(old, "index"))
    )


def test_versioned_rollover_reader_across_flip_and_prune(
    spark, tmp_path, vec_corpus
):
    """The round-11 VERDICT #4 close, in-process: a reader resolves
    the (index, centroids) pair, a rollover + prune land, and the
    reader's already-planned probe still executes (prune honors the
    grace); a fresh resolve sees the new pair and
    rollover == fresh-rebuild holds on the versioned layout too."""
    import os
    import time

    from synthea_etl_spark.operators.scd2 import prune_versions

    vecs, corpus = vec_corpus
    root = str(tmp_path / "ivf")
    c1 = S.ivf_train_centroids(
        corpus, "vec_id", "embedding", n_centroids=8, lloyd_iters=0
    )
    S.ivf_publish_versioned(
        spark,
        S.ivf_index(corpus, c1),
        c1,
        root,
    )
    # reader resolves the current pair and PLANS (lazy) a probe
    old_index, old_cents = S.ivf_read_current(spark, root)
    queries = corpus.limit(5).withColumnRenamed("vec_id", "qid")
    planned = S.knn_ann_ivf_probe(
        old_index,
        old_cents,
        queries,
        id_col="qid",
        vec_col="embedding",
        k=3,
        n_probe=2,
    )
    # rollover publishes v=2; prune with grace leaves v=1 (fresh flip)
    new_c = S.ivf_index_rollover_versioned(
        spark, root, n_centroids=5, lloyd_iters=1, prune_grace_s=3600
    )
    assert os.path.isdir(os.path.join(root, "v=1"))
    # the pre-flip plan still executes against v=1 files
    got = planned.collect()
    assert len(got) > 0
    # fresh resolve == fresh rebuild under the new quantizer
    new_index, new_cents = S.ivf_read_current(spark, root)
    assert new_cents == [[float(x) for x in c] for c in new_c]
    assert sorted(map(_key, new_index.collect())) == sorted(
        map(_key, S.ivf_index(corpus, new_c).collect())
    )
    # after the grace elapses (judged by the SUPERSEDING version's
    # age) the superseded version is collected
    past = time.time() - 100
    os.utime(os.path.join(root, "_CURRENT"), (past, past))
    os.utime(os.path.join(root, "v=1"), (past, past))
    os.utime(os.path.join(root, "v=2"), (past, past))
    assert [os.path.basename(p) for p in prune_versions(root, 50)] == [
        "v=1"
    ]
    assert not os.path.isdir(os.path.join(root, "v=1"))
    assert os.path.isdir(os.path.join(root, "v=2"))
