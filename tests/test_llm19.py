"""Round-12 tests: compaction GC read-grace, the q225
boundary-equality fix, the empty-text oracle guard, and the
versioned-publish lifecycle additions not already covered in
test_llm13 (which holds the reservation / prune / paired-publish
tests)."""

from __future__ import annotations

import os
import time

import duckdb
import pytest

from pyspark.sql import functions as F


def _backdate_flips(store: str, past: float) -> None:
    """Backdate the watermark file AND every flip sidecar — since the
    round-12 ADVICE fix, the graced GC judges each superseded dir
    against the sidecar of the flip that superseded it, not the main
    watermark file's mtime."""
    from synthea_etl_spark.operators.dedup import (
        _compaction_watermark_path,
    )

    wmp = _compaction_watermark_path(store)
    os.utime(wmp, (past, past))
    base = os.path.basename(wmp) + "."
    for d in os.listdir(store):
        if d.startswith(base) and d[len(base):].isdigit():
            os.utime(os.path.join(store, d), (past, past))


def test_gc_grace_defers_counting_slice_deletion(spark, tmp_path):
    """round-11 ADVICE close: compaction with a gc grace leaves the
    just-folded dirs on disk (so a reader whose scan was planned
    PRE-FLIP still collects), keeps totals exact via the watermark
    filter, and an explicit gc call deletes them only after the
    grace elapses."""
    from synthea_etl_spark.operators.dedup import (
        _compaction_watermark_path,
        compact_counting_slices,
        counting_store_totals,
        gc_counting_slices,
    )

    store = str(tmp_path / "store")
    for b, rows in enumerate(
        [[("a", 1), ("b", 2)], [("a", 3)]]
    ):
        (
            spark.createDataFrame(rows, "k string, n long")
            .withColumn("slice_id", F.lit(f"batch{b}"))
            .write.mode("append")
            .partitionBy("slice_id")
            .parquet(store)
        )

    def totals():
        return {
            (r.k, r.n)
            for r in counting_store_totals(spark, store, ["k"], "n").collect()
        }

    want = {("a", 4), ("b", 2)}
    assert totals() == want
    # a reader planned against the PRE-COMPACTION layout
    pre_reader = spark.read.parquet(store)
    compact_counting_slices(
        spark, store, 1, ["k"], "n", gc_grace_s=3600.0
    )
    # folded dirs survive the grace; totals exact either way
    assert os.path.isdir(os.path.join(store, "slice_id=batch0"))
    assert os.path.isdir(os.path.join(store, "slice_id=batch1"))
    assert totals() == want
    # the pre-flip reader still scans its dirs without file-not-found
    assert pre_reader.count() == 3
    # watermark fresh -> explicit gc with grace is a no-op
    assert gc_counting_slices(store, grace_s=3600.0) == []
    # grace elapsed -> gc collects folded batches (compacted stays)
    past = time.time() - 100
    _backdate_flips(store, past)
    deleted = gc_counting_slices(store, grace_s=50.0)
    assert sorted(os.path.basename(p) for p in deleted) == [
        "slice_id=batch0",
        "slice_id=batch1",
    ]
    assert os.path.isdir(os.path.join(store, "slice_id=compacted1"))
    assert totals() == want


def test_gc_grace_defers_batch_partition_deletion(spark, tmp_path):
    """Same contract on the row-set (batch_id) stores."""
    from synthea_etl_spark.operators.dedup import (
        _compaction_watermark_path,
        batch_watermark_filter,
        compact_batch_partitions,
        gc_batch_partitions,
    )

    store = str(tmp_path / "store")
    for b in range(2):
        (
            spark.createDataFrame(
                [(b * 10 + i,) for i in range(3)], "id long"
            )
            .withColumn("batch_id", F.lit(b))
            .write.mode("append")
            .partitionBy("batch_id")
            .parquet(store)
        )

    def ids():
        return {
            r.id
            for r in batch_watermark_filter(
                spark.read.parquet(store), store
            ).collect()
        }

    want = {0, 1, 2, 10, 11, 12}
    assert ids() == want
    compact_batch_partitions(spark, store, 1, gc_grace_s=3600.0)
    assert os.path.isdir(os.path.join(store, "batch_id=0"))
    assert os.path.isdir(os.path.join(store, "batch_id=1"))
    assert ids() == want
    assert gc_batch_partitions(store, grace_s=3600.0) == []
    past = time.time() - 100
    _backdate_flips(store, past)
    deleted = gc_batch_partitions(store, grace_s=50.0)
    assert sorted(os.path.basename(p) for p in deleted) == [
        "batch_id=0",
        "batch_id=1",
    ]
    # current compacted partition -(wm+2) = -3 survives
    assert os.path.isdir(os.path.join(store, "batch_id=-3"))
    assert ids() == want


def test_graced_gc_under_fast_compaction_cadence(spark, tmp_path):
    """round-12 ADVICE (medium): when compaction cadence is faster
    than the gc grace, the LATEST flip is always younger than the
    grace — judging every deletion against it made graced GC a
    permanent no-op (unbounded dir growth). Each superseded
    generation must be judged against the flip that superseded IT
    (the per-flip sidecars), so old generations are collected even
    while the newest flip is fresh."""
    from synthea_etl_spark.operators.dedup import (
        _compaction_watermark_path,
        compact_counting_slices,
        counting_store_totals,
        gc_counting_slices,
    )

    store = str(tmp_path / "store")
    for b, rows in enumerate([[("a", 1)], [("a", 2)], [("a", 4)]]):
        (
            spark.createDataFrame(rows, "k string, n long")
            .withColumn("slice_id", F.lit(f"batch{b}"))
            .write.mode("append")
            .partitionBy("slice_id")
            .parquet(store)
        )
    for upto in (0, 1, 2):
        compact_counting_slices(
            spark, store, upto, ["k"], "n", gc_grace_s=3600.0
        )
    # fast cadence: flips 0 and 1 happened long ago, flip 2 (and the
    # main watermark file) is FRESH — the old rule would delete
    # nothing here, ever
    past = time.time() - 100
    wmp = _compaction_watermark_path(store)
    os.utime(wmp + ".0", (past, past))
    os.utime(wmp + ".1", (past, past))
    deleted = sorted(
        os.path.basename(p) for p in gc_counting_slices(store, grace_s=50.0)
    )
    # generations superseded by the AGED flips 0/1 are collected...
    assert deleted == [
        "slice_id=batch0",
        "slice_id=batch1",
        "slice_id=compacted0",
    ]
    # ...while the generation superseded by the FRESH flip 2 is
    # still deferred, and the current generation untouched
    assert os.path.isdir(os.path.join(store, "slice_id=compacted1"))
    assert os.path.isdir(os.path.join(store, "slice_id=batch2"))
    assert os.path.isdir(os.path.join(store, "slice_id=compacted2"))
    # drained flips' sidecars are cleaned up; live ones kept
    assert not os.path.exists(wmp + ".0")
    assert not os.path.exists(wmp + ".1")
    assert os.path.exists(wmp + ".2")
    assert {
        (r.k, r.n)
        for r in counting_store_totals(spark, store, ["k"], "n").collect()
    } == {("a", 7)}
    # once flip 2 ages too, the remaining superseded generation goes
    os.utime(wmp + ".2", (past, past))
    deleted2 = sorted(
        os.path.basename(p) for p in gc_counting_slices(store, grace_s=50.0)
    )
    assert deleted2 == ["slice_id=batch2", "slice_id=compacted1"]


def test_prefix_admit_boundary_on_exact_budget_edge(spark):
    """round-11 ADVICE close: when the budget lands EXACTLY on a
    bucket edge, zero-token docs at that bucket's head are admitted
    (oracle running-sum <= budget semantics). The old strict
    ``_before < _budget`` filter dropped the bucket entirely."""
    from synthea_etl_spark.plans.llm18 import _prefix_admit

    scored = spark.createDataFrame(
        [
            (1, 5, "00" + "a" * 30),   # bucket 0x00: fills budget exactly
            (2, 0, "01" + "a" * 30),   # bucket 0x01 head: zero tokens
            (3, 7, "01" + "b" * 30),   # bucket 0x01: over budget
        ],
        "doc_id long, n_tokens long, _h string",
    )
    budget = spark.createDataFrame([(5,)], "_budget long")
    got = {
        r.doc_id: r.admitted
        for r in _prefix_admit(scored, F.broadcast(budget)).collect()
    }
    # naive global running sum in (_h, doc_id) order:
    # doc1 prefix 5 <= 5 admit; doc2 prefix 5 <= 5 admit; doc3 12 > 5
    assert got == {1: True, 2: True, 3: False}


def test_line_oracles_match_engine_on_empty_text(spark, tmp_path):
    """round-11 ADVICE close: DuckDB string_split_regex('') yields
    [''] (1 token) where the engine's tokens() yields [] — the
    _SQL_LINES CASE guard makes the line oracles agree with the
    engine on corpora containing empty-text documents."""
    import __spark_entry__ as ent
    from tools.selfcheck import table_hash

    docs = spark.createDataFrame(
        [
            (1, "", "en", "web", 0),
            (2, "   ", "en", "web", 3),
            (3, "alpha beta gamma " * 8, "en", "web", 136),
            (4, "alpha beta gamma " * 8, "en", "web", 136),
            (5, "unique words only here now", "en", "web", 26),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    qs, oracles = ent.queries(), ent.oracle_sql()
    for name in (
        "q212_boilerplate_line_removal",
        "q213_c4_line_filters",
        "q223_site_boilerplate_removal",
    ):
        sdf = qs[name](spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(oracles[name])
        drows = rel.fetchall()
        assert len(srows) == len(drows), name
        assert table_hash(sdf.columns, srows) == table_hash(
            rel.columns, drows
        ), name
    con.close()


def test_blocklist_shapes_agree_and_dispatch(spark):
    """The q217 large-K close: the explode+broadcast-join shape
    returns EXACTLY the alternation shape's frame (counts, score,
    verdict) on the same corpus — including zero-hit docs — and the
    dispatcher flips to the join at the crossover K."""
    from synthea_etl_spark.plans.llm16 import (
        _BLOCK_JOIN_MIN_K,
        blocklist_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "dup dup corrupt fine words here"),
            (2, "totally clean text with no hits at all"),
            (3, "slow big slow big slow big slow big"),
            (4, ""),
            (5, "dup"),
            (6, None),  # NULL text: zero hits on every shape (r12 review)
        ],
        "doc_id long, text string",
    )

    def rows(shape):
        return sorted(
            tuple(r)
            for r in blocklist_scores(docs, shape=shape).collect()
        )

    a, j = rows("alternation"), rows("join")
    assert a == j
    # the default Arrow/RE2 shape is bit-identical too
    assert rows("arrow") == a
    assert rows(None) == a
    # sanity on the values themselves
    byid = {r[0]: r for r in a}
    assert byid[1] == (1, 3, 0, 12, True)
    assert byid[2] == (2, 0, 0, 0, False)
    assert byid[3] == (3, 0, 8, 8, True)
    assert byid[4] == (4, 0, 0, 0, False)
    # jvm dispatch: a large synthetic wordlist picks the join shape
    # (the padding words are absent from the corpus, so results match
    # the 4-word lists exactly); and arrow handles the same large K
    pad = tuple(f"zzpad{i}" for i in range(_BLOCK_JOIN_MIN_K))
    for shp in ("jvm", "arrow"):
        big = sorted(
            tuple(r)
            for r in blocklist_scores(
                docs,
                severe=("dup", "corrupt") + pad,
                mild=("slow", "big"),
                shape=shp,
            ).collect()
        )
        assert big == a, shp


def test_blocklist_terms_with_regex_metacharacters_count_literally(
    spark,
):
    """round-12 ADVICE close: blocklist terms are LITERAL tokens.
    Unescaped, a term like 'a.b' became the pattern a.b (matching
    'aXb') and 'c++' broke the alternation entirely — diverging from
    the contains gate and the join shape's token equality. Both
    regex shapes (JVM alternation, Arrow/RE2) must escape."""
    from synthea_etl_spark.plans.llm16 import blocklist_scores

    docs = spark.createDataFrame(
        [
            (1, "the a.b term appears once"),
            (2, "aXb must NOT count as the dotted term"),
            (3, "c++ and c++ twice"),
            (4, "cxx is not c plus plus"),
            (5, "ein über beispiel mit über zwei treffern"),
        ],
        "doc_id long, text string",
    )
    for shape in ("alternation", "arrow"):
        got = {
            r.doc_id: (r.hits_severe, r.hits_mild)
            for r in blocklist_scores(
                docs, severe=("a.b", "über"), mild=("c++",), shape=shape
            ).collect()
        }
        assert got[1] == (1, 0), shape
        assert got[2] == (0, 0), shape  # aXb is not a literal a.b
        # trailing '+' is not a word char, so \b after it anchors at
        # the +/space boundary either way; both occurrences count
        assert got[3] == (0, 2), shape
        assert got[4] == (0, 0), shape
        # round-13 review close: both engines' \b is ASCII, so a
        # non-ASCII term must NOT be anchored with Python's Unicode
        # \w — anchored, it could never match and silently counted 0
        assert got[5] == (2, 0), shape


def test_crawl_pipeline_stage_invariants(spark):
    """q226 composition invariants on the real sf0.001 corpus: the
    stage label is a partition (exactly one per doc), split/phase/
    shard fields are populated iff the doc reached that stage, and
    leaked docs are eval-side only."""
    from tests.conftest import SF_SMALL
    from synthea_etl_spark.plans.llm19 import (
        q226_crawl_training_pipeline,
    )

    rows = q226_crawl_training_pipeline(spark, SF_SMALL).collect()
    assert len(rows) > 0
    stages = {r.stage for r in rows}
    assert stages <= {
        "line_curation",
        "exact_dup",
        "quality",
        "leaked",
        "admitted",
    }
    for r in rows:
        if r.stage in ("admitted", "leaked"):
            assert r.split in ("train", "val", "test"), r
        else:
            assert r.split == "none", r
        if r.stage == "leaked":
            assert r.split in ("val", "test"), r
        if r.phase1 or r.phase2:
            # only admitted TRAIN docs enter the schedule
            assert r.stage == "admitted" and r.split == "train", r
            assert 0 <= r.shard_id < 16, r
        else:
            assert r.shard_id == -1, r
    # the funnel actually funnels: at least two distinct stages fire
    # on the real corpus (all-admitted would mean stages are inert)
    assert len(stages) >= 2, stages


def test_postings_store_compaction_transparent_to_bm25(spark, tmp_path):
    """round-11 VERDICT #6: the retrieval postings store folds with
    the generic row-set compactor; bm25_topk_from_index answers
    identically through postings_from_store before and after a
    mid-stream compaction, and a replayed folded batch is a no-op."""
    import json as _json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from synthea_etl_spark.operators.dedup import (
        compact_batch_partitions,
        compaction_watermark,
    )
    from synthea_etl_spark.operators.retrieval import (
        bm25_topk_from_index,
        inverted_index,
    )
    from synthea_etl_spark.pipeline import (
        postings_from_store,
        retrieval_index_ingest_stream,
    )
    from tests.test_llm4 import CORPUS, _docs, _queries, _ranking

    landing = tmp_path / "landing"
    index = tmp_path / "index"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def land(name, rows):
        (landing / name).write_text(
            "\n".join(_json.dumps({"doc_id": i, "text": t}) for i, t in rows)
        )

    def run():
        retrieval_index_ingest_stream(
            spark, str(landing), str(index), str(ckpt), schema
        ).awaitTermination(120)

    land("b0.json", CORPUS[:2])
    run()
    land("b1.json", CORPUS[2:4])
    run()

    rebuilt_half = inverted_index(_docs(spark, CORPUS[:4]))
    want_half = _ranking(
        bm25_topk_from_index(rebuilt_half, _queries(spark), k=4)
    )

    def got():
        return _ranking(
            bm25_topk_from_index(
                postings_from_store(spark, str(index)), _queries(spark), k=4
            )
        )

    assert got() == want_half
    # mid-stream fold of batches 0..1, then MORE stream batches
    compact_batch_partitions(spark, str(index), 1)
    assert compaction_watermark(str(index)) == 1
    assert got() == want_half
    land("b2.json", CORPUS[4:])
    run()
    rebuilt_full = inverted_index(_docs(spark, CORPUS))
    want_full = _ranking(
        bm25_topk_from_index(rebuilt_full, _queries(spark), k=4)
    )
    assert got() == want_full
    # row-level identity too, not just rankings
    assert sorted(
        (r.t, r.doc_id, r.tf)
        for r in postings_from_store(spark, str(index)).collect()
    ) == sorted((r.t, r.doc_id, r.tf) for r in rebuilt_full.collect())
    # replay of a FOLDED batch is a no-op (the stream-side watermark
    # skip): simulate the checkpoint replaying batch 1
    from synthea_etl_spark.operators.retrieval import inverted_index as _ii

    replay = _docs(spark, CORPUS[2:4])
    # the stream's ingest_batch guard: batch_id 1 <= watermark 1
    # (exercise through a fresh stream run over the same landing dir
    # with a WIPED checkpoint — every batch replays, folded ones must
    # not double)
    import shutil

    shutil.rmtree(str(ckpt))
    run()
    assert got() == want_full
    assert sorted(
        (r.t, r.doc_id, r.tf)
        for r in postings_from_store(spark, str(index)).collect()
    ) == sorted((r.t, r.doc_id, r.tf) for r in rebuilt_full.collect())


def test_graced_gc_runs_at_next_compaction(spark, tmp_path):
    """round-12 review catch: with a grace, the in-compaction GC ran
    AFTER the flip (watermark mtime = now) and was a no-op forever —
    superseded dirs grew without bound. Now the graced GC runs at the
    START of the next compaction against the PREVIOUS flip's age."""
    from synthea_etl_spark.operators.dedup import (
        _compaction_watermark_path,
        compact_counting_slices,
        counting_store_totals,
    )

    store = str(tmp_path / "store")
    for b, rows in enumerate([[("a", 1)], [("a", 2)], [("a", 4)]]):
        (
            spark.createDataFrame(rows, "k string, n long")
            .withColumn("slice_id", F.lit(f"batch{b}"))
            .write.mode("append")
            .partitionBy("slice_id")
            .parquet(store)
        )
    compact_counting_slices(spark, store, 0, ["k"], "n", gc_grace_s=3600)
    assert os.path.isdir(os.path.join(store, "slice_id=batch0"))
    # previous flip ages past the grace; the NEXT compaction's
    # leading GC collects the prior generation before folding
    past = time.time() - 100
    _backdate_flips(store, past)
    compact_counting_slices(spark, store, 1, ["k"], "n", gc_grace_s=50)
    assert not os.path.isdir(os.path.join(store, "slice_id=batch0"))
    # the JUST-superseded generation is (correctly) still deferred
    assert os.path.isdir(os.path.join(store, "slice_id=compacted0"))
    assert os.path.isdir(os.path.join(store, "slice_id=batch1"))
    assert {
        (r.k, r.n)
        for r in counting_store_totals(spark, store, ["k"], "n").collect()
    } == {("a", 7)}
