"""Round-11 tests, part 3: feature-frame assembly semantics and the
KL drift monitor."""

from __future__ import annotations

import math
import os
import tempfile


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(os.path.join(d, "documents.parquet"))


def test_feature_frame_features_and_labels(spark):
    """Feature semantics on crafted docs: labels follow the slice
    rule, blocklist score matches q217's arithmetic, NLL is the
    q185 value, and surface stats are exact micro-units."""
    from synthea_etl_spark.plans.llm18 import q221_quality_feature_frame

    with tempfile.TemporaryDirectory() as d:
        _write_docs(
            spark,
            d,
            [
                (0, "aa bb cc", "en", "s"),  # ref slice
                (13, "aa bb dup", "en", "s"),  # crawl + severe hit
            ],
        )
        out = {
            r.doc_id: r
            for r in q221_quality_feature_frame(spark, d).collect()
        }
    assert out[0].label == "ref" and out[13].label == "crawl"
    assert out[0].n_tokens == 3
    # mean word len: all 2-char tokens -> exactly 2.0
    assert out[0].mean_word_len_micro == 2_000_000
    assert out[0].block_score == 0
    assert out[13].block_score == 4  # one severe hit
    # NLL hand-check: corpus tokens = aa(x2) bb(x2) cc dup, N=6
    # doc0 = aa bb cc -> mean of q(-ln(2/6)) x2 and q(-ln(1/6))
    q = lambda p: int(math.floor(round(-math.log(p), 6) * 1_000_000 + 0.5))
    want = (q(2 / 6) + q(2 / 6) + q(1 / 6)) // 3
    assert out[0].nll_micro_mean == want


def test_drift_monitor_flags_shifted_source(spark):
    """A source whose token distribution diverges from the reference
    slice gets a large KL; a source matching the reference scores
    near zero; smoothing keeps unseen-in-ref tokens finite."""
    from synthea_etl_spark.plans.llm18 import q222_token_drift_monitor

    ref_like = "alpha beta gamma delta " * 10
    shifted = "zz yy xx ww " * 10  # no overlap with the reference
    rows = []
    # a LARGE reference slice (ids with doc_id % 10 < 3) so the
    # add-one smoothing bias on a matching source stays well under
    # the drift threshold; crawl ids use % 10 >= 3
    for d10 in range(0, 100, 10):
        for k in range(3):
            rows.append((d10 + k, ref_like.strip(), "en", "clean"))
    for i in range(3):
        rows.append((13 + i * 10, ref_like.strip(), "en", "clean"))
    for i in range(3):
        rows.append((17 + i * 10, shifted.strip(), "en", "spammy"))
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, rows)
        out = {
            r.source: r for r in q222_token_drift_monitor(spark, d).collect()
        }
    assert out["spammy"].kl_micro > out["clean"].kl_micro
    assert out["spammy"].drifted
    assert not out["clean"].drifted
    # all terms finite (smoothed): kl is a real number, not huge
    assert out["spammy"].kl_micro < 50_000_000


def test_site_boilerplate_is_host_scoped(spark):
    """A line shared across docs of DIFFERENT hosts is NOT site
    boilerplate; the same line shared within one host is. Host
    mapping: doc_id div 4 -> site, so ids 0-3 share a host and id 4
    is the next host."""
    from synthea_etl_spark.plans.llm18 import (
        q223_site_boilerplate_removal,
    )

    shared = "nav home about contact login cart search help terms faq"
    uniq = lambda i: " ".join(f"u{i}w{j}" for j in range(10))
    with tempfile.TemporaryDirectory() as d:
        _write_docs(
            spark,
            d,
            [
                # host site0: two docs sharing the nav line
                (0, uniq(0) + " " + shared, "en", "s"),
                (1, uniq(1) + " " + shared, "en", "s"),
                # host site1: ONE doc with the same nav line — not
                # boilerplate within ITS host
                (4, uniq(4) + " " + shared, "en", "s"),
            ],
        )
        out = {
            r.doc_id: r
            for r in q223_site_boilerplate_removal(spark, d).collect()
        }
    assert out[0].host == "site0.com" and out[4].host == "site1.com"
    assert out[0].n_removed == 1 and out[1].n_removed == 1
    assert out[4].n_removed == 0  # cross-host share is NOT removed
    assert out[0].tokens_removed == 10


def test_token_stats_stream_store_drift_and_compaction(spark, tmp_path):
    """The seventh stream family: streamed token-count slices sum to
    the corpus counts; drift-from-store equals the batch q222 report;
    compaction + folded-replay leave both unchanged."""
    import json as _json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from synthea_etl_spark.operators.dedup import (
        compact_counting_slices,
        drift_from_token_store,
        token_stats_store,
    )
    from synthea_etl_spark.pipeline import token_stats_ingest_stream
    from synthea_etl_spark.plans.llm18 import q222_token_drift_monitor

    ref_like = "alpha beta gamma delta " * 10
    shifted = "zz yy xx ww " * 10
    rows = []
    for d10 in range(0, 100, 10):
        for k in range(3):
            rows.append((d10 + k, ref_like.strip(), "en", "clean"))
    for i in range(3):
        rows.append((13 + i * 10, ref_like.strip(), "en", "clean"))
    for i in range(3):
        rows.append((17 + i * 10, shifted.strip(), "en", "spammy"))

    landing = tmp_path / "landing"
    store = tmp_path / "store"
    docs_dir = tmp_path / "docs"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )

    def land(name, batch):
        (landing / name).write_text(
            "\n".join(
                _json.dumps(
                    {"doc_id": i, "source": s, "text": t}
                )
                for i, t, _l, s in batch
            )
        )

    def run():
        token_stats_ingest_stream(
            spark, str(landing), str(store), str(ckpt), schema
        ).awaitTermination(120)

    half = len(rows) // 2
    land("b0.json", rows[:half])
    run()
    land("b1.json", rows[half:])
    run()

    # batch reference: q222 over the same corpus
    import os

    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(os.path.join(str(docs_dir), "documents.parquet"))
    want = {
        (r.source, r.n_tokens, r.kl_micro, r.drifted)
        for r in q222_token_drift_monitor(spark, str(docs_dir)).collect()
    }

    def got():
        return {
            (r.source, r.n_tokens, r.kl_micro, r.drifted)
            for r in drift_from_token_store(spark, str(store)).collect()
        }

    assert got() == want
    # compact + assert unchanged; folded replay is a no-op
    compact_counting_slices(spark, str(store), 0, ["source", "t"], "c")
    assert got() == want
    b0 = spark.createDataFrame(
        [(i, s, t) for i, t, _l, s in rows[:half]],
        "doc_id long, source string, text string",
    )
    token_stats_store(b0, str(store), slice_id="batch0")  # crash leftover
    assert got() == want


def test_annealing_schedule_budgets_and_pools(spark):
    """Phase budgets hold exactly (token prefix <= budget in md5
    order), phase 2 only draws from the high-quality pool, and the
    md5-bucket admission equals the naive global-running-sum rule."""
    import hashlib

    from synthea_etl_spark.plans.llm18 import (
        _P1_DEN,
        _P1_NUM,
        _P2_DEN,
        _P2_NUM,
        _Q225_HQ_BUCKET,
        q225_annealing_schedule,
    )

    out = q225_annealing_schedule(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.n_tokens for r in out)
    b1 = total * _P1_NUM // _P1_DEN
    b2 = total * _P2_NUM // _P2_DEN
    # naive reference: global md5 order running sums
    order = sorted(
        out,
        key=lambda r: (
            hashlib.md5(f"an{r.doc_id}".encode()).hexdigest(),
            r.doc_id,
        ),
    )
    run = 0
    want1 = {}
    for r in order:
        run += r.n_tokens
        want1[r.doc_id] = run <= b1
    run2 = 0
    want2 = {}
    for r in order:
        if r.bucket >= _Q225_HQ_BUCKET:
            run2 += r.n_tokens
            want2[r.doc_id] = run2 <= b2
    for r in out:
        assert r.phase1 == want1[r.doc_id], (r, want1[r.doc_id])
        assert r.phase2 == want2.get(r.doc_id, False), (r,)
    # phase 2 never draws outside the pool; budgets are respected
    assert all(r.bucket >= _Q225_HQ_BUCKET for r in out if r.phase2)
    assert sum(r.n_tokens for r in out if r.phase1) <= b1
    assert sum(r.n_tokens for r in out if r.phase2) <= b2
    # the cut is REAL on this corpus: some of each pool is excluded
    assert any(not r.phase1 for r in out)
    assert any(r.bucket >= _Q225_HQ_BUCKET and not r.phase2 for r in out)
