"""Round-9 operator family, part 3: paragraph-level exact dedup,
the non-repetition Gopher quality rules, product-quantization ANN
with exact integer ADC scoring, and cluster-balanced diversity
subsampling."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def _embs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


# ---------------------------------------------------------------------------
# q187 paragraph dedup
# ---------------------------------------------------------------------------


def test_paragraph_dedup_fixture(spark, tmp_path):
    """Two docs sharing one exact 20-token paragraph: the earlier
    (doc_id, para_idx) wins, the later occurrence is removed, and
    the reclaimed token count is the paragraph width."""
    from synthea_etl_spark.plans.llm7 import _PARA_W, q187_paragraph_dedup

    shared = " ".join(f"s{i:02d}" for i in range(_PARA_W))
    uniq_a = " ".join(f"a{i:02d}" for i in range(_PARA_W))
    uniq_b = " ".join(f"b{i:02d}" for i in range(_PARA_W))
    p = str(tmp_path / "documents.parquet")
    _docs(
        spark,
        [
            (0, uniq_a + " " + shared, "s"),   # paras: [uniq_a, shared]
            (1, shared + " " + uniq_b, "s"),   # paras: [shared, uniq_b]
            (2, uniq_b, "s"),                  # dup of doc 1's 2nd para
        ],
    ).write.parquet(p)
    out = {
        r.doc_id: r.asDict()
        for r in q187_paragraph_dedup(spark, str(tmp_path)).collect()
    }
    # doc 0 holds the winning copy of `shared` (doc_id 0 < 1)
    assert out[0] == {
        "doc_id": 0,
        "n_paras": 2,
        "n_dup_paras": 1,
        "n_removed": 0,
        "tokens_removed": 0,
    }
    # doc 1 loses `shared` (winner is doc 0) but keeps uniq_b
    # (para_idx 1 in doc 1 beats para_idx 0 in doc 2? No: winner is
    # min (doc_id, para_idx) -> doc 1 wins uniq_b over doc 2)
    assert out[1]["n_removed"] == 1
    assert out[1]["tokens_removed"] == _PARA_W
    assert out[2]["n_removed"] == 1


def test_paragraph_dedup_group_accounting(spark):
    """Corpus-level invariant at sf0.001: every duplicate group keeps
    exactly one winner, so sum(n_dup_paras) - sum(n_removed) equals
    the number of distinct duplicated fingerprints."""
    import synthea_etl_spark.operators.text as T
    from synthea_etl_spark.plans.common import load
    from synthea_etl_spark.plans.llm7 import _PARA_W, q187_paragraph_dedup

    sf = "/root/testdata/sf0.001"
    out = q187_paragraph_dedup(spark, sf)
    agg = out.agg(
        F.sum("n_dup_paras").alias("dup"), F.sum("n_removed").alias("rm")
    ).collect()[0]
    paras = T.chunk_by_tokens(
        load(spark, sf, "documents").select("doc_id", "text"),
        window=_PARA_W,
        overlap=0,
    ).select(F.md5("chunk_text").alias("fp"))
    n_groups = (
        paras.groupBy("fp")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert agg["dup"] - agg["rm"] == n_groups


# ---------------------------------------------------------------------------
# q188 Gopher non-repetition rules
# ---------------------------------------------------------------------------


def test_gopher_rules_fixture(spark, tmp_path):
    from synthea_etl_spark.plans.llm7 import q188_gopher_quality_rules

    good = "the quick brown fox jumps over a lazy dog and then " * 6
    short = "too short to keep"
    longwords = " ".join(["extraordinarily"] * 60)  # mean wlen 15 > 10
    nostop = " ".join(f"tok{i}" for i in range(60))  # zero stop hits
    p = str(tmp_path / "documents.parquet")
    _docs(
        spark,
        [(0, good.strip(), "s"), (1, short, "s"),
         (2, longwords, "s"), (3, nostop, "s")],
    ).write.parquet(p)
    out = {
        r.doc_id: r.asDict()
        for r in q188_gopher_quality_rules(spark, str(tmp_path)).collect()
    }
    assert out[0]["keep"] is True
    assert out[0]["n_words"] == 66  # 11 words x 6 repeats
    assert out[0]["alpha_frac_micro"] == 1_000_000
    assert out[1]["keep"] is False  # word count below 50
    assert out[2]["keep"] is False  # mean word length 15 > 10
    assert out[2]["mean_wlen_micro"] == 15_000_000
    assert out[3]["keep"] is False  # no stop-word hits
    assert out[3]["n_stop_hits"] == 0


def test_gopher_rules_exact_micro_arithmetic(spark, tmp_path):
    """mean_wlen_micro is sum(len)*1e6 div n — integer div, exact."""
    from synthea_etl_spark.plans.llm7 import q188_gopher_quality_rules

    p = str(tmp_path / "documents.parquet")
    _docs(spark, [(0, "ab cde f", "s")]).write.parquet(p)
    r = q188_gopher_quality_rules(spark, str(tmp_path)).collect()[0]
    assert r["mean_wlen_micro"] == 6 * 1_000_000 // 3  # 2000000
    assert r["alpha_frac_micro"] == 1_000_000


# ---------------------------------------------------------------------------
# q189 PQ / ADC
# ---------------------------------------------------------------------------


@pytest.fixture()
def pq_out(spark):
    from synthea_etl_spark.plans.llm7 import q189_pq_adc_topk

    return q189_pq_adc_topk(spark, "/root/testdata/sf0.001").collect()


def test_pq_shape_and_ordering(pq_out):
    from synthea_etl_spark.plans.llm7 import _PQ_TOPK

    by_q = {}
    for r in pq_out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(10))
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, _PQ_TOPK + 1))
        dists = [r.adc_dist for r in rows]
        assert dists == sorted(dists)
        assert all(r.neighbor_id != q for r in rows)


def test_pq_adc_matches_numpy_reference(spark, pq_out):
    """End-to-end PQ recomputation in NumPy: seeded codebooks, integer
    encode, ADC tables, ranking — the Spark pipeline must reproduce
    it bit-for-bit."""
    from synthea_etl_spark.plans.common import load
    from synthea_etl_spark.plans.llm7 import (
        _PQ_DSUB,
        _PQ_KS,
        _PQ_M,
        _PQ_QSCALE,
        _PQ_TOPK,
    )

    rows = (
        load(spark, "/root/testdata/sf0.001", "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    x = np.array([r.embedding for r in rows], dtype=np.float64)
    xq = np.floor(x * _PQ_QSCALE + 0.5).astype(np.int64)
    order = np.argsort(
        [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    )
    seed = xq[order[:_PQ_KS]]
    cb = seed.reshape(_PQ_KS, _PQ_M, _PQ_DSUB)
    xs = xq.reshape(-1, _PQ_M, _PQ_DSUB)
    diff = xs[:, None, :, :] - cb[None, :, :, :]
    d = np.einsum("nkmd,nkmd->nkm", diff, diff)  # (n, KS, M)
    codes = d.argmin(axis=1)  # (n, M)
    expected = {}
    for qpos in np.where(ids < 10)[0]:
        qid = int(ids[qpos])
        adc = d[qpos]  # (KS, M)
        scores = []
        for npos in range(len(ids)):
            nid = int(ids[npos])
            if nid == qid:
                continue
            s = sum(
                int(adc[codes[npos, m], m]) for m in range(_PQ_M)
            )
            scores.append((s, nid))
        scores.sort()
        expected[qid] = scores[:_PQ_TOPK]
    got = {}
    for r in pq_out:
        got.setdefault(r.query_id, []).append(
            (r.rank, r.adc_dist, r.neighbor_id)
        )
    for qid, exp in expected.items():
        g = sorted(got[qid])
        assert [(d_, n) for _, d_, n in g] == exp


def test_pq_recovers_cluster_structure(spark, tmp_path):
    """Quality sanity on a STRUCTURED corpus (the sf fixtures are
    unit-norm random vectors — intra == inter distance — so no
    quantizer can rank them; see test_pq_adc_matches_numpy_reference
    for exactness there): with well-separated clusters, every ADC
    top-5 list stays inside the query's own cluster."""
    from synthea_etl_spark.plans.llm7 import q189_pq_adc_topk

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 10, (6, 64))
    rows = []
    vid = 0
    for c in range(6):
        for _ in range(20):
            v = (centers[c] + rng.normal(0, 0.1, 64)).astype(np.float32)
            rows.append((vid, [float(a) for a in v], c))
            vid += 1
    p = str(tmp_path / "embeddings.parquet")
    _embs(spark, rows).write.parquet(p)
    label = {r[0]: r[2] for r in rows}
    out = q189_pq_adc_topk(spark, str(tmp_path)).collect()
    assert out  # queries are vec_id < 10 (cluster 0)
    wrong = [
        r for r in out if label[r.neighbor_id] != label[r.query_id]
    ]
    assert not wrong


# ---------------------------------------------------------------------------
# q190 cluster-balanced sample
# ---------------------------------------------------------------------------


def test_cluster_sample_quota_and_determinism(spark):
    from synthea_etl_spark.plans.llm7 import (
        _PQ_KS,
        _Q190_CAP,
        q190_cluster_balanced_sample,
    )

    sf = "/root/testdata/sf0.001"
    out = q190_cluster_balanced_sample(spark, sf).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell_id, []).append(r)
    assert set(by_cell) <= set(range(_PQ_KS))
    seen = set()
    for cell, rows in by_cell.items():
        assert len(rows) <= _Q190_CAP
        ranks = sorted(r.pick_rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        for r in rows:
            assert r.vec_id not in seen  # each vector in one cell only
            seen.add(r.vec_id)
    # deterministic pick order: smallest md5 first within each cell
    for cell, rows in by_cell.items():
        rows.sort(key=lambda r: r.pick_rank)
        digests = [
            hashlib.md5(str(r.vec_id).encode()).hexdigest() for r in rows
        ]
        assert digests == sorted(digests)


def test_cluster_sample_balances_skew(spark, tmp_path):
    """A corpus where one mode dominates: the quota admits at most
    cap vectors from the dominant cell, so the curated set's max
    cell share is bounded by cap — the point of the operator."""
    from synthea_etl_spark.plans.llm7 import (
        _Q190_CAP,
        q190_cluster_balanced_sample,
    )

    rng = np.random.default_rng(7)
    rows = []
    # 50 copies of (≈) one point, 10 spread-out others
    for i in range(50):
        v = (np.ones(64) + rng.normal(0, 1e-3, 64)).astype(np.float32)
        rows.append((i, [float(a) for a in v], 0))
    for i in range(50, 60):
        v = rng.normal(0, 1, 64).astype(np.float32)
        rows.append((i, [float(a) for a in v], 1))
    p = str(tmp_path / "embeddings.parquet")
    _embs(spark, rows).write.parquet(p)
    out = q190_cluster_balanced_sample(spark, str(tmp_path)).collect()
    dense_cells = {}
    for r in out:
        dense_cells.setdefault(r.cell_id, 0)
        dense_cells[r.cell_id] += 1
    assert max(dense_cells.values()) <= _Q190_CAP
    # the spread-out vectors still get in: output is not just the mode
    assert sum(1 for r in out if r.vec_id >= 50) >= 5
