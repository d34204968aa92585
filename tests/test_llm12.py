"""Round-9 operator family, part 8: index-quality recall reports."""

from __future__ import annotations


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_minhash_recall_catches_identical_docs(spark, tmp_path):
    """Identical docs share every MinHash band, so a Jaccard-1.0
    truth pair can never be a recall loss; a moderately similar pair
    appears in the truth frame with an honest caught flag either
    way."""
    from synthea_etl_spark.plans.llm12 import q202_minhash_recall_eval

    base = " ".join(f"w{i:02d}" for i in range(40))
    near = " ".join(f"w{i:02d}" for i in range(38)) + " xx yy"
    rows = [
        (0, base, "en", "s"),
        (1, base, "en", "s"),          # identical -> jaccard 1.0
        (2, near, "en", "s"),          # high-overlap neighbor
        (3, "totally different words here now", "en", "s"),
    ]
    _docs(spark, rows).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r.id_a, r.id_b): (r.jaccard, r.caught)
        for r in q202_minhash_recall_eval(spark, str(tmp_path)).collect()
    }
    assert out[(0, 1)][0] == 1.0
    assert out[(0, 1)][1] is True  # identical docs cannot be missed
    assert (0, 2) in out and out[(0, 2)][0] >= 0.3
    assert all((a, b) != (0, 3) for a, b in out)  # disjoint: not truth


def test_recall_reports_consistent_with_components(spark):
    """On the real fixture: the caught flags equal an independent
    truth-candidate intersection, and candidate verification means
    the embedding report has no false positives to hide."""
    import synthea_etl_spark.operators.dedup as D
    import synthea_etl_spark.operators.similarity as S
    from synthea_etl_spark.plans.common import load
    from synthea_etl_spark.plans.llm12 import (
        q202_minhash_recall_eval,
        q203_embedding_recall_eval,
    )

    sf = "/root/testdata/sf0.001"
    d = load(spark, sf, "documents")
    sig = D.minhash_signature(d, "text", "doc_id", 32, 3)
    cand = {
        (r.id_a, r.id_b)
        for r in D.lsh_candidates(sig, "doc_id", 32, 8).collect()
    }
    rep = q202_minhash_recall_eval(spark, sf).collect()
    assert rep
    for r in rep:
        assert r.caught == ((r.id_a, r.id_b) in cand)
        assert r.jaccard >= 0.3

    e = load(spark, sf, "embeddings")
    ecand = {
        (r.id_a, r.id_b)
        for r in S.embedding_near_dup_lsh(
            e, threshold=0.4, n_planes=6, multiprobe=2
        ).collect()
    }
    erep = q203_embedding_recall_eval(spark, sf).collect()
    assert erep
    caught = sum(1 for r in erep if r.caught)
    for r in erep:
        assert r.caught == ((r.id_a, r.id_b) in ecand)
    # the multiprobe setting is tuned for useful recall on this data
    assert caught / len(erep) >= 0.5
