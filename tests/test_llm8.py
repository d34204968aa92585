"""Round-9 operator family, part 4: mined bitext, the curation
funnel, and dataset snapshot diffing."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def _embs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


# ---------------------------------------------------------------------------
# q191 mined bitext
# ---------------------------------------------------------------------------


def test_bitext_mutual_best_fixture(spark, tmp_path):
    """Two translation pairs with near-identical embeddings plus one
    decoy: only the mutual-best pairs are mined, and the decoy (whose
    best match's best match is someone else) is excluded."""
    from synthea_etl_spark.plans.llm8 import q191_mined_bitext

    rng = np.random.default_rng(3)
    base = [rng.normal(0, 1, 64) for _ in range(3)]

    def jitter(v, eps):
        return [(float(a)) for a in (v + eps).astype(np.float32)]

    docs, embs = [], []
    # en docs 0,1,2 ~ base0, base1, base2
    for i, b in enumerate(base):
        docs.append((i, f"en doc {i}", "en", "s"))
        embs.append((i, jitter(b, rng.normal(0, 0.01, 64)), 0))
    # fr docs 10, 11 are translations of en 0, 1
    for k, b in enumerate(base[:2]):
        docs.append((10 + k, f"fr doc {k}", "fr", "s"))
        embs.append((10 + k, jitter(b, rng.normal(0, 0.01, 64)), 1))
    # fr decoy 12: halfway between base2 and base0 but closer to
    # base2; en 2's best fr match is the decoy, but the decoy's best
    # en match is ALSO en 2 -> actually mutual. Make it asymmetric:
    # decoy near base0 (so its best en is 0) while en 0's best fr is
    # its true translation 10.
    docs.append((12, "fr decoy", "fr", "s"))
    embs.append((12, jitter(base[0], rng.normal(0, 0.3, 64)), 1))
    (str(tmp_path / "documents.parquet"))
    _docs(spark, docs).write.parquet(str(tmp_path / "documents.parquet"))
    _embs(spark, embs).write.parquet(str(tmp_path / "embeddings.parquet"))

    out = q191_mined_bitext(spark, str(tmp_path)).collect()
    pairs = {(r.en_id, r.other_id) for r in out}
    assert (0, 10) in pairs
    assert (1, 11) in pairs
    assert all(o != 12 for _, o in pairs)  # decoy not mutual-best
    for r in out:
        assert r.other_lang == "fr"
        assert r.sim > 0.9


def test_bitext_mutuality_invariant(spark):
    """On the real fixture: every mined pair must be each side's
    rank-1 ANN match — recomputed independently via the same seeded
    machinery."""
    import synthea_etl_spark.operators.similarity as S
    from synthea_etl_spark.plans.common import load
    from synthea_etl_spark.plans.llm8 import q191_mined_bitext

    sf = "/root/testdata/sf0.001"
    out = q191_mined_bitext(spark, sf).collect()
    docs = load(spark, sf, "documents").select("doc_id", "lang")
    embs = load(spark, sf, "embeddings").select("vec_id", "embedding")
    j = docs.join(embs, docs["doc_id"] == embs["vec_id"]).select(
        "vec_id", "embedding", "lang"
    )
    en = j.filter(F.col("lang") == "en").select("vec_id", "embedding")
    other = j.filter(F.col("lang") != "en").select("vec_id", "embedding")
    best_en = {
        r.query_id: r.neighbor_id
        for r in S.knn_ann_ivf(
            en, other, k=1, n_centroids=16, n_probe=4, lloyd_iters=0
        ).collect()
    }
    best_other = {
        r.query_id: r.neighbor_id
        for r in S.knn_ann_ivf(
            other, en, k=1, n_centroids=16, n_probe=4, lloyd_iters=0
        ).collect()
    }
    assert out  # sf0.001 mines at least one mutual pair
    for r in out:
        assert best_en[r.other_id] == r.en_id
        assert best_other[r.en_id] == r.other_id


# ---------------------------------------------------------------------------
# q192 curation funnel
# ---------------------------------------------------------------------------


def test_funnel_stage_order_and_quota(spark, tmp_path):
    """Each doc lands in its FIRST failing stage; the quota stage
    admits at most _Q192_QUOTA docs per language."""
    from synthea_etl_spark.plans.llm8 import (
        _Q192_QUOTA,
        q192_curation_funnel,
    )

    def good(i):
        # 57 words, all 2-grams unique -> clean on every repetition
        # rule; stop-words present; mean word length ~5
        return "the a of and to in is " + " ".join(
            f"u{i:02d}x{j:02d}" for j in range(50)
        )

    rows = []
    # 60 distinct good docs in one language -> quota (50) must bite
    for i in range(60):
        rows.append((i, good(i), "en", "s"))
    # an exact duplicate of doc 0 -> exact_dup (doc 100 > doc 0)
    rows.append((100, good(0), "en", "s"))
    # a too-short doc -> quality
    rows.append((101, "too short", "en", "s"))
    # a doc passing quality but failing repetition: one 2-gram
    # dominating. Needs >= 50 words, mean wlen in [3,10], stopwords.
    spam = ("the spammy " * 30).strip() + " of and to in is extra filler"
    rows.append((102, spam, "en", "s"))
    _docs(spark, rows).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r.stage
        for r in q192_curation_funnel(spark, str(tmp_path)).collect()
    }
    assert out[100] == "exact_dup"
    assert out[101] == "quality"
    assert out[102] == "repetition"
    admitted = [d for d, s in out.items() if s == "admitted"]
    quota_rej = [d for d, s in out.items() if s == "quota"]
    assert len(admitted) == _Q192_QUOTA
    assert len(quota_rej) == 60 - _Q192_QUOTA


def test_funnel_covers_every_doc_exactly_once(spark):
    from synthea_etl_spark.plans.common import load
    from synthea_etl_spark.plans.llm8 import q192_curation_funnel

    sf = "/root/testdata/sf0.001"
    out = q192_curation_funnel(spark, sf)
    n_docs = load(spark, sf, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    stages = {r.stage for r in out.select("stage").distinct().collect()}
    assert stages <= {
        "admitted", "exact_dup", "quality", "repetition", "quota"
    }


# ---------------------------------------------------------------------------
# q193 dataset diff
# ---------------------------------------------------------------------------


def test_dataset_diff_classification(spark, tmp_path):
    from synthea_etl_spark.plans.llm8 import q193_dataset_diff

    rows = [
        (7, "dropped doc", "en", "s"),     # 7 % 7 == 0 -> removed
        (11, "edited doc", "en", "s"),     # 11 % 11 == 0 -> changed
        (13, "copied doc", "en", "s"),     # 13 % 13 == 0 -> unchanged + added twin
        (3, "plain doc", "en", "s"),       # untouched -> unchanged
    ]
    _docs(spark, rows).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r.status
        for r in q193_dataset_diff(spark, str(tmp_path)).collect()
    }
    assert out == {
        7: "removed",
        11: "changed",
        13: "unchanged",
        1000013: "added",
        3: "unchanged",
    }


def test_dataset_diff_partition_invariance(spark):
    """Same classification under different shuffle parallelism — the
    full-outer join carries no ordering assumptions."""
    from synthea_etl_spark.plans.llm8 import q193_dataset_diff

    sf = "/root/testdata/sf0.001"
    a = sorted(
        (r.doc_id, r.status) for r in q193_dataset_diff(spark, sf).collect()
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(
            (r.doc_id, r.status)
            for r in q193_dataset_diff(spark, sf).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
    counts = {}
    for _, s in a:
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {"added", "removed", "changed", "unchanged"}
