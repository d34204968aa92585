"""Round-8 LLM-pipeline operators (plans/llm4.py over
operators/{retrieval,text,similarity,multimodal,dedup}.py): the
persisted/streamed inverted index for BM25, the pHash fixture, kNN
label propagation + the bulk per-cluster matmul IVF scorer,
value-decile curation, JL random projection, cross-format raster
dedup, phrase/proximity search, c-TF-IDF cluster labeling, and
corpus-overlap sketches.

Reference scope note: the reference has no retrieval/similarity
surface; this is builder's-brief training-data-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from synthea_etl_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_from_index,
    inverted_index,
)

CORPUS = [
    (0, "spark shuffles data between stages"),
    (1, "parquet files store columnar data"),
    (2, "spark reads parquet files fast"),
    (3, "the quick brown fox jumps"),
    (4, "data pipelines move data between systems"),
    (5, "columnar formats compress data well"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(100, "spark parquet data"), (101, "quick fox")],
        "query_id long, query_text string",
    )


def _ranking(df):
    return sorted(
        (r.query_id, r.rank, r.doc_id, r.score) for r in df.collect()
    )


def test_index_probe_matches_fresh_bm25(spark):
    """On a corpus with no empty documents, answering from the
    postings index is bit-identical to the recompute-per-call path —
    same micro-quantized scores, same ranks."""
    docs = _docs(spark, CORPUS)
    fresh = _ranking(bm25_topk(docs, _queries(spark), k=4))
    via_index = _ranking(
        bm25_topk_from_index(inverted_index(docs), _queries(spark), k=4)
    )
    assert fresh == via_index and len(fresh) > 0


def test_index_persisted_roundtrip_bucketed(spark, tmp_path):
    """The production shape: the postings table is WRITTEN (bucketed
    by term in a warehouse; plain parquet here) and a later session
    probes the stored table — results match probing the fresh
    frame."""
    docs = _docs(spark, CORPUS)
    path = str(tmp_path / "postings")
    inverted_index(docs).write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    assert _ranking(
        bm25_topk_from_index(stored, _queries(spark), k=4)
    ) == _ranking(
        bm25_topk_from_index(inverted_index(docs), _queries(spark), k=4)
    )


def test_index_union_invariant(spark):
    """Incremental maintenance: for disjoint doc batches A and B,
    index(A) UNION index(B) == index(A ∪ B) exactly — appending a
    new batch's postings IS the index update, and every derived
    statistic (df, dl, totals) follows automatically."""
    a = _docs(spark, CORPUS[:3])
    b = _docs(spark, CORPUS[3:])
    both = _docs(spark, CORPUS)

    def rows(df):
        return sorted((r.t, r.doc_id, r.tf) for r in df.collect())

    unioned = inverted_index(a).unionByName(inverted_index(b))
    assert rows(unioned) == rows(inverted_index(both))

    # and the probe over the unioned index equals the full rebuild
    assert _ranking(
        bm25_topk_from_index(unioned, _queries(spark), k=4)
    ) == _ranking(
        bm25_topk_from_index(inverted_index(both), _queries(spark), k=4)
    )


def test_index_ignores_empty_docs_and_still_ranks(spark):
    """Empty/whitespace docs never enter the postings, and the index
    path's n_docs counts only indexed docs — empty docs cannot be
    retrieved and do not perturb idf for the docs that can."""
    docs = _docs(spark, CORPUS + [(90, "   "), (91, "")])
    idx = inverted_index(docs)
    assert idx.filter(F.col("doc_id") >= 90).count() == 0
    out = bm25_topk_from_index(idx, _queries(spark), k=10).collect()
    assert {r.doc_id for r in out}.isdisjoint({90, 91})
    # idf base equals the 6 indexed docs, not the 8 corpus rows:
    # identical to indexing the clean corpus alone
    clean = inverted_index(_docs(spark, CORPUS))
    assert _ranking(
        bm25_topk_from_index(idx, _queries(spark), k=10)
    ) == _ranking(bm25_topk_from_index(clean, _queries(spark), k=10))


def test_phash_fixture_plants_exact_bits():
    """The q168 fixture's whole premise, validated exhaustively: for
    400 rasters (100 clusters x 4 members) the REAL pHash pipeline
    (grayscale -> 32x32 DCT-II -> zigzag median threshold) recovers
    EXACTLY the planted balanced 60-bit word — the <=0.5/pixel
    rounding noise never flips a +-30-amplitude coefficient against
    the zero median."""
    import numpy as np

    from synthea_etl_spark.operators.multimodal import (
        decode_raster,
        phash_bits,
    )
    from synthea_etl_spark.plans.llm4 import (
        _phash_fixture_raster,
        _phash_planted_set,
    )

    for cluster in range(100):
        for m in range(4):
            target = sum(1 << p for p in _phash_planted_set(cluster, m))
            dec = decode_raster(_phash_fixture_raster(cluster * 4 + m))
            assert dec is not None and dec[0] == "ppm"
            assert phash_bits(dec[1]) == target, (cluster, m)


def test_phash_fixture_pair_structure():
    """Within a cluster the base sits at hamming 2 from every variant
    and variants sit at hamming 4 from each other, so max_hamming=2
    selects exactly the (base, variant) pairs q168's oracle plants;
    cross-cluster words are far apart."""
    words = {
        (c, m): sum(1 << p for p in _planted(c, m))
        for c in range(20)
        for m in range(4)
    }
    for c in range(20):
        for m in range(1, 4):
            assert bin(words[(c, 0)] ^ words[(c, m)]).count("1") == 2
            for m2 in range(m + 1, 4):
                assert bin(words[(c, m)] ^ words[(c, m2)]).count("1") == 4
    for c2 in range(1, 20):
        assert bin(words[(0, 0)] ^ words[(c2, 0)]).count("1") > 10


def _planted(c, m):
    from synthea_etl_spark.plans.llm4 import _phash_planted_set

    return _phash_planted_set(c, m)


def test_knn_label_propagation_two_blobs(spark):
    """Two well-separated blobs with labeled anchors: every unlabeled
    vector receives its own blob's label, votes are unanimous, and
    the output covers exactly the unlabeled ids."""
    import numpy as np

    import synthea_etl_spark.operators.similarity as S

    rng = np.random.RandomState(3)
    rows_l, rows_u = [], []
    for i in range(40):
        blob = i % 2
        center = 10.0 if blob else -10.0
        v = [float(center + x) for x in rng.randn(4) * 0.1]
        if i < 20:
            rows_l.append((i, v, blob))
        else:
            rows_u.append((i, v))
    labeled = spark.createDataFrame(
        rows_l, "vec_id long, embedding array<double>, label int"
    )
    unlabeled = spark.createDataFrame(
        rows_u, "vec_id long, embedding array<double>"
    )
    out = {
        r.vec_id: r
        for r in S.knn_label_propagation(
            labeled, unlabeled, k=3, n_centroids=2, n_probe=1,
            lloyd_iters=0,
        ).collect()
    }
    assert set(out) == {r[0] for r in rows_u}
    for i, _v in rows_u:
        assert out[i].pred_label == i % 2, i
        assert out[i].votes == 3  # unanimous within the blob


def test_value_decile_bins_exact_and_tie_safe(spark):
    """bin = floor(bins * strictly-smaller-count / N): a uniform
    0..99 score column lands 10 per decile; a fully-tied column
    lands everything in decile 0 (ties never straddle bins)."""
    from synthea_etl_spark.operators.text import value_decile_bins

    uniform = spark.createDataFrame(
        [(i, i) for i in range(100)], "id long, s long"
    )
    got = {
        r.id: r.decile for r in value_decile_bins(uniform, "s").collect()
    }
    assert all(got[i] == i // 10 for i in range(100))

    tied = spark.createDataFrame([(i, 7) for i in range(50)], "id long, s long")
    assert {
        r.decile for r in value_decile_bins(tied, "s").collect()
    } == {0}

    # NULL scores are kept (null-safe join) and bin deterministically
    # lowest: null-first window order puts the NULL group before
    # every real value
    withnull = spark.createDataFrame(
        [(0, None), (1, None), (2, 5), (3, 9)], "id long, s long"
    )
    got = {r.id: r.decile for r in value_decile_bins(withnull, "s").collect()}
    assert len(got) == 4  # no row vanished
    assert got[0] == got[1] == 0  # NULLs: lowest bin
    assert got[2] == 5 and got[3] == 7  # floor(10*2/4), floor(10*3/4)


def test_quality_decile_sample_rates_and_determinism(spark):
    """Decile d keeps ~d/10 of its documents under the md5 rule; the
    whole frame is deterministic across re-runs and partitionings."""
    from synthea_etl_spark.operators.text import quality_decile_sample

    rows = [
        (i, " ".join(f"w{j}" for j in range(i % 40 + 1))) for i in range(400)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out1 = sorted(
        (r.doc_id, r.score, r.decile, r.keep)
        for r in quality_decile_sample(docs).collect()
    )
    out2 = sorted(
        (r.doc_id, r.score, r.decile, r.keep)
        for r in quality_decile_sample(docs.repartition(16)).collect()
    )
    assert out1 == out2 and len(out1) == 400
    by_decile = {}
    for _id, _s, d, k in out1:
        tot, kept = by_decile.get(d, (0, 0))
        by_decile[d] = (tot + 1, kept + bool(k))
    assert by_decile[0][1] == 0  # decile 0 keeps nothing
    # keep counts rise with decile (coarse monotonicity of the rule)
    top = max(by_decile)
    assert by_decile[top][1] > by_decile[min(by_decile)][1]


def test_random_projection_exact_and_partition_invariant(spark):
    """The ±1 projection equals a numpy matmul on the decimal-rounded
    inputs and is bit-identical at any parallelism (decimal
    accumulation, not float)."""
    import numpy as np

    import synthea_etl_spark.operators.similarity as S

    rng = np.random.RandomState(11)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(60)]
    signs = np.array(S.random_projection_signs(4, 8))
    outs = []
    for parts in (1, 12):
        df = spark.createDataFrame(
            vecs, "vec_id long, embedding array<double>"
        ).repartition(parts)
        outs.append({
            (r.vec_id, r.pos): r.value
            for r in S.random_projection_dims(
                df, out_dim=4, in_dim=8
            ).collect()
        })
    assert outs[0] == outs[1]
    for i, v in vecs:
        q = np.round(np.array(v), 6)  # decimal(25,6) grid
        want = signs @ q
        for j in range(4):
            assert abs(outs[0][(i, j)] - want[j]) < 1e-9, (i, j)


def test_random_projection_arrow_matches_expression_twin(spark):
    """The r16 Arrow matmul pass is bit-identical to the original
    zip_with/aggregate DECIMAL expression form — including rounding
    halfway points (dyadic values like 1/128 sit EXACTLY on the 6th-
    decimal halfway line, where naive float rounding half-evens while
    decimal HALF_UP rounds away from zero), null poisoning, and
    wrong-length vectors."""
    import synthea_etl_spark.operators.similarity as S

    vecs = [
        (0, [float(i) / 7 for i in range(8)]),
        (1, [2.0 ** -7] * 8),  # 0.0078125: exact halfway at scale 6
        (2, [-(2.0 ** -7)] * 8),  # HALF_UP is away from zero on negatives
        (3, [2.0 ** -20] * 8),  # rounds to 0.000001 vs nothing
        (4, None),  # null vector -> 16 null values
        (5, [1.0, 2.0]),  # wrong length -> nulls (zip_with poisoning)
        (6, [1.0, None, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]),  # null element
        (7, [123456.654321] * 8),  # large magnitude
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    new = {
        (r.vec_id, r.pos): r.value
        for r in S.random_projection_dims(df, out_dim=4, in_dim=8).collect()
    }
    old = {
        (r.vec_id, r.pos): r.value
        for r in S._random_projection_dims_expr(
            df, out_dim=4, in_dim=8
        ).collect()
    }
    assert new == old


def test_raster_exact_fingerprints_cross_format_and_nulls(spark):
    """Identical pixels under PPM and BMP containers share one
    fingerprint; different pixels differ; undecodable payloads
    degrade to null rows."""
    import numpy as np

    from synthea_etl_spark.operators.multimodal import (
        encode_ppm,
        raster_exact_fingerprints,
    )
    from synthea_etl_spark.plans.llm4 import _encode_bmp24, _q172_pixels

    px_a, px_b = _q172_pixels(0, False), _q172_pixels(1, False)
    rows = [
        (0, bytearray(encode_ppm(px_a))),
        (1, bytearray(_encode_bmp24(px_a))),
        (2, bytearray(encode_ppm(px_b))),
        (3, bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in raster_exact_fingerprints(df).collect()}
    assert out[0].format == "ppm" and out[1].format == "bmp"
    assert out[0].raster_md5 == out[1].raster_md5  # container-invariant
    assert out[2].raster_md5 != out[0].raster_md5
    assert out[3].format is None and out[3].raster_md5 is None
    assert (out[0].width, out[0].height) == (16, 8)


def test_quality_decile_sample_null_text_scores_zero(spark):
    """NULL text scores 0 (same bin as empty text) instead of landing
    in an engine-dependent NULL-ordering position."""
    from synthea_etl_spark.operators.text import quality_decile_sample

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "real words here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in quality_decile_sample(docs).collect()}
    assert out[0].score == 0 and out[1].score == 0
    assert out[0].decile == out[1].decile
    assert out[2].score > 0


def test_retrieval_index_ingest_stream_end_to_end(spark, tmp_path):
    """Streaming BM25 index maintenance: batches of documents land as
    JSON; each micro-batch publishes only ITS postings partitioned by
    batch_id, and the accumulated table equals the batch-built index
    of the whole corpus (the union invariant, live) — so probes
    against the streamed index rank identically to a full rebuild."""
    import json as _json

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from synthea_etl_spark.pipeline import retrieval_index_ingest_stream

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

    land("b0.json", CORPUS[:3])
    run()
    land("b1.json", CORPUS[3:])
    run()

    streamed = spark.read.parquet(str(index)).drop("batch_id")
    rebuilt = inverted_index(_docs(spark, CORPUS))
    assert sorted((r.t, r.doc_id, r.tf) for r in streamed.collect()) == sorted(
        (r.t, r.doc_id, r.tf) for r in rebuilt.collect()
    )
    assert _ranking(
        bm25_topk_from_index(streamed, _queries(spark), k=4)
    ) == _ranking(bm25_topk_from_index(rebuilt, _queries(spark), k=4))

    # replay simulation: republishing batch 1's partition is a no-op
    b1 = spark.createDataFrame(
        spark.read.parquet(str(index)).filter("batch_id = 1").collect()
    )
    (
        b1.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(str(index))
    )
    again = spark.read.parquet(str(index)).drop("batch_id")
    assert sorted((r.t, r.doc_id, r.tf) for r in again.collect()) == sorted(
        (r.t, r.doc_id, r.tf) for r in rebuilt.collect()
    )


def test_ivf_grouped_matches_pair_path(spark):
    """The bulk per-cluster matmul scorer returns EXACTLY the frame
    the per-pair UDF path returns under the same centroids — same
    neighbors, same 6dp sims, same ranks — on a corpus big enough
    that every cluster holds more than k candidates."""
    import numpy as np

    import synthea_etl_spark.operators.similarity as S

    rng = np.random.RandomState(23)
    vecs = [(i, [float(x) for x in rng.randn(16)]) for i in range(300)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id < 40")
    kw = dict(k=5, n_centroids=8, n_probe=3, lloyd_iters=0)
    pair = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.sim)
        for r in S.knn_ann_ivf(df, queries, **kw).collect()
    )
    grouped = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.sim)
        for r in S.knn_ann_ivf_grouped(df, queries, **kw).collect()
    )
    assert pair == grouped and len(pair) == 40 * 5


def test_phrase_search_alignment_semantics(spark):
    """The alignment join counts exact consecutive occurrences:
    multi-occurrence docs count each start, repeated-term phrases
    need all DISTINCT qpos votes at one start (no false positive
    from one token voting twice), and scattered words never match."""
    from synthea_etl_spark.operators.retrieval import (
        phrase_search,
        positional_index,
    )

    docs = _docs(
        spark,
        [
            (0, "a b c x a b c"),        # "a b c" twice
            (1, "a x b y c"),            # scattered: no match
            (2, "a a b"),                # for the repeated-term phrase
            (3, "a b a"),                # contains "a b a" once
        ],
    )
    idx = positional_index(docs)

    def run(phrase_terms):
        phrases = spark.createDataFrame(
            [(99, phrase_terms)], "phrase_id long, terms array<string>"
        )
        return {
            r.doc_id: r.n_occurrences
            for r in phrase_search(idx, phrases).collect()
        }

    assert run(["a", "b", "c"]) == {0: 2}
    # repeated-term phrase "a b a": doc 3 matches at start 0; doc 0's
    # "a b c..a b c" has no a at start+2; doc 2's "a a b" has no
    # third-position a
    assert run(["a", "b", "a"]) == {3: 1}
    # phrase "a a": only doc 2 has adjacent repeated a
    assert run(["a", "a"]) == {2: 1}


def test_ivf_grouped_probe_persisted_matches_fresh(spark, tmp_path):
    """The bulk scorer against a persisted ivf_index parquet table
    returns exactly what the fresh train+assign path returns under
    the same centroids — the corpus-scale probe never needs the
    corpus."""
    import numpy as np

    import synthea_etl_spark.operators.similarity as S

    rng = np.random.RandomState(29)
    vecs = [(i, [float(x) for x in rng.randn(16)]) for i in range(200)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id % 7 = 0")
    centroids = S.ivf_train_centroids(
        df.select(F.col("vec_id").alias("neighbor_id"),
                  F.col("embedding").alias("cv")),
        "neighbor_id", "cv", 8, 0,
    )
    path = str(tmp_path / "ivf")
    S.ivf_index(df, centroids).write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)

    fresh = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.sim)
        for r in S.knn_ann_ivf_grouped(
            df, queries, k=4, n_centroids=8, n_probe=3, lloyd_iters=0
        ).collect()
    )
    probed = sorted(
        (r.query_id, r.rank, r.neighbor_id, r.sim)
        for r in S.knn_ann_ivf_grouped_probe(
            stored, centroids, queries, k=4, n_probe=3
        ).collect()
    )
    assert fresh == probed and len(fresh) > 0


def test_proximity_search_window_semantics(spark):
    """A doc matches iff some window of W tokens holds all distinct
    terms: adjacency not required, order irrelevant, gaps wider than
    the window fail, and duplicate terms in the query collapse."""
    from synthea_etl_spark.operators.retrieval import (
        positional_index,
        proximity_search,
    )

    docs = _docs(
        spark,
        [
            (0, "x a x b x c x"),       # a,b,c within any 6-window
            (1, "a x x x x x b x c"),   # a..c span 9 > window 6
            (2, "c b a"),               # reversed order still matches
            (3, "a b x"),               # missing c
        ],
    )
    idx = positional_index(docs)
    ts = spark.createDataFrame(
        [(7, ["a", "b", "c", "a"])],  # duplicate 'a' collapses
        "query_id long, terms array<string>",
    )
    out = {
        r.doc_id: r.n_starts
        for r in proximity_search(idx, ts, window=6).collect()
    }
    assert 0 in out and 2 in out
    assert 1 not in out and 3 not in out
    # windows extend FORWARD from the start, so doc 2's only witness
    # is position 0 (starts 1/2 cannot see the earlier 'c'/'b')
    assert out[2] == 1
    # doc 0: only the earliest term's position (a at 1) can see the
    # whole set ahead of it within the window
    assert out[0] == 1


def test_cluster_top_terms_ranks_distinctive_terms(spark):
    """Terms unique to one cluster outrank terms shared by all:
    score = tf * n_clusters / cluster_df."""
    from synthea_etl_spark.operators.text import cluster_top_terms

    docs = spark.createDataFrame(
        [
            (0, "shared alpha alpha"),
            (0, "shared alpha"),
            (1, "shared beta beta beta"),
        ],
        "cluster int, text string",
    )
    out = {
        (r.cluster, r.rank): (r.t, r.tf, r.score_micro)
        for r in cluster_top_terms(docs, k=2).collect()
    }
    # cluster 0: alpha tf=3 cdf=1 -> 3*2/1 = 6.0; shared tf=2 cdf=2 -> 2
    assert out[(0, 1)] == ("alpha", 3, 6_000_000)
    assert out[(0, 2)] == ("shared", 2, 2_000_000)
    assert out[(1, 1)] == ("beta", 3, 6_000_000)


def test_corpus_sketch_mergeable_and_estimator_close(spark):
    """Mergeability: sketch(A ∪ B) == bottom-k(sketch(A) ∪
    sketch(B)); and on corpora with a planted 50% doc overlap the
    bottom-k estimate lands near the true Jaccard."""
    import synthea_etl_spark.operators.dedup as D

    rows_a = [(i, f"document number {i} content") for i in range(200)]
    rows_b = [(i, f"document number {i} content") for i in range(100, 300)]
    a, b = _docs(spark, rows_a), _docs(spark, rows_b)
    both = _docs(spark, rows_a + rows_b)

    k = 32
    ska = D.corpus_bottomk_sketch(a, k=k)
    skb = D.corpus_bottomk_sketch(b, k=k)
    merged = sorted(
        r.h
        for r in ska.unionByName(skb)
        .distinct()
        .orderBy("h")
        .limit(k)
        .collect()
    )
    direct = sorted(r.h for r in D.corpus_bottomk_sketch(both, k=k).collect())
    assert merged == direct  # union sketch == merged sketches

    est = D.corpus_overlap_estimate(a, b, k=k).collect()[0]
    true_j = 100 / 300  # |∩|=100, |∪|=300
    assert est.k == k
    assert abs(est.jaccard_micro / 1_000_000 - true_j) < 0.2


def test_round_half_up_matches_spark_round_on_boundaries(spark):
    """_round_half_up (the grouped-IVF scorer's quantizer) must equal
    Spark's F.round(x, 6) — BigDecimal.valueOf shortest-repr HALF_UP
    — element for element, including values engineered to sit ON the
    .5 boundary at 6 decimals where binary floor(|x|*1e6+0.5) can
    land one ulp wrong."""
    import numpy as np

    from synthea_etl_spark.operators.similarity import _round_half_up

    rng = np.random.default_rng(7)
    vals = list(rng.uniform(-1, 1, 3000))
    # exact .5-at-6-decimals boundaries and their float neighbors
    for n in range(-999, 1000, 7):
        v = (2 * n + 1) / 2e6
        vals += [v, np.nextafter(v, -2), np.nextafter(v, 2)]
    arr = np.array(vals, dtype=np.float64)
    ours = _round_half_up(arr, 1e6)
    df = spark.createDataFrame([(float(v),) for v in arr], "x double")
    theirs = np.array(
        [r.r for r in df.select(F.round("x", 6).alias("r")).collect()]
    )
    assert np.array_equal(ours, theirs), (
        np.argwhere(ours != theirs)[:5],
        arr[ours != theirs][:5],
    )


def test_ann_index_ingest_stream_end_to_end(spark, tmp_path):
    """Streaming IVF ANN index maintenance: batches of vectors land
    as JSON; each micro-batch assigns ONLY itself under the frozen
    quantizer and publishes partitioned by batch_id. The accumulated
    table equals ivf_index of the whole corpus (the union invariant,
    live), probes against the streamed index rank identically to a
    batch rebuild, and a replayed partition is a no-op."""
    import json as _json

    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    import synthea_etl_spark.operators.similarity as S
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
    rng = np.random.RandomState(41)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(120)]
    centroids = [list(v) for _, v in vecs[:6]]  # frozen quantizer

    def land(name, rows):
        (landing / name).write_text(
            "\n".join(
                _json.dumps({"vec_id": i, "embedding": v}) for i, v in rows
            )
        )

    def run():
        ann_index_ingest_stream(
            spark, str(landing), str(index), str(ckpt), schema, centroids
        ).awaitTermination(120)

    land("b0.json", vecs[:70])
    run()
    land("b1.json", vecs[70:])
    run()  # restart resumes from the checkpoint: only b1 is new

    corpus = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    streamed = spark.read.parquet(str(index))
    rebuilt = S.ivf_index(corpus, centroids)
    key = lambda r: (r.cluster, r.neighbor_id, tuple(r.cv))  # noqa: E731
    assert sorted(map(key, streamed.drop("batch_id").collect())) == sorted(
        map(key, rebuilt.collect())
    )
    # two committed batches, each owning its partition
    assert {r.batch_id for r in streamed.select("batch_id").distinct().collect()} == {0, 1}

    queries = corpus.filter("vec_id < 10")
    rk = lambda df: sorted(  # noqa: E731
        (r.query_id, r.rank, r.neighbor_id, r.sim) for r in df.collect()
    )
    assert rk(
        S.knn_ann_ivf_grouped_probe(
            streamed.drop("batch_id"), centroids, queries, k=3, n_probe=2
        )
    ) == rk(
        S.knn_ann_ivf_grouped_probe(rebuilt, centroids, queries, k=3, n_probe=2)
    )

    # replay simulation: republishing batch 1's partition is a no-op
    b1 = spark.createDataFrame(
        streamed.filter("batch_id = 1").collect(), streamed.schema
    )
    (
        b1.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(str(index))
    )
    again = spark.read.parquet(str(index)).drop("batch_id")
    assert sorted(map(key, again.collect())) == sorted(
        map(key, rebuilt.collect())
    )


def test_proximity_search_hot_term_linear_and_exact(spark):
    """A stop-word query term occurring at EVERY position of a long
    document must not blow up the plan (the collected-positions
    two-pointer path is O(T), not T² pair fan-out) and must still
    return the exact start count: with 'the' everywhere and 'rare'
    at two spots, qualifying starts are exactly the positions whose
    [s, s+window) window reaches a 'rare' occurrence. A brute-force
    recount over the raw positions pins exactness."""
    from synthea_etl_spark.operators.retrieval import (
        positional_index,
        proximity_search,
    )

    n, window = 5000, 8
    rare_at = {1200, 3700}
    words = ["rare" if i in rare_at else "the" for i in range(n)]
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    idx = positional_index(docs)
    ts = spark.createDataFrame(
        [(10, ["the", "rare"])], "query_id long, terms array<string>"
    )
    got = proximity_search(idx, ts, window=window).collect()
    # brute force over raw occurrence positions (both terms occur at
    # every i in 0..n-1 collectively, so starts = all positions s
    # where some rare r satisfies s <= r < s + window -- including
    # the rare positions themselves)
    starts = {
        s
        for s in range(n)
        for r in rare_at
        if s <= r < s + window
    }
    assert [(r.query_id, r.doc_id, r.n_starts) for r in got] == [
        (10, 1, len(starts))
    ]


def test_ivf_grouped_survives_zero_norm_members(spark):
    """A zero-norm vector in a probed cell yields NaN cosines; the
    candidate cut must rank it LAST (not let NaN poison the
    partition threshold) so every query still gets k finite
    neighbors."""
    import numpy as np

    import synthea_etl_spark.operators.similarity as S

    rng = np.random.RandomState(5)
    vecs = [(i, [float(x) for x in rng.randn(16)]) for i in range(200)]
    vecs.append((500, [0.0] * 16))  # zero-norm member
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id < 20")
    out = S.knn_ann_ivf_grouped(
        df, queries, k=5, n_centroids=4, n_probe=4, lloyd_iters=0
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(20))
    for q, rows in by_q.items():
        assert len(rows) == 5
        for r in rows:
            assert r.neighbor_id != 500  # NaN sims never beat finite
            assert r.sim == r.sim  # finite (not NaN)


def test_proximity_segmentation_parity(spark):
    """The bounded-row segmentation (ADVICE r9: cap the per-(query,
    doc) collected occurrence array) must be invisible in results:
    forcing many tiny segments (segment_positions=window, the
    minimum) returns bit-identical (query, doc, n_starts) to one
    giant segment, including starts whose windows straddle segment
    boundaries, and both match a brute-force recount."""
    import random

    from synthea_etl_spark.operators.retrieval import (
        positional_index,
        proximity_search,
    )

    rng = random.Random(42)
    n, window = 600, 7
    vocab = ["alpha", "beta", "gamma", "filler"]
    words = [vocab[rng.randrange(4)] for _ in range(n)]
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    idx = positional_index(docs)
    ts = spark.createDataFrame(
        [(10, ["alpha", "beta", "gamma"])],
        "query_id long, terms array<string>",
    )
    tiny = proximity_search(
        idx, ts, window=window, segment_positions=window
    ).collect()
    one = proximity_search(
        idx, ts, window=window, segment_positions=10**6
    ).collect()
    key = lambda r: (r.query_id, r.doc_id, r.n_starts)  # noqa: E731
    assert sorted(map(key, tiny)) == sorted(map(key, one))
    # brute force: starts are query-term occurrences whose window
    # covers all three terms
    occ = [
        (i, w) for i, w in enumerate(words) if w in ("alpha", "beta", "gamma")
    ]
    starts = sum(
        1
        for s, _ in occ
        if {"alpha", "beta", "gamma"}
        <= {w for p, w in occ if s <= p < s + window}
    )
    assert sorted(map(key, tiny)) == [(10, 1, starts)]
