"""Round-10 tests, part 2: incremental cluster maintenance, the
retuned-bands recall remediation, and PQ re-rank."""

from __future__ import annotations

import synthea_etl_spark.operators.dedup as D


def test_incremental_components_equals_full_rebuild(spark):
    """The core invariant: min-label CC over (star-compressed stored
    assignments ∪ new pairs) == CC over the full original pair
    graph — including the hard case where one NEW doc chains two
    previously-separate history components together (their labels
    must merge to the global min)."""
    hist_pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (20, 24), (30, 34)], "id_a long, id_b long"
    )
    assignments = D.connected_components(hist_pairs)
    got_hist = {
        (r.id, r.cluster_id) for r in assignments.collect()
    }
    assert got_hist == {(1, 1), (5, 1), (9, 1), (20, 20), (24, 20), (30, 30), (34, 30)}

    # new batch: 100 bridges the {1,5,9} and {20,24} components;
    # 101-102 is a fresh pair; 30's component untouched
    new_pairs = spark.createDataFrame(
        [(9, 100), (100, 24), (101, 102)], "id_a long, id_b long"
    )
    inc = {
        (r.id, r.cluster_id)
        for r in D.incremental_components(assignments, new_pairs).collect()
    }
    full = {
        (r.id, r.cluster_id)
        for r in D.connected_components(
            hist_pairs.unionByName(new_pairs)
        ).collect()
    }
    assert inc == full
    assert (100, 1) in inc and (24, 1) in inc  # merged to global min
    assert (101, 101) in inc and (30, 30) in inc


def test_retuned_bands_catch_low_jaccard_pairs(spark):
    """The remediation claim behind q207: on ~0.35-jaccard mutation
    pairs, 32/16 bands (2 rows/band) must catch strictly more truth
    pairs than the standing 32/8 (4 rows/band) — the S-curve knee
    moves left. Fixture: near-dup pairs made by replacing every 7th
    token (shingle jaccard ~0.4)."""
    from synthea_etl_spark.plans.llm12 import minhash_recall_eval

    base = [f"tok{j}" for j in range(40)]
    rows = []
    for d in range(30):
        words = [f"d{d}w{j}" if (j * 7 + d) % 3 == 0 else w
                 for j, w in enumerate(base)]
        rows.append((2 * d, " ".join(words)))
        mutated = [f"d{d}m{j}" if (j + d) % 7 == 0 else w
                   for j, w in enumerate(words)]
        rows.append((2 * d + 1, " ".join(mutated)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def caught(bands):
        out = minhash_recall_eval(docs, num_hashes=32, bands=bands).collect()
        truth = [r for r in out if r.id_b == r.id_a + 1 and r.id_a % 2 == 0]
        return sum(1 for r in truth if r.caught), len(truth)

    c8, n8 = caught(8)
    c16, n16 = caught(16)
    assert n8 == n16 > 0  # same truth side (index setting changes candidates only)
    assert c16 > c8  # the retune catches more of the low-jaccard band


def test_pq_rerank_is_exact_over_candidates(spark):
    """q208's stage 2 must equal brute-force cosine ranking
    restricted to the ADC candidate set: join the gate-scale output
    against an independent recompute."""
    import numpy as np

    from synthea_etl_spark.plans.llm14 import (
        _RERANK_C,
        q208_pq_rerank,
    )
    from synthea_etl_spark.plans.llm7 import pq_adc_topk

    sf = "/root/testdata/sf0.001"
    got = q208_pq_rerank(spark, sf).collect()
    cand = pq_adc_topk(spark, sf, _RERANK_C).collect()
    vecs = {
        r.vec_id: np.array(r.embedding)
        for r in spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    }
    by_q: dict = {}
    for r in cand:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    for q, neighbors in by_q.items():
        qv = vecs[q]
        sims = sorted(
            (
                (
                    round(
                        float(
                            np.dot(qv, vecs[n])
                            / (np.linalg.norm(qv) * np.linalg.norm(vecs[n]))
                        ),
                        6,
                    ),
                    n,
                )
                for n in neighbors
            ),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        mine = [
            (r.sim, r.neighbor_id)
            for r in sorted(
                (x for x in got if x.query_id == q), key=lambda x: x.rank
            )
        ]
        assert [n for _, n in mine] == [n for _, n in sims]


def test_sketch_store_ingest_stream(spark, tmp_path):
    """The fifth index family's streaming maintenance: batches of
    docs land as JSON; each publishes only its own k-row bottom-k
    sketch as a slice partition. The merged accumulated store must
    equal a fresh sketch of the union corpus (mergeability through
    parquet + the stream), a replayed slice partition is a no-op,
    and the q178-style overlap question is answerable mid-ingest
    from the store alone."""
    import json as _json

    from synthea_etl_spark.operators.dedup import (
        corpus_bottomk_sketch,
        corpus_sketch_store,
        merge_bottomk_sketches,
    )
    from synthea_etl_spark.pipeline import sketch_store_ingest_stream
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    landing = tmp_path / "landing"
    store = tmp_path / "store"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    rows = [(i, f"document body number {i} with shared tokens") for i in range(90)]

    def land(name, batch):
        (landing / name).write_text(
            "\n".join(
                _json.dumps({"doc_id": i, "text": t}) for i, t in batch
            )
        )

    def run():
        sketch_store_ingest_stream(
            spark, str(landing), str(store), str(ckpt), schema, k=16
        ).awaitTermination(120)

    land("b0.json", rows[:40])
    run()
    land("b1.json", rows[40:])
    run()  # restart resumes: only b1 is new

    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    merged = merge_bottomk_sketches(spark.read.parquet(str(store)), k=16)
    fresh = corpus_bottomk_sketch(corpus, "text", 16)
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in fresh.collect()
    )
    # slice partitions: one per committed batch
    slices = {
        r.slice_id
        for r in spark.read.parquet(str(store))
        .select("slice_id")
        .distinct()
        .collect()
    }
    assert slices == {"batch0", "batch1"}
    # replayed slice rewrite is a no-op (idempotent publication)
    b1 = spark.createDataFrame(
        rows[40:], "doc_id long, text string"
    )
    corpus_sketch_store(b1, str(store), slice_id="batch1", k=16)
    again = merge_bottomk_sketches(spark.read.parquet(str(store)), k=16)
    assert sorted(r.h for r in again.collect()) == sorted(
        r.h for r in fresh.collect()
    )
