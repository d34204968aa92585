"""Round-9 operator family, part 7: token-budget curriculum and the
epoch repetition plan."""

from __future__ import annotations

import hashlib
import math
import re


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def _py_curriculum(rows, bucket_width=50_000, num=3, den=10):
    """Pure-Python mirror of q200's histogram-cutoff admission."""
    stops = {"the", "a", "of", "and", "to", "in", "is"}
    scored = []
    for doc_id, text in rows:
        t = text.strip()
        toks = re.split(r"\s+", t) if t else []
        n = len(toks)
        nn = max(n, 1)
        score = len([x for x in toks if x in stops]) * 1_000_000 // nn
        scored.append(
            (
                doc_id,
                n,
                score // bucket_width,
                hashlib.md5(f"cb{doc_id}".encode()).hexdigest(),
            )
        )
    hist = {}
    for _, n, b, _h in scored:
        hist[b] = hist.get(b, 0) + n
    budget = sum(hist.values()) * num // den
    admitted = {}
    before = {}
    acc = 0
    for b in sorted(hist, reverse=True):
        before[b] = acc
        acc += hist[b]
    for b in sorted(hist, reverse=True):
        if before[b] + hist[b] <= budget:
            for d, n, bb, _h in scored:
                if bb == b:
                    admitted[d] = True
        elif before[b] < budget:
            rem = budget - before[b]
            run = 0
            for d, n, bb, h in sorted(
                (x for x in scored if x[2] == b), key=lambda x: (x[3], x[0])
            ):
                run += n
                admitted[d] = run <= rem
        else:
            for d, n, bb, _h in scored:
                if bb == b:
                    admitted[d] = False
    return admitted, budget


def test_curriculum_matches_python_mirror(spark):
    from synthea_etl_spark.plans.common import load
    from synthea_etl_spark.plans.llm11 import q200_token_budget_curriculum

    sf = "/root/testdata/sf0.001"
    rows = [
        (r.doc_id, r.text)
        for r in load(spark, sf, "documents").select("doc_id", "text").collect()
    ]
    expected, budget = _py_curriculum(rows)
    out = {
        r.doc_id: (r.admitted, r.n_tokens)
        for r in q200_token_budget_curriculum(spark, sf).collect()
    }
    assert {d: a for d, (a, _) in out.items()} == expected
    used = sum(n for d, (a, n) in out.items() if a)
    assert used <= budget
    # the budget is actually consumed: within one boundary-doc of full
    assert used >= budget - max(n for _, (_, n) in out.items())


def test_curriculum_prefers_high_buckets(spark, tmp_path):
    """Docs rich in stop-words (high buckets) admit before docs with
    none when the budget is scarce."""
    from synthea_etl_spark.plans.llm11 import q200_token_budget_curriculum

    rows = []
    for i in range(10):  # high-quality: 50% stop density
        rows.append((i, "the cat of dog and fox " * 10, "en", "s"))
    for i in range(10, 40):  # zero stop density
        rows.append((i, " ".join(f"z{i}x{j}" for j in range(60)), "en", "s"))
    _docs(spark, rows).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r.admitted
        for r in q200_token_budget_curriculum(spark, str(tmp_path)).collect()
    }
    assert all(out[i] for i in range(10))  # every rich doc admitted
    assert not all(out[i] for i in range(10, 40))  # budget cuts the rest


def test_epoch_plan_exact_allocation(spark, tmp_path):
    """Per-source repeat sums equal the integer allocation, with
    low-resource sources upsampled above 1x and the dominant source
    pushed below 1x."""
    from synthea_etl_spark.plans.llm11 import q201_epoch_repetition_plan

    rows = []
    vid = 0
    for _ in range(96):
        rows.append((vid, f"doc {vid} text", "en", "big"))
        vid += 1
    for _ in range(4):
        rows.append((vid, f"doc {vid} text", "en", "small"))
        vid += 1
    _docs(spark, rows).write.parquet(str(tmp_path / "documents.parquet"))
    out = q201_epoch_repetition_plan(spark, str(tmp_path)).collect()
    n = 100
    w_big = math.floor(math.sqrt(96) * 1_000_000 + 0.5)
    w_small = math.floor(math.sqrt(4) * 1_000_000 + 0.5)
    tw = w_big + w_small
    ns = {"big": w_big * n // tw, "small": w_small * n // tw}
    sums = {}
    for r in out:
        sums[r.source] = sums.get(r.source, 0) + r.n_repeats
    assert sums == ns
    # temperature boost: small source draws ~1.4x its size, big < 1x
    assert ns["small"] > 4
    assert ns["big"] < 96
    reps_small = [r.n_repeats for r in out if r.source == "small"]
    assert max(reps_small) >= 2  # upsampling means repetition


def test_epoch_plan_remainder_goes_to_md5_order(spark):
    from synthea_etl_spark.plans.common import load
    from synthea_etl_spark.plans.llm11 import q201_epoch_repetition_plan

    sf = "/root/testdata/sf0.001"
    out = q201_epoch_repetition_plan(spark, sf).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        reps = sorted({r.n_repeats for r in rows})
        assert len(reps) <= 2  # base and base+1 only
        if len(reps) == 2:
            assert reps[1] - reps[0] == 1
            # the +1 docs are exactly the smallest md5('ep'||id) ranks
            ranked = sorted(
                rows,
                key=lambda r: (
                    int(
                        hashlib.md5(f"ep{r.doc_id}".encode()).hexdigest()[:8],
                        16,
                    ),
                    r.doc_id,
                ),
            )
            k = sum(1 for r in rows if r.n_repeats == reps[1])
            assert all(r.n_repeats == reps[1] for r in ranked[:k])
            assert all(r.n_repeats == reps[0] for r in ranked[k:])
