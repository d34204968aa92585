"""Round-13 batch-6 tests: char entropy, Luhn PII audit, script-mix
audit, LSH+edit-distance verification, calibration table, soft-dedup
budget."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(
        path + "/documents.parquet"
    )


def test_char_entropy_known_values(spark, tmp_path):
    """Hand-computable entropy cases: a one-char doc has H = 0 and
    flags both rules; a uniform 4-char doc has H = ln 4; an 8-char
    uniform doc crosses the 2-nat threshold."""
    from synthea_etl_spark.plans.llm27 import q246_char_entropy_quality

    sf = str(tmp_path)
    _write_docs(
        spark,
        sf,
        [(0, "aaaa", "s"), (1, "abcd", "s"), (2, "abcdefgh", "s")],
    )
    out = {
        r.doc_id: r for r in q246_char_entropy_quality(spark, sf).collect()
    }
    # doc 0: one run of 4 -> H = ln4 - (4 ln4)/4 = 0
    assert out[0].entropy_micro == 0
    assert out[0].top_char_micro == 1_000_000
    assert out[0].distinct_chars == 1
    assert out[0].low_entropy and out[0].repetitive
    # doc 1: uniform over 4 chars -> H = ln 4 (every k = 1 term is 0)
    assert out[1].entropy_micro == math.floor(
        round(math.log(4), 6) * 1_000_000 + 0.5
    )
    assert out[1].distinct_chars == 4
    assert out[1].low_entropy  # ln4 = 1.386 < 2.0 nats
    assert out[1].repetitive  # top char = 1/4 = 25%
    # doc 2: H = ln 8 = 2.079 nats -> neither flag
    assert out[2].entropy_micro == math.floor(
        round(math.log(8), 6) * 1_000_000 + 0.5
    )
    assert not out[2].low_entropy and not out[2].repetitive


def test_char_entropy_mixed_runs(spark, tmp_path):
    """A non-uniform histogram: 'aab' -> H = ln3 - (2 ln2)/3, with
    the k*ln(k) term quantized before the integer division."""
    from synthea_etl_spark.plans.llm27 import q246_char_entropy_quality

    sf = str(tmp_path)
    _write_docs(spark, sf, [(0, "aab", "s")])
    r = q246_char_entropy_quality(spark, sf).collect()[0]
    term = math.floor(round(2 * math.log(2), 6) * 1_000_000 + 0.5)
    want = math.floor(round(math.log(3), 6) * 1_000_000 + 0.5) - term // 3
    assert r.entropy_micro == want
    assert r.top_char_micro == 2 * 1_000_000 // 3
    assert r.distinct_chars == 2


def test_luhn_audit_counts_valid_and_corrupted(spark, tmp_path):
    """doc_id % 7 == 0 carries no card; doc_id % 3 == 0 carries a
    corrupted check digit; everything else Luhn-validates. The
    12-digit decoy never matches the candidate pattern."""
    from synthea_etl_spark.plans.llm27 import q247_pii_luhn_audit

    sf = str(tmp_path)
    ids = list(range(21))
    _write_docs(spark, sf, [(i, f"text {i}", "s") for i in ids])
    r = q247_pii_luhn_audit(spark, sf).collect()[0]
    carded = [i for i in ids if i % 7 != 0]
    valid = [i for i in carded if i % 3 != 0]
    assert r.n_docs == len(ids)
    assert r.n_docs_with_cards == len(carded)
    assert r.n_valid_cards == len(valid)
    assert r.n_invalid_cards == len(carded) - len(valid)


def test_luhn_sum_is_mod10_correct(spark):
    """The synthesized valid cards actually pass an independent
    Python Luhn implementation (guards against a same-bug-both-
    engines fold)."""
    from synthea_etl_spark.plans.llm27 import q247_pii_luhn_audit  # noqa: F401

    import hashlib

    def luhn_ok(s: str) -> bool:
        total = 0
        for pos, ch in enumerate(reversed(s), start=1):
            d = int(ch)
            if pos % 2 == 0:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    trans = str.maketrans("abcdef", "012345")
    for doc_id in (1, 2, 4, 5, 8, 10, 11, 13):  # % 3 != 0, % 7 != 0
        p = hashlib.md5(f"card{doc_id}".encode()).hexdigest().translate(
            trans
        )[:15]
        # reproduce the engine's check digit: doubling at odd left
        # index of the 15-digit payload
        s = 0
        for j, ch in enumerate(p, start=1):
            d = int(ch)
            if j % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            s += d
        check = (10 - s % 10) % 10
        assert luhn_ok(p + str(check)), doc_id


def test_script_mix_classes(spark, tmp_path):
    """doc_id % 4 == 1 (homoglyph substitution inside tokens) flags
    spoofed; % 4 == 2 (clean appended Cyrillic word) counts as clean
    multilingual, not spoofed; pure-ASCII docs count in neither."""
    from synthea_etl_spark.plans.llm27 import q248_script_mix_audit

    sf = str(tmp_path)
    _write_docs(
        spark,
        sf,
        [
            (0, "plain words here", "s"),
            (1, "paypal account xyz", "s"),  # a->Cyrillic inside tokens
            (2, "hello world", "s"),  # + clean Cyrillic appended
            (3, "no vowels-of-interest", "s"),
        ],
    )
    r = q248_script_mix_audit(spark, sf).collect()[0]
    assert r.n_docs == 4
    assert r.n_spoofed_docs == 1
    assert r.n_clean_cyrillic_docs == 1
    assert r.mixed_tokens == 2  # 'pаypаl' and 'аccount' mix scripts
    assert r.cyrillic_chars > 0 and r.latin_chars > 0


def test_lsh_verified_pairs_keeps_and_scores(spark, tmp_path):
    """An exact-dup pair passes with distance 0 / similarity 1.0;
    a one-word-changed near-dup passes with the exact integer
    similarity; band machinery is q33's so unrelated docs produce
    no candidate at all."""
    from synthea_etl_spark.plans.llm27 import q249_lsh_verified_pairs

    sf = str(tmp_path)
    base = " ".join(f"w{i}" for i in range(30))
    near = base.replace("w7 ", "zz ", 1)
    other = " ".join(f"q{i}" for i in range(30))
    _write_docs(
        spark, sf, [(0, base, "s"), (1, base, "s"), (2, near, "s"),
                    (3, other, "s")]
    )
    rows = {
        (r.id_a, r.id_b): r
        for r in q249_lsh_verified_pairs(spark, sf).collect()
    }
    assert (0, 1) in rows
    assert rows[(0, 1)].edit_dist == 0
    assert rows[(0, 1)].edit_sim_micro == 1_000_000
    assert (0, 2) in rows and (1, 2) in rows
    mx = max(len(base), len(near))
    d = rows[(0, 2)].edit_dist
    assert 0 < d <= 2
    assert rows[(0, 2)].edit_sim_micro == (mx - d) * 1_000_000 // mx
    assert not any(3 in k for k in rows)


def test_lsh_verify_sample_fraction_bounds_and_nests(spark):
    """The degenerate-clique bound: fraction=1.0 is the identity
    (the gate path), a fraction < 1 selects a deterministic,
    hash-stable SUBSET of the verified pairs (same rows, same
    scores), and the selection is by pair — rerunning gives the
    same subset."""
    from synthea_etl_spark.plans.llm27 import q249_lsh_verified_pairs

    full = {
        tuple(r)
        for r in q249_lsh_verified_pairs(spark, SF_DIR).collect()
    }
    ident = {
        tuple(r)
        for r in q249_lsh_verified_pairs(
            spark, SF_DIR, verify_sample_fraction=1.0
        ).collect()
    }
    assert ident == full
    half = {
        tuple(r)
        for r in q249_lsh_verified_pairs(
            spark, SF_DIR, verify_sample_fraction=0.5
        ).collect()
    }
    assert half <= full
    assert len(half) < len(full) or not full
    rerun = {
        tuple(r)
        for r in q249_lsh_verified_pairs(
            spark, SF_DIR, verify_sample_fraction=0.5
        ).collect()
    }
    assert rerun == half


def test_calibration_table_is_internally_consistent(spark):
    """On the real corpus: one base rate shared by every row,
    pass_micro the exact integer ratio, gap the absolute
    difference, and the doc counts reconcile with the joined
    population."""
    from synthea_etl_spark.plans.llm27 import q250_ppl_rules_calibration

    rows = q250_ppl_rules_calibration(spark, SF_DIR).collect()
    assert rows
    bases = {r.base_micro for r in rows}
    assert len(bases) == 1
    total = sum(r.n_docs for r in rows)
    passed = sum(r.n_pass for r in rows)
    assert bases.pop() == passed * 1_000_000 // total
    for r in rows:
        assert r.pass_micro == r.n_pass * 1_000_000 // r.n_docs
        assert r.gap_micro == abs(r.pass_micro - r.base_micro)


def test_soft_dedup_budget_arithmetic(spark, tmp_path):
    """3 copies of a 4-token doc + 1 unique 2-token doc: hard keeps
    6 tokens, soft keeps 3 * 4 * (1e6 div 3) + 2e6 micro-tokens."""
    from synthea_etl_spark.plans.llm27 import q251_dup_weighted_budget

    sf = str(tmp_path)
    a = "w1 w2 w3 w4"
    _write_docs(
        spark,
        sf,
        [(0, a, "s"), (1, a, "s"), (2, a, "s"), (3, "u1 u2", "s")],
    )
    r = q251_dup_weighted_budget(spark, sf).collect()[0]
    assert r.n_docs == 4 and r.n_unique == 2
    assert r.total_tokens == 14
    assert r.hard_dedup_tokens == 6
    assert r.soft_tokens_micro == 3 * 4 * (1_000_000 // 3) + 2 * 1_000_000


def test_llm27_match_duckdb_on_testdata(duck, spark):
    from synthea_etl_spark.plans.llm27 import QUERIES

    for name, spec in QUERIES.items():
        got = {tuple(r) for r in spec.fn(spark, SF_DIR).collect()}
        want = {tuple(r) for r in duck.execute(spec.oracle).fetchall()}
        assert got == want, name
