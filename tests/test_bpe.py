"""BPE tokenizer tests — distributed training pinned against a
loop-written single-node reference implementation of the published
algorithm (Sennrich et al. 2016), plus application invariants.

Reference scope note: the reference repo has no tokenizer; this is
builder's-brief LLM-pipeline surface (operators/bpe.py).
"""

from __future__ import annotations

from collections import Counter

from synthea_etl_spark.operators.bpe import apply_bpe, train_bpe


def _ref_train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Single-node reference: dict-of-words BPE with the same
    deterministic tie-break (max count, lexicographically smallest
    pair) and the same stop rule (count < 2)."""
    vocab: Counter = Counter()
    for t in texts:
        for w in t.split():
            vocab[" ".join(list(w)) + " </w>"] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for rep, wt in vocab.items():
            syms = rep.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wt
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < 2:
            break
        pair = sorted(
            " ".join(p) for p, c in pairs.items() if c == best_count
        )[0]
        a, b = pair.split(" ", 1)
        merges.append((a, b))
        newv: Counter = Counter()
        for rep, wt in vocab.items():
            padded = " " + rep + " "
            padded = padded.replace(f" {a} {b} ", f" {a}{b} ")
            newv[padded.strip()] += wt
        vocab = newv
    return merges


def test_distributed_training_matches_reference(spark):
    texts = [
        "low lower lowest low low newer new wider new new",
        "the the the then there low newer wide wide wide",
        "bpe merges should be frequency then lexicographic",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for n in (1, 4, 8, 12):
        assert train_bpe(df, n_merges=n) == _ref_train(texts, n)


def test_training_stops_when_nothing_repeats(spark):
    df = spark.createDataFrame(
        [(0, "abc defg hij")], "doc_id long, text string"
    )
    # every pair occurs once -> stop rule (count < 2) fires immediately
    assert train_bpe(df, n_merges=5) == []


def test_apply_counts_and_segmentation(spark):
    """With the merge ladder (l,o), (w,</w>), (lo,w</w>): 'low'
    collapses to one token; words not touched by the merges stay
    fully split (chars + the end-of-word marker)."""
    df = spark.createDataFrame(
        [(0, "low low ox"), (1, "low")], "doc_id long, text string"
    )
    merges = [("l", "o"), ("w", "</w>"), ("lo", "w</w>")]
    out = {r.id: r for r in apply_bpe(df, "text", merges).collect()}
    # doc 0: 'low' -> ['low</w>'] (1 token) x2, 'ox' -> o x </w> (3)
    assert out[0].bpe_tokens == 1 + 1 + 3
    assert out[0].n_words == 3
    # alphabetically first word of doc 0 is 'low'
    assert out[0].first_word_segmentation == "low</w>"
    assert out[1].bpe_tokens == 1 and out[1].n_words == 1


def test_merge_is_boundary_safe(spark):
    """A merge (a,b) must only join the full symbols a and b — never
    a suffix/prefix spanning a symbol boundary ('xa b' stays)."""
    df = spark.createDataFrame(
        [(0, "xab ab")], "doc_id long, text string"
    )
    out = {
        r.id: r for r in apply_bpe(df, "text", [("a", "b")]).collect()
    }
    # 'xab' -> x ab </w> (3 tokens), 'ab' -> ab </w> (2 tokens):
    # the x-a boundary never fused
    assert out[0].bpe_tokens == 5
    assert out[0].first_word_segmentation == "ab </w>"


def test_apply_respects_merge_order(spark):
    """The ladder (e,</w>), (t,h), (th,e</w>) tokenizes 'the' to one
    symbol; running (th,e</w>) FIRST cannot (neither 'th' nor 'e</w>'
    exists yet), leaving two symbols — merge order is semantic."""
    df = spark.createDataFrame([(0, "the")], "doc_id long, text string")
    ordered = apply_bpe(
        df, "text", [("e", "</w>"), ("t", "h"), ("th", "e</w>")]
    ).collect()[0]
    reversed_ = apply_bpe(
        df, "text", [("th", "e</w>"), ("e", "</w>"), ("t", "h")]
    ).collect()[0]
    assert ordered.bpe_tokens == 1
    assert ordered.first_word_segmentation == "the</w>"
    assert reversed_.bpe_tokens == 2  # -> th e</w>


def test_repeated_symbol_run_divergence(spark):
    """Documented divergence (see operators/bpe.py docstring): the
    boundary-space-consuming replace merges a run of a repeated
    symbol once per non-overlapping occurrence, not with canonical
    Sennrich greedy pairing — 'aaaa' under merge (a, a) becomes
    ' aa a a </w>' (3 tokens + marker) rather than canonical 'aa aa'.
    Training, application, and the in-test reference all share the
    semantics, so the pinned behavior is internally consistent."""
    df = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id long, text string")
    merges = train_bpe(df, "text", n_merges=1)
    assert merges == [("a", "a")]
    out = apply_bpe(df, "text", merges).collect()[0]
    # per word: 'aa', 'a', 'a', '</w>' -> 4 symbols (canonical would be 3)
    assert out.first_word_segmentation == "aa a a </w>"
    assert out.bpe_tokens == 8
    # the single-node reference trainer agrees symbol-for-symbol
    assert _ref_train(["aaaa aaaa"], 1) == merges
