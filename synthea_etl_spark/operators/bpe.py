"""Byte-pair-encoding tokenizer — distributed training AND
application, the classic Sennrich et al. (2016) word-level BPE.

Beyond-reference LLM-pipeline surface (the reference repo has no
tokenizer; builder's-brief scope — token-budget accounting and
tokenizer training are core pretraining-pipeline jobs). Public
knowledge only: the published BPE algorithm — represent words as
space-separated symbol sequences ending in an end-of-word marker,
repeatedly count adjacent symbol pairs over the (word, frequency)
vocabulary and merge the most frequent pair everywhere.

Scale design:

- Training first collapses the corpus to its VOCABULARY
  (groupBy word -> weight), which is the published algorithm's own
  trick: pair statistics over 100 TB of text equal pair statistics
  over its distinct words weighted by count — one shuffle, then the
  merge loop runs on a table the size of the vocabulary, not the
  corpus. Each iteration is one pair-count aggregation (JVM
  transform/sequence expressions, no UDF) plus a 1-row argmax
  collect (bounded driver traffic), with periodic localCheckpoint
  lineage truncation exactly like the PageRank loop (graph.py).
- Tie-breaks are total and deterministic: max count, then
  lexicographic pair order — training is reproducible at any
  parallelism.
- Application is a pure JVM replace chain over the space-joined
  symbol representation (left-to-right non-overlapping replace is
  the published merge order), so encoding 100 TB is narrow
  codegen work; DuckDB's replace() has identical semantics, which
  is what q149's oracle exploits.

DOCUMENTED DIVERGENCE — runs of a repeated symbol: the literal
' l r ' -> ' lr ' replace consumes the shared boundary space, so a
run of the same symbol merges fewer pairs per pass than canonical
Sennrich BPE. With merge (a, a): 'aaaa' -> ' aa a a </w> ' (one
merge) where canonical greedy pairing yields 'aa aa'. Iterating the
replace to a fixpoint would NOT recover canonical semantics either
(on 'aaaaa' it converges to 'aa a aa' vs canonical 'aa aa a'), so we
keep the single-pass replace, which training (_pair_counts +
vocabulary collapse), application, the q149 DuckDB oracle, and the
single-node reference implementation in tests/test_bpe.py all share
— the tokenizer is internally consistent and reproducible; only
learned merges on repeated-character words differ from canonical
BPE. Pinned by test_bpe.py::test_repeated_symbol_run_divergence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def to_symbols(col: Column | str) -> Column:
    """Word -> initial space-separated symbol string with sentinel
    spaces on both ends: 'low' -> ' l o w </w> '. The outer spaces
    make every symbol boundary explicit so a literal ' a b '
    replacement can never match across symbols."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.array_join(F.split(c, ""), " ")
    return F.concat(F.lit(" "), chars, F.lit(" " + END_OF_WORD + " "))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(repr, weight) vocabulary -> (pair, total weight): every
    adjacent symbol pair, weighted by word frequency. JVM-side:
    split + transform(sequence) + explode."""
    # guard the fully-merged case: a 1-symbol word has no pairs, and
    # sequence(1, 0) would count DOWN ([1, 0]) into an invalid index
    pairs = F.expr(
        "CASE WHEN size(split(trim(repr), ' ')) < 2"
        " THEN array()"
        " ELSE transform(sequence(1, size(split(trim(repr), ' ')) - 1),"
        "  i -> concat(element_at(split(trim(repr), ' '), i), ' ',"
        "             element_at(split(trim(repr), ' '), i + 1))) END"
    )
    return (
        vocab.select(F.explode(pairs).alias("pair"), "weight")
        .groupBy("pair")
        .agg(F.sum("weight").alias("cnt"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    checkpoint_every: int = 4,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus. Returns the
    ordered merge list [(left, right), ...]. Deterministic: ties on
    pair count break lexicographically."""
    from synthea_etl_spark.operators.text import tokens

    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("weight"))
        .select(to_symbols("word").alias("repr"), "weight")
    )
    vocab = vocab.localCheckpoint()  # one corpus pass; loop runs on vocab
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break  # nothing left worth merging
        pair = top[0]["pair"]
        left, right = pair.split(" ", 1)
        merges.append((left, right))
        vocab = vocab.select(
            F.replace(
                F.col("repr"),
                F.lit(f" {left} {right} "),
                F.lit(f" {left}{right} "),
            ).alias("repr"),
            "weight",
        )
        if (it + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()  # truncate the replace chain
    return merges


def apply_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize every document with a learned merge list: words ->
    symbol strings -> the merge replace chain in training order ->
    per-document BPE token count and the tokenized first word (a
    hashable witness of the actual segmentation). Narrow JVM work
    end to end."""
    from synthea_etl_spark.operators.text import tokens

    words = df.select(
        F.col("doc_id").alias("id"),
        F.explode(tokens(F.col(text_col))).alias("word"),
    ).filter(F.length("word") > 0)
    rep = to_symbols("word")
    for left, right in merges:
        rep = F.replace(
            rep, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
        )
    toks_per_word = F.size(F.split(F.trim(rep), " "))
    return (
        words.select("id", F.col("word"), rep.alias("rep"),
                     toks_per_word.alias("n"))
        .groupBy("id")
        .agg(
            F.sum("n").alias("bpe_tokens"),
            F.count("*").cast("int").alias("n_words"),
            F.min_by(F.trim(F.col("rep")), F.struct(F.col("word"))).alias(
                "first_word_segmentation"
            ),
        )
    )
