"""BPE tokenizer training: the byte-pair-encoding merge loop (Sennrich et
al. 2016) over a distributed word-frequency dictionary — the operator that
trains a tokenizer FROM the corpus, one step up from applying one
(functions/text.py::bpe_token_count).

Shape per merge step (the classic iterative-refinement pattern, same as
clustering.kmeans_fit):

  1. adjacent-pair counts over the per-word symbol arrays, weighted by
     word frequency — explode + one hash-aggregate exchange whose keys
     are PAIRS (bounded by |alphabet|^2 early, vocab-bounded later),
     never corpus rows;
  2. argmax pair (count desc, pair lexicographic — fully deterministic);
     ONLY this one (x, y, n) row crosses to the driver per step;
  3. greedy non-overlapping left-to-right merge applied to every word via
     a codegen'd aggregate() fold (skip-flag accumulator — no UDF, no
     regex back-and-forth, exact greedy semantics).

Everything is integers and strings: the DuckDB oracle replays the exact
loop (argmax CTE + recursive-CTE greedy walk per step) with NO float
tolerance anywhere.

Scale: the state that matters is the WORD DICTIONARY (distinct words x
frequency), which is vocabulary-sized, not corpus-sized — exactly how
production BPE trainers shard (count words once over 100 TB, then iterate
on the dictionary).  Each merge step is one aggregate exchange over the
dictionary plus a map-only rewrite; the driver holds k (pair, count)
tuples total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chars_of(word_col: str = "word") -> F.Column:
    """Per-word initial symbol array: one single-character symbol per
    character (1-based substr — matches the oracle's list_transform)."""
    return F.expr(
        f"transform(sequence(1, length({word_col})), i -> substr({word_col}, i, 1))"
    )


def pair_counts(words: DataFrame, s_col: str = "s", wc_col: str = "wc") -> DataFrame:
    """Frequency-weighted adjacent symbol pairs.  Words with one symbol
    contribute nothing (the sequence() guard matters: Spark's sequence(1, 0)
    counts DOWN, so an unguarded transform would fabricate pairs)."""
    pairs = F.expr(
        f"""CASE WHEN size({s_col}) >= 2 THEN
              transform(sequence(1, size({s_col}) - 1),
                        i -> named_struct('x', element_at({s_col}, i),
                                          'y', element_at({s_col}, i + 1)))
            ELSE cast(array() as array<struct<x: string, y: string>>) END"""
    )
    return (
        words.select(F.col(wc_col).alias("_wc"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.sum("_wc").alias("n"))
    )


def apply_merge(words: DataFrame, x: str, y: str, s_col: str = "s") -> DataFrame:
    """Greedy non-overlapping left-to-right merge of the pair (x, y) in
    every symbol array — the aggregate() fold with a skip flag (after a
    merge the next position is consumed; a freshly-merged symbol never
    re-merges within the same pass, matching reference BPE).

    The pair rides in as a broadcast one-row frame referenced by COLUMN,
    not embedded as literals: the fold expression is then byte-identical
    across merge steps and runs, so whole-stage codegen compiles it once
    (literal pairs re-compiled the generated class per step — measured
    ~8 s of first-run janino time at sf0.1)."""
    spark = words.sparkSession
    pair = spark.createDataFrame([(x, y)], "_mx string, _my string")
    fold = F.expr(
        f"""aggregate(
              sequence(1, size({s_col})),
              named_struct('out', cast(array() as array<string>), 'skip', false),
              (acc, i) -> CASE
                WHEN acc.skip THEN named_struct('out', acc.out, 'skip', false)
                WHEN i < size({s_col}) AND element_at({s_col}, i) = _mx
                     AND try_element_at({s_col}, i + 1) = _my
                  THEN named_struct(
                         'out', array_append(acc.out,
                                element_at({s_col}, i) || element_at({s_col}, i + 1)),
                         'skip', true)
                ELSE named_struct(
                       'out', array_append(acc.out, element_at({s_col}, i)),
                       'skip', false)
              END,
              acc -> acc.out)"""
    )
    return (
        words.join(F.broadcast(pair))
        .withColumn(s_col, fold)
        .drop("_mx", "_my")
    )


def bpe_train(word_counts: DataFrame, n_merges: int) -> list[tuple[int, str, str, int]]:
    """Run ``n_merges`` BPE merge steps over a (word, wc) dictionary.
    Returns [(rank, lhs, rhs, pair_count)] and leaves the driver holding
    nothing else; call sites re-derive the merged dictionary by replaying
    apply_merge (cheap map work) if they need the final symbols."""
    words = word_counts.withColumn("s", chars_of("word"))
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            pair_counts(words)
            .orderBy(F.desc("n"), F.asc("x"), F.asc("y"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        x, y, n = top[0]["x"], top[0]["y"], int(top[0]["n"])
        merges.append((rank, x, y, n))
        words = apply_merge(words, x, y)
    return merges
