"""Deterministic, engine-portable hashing for dedup/LSH operators.

Every hash bottoms out in md5 — the one hash both Spark and DuckDB compute
identically — so each Spark Column builder here has a ``*_sql`` twin
producing the equivalent DuckDB expression; the oracle replays the exact
same math.  hash32 = first 8 hex chars of md5("{seed}:{s}") as an unsigned
32-bit int (carried in a BIGINT).

Scale: md5-per-shingle is JVM-side codegen (no Python); at 100 TB the
shingle explosion dominates, not the hash — see operators/dedup.py for the
band-bucket join that keeps candidate generation linear.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash32(col: Column, seed: int) -> Column:
    """Unsigned 32-bit md5-derived hash of a string column (as long)."""
    m = F.md5(F.concat(F.lit(f"{seed}:"), col))
    return F.conv(F.substring(m, 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str, seed: int) -> str:
    """DuckDB twin of :func:`hash32`."""
    return f"CAST('0x' || substr(md5('{seed}:' || ({expr})), 1, 8) AS BIGINT)"


def words(text: Column) -> Column:
    """Lowercased alnum word tokens (empty tokens filtered)."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda w: F.length(w) > 0
    )


def words_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'),"
        " w -> length(w) > 0)"
    )


def shingles(word_arr: Column, k: int = 3) -> Column:
    """k-word shingles joined by single spaces; texts shorter than k words
    collapse to one whole-text shingle (so every doc has >= 1 shingle)."""
    full = F.array(F.array_join(word_arr, " "))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(word_arr) - k + 1),
        lambda i: F.array_join(F.slice(word_arr, i, k), " "),
    )
    return F.when(F.size(word_arr) >= k, grams).otherwise(full)


def shingles_sql(words_expr: str, k: int = 3) -> str:
    return f"""CASE WHEN len({words_expr}) >= {k}
      THEN list_transform(range(1, len({words_expr}) - {k} + 2),
                          i -> array_to_string(({words_expr})[i:i+{k - 1}], ' '))
      ELSE [array_to_string({words_expr}, ' ')] END"""


def minhash(shingle_arr: Column, seed: int) -> Column:
    """Min over shingles of hash32(shingle, seed) — one MinHash component."""
    return F.array_min(F.transform(shingle_arr, lambda s: hash32(s, seed)))


def minhash_sql(shingles_expr: str, seed: int) -> str:
    h = hash32_sql("x", seed).replace("(x)", "x")
    return f"list_aggregate(list_transform({shingles_expr}, x -> {h}), 'min')"


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Character n-grams of a (pre-normalized) string column."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - n + 1, F.lit(1))),
        lambda i: F.substring(text, i, n),
    )


def char_ngrams_sql(expr: str, n: int = 3) -> str:
    return (
        f"list_transform(range(1, greatest(length({expr}) - {n} + 1, 1) + 1),"
        f" i -> substr({expr}, i, {n}))"
    )


def simhash16(word_arr: Column) -> Column:
    """16-bit SimHash over word tokens: bit b set iff the sum over tokens of
    (+1 if bit b of hash32(token) set else -1) is positive.  Pure built-in
    expression; identical math in :func:`simhash16_sql`."""
    return simhash16_from_hashes(F.transform(word_arr, lambda w: hash32(w, 7)))


def simhash16_from_hashes(tok_hashes: Column) -> Column:
    """SimHash bit logic over precomputed token hashes (materialize the
    hash array as a column first to avoid 16x md5 recomputation)."""

    def bit_term(b: int):
        def fold(acc: Column, h: Column) -> Column:
            return acc + F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return fold

    out = F.lit(0)
    for b in range(16):
        bit_sum = F.aggregate(tok_hashes, F.lit(0), bit_term(b))
        out = out + F.when(bit_sum > 0, F.lit(1 << b)).otherwise(0)
    return out.cast("int")


def simhash16_sql(words_expr: str) -> str:
    h = hash32_sql("w", 7).replace("(w)", "w")
    terms = []
    for b in range(16):
        bit_sum = (
            f"list_aggregate(list_transform({words_expr}, "
            f"w -> CASE WHEN (({h} >> {b}) & 1) = 1 THEN 1 ELSE -1 END), 'sum')"
        )
        terms.append(f"CASE WHEN {bit_sum} > 0 THEN {1 << b} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS INT)"
