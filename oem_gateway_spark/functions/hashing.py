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


# 64-bit SimHash: bits 0..31 come from hash32(token, SEED_LO), bits 32..63
# from hash32(token, SEED_HI).  The signature is carried as 4 x 16-bit band
# columns sh_b0..sh_b3 (band j = bits [16j, 16j+15]) — bands double as the
# LSH bucket keys for hamming<=3 candidate generation, and 16-bit pieces
# never overflow a signed int in either engine.
SIMHASH_SEED_LO = 7
SIMHASH_SEED_HI = 8
SIMHASH_BITS = 64
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


def simhash64_bit_sum_terms(lo: Column, hi: Column) -> list[Column]:
    """64 per-token +/-1 contributions for the SimHash majority vote.

    Term b is +1 if bit b of the token's 64-bit hash is set, else -1; a NULL
    token hash (explode_outer row for an empty document) contributes 0 so
    empty docs keep an all-zero signature.  Summed per doc by the caller's
    groupBy — flat-column codegen, no interpreted array folds."""
    terms = []
    for b in range(SIMHASH_BITS):
        h = lo if b < 32 else hi
        terms.append(
            F.when(h.isNull(), 0)
            .when(F.shiftright(h, b % 32).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        )
    return terms


def simhash64_bands_from_bit_sums(sums: list[Column]) -> list[Column]:
    """4 x 16-bit band columns from the 64 per-bit majority sums (bit set
    iff its sum is strictly positive)."""
    bands = []
    for j in range(SIMHASH_BANDS):
        out = F.lit(0)
        for r in range(SIMHASH_BAND_BITS):
            out = out + F.when(
                sums[SIMHASH_BAND_BITS * j + r] > 0, F.lit(1 << r)
            ).otherwise(0)
        bands.append(out.cast("int"))
    return bands


def simhash64_sql_ctes() -> str:
    """DuckDB CTE chain (toks -> hashed -> sums -> sig0 -> sig) computing
    (doc_id, sh_b0..sh_b3, simhash_hex) from a CTE named ``corpus`` — the
    exact twin of ``operators.dedup.simhash64_signatures``.  Token hashes
    materialize as two lists so the 64 bit folds reuse one md5 pass per
    seed; COALESCE keeps empty-token docs at an all-zero signature."""
    lo = hash32_sql("x", SIMHASH_SEED_LO)
    hi = hash32_sql("x", SIMHASH_SEED_HI)
    sum_cols = []
    for b in range(SIMHASH_BITS):
        src = "hlo" if b < 32 else "hhi"
        sum_cols.append(
            f"COALESCE(list_aggregate(list_transform({src}, h -> "
            f"CASE WHEN (h >> {b % 32}) & 1 = 1 THEN 1 ELSE -1 END), 'sum'), 0)"
            f" AS s{b}"
        )
    band_cols = []
    for j in range(SIMHASH_BANDS):
        expr = " + ".join(
            f"CASE WHEN s{SIMHASH_BAND_BITS * j + r} > 0"
            f" THEN {1 << r} ELSE 0 END"
            for r in range(SIMHASH_BAND_BITS)
        )
        band_cols.append(f"CAST({expr} AS INT) AS sh_b{j}")
    return f"""
    toks AS (SELECT doc_id, {words_sql('text')} AS w FROM corpus),
    hashed AS (SELECT doc_id,
                      list_transform(w, x -> {lo}) AS hlo,
                      list_transform(w, x -> {hi}) AS hhi FROM toks),
    sums AS (SELECT doc_id, {', '.join(sum_cols)} FROM hashed),
    sig0 AS (SELECT doc_id, {', '.join(band_cols)} FROM sums),
    sig AS (SELECT doc_id, sh_b0, sh_b1, sh_b2, sh_b3,
                   printf('%04x%04x%04x%04x', sh_b3, sh_b2, sh_b1, sh_b0)
                     AS simhash_hex
            FROM sig0)"""
