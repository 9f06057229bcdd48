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
    collapse to one whole-text shingle (so every doc has >= 1 shingle).

    Built as a zip_with fold over k shifted slices of the word array
    (gram i = words[i] .. words[i+k-1]), not transform(sequence(..),
    i -> array_join(slice(arr, i, k))): the slice-per-gram form
    re-copies k elements per output gram (O(n*k) array work per doc in
    interpreted HOF eval), while the fold does k-1 whole-array zips —
    measured 2.3x faster at sf0.1 with bit-identical output
    (tools notes, round 6)."""
    n = F.size(word_arr)
    full = F.array(F.array_join(word_arr, " "))
    grams = F.slice(word_arr, 1, n - (k - 1))
    for j in range(2, k + 1):
        nxt = F.slice(word_arr, j, n - (k - 1))
        grams = F.zip_with(
            grams, nxt, lambda acc, w: F.concat_ws(" ", acc, w)
        )
    return F.when(n >= k, grams).otherwise(full)


def shingles_sql(words_expr: str, k: int = 3) -> str:
    return f"""CASE WHEN len({words_expr}) >= {k}
      THEN list_transform(range(1, len({words_expr}) - {k} + 2),
                          i -> array_to_string(({words_expr})[i:i+{k - 1}], ' '))
      ELSE [array_to_string({words_expr}, ' ')] END"""


# MinHash components slice md5 digests: md5 yields 128 bits = four 32-bit
# hash functions per digest, so 8 components cost TWO md5 calls per shingle
# instead of eight (the digest dominates; distinct slices of a well-mixing
# digest act as independent hash functions).  Component s lives in digest
# s // 4 (prefix "{s//4}:") at hex offset 1 + 8*(s % 4).
MINHASH_SLICES = 4


def minhash_digest(shingle: Column, s: int) -> Column:
    """The md5 digest that component ``s`` slices from."""
    return F.md5(F.concat(F.lit(f"{s // MINHASH_SLICES}:"), shingle))


def minhash_component(shingle: Column, s: int) -> Column:
    """32-bit MinHash component ``s`` of one shingle (as long)."""
    return md5_slice32(minhash_digest(shingle, s), 1 + 8 * (s % MINHASH_SLICES))


def minhash(shingle_arr: Column, s: int) -> Column:
    """Min over shingles of component ``s`` — one MinHash signature slot."""
    return F.array_min(F.transform(shingle_arr, lambda x: minhash_component(x, s)))


def minhash_sql(shingles_expr: str, s: int) -> str:
    start = 1 + 8 * (s % MINHASH_SLICES)
    h = (
        f"CAST('0x' || substr(md5('{s // MINHASH_SLICES}:' || x), {start}, 8)"
        " AS BIGINT)"
    )
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


# 64-bit SimHash: ONE md5 per token supplies both halves — bits 0..31 from
# hex chars 1-8, bits 32..63 from hex chars 9-16 (md5 has 128 bits; paying a
# second digest for the high half would double the dominant hash cost).  The
# signature is carried as 4 x 16-bit band columns sh_b0..sh_b3 (band j =
# bits [16j, 16j+15]) — bands double as the LSH bucket keys for hamming<=3
# candidate generation, and 16-bit pieces never overflow a signed int in
# either engine.
SIMHASH_SEED = 7
SIMHASH_BITS = 64
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


def simhash64_token_md5(word: Column) -> Column:
    """The one md5 digest per token both signature halves slice from."""
    return F.md5(F.concat(F.lit(f"{SIMHASH_SEED}:"), word))


def md5_slice32(m: Column, start: int) -> Column:
    """Unsigned 32-bit int (as long) from 8 hex chars of an md5 column."""
    return F.conv(F.substring(m, start, 8), 16, 10).cast("long")


def simhash64_bit_cols(lo: Column, hi: Column) -> list[Column]:
    """64 raw bit extractions (0/1) of the per-token hash halves.

    The majority vote ``sum(+/-1) > 0`` equals ``2*popcount > n_tokens``,
    so summing raw bits (branch-free shift/AND arithmetic — measurably
    faster in codegen than 64 CASE expressions) with one token count is
    the whole aggregation.  SUM skips the NULL hash of an explode_outer
    row, so empty documents aggregate to (NULL sums, n=0)."""
    return [
        F.shiftright(lo if b < 32 else hi, b % 32).bitwiseAND(F.lit(1))
        for b in range(SIMHASH_BITS)
    ]


def simhash64_bands_from_bit_sums(sums: list[Column], n: Column) -> list[Column]:
    """4 x 16-bit band columns from the 64 per-bit popcount sums and the
    token count (bit set iff a strict majority of tokens set it)."""
    bands = []
    for j in range(SIMHASH_BANDS):
        out = F.lit(0)
        for r in range(SIMHASH_BAND_BITS):
            s = F.coalesce(sums[SIMHASH_BAND_BITS * j + r], F.lit(0))
            out = out + F.when(s * 2 > n, F.lit(1 << r)).otherwise(0)
        bands.append(out.cast("int"))
    return bands


# Packed popcount accumulation (r14, guide §2.3 "shuffle fewer bytes"):
# 4 x 16-bit lanes per long -> 16 packed sum columns instead of 64.
# Lane arithmetic is carry-free while every per-doc token count stays
# <= SIMHASH_PACKED_MAX_TOKENS: each lane total <= n < 2^15, and the
# worst-case packed sum n * 0x0001000100010001 < 2^63 never overflows
# the signed accumulator.  Corpora with longer documents move to 32-bit
# lanes (2 per long, 32 columns) — the runtime guard in
# simhash64_bands_from_packed names that switch instead of ever letting
# a lane carry silently corrupt a signature.
_SIMHASH_PACKED_COLS = 16
_SIMHASH_LANE_MASK = 0x0001000100010001
SIMHASH_PACKED_MAX_TOKENS = (1 << 15) - 1


def simhash64_packed_cols(lo: Column, hi: Column) -> list[Column]:
    """16 packed per-token accumulator columns (4 x 16-bit lanes each).

    ``packed[g] = (h64 >> g) & 0x0001000100010001`` drops bit ``g + 16r``
    of the 64-bit token hash into lane ``r`` — ONE shift + ONE mask per
    column versus the 64 separate shift/AND extractions of
    :func:`simhash64_bit_cols` (which stays as the readable spec form the
    equivalence test drives both paths against).  Summing the packed
    longs accumulates four lane counts per add, so the aggregation
    buffer narrows 65 -> 17 longs and the per-token hash-agg update does
    16 adds instead of 64.  NULL token hashes (explode_outer of an empty
    doc) stay NULL and are skipped by SUM, exactly like the unpacked
    form."""
    h64 = F.shiftleft(hi, 32).bitwiseOR(lo)
    return [
        F.shiftrightunsigned(h64, g).bitwiseAND(F.lit(_SIMHASH_LANE_MASK))
        for g in range(_SIMHASH_PACKED_COLS)
    ]


def simhash64_bands_from_packed(
    packed_sums: list[Column], n: Column
) -> list[Column]:
    """4 x 16-bit band columns from the 16 packed lane sums + token count.

    Unpacks lane ``r`` of ``packed_sums[g]`` back into the per-bit sum of
    bit ``g + 16r`` (shift + 0xFFFF mask — exact integers, so the
    majority vote is IDENTICAL arithmetic to
    :func:`simhash64_bands_from_bit_sums` over unpacked sums), after a
    runtime overflow guard: a document with more than
    SIMHASH_PACKED_MAX_TOKENS tokens would carry between lanes, so it
    raises (assert_true) rather than sign a wrong signature.  The guard
    evaluates once per aggregated doc row — post-aggregation, i.e. docs
    not tokens."""
    guard = F.assert_true(
        n <= F.lit(SIMHASH_PACKED_MAX_TOKENS),
        F.lit(
            "simhash64 packed popcount: a document exceeds "
            f"{SIMHASH_PACKED_MAX_TOKENS} tokens per doc; switch "
            "simhash64_signatures to 32-bit lanes"
        ),
    )
    sums: list[Column] = []
    for b in range(SIMHASH_BITS):
        g, r = b % _SIMHASH_PACKED_COLS, b // _SIMHASH_PACKED_COLS
        lane = F.shiftrightunsigned(
            F.coalesce(packed_sums[g], F.lit(0)), 16 * r
        ).bitwiseAND(F.lit(0xFFFF))
        if b == 0:
            # Thread the guard through one always-used lane: assert_true
            # yields NULL on success, so the when() resolves to the lane
            # value; on violation the job fails with the message above.
            lane = F.when(guard.isNull(), lane)
        sums.append(lane)
    return simhash64_bands_from_bit_sums(sums, n)


def simhash64_sql_ctes() -> str:
    """DuckDB CTE chain (toks -> hashed -> sums -> sig0 -> sig) computing
    (doc_id, sh_b0..sh_b3, simhash_hex) from a CTE named ``corpus`` — the
    exact twin of ``operators.dedup.simhash64_signatures``.  One md5 list
    materializes per doc; both 32-bit halves slice from it, and the 64 bit
    folds reuse those integer lists; COALESCE keeps empty-token docs at an
    all-zero signature."""
    sum_cols = []
    for b in range(SIMHASH_BITS):
        src = "hlo" if b < 32 else "hhi"
        sum_cols.append(
            f"COALESCE(list_aggregate(list_transform({src}, h -> "
            f"(h >> {b % 32}) & 1), 'sum'), 0) AS s{b}"
        )
    band_cols = []
    for j in range(SIMHASH_BANDS):
        expr = " + ".join(
            f"CASE WHEN 2 * s{SIMHASH_BAND_BITS * j + r} > n"
            f" THEN {1 << r} ELSE 0 END"
            for r in range(SIMHASH_BAND_BITS)
        )
        band_cols.append(f"CAST({expr} AS INT) AS sh_b{j}")
    return f"""
    toks AS (SELECT doc_id, {words_sql('text')} AS w FROM corpus),
    digests AS (SELECT doc_id,
                       list_transform(w, x -> md5('{SIMHASH_SEED}:' || x)) AS hm
                FROM toks),
    hashed AS (SELECT doc_id,
                      list_transform(hm, m -> CAST('0x' || substr(m, 1, 8) AS BIGINT)) AS hlo,
                      list_transform(hm, m -> CAST('0x' || substr(m, 9, 8) AS BIGINT)) AS hhi
               FROM digests),
    sums AS (SELECT doc_id, len(hlo) AS n, {', '.join(sum_cols)} FROM hashed),
    sig0 AS (SELECT doc_id, {', '.join(band_cols)} FROM sums),
    sig AS (SELECT doc_id, sh_b0, sh_b1, sh_b2, sh_b3,
                   printf('%04x%04x%04x%04x', sh_b3, sh_b2, sh_b1, sh_b0)
                     AS simhash_hex
            FROM sig0)"""
