"""Property checks for the round-4 operators: chunking geometry (pure
formula — every word covered, exact overlap) and salted-join equivalence
to the plain join over random skewed inputs (seeded batch, same rationale
as test_graph.py: hypothesis would respawn Spark jobs per example)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from oem_gateway_spark.operators.skew import salted_join
from oem_gateway_spark.suite.text_extra import CHUNK_OVERLAP, CHUNK_SIZE, CHUNK_STRIDE


def _n_chunks(n_words: int) -> int:
    # the exact formula t_chunking and its oracle share
    return max(1, math.ceil((n_words - CHUNK_OVERLAP) / CHUNK_STRIDE))


def test_chunking_formula_covers_every_word_with_exact_overlap():
    """For every doc length: chunks cover all words, interior neighbors
    overlap by exactly CHUNK_OVERLAP, no chunk exceeds CHUNK_SIZE, and
    only the last chunk may be short."""
    for n in range(0, 400):
        k = _n_chunks(n)
        chunks = [
            list(range(i * CHUNK_STRIDE, min(i * CHUNK_STRIDE + CHUNK_SIZE, n)))
            for i in range(k)
        ]
        covered = set().union(*[set(c) for c in chunks]) if chunks else set()
        assert covered == set(range(n)), n
        for i, c in enumerate(chunks):
            assert len(c) <= CHUNK_SIZE, (n, i)
            if i < k - 1:
                assert len(c) == CHUNK_SIZE, (n, i)  # only the tail is short
                overlap = set(c) & set(chunks[i + 1])
                assert len(overlap) == CHUNK_OVERLAP, (n, i)
        # one chunk fewer would leave words uncovered (minimality), except
        # the degenerate n==0 single empty chunk
        if k > 1:
            short = set().union(*[set(c) for c in chunks[:-1]])
            assert short != set(range(n)), n


def test_salted_join_equals_plain_join_random_skew(spark):
    """salted_join must return exactly the plain join's multiset for inner
    and left joins, across random skewed key distributions (hot keys,
    missing keys, NULL keys)."""
    rng = random.Random(20260814)
    for trial in range(4):
        n_big = rng.randint(10, 300)
        keys = ["hot"] * (n_big // 2) + [
            rng.choice(["a", "b", "c", "orphan", None]) for _ in range(n_big - n_big // 2)
        ]
        big = spark.createDataFrame(
            [(k, i) for i, k in enumerate(keys)], "k string, v int"
        )
        small = spark.createDataFrame(
            [("hot", 1), ("a", 2), ("b", 3), ("only_small", 4)], "k string, w int"
        )
        for how in ("inner", "left"):
            got = salted_join(big, small, on="k", n_salts=5, how=how)
            want = big.join(small, on="k", how=how)
            got_rows = sorted(map(tuple, got.select("k", "v", "w").collect()),
                              key=lambda t: (str(t[0]), t[1], str(t[2])))
            want_rows = sorted(map(tuple, want.select("k", "v", "w").collect()),
                               key=lambda t: (str(t[0]), t[1], str(t[2])))
            assert got_rows == want_rows, (trial, how)
