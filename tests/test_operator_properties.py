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


def test_misra_gries_merge_superset_guarantee():
    """The vectorized MG merge used by d_heavy_hitters: for random skewed
    token streams split into arbitrary batches, every token with total
    frequency > n/(K+1) must survive in the final counter set (the
    candidate-superset guarantee the exact recount relies on)."""
    import pandas as pd

    K = 20
    rng = random.Random(7)
    for trial in range(25):
        n = rng.randint(50, 2000)
        # zipf-ish skew over a vocabulary larger than K
        vocab = [f"w{i}" for i in range(rng.randint(K + 5, 200))]
        weights = [1.0 / (i + 1) for i in range(len(vocab))]
        stream = rng.choices(vocab, weights=weights, k=n)
        # arbitrary batch split
        cuts = sorted(rng.sample(range(1, n), min(5, n - 1))) + [n]
        counters: dict[str, int] = {}
        start = 0
        for c in cuts:
            batch = pd.Series(stream[start:c], dtype=object)
            start = c
            merged = pd.Series(counters, dtype="int64").add(
                batch.value_counts(), fill_value=0
            )
            if len(merged) > K:
                cut_v = merged.nlargest(K + 1).iloc[-1]
                merged = merged - cut_v
                merged = merged[merged > 0]
            counters = merged.astype("int64").to_dict()
        import collections

        true = collections.Counter(stream)
        for tok, freq in true.items():
            if freq > n / (K + 1):
                assert tok in counters, (trial, tok, freq, n)


def test_locf_state_chain_equals_global_ffill():
    """locf_fill's per-batch update (ffill + leading-gap repair from one
    carried float) must equal a single global ffill for ANY batch split
    of a time-ordered stream — the exact invariant stream_locf relies on
    when the replay slices the stream into micro-batches."""
    import math as m

    import pandas as pd

    rng = random.Random(11)
    for trial in range(25):
        n = rng.randint(1, 200)
        vals = [
            None if rng.random() < 0.4 else round(rng.uniform(0, 10), 3)
            for _ in range(n)
        ]
        s = pd.Series(vals, dtype=object).astype(float)
        expect = s.ffill().tolist()
        cuts = sorted(rng.sample(range(1, n), min(4, n - 1))) + [n] if n > 1 else [n]
        got: list[float] = []
        last_good = float("nan")
        start = 0
        for c in cuts:
            chunk = s.iloc[start:c]
            start = c
            filled = chunk.ffill()
            if not m.isnan(last_good):
                filled = filled.fillna(last_good)
            tail = filled.iloc[-1] if len(filled) else float("nan")
            last_good = last_good if pd.isna(tail) else float(tail)
            got.extend(filled.tolist())
        assert len(got) == len(expect)
        for a, b in zip(got, expect):
            assert (m.isnan(a) and m.isnan(b)) or a == b, (trial, got, expect)


def test_skyline_decomposition_equals_brute_force(spark, tmp_path):
    """The skyline's scalable decomposition (per-x max, frontier pass on
    distinct x, join back) must equal the O(n^2) dominance definition on
    random data with heavy ties — the regime where per-x dedup and the
    strict/non-strict boundary are easiest to get wrong."""
    rng = random.Random(42)
    rows = [
        (i, float(rng.randint(0, 20)), rng.randint(0, 10))
        for i in range(400)
    ]
    spark.createDataFrame(
        rows, "p_partkey INT, p_retailprice DOUBLE, p_size INT"
    ).write.parquet(str(tmp_path / "part.parquet"))

    from oem_gateway_spark.suite.analytics_extra import q_skyline

    got = {
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in q_skyline(spark, str(tmp_path)).collect()
    }

    def dominated(r):
        return any(
            s[1] >= r[1] and s[2] >= r[2] and (s[1] > r[1] or s[2] > r[2])
            for s in rows
        )

    want = {r for r in rows if not dominated(r)}
    assert got == want


def test_semdedup_drops_exactly_the_constructed_copies(spark):
    """Every colinear copy must be dropped (its source has the lower id
    and cosine exactly 1); no original may be dropped (natural cosines
    sit far below the threshold).  Cluster-level: n_dropped equals the
    cluster's copy count, survivors equal its original count."""
    from oem_gateway_spark.operators.dedup import release_caches
    from oem_gateway_spark.suite.mlstats_extra import d_semdedup_centroid

    out = d_semdedup_centroid(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    release_caches(out)
    total_vec = sum(r["n_vectors"] for r in rows)
    total_drop = sum(r["n_dropped"] for r in rows)
    assert total_vec % 2 == 0  # corpus = originals + copies
    assert total_drop == total_vec // 2, rows  # exactly the copies
    for r in rows:
        assert r["n_survivors"] == r["n_vectors"] - r["n_dropped"]
        # copies land in their source's cluster: every cluster is half copies
        assert r["n_dropped"] * 2 == r["n_vectors"], r


def test_prefix_filter_join_recall_lossless_random_sets(spark):
    """The prefix-filtering theorem, empirically: over seeded random
    token sets drawn from a SMALL vocabulary (so pairs crowd the 0.7
    threshold from both sides), the Spark join returns EXACTLY the
    brute-force jaccard-threshold pair set — no missed pair (recall)
    and no extra pair (the verify stage).  Exact-rational comparison on
    the reference side; set sizes <= 24 keep every achievable jaccard
    more than 1e-6 away from the threshold, so round(.,6) cannot blur
    membership."""
    from fractions import Fraction

    from oem_gateway_spark.suite.reconcile_extra import (
        _SIM_DEN,
        _SIM_NUM,
        prefix_filter_join,
    )

    rng = random.Random(20260814)
    vocab = [f"t{i}" for i in range(12)]
    for trial in range(3):
        docs = []
        for did in range(60):
            size = rng.randint(1, min(24, len(vocab)))
            docs.append((did, sorted(rng.sample(vocab, size))))
        expected = set()
        thr = Fraction(_SIM_NUM, _SIM_DEN)
        for x in range(len(docs)):
            for y in range(x + 1, len(docs)):
                ia, ta = docs[x]
                ib, tb = docs[y]
                inter = len(set(ta) & set(tb))
                if inter and Fraction(inter, len(ta) + len(tb) - inter) >= thr:
                    expected.add((ia, ib))
        toks = spark.createDataFrame(
            [(d, t, len(t)) for d, t in docs],
            "doc_id long, toks array<string>, s long",
        )
        got = {
            (r.id_a, r.id_b) for r in prefix_filter_join(toks).collect()
        }
        assert got == expected, (
            trial,
            sorted(expected - got)[:5],
            sorted(got - expected)[:5],
        )


def test_exact_order_statistics_random_distributions(spark):
    """exact_order_statistics must equal the brute-force sorted rank for
    random distributions (seeded batch, one Spark DF per case — same
    rationale as the salted-join test): uniform floats, heavy duplicate
    pile-ups, negatives, exponential skew, and tiny n, across quantiles
    including both edges, with a cap small enough to force narrowing."""
    import math as _math

    from oem_gateway_spark.operators.selection import exact_order_statistics

    rng = random.Random(0xC0FFEE)
    cases = [
        [rng.uniform(-1e6, 1e6) for _ in range(3000)],
        [float(rng.randint(0, 8)) for _ in range(4000)],    # heavy dups
        [rng.expovariate(1e-3) for _ in range(2500)],        # skew
        [-abs(rng.gauss(0, 1)) for _ in range(1500)],        # all negative
        [7.25] * 997,                                        # constant
        [rng.uniform(0, 1)],                                 # n == 1
    ]
    qs = [0.001, 0.25, 0.5, 0.9, 1.0]
    for xs in cases:
        df = spark.createDataFrame([(v,) for v in xs], "x double")
        got = exact_order_statistics(
            df, "x", qs, n_buckets=8, collect_cap=40
        )
        srt = sorted(xs)
        for (q, k, v), want_q in zip(got, qs):
            bk = max(1, _math.ceil(want_q * len(xs)))
            assert (q, k) == (want_q, bk), (len(xs), q, k, bk)
            assert v == srt[bk - 1], (len(xs), q, v, srt[bk - 1])
