"""Exact order-statistic selection by iterative histogram narrowing —
the no-global-sort way to answer "the exact k-th smallest of 100 TB".

Plan shape (new to the suite): DRIVER-COORDINATED AGGREGATE-NARROWED
SELECTION.  Every other exact-percentile surface in the registry
(q_exact_percentiles, q_window_* ranks) pays a per-group or global sort
of ALL values; this operator never sorts more than ``collect_cap`` rows:

  - pass 0: one scan -> (count, min, max) per target rank.  Each target
    becomes a live interval [lo, hi] plus the rank k_rem it must satisfy
    WITHIN that interval.
  - iteration: ONE scan serves every live target simultaneously — each
    row explodes into (rank_id, bucket) pairs for the intervals it falls
    in (a Generate + partial HashAggregate; the shuffle carries at most
    |targets| x n_buckets rows, i.e. kilobytes).  Per bucket we aggregate
    (count, min, max); the driver walks the cumulative counts, descends
    into the bucket containing k_rem, and tightens the interval to that
    bucket's OBSERVED [min, max] (not its arithmetic bounds — this is
    what guarantees strict progress: the next interval is spanned by
    actual values, so equal-value pile-ups resolve via min == max).
  - exit per target: bucket min == max (the answer is that value), or
    bucket count <= collect_cap (final scan collects just those values
    and the driver picks the (k_rem)-th — a justified bounded collect,
    same class as graph.py's convergence scalars).

Cost at 100 TB: (2 + iterations) full scans, each map-side combined to
kilobytes of shuffle; equal-width narrowing over doubles converges in
log_B(range/resolution) rounds (B=64 default -> range shrinks 64x per
round, and the observed-min/max tightening usually does far better on
real data).  No sort, no single-reducer stage, no per-group explosion.
Contrast: a global sort of 100 TB is a full-data range-partitioned
shuffle; percentile_approx is one pass but NOT exact.

Determinism: rank is the 1-based k-th smallest with k = ceil(q * n) —
duplicates are harmless (any tie order yields the same k-th VALUE).
All comparisons are on raw doubles read identically by both engines;
no arithmetic is performed on the values themselves (bucket indices
are derived from (x - lo) / width, used only for routing — the answer
is always an actual data value, never an interpolation), so the result
is bit-exact regardless of libm/fma differences.

Ref: SURVEY.md §2.6 (engine-beyond-reference surface); the reference
gateway (SURVEY ~l.120 buffer/sink loop) has no analytics at all.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _Target:
    __slots__ = ("q", "k", "lo", "hi", "k_rem", "cnt", "answer")

    def __init__(self, q: float, k: int, lo: float, hi: float, cnt: int):
        self.q = q
        self.k = k  # global 1-based rank (ceil(q * n))
        self.lo = lo
        self.hi = hi
        self.k_rem = k  # rank within [lo, hi]
        self.cnt = cnt  # values currently in [lo, hi]
        self.answer: float | None = None


def exact_order_statistics(
    df: DataFrame,
    col: str,
    quantiles: list[float],
    n_buckets: int = 64,
    collect_cap: int = 8192,
    max_iters: int = 64,
    final_collect_multiplier: int = 4,
) -> list[tuple[float, int, float]]:
    """Return [(q, k, value)] where value is the exact k-th smallest of
    ``df[col]`` (k = ceil(q * n), 1-based), computed without any sort.

    ``df`` is scanned (2 + iterations) times; persist it upstream if the
    source is not a cheap parquet scan.  NULLs are excluded (SQL rank
    semantics).  Raises ValueError on an empty column or a quantile
    outside (0, 1] — q > 1 would otherwise die rounds later with an
    opaque descent error (rank beyond n), and q <= 0 would silently
    clamp to rank 1 where the row_number() oracle formulation yields no
    row at all.
    """
    bad_q = [q for q in quantiles if not (0.0 < q <= 1.0)]
    if bad_q:
        raise ValueError(f"quantiles must be in (0, 1], got {bad_q}")
    x = F.col(col).cast("double")
    vals = df.select(x.alias("x")).where(F.col("x").isNotNull())

    n, gmin, gmax = vals.agg(
        F.count("x"), F.min("x"), F.max("x")
    ).first()  # pass 0: three scalars
    if not n:
        raise ValueError(f"exact_order_statistics: no non-null values in {col!r}")

    targets = [
        _Target(q, max(1, math.ceil(q * n)), float(gmin), float(gmax), int(n))
        for q in quantiles
    ]
    for t in targets:
        if t.lo == t.hi:
            t.answer = t.lo

    def _narrow(buckets: int) -> None:
        _narrow_targets(vals, targets, buckets, collect_cap, max_iters)

    _narrow(n_buckets)

    # Final scan: collect the survivors' (small) intervals in one pass.
    # If the bounded collect overflows (max_iters exhausted with a wide
    # residual interval), retry with progressively finer histograms — the
    # previously-correct-if-slow case keeps its answer instead of dying
    # (r7 ADVICE): a target that exited via cnt <= collect_cap cannot
    # overflow its share of the cap, so overflow always means a target
    # that can still narrow.
    # 4 collect attempts, narrows (8x/64x/512x buckets) only BETWEEN them
    # — never after the last collect, where the work could not contribute
    # to an answer (r8 code review).
    for _attempt in range(4):
        pending = [(i, t) for i, t in enumerate(targets) if t.answer is None]
        if not pending:
            break
        hard_cap = (
            max(collect_cap, 1) * max(len(pending), 1) * max(final_collect_multiplier, 1)
        )
        rows = _final_collect(vals, pending, hard_cap)
        if rows is not None:
            _resolve_pending(pending, rows)
            break
        if _attempt < 3:
            _narrow(n_buckets * 8 ** (_attempt + 1))
    else:
        raise RuntimeError(
            "exact_order_statistics: final collect exceeded its cap after "
            "retries with finer histograms — raise final_collect_multiplier, "
            "collect_cap, or max_iters"
        )

    return [(t.q, t.k, float(t.answer)) for t in targets]


def _narrow_targets(
    vals: DataFrame,
    targets: list[_Target],
    n_buckets: int,
    collect_cap: int,
    max_iters: int,
) -> None:
    """Iterative histogram narrowing (the main loop of the module doc)."""
    for _ in range(max_iters):
        live = [
            (i, t)
            for i, t in enumerate(targets)
            if t.answer is None
            and t.cnt > collect_cap
            # width must stay a positive double; a sub-ulp interval (lo
            # != hi but (hi-lo)/B underflows) falls through to the final
            # bounded-ish collect rather than an ANSI inf-cast crash.
            and (t.hi - t.lo) / n_buckets > 0.0
        ]
        if not live:
            break
        # One scan, all live targets: explode each row into the (rid,
        # bucket) pairs of the intervals containing it.  Intervals are
        # closed (tightened to observed min/max); the top edge folds into
        # the last bucket.
        structs = []
        for rid, t in live:
            width = (t.hi - t.lo) / n_buckets
            b = F.least(
                F.floor((F.col("x") - F.lit(t.lo)) / F.lit(width)).cast("int"),
                F.lit(n_buckets - 1),
            )
            inside = (F.col("x") >= F.lit(t.lo)) & (F.col("x") <= F.lit(t.hi))
            structs.append(
                F.when(
                    inside, F.struct(F.lit(rid).alias("rid"), b.alias("b"))
                ).otherwise(
                    F.struct(F.lit(-1).alias("rid"), F.lit(-1).alias("b"))
                )
            )
        hist = (
            vals.select("x", F.explode(F.array(*structs)).alias("s"))
            .where(F.col("s.rid") >= 0)
            .groupBy(F.col("s.rid").alias("rid"), F.col("s.b").alias("b"))
            .agg(
                F.count("*").alias("cnt"),
                F.min("x").alias("bmin"),
                F.max("x").alias("bmax"),
            )
            .collect()  # <= |live| * n_buckets rows — kilobytes by construction
        )
        by_rid: dict[int, list] = {}
        for row in hist:
            by_rid.setdefault(row["rid"], []).append(row)
        for rid, t in live:
            rows = sorted(by_rid.get(rid, ()), key=lambda r: r["b"])
            cum = 0
            for r in rows:
                if cum + r["cnt"] >= t.k_rem:
                    t.k_rem -= cum
                    t.lo, t.hi, t.cnt = float(r["bmin"]), float(r["bmax"]), int(
                        r["cnt"]
                    )
                    if t.lo == t.hi:
                        t.answer = t.lo
                    break
                cum += r["cnt"]
            else:  # pragma: no cover — counts changed under us
                raise RuntimeError("histogram lost the target rank")


def _final_collect(vals: DataFrame, pending, hard_cap: int):
    """Bounded final collect: DISTINCT values with counts for every
    pending target's interval, or None if the cap is exceeded.

    Collect DISTINCT values with counts, not raw rows: targets that
    exited via cnt <= collect_cap transfer at most cnt rows either
    way, but width-guard / max_iters fall-throughs can still hold
    huge intervals — on the pathological near-identical-value data
    that triggers them, those are FEW distinct doubles repeated many
    times, so grouping by value keeps the driver transfer bounded
    where a raw collect would be driver-OOM-scale.  The hard cap
    turns the residual adversarial case (many distinct values AND
    no convergence) into a retry-then-loud-error instead of a silent
    OOM (see exact_order_statistics' retry loop).
    """
    structs = [
        F.when(
            (F.col("x") >= F.lit(t.lo)) & (F.col("x") <= F.lit(t.hi)),
            F.lit(rid),
        ).otherwise(F.lit(-1))
        for rid, t in pending
    ]
    rows = (
        vals.select("x", F.explode(F.array(*structs)).alias("rid"))
        .where(F.col("rid") >= 0)
        .groupBy("rid", "x")
        .agg(F.count("*").alias("cnt"))
        .limit(hard_cap + 1)
        .collect()
    )
    if len(rows) > hard_cap:
        return None
    return rows


def _resolve_pending(pending, rows) -> None:
    """Walk each pending target's sorted (value, count) list to its rank."""
    per: dict[int, list[tuple[float, int]]] = {rid: [] for rid, _ in pending}
    for row in rows:
        per[row["rid"]].append((row["x"], int(row["cnt"])))
    for rid, t in pending:
        k = t.k_rem
        for val, cnt in sorted(per[rid]):
            if cnt >= k:
                t.answer = val
                break
            k -= cnt
        else:  # pragma: no cover — counts changed under us
            raise RuntimeError("final scan lost the target rank")
