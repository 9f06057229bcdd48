"""Time-series suite: regular-grid resampling with linear interpolation
and robust (median/MAD) outlier detection over the events telemetry.

These are the server-side halves of the reference gateway's dataflow:
the gateway forwards raw irregular readings and "the server sorts it
out" (SURVEY.md §2.6 — emoncms resamples to fixed intervals and flags
bad readings).  Here the engine IS the server side, expressed as one
declarative plan per operator.

Determinism: interpolation is pure IEEE arithmetic on epoch-micros
longs and double values (no libm), ordering ties are broken by
(ts, is_grid, event_id) so the ignore-nulls window scans resolve
identically in both engines; the median/MAD path relies on Spark
``percentile`` and DuckDB ``quantile_cont`` computing the same
``lower + (upper-lower)*frac`` interpolation over the same sorted
doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oem_gateway_spark.catalog import load_table
from oem_gateway_spark.suite.registry import query


@query(
    "q_resample_interpolate",
    oracle="""
    WITH obs AS (
      SELECT user_id, ts, event_id, value FROM events
    ), bounds AS (
      SELECT user_id, date_trunc('day', min(ts)) AS t0, max(ts) AS t1
      FROM obs GROUP BY 1
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(t0, t1, INTERVAL 6 HOUR)) AS ts
      FROM bounds
    ), unioned AS (
      SELECT user_id, ts, 1 AS is_grid, CAST(-1 AS BIGINT) AS event_id,
             CAST(NULL AS DOUBLE) AS v
      FROM grid
      UNION ALL
      SELECT user_id, ts, 0, event_id, value FROM obs
    ), scanned AS (
      SELECT user_id, ts, is_grid,
        last_value(v IGNORE NULLS) OVER w_back AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END
                   IGNORE NULLS) OVER w_back AS pt,
        first_value(v IGNORE NULLS) OVER w_fwd AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END
                    IGNORE NULLS) OVER w_fwd AS nt
      FROM unioned
      WINDOW
        w_back AS (PARTITION BY user_id ORDER BY ts, is_grid, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_fwd AS (PARTITION BY user_id ORDER BY ts, is_grid, event_id
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id AS node, ts AS grid_ts,
           round(CASE WHEN nt = pt THEN pv
                      ELSE pv + (nv - pv) * ((epoch_us(ts) - pt)
                                             / CAST(nt - pt AS DOUBLE))
                 END, 6) AS v_interp
    FROM scanned
    WHERE is_grid = 1 AND pv IS NOT NULL AND nv IS NOT NULL
    """,
)
def q_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each node's irregular telemetry onto a regular 6-hour
    grid with linear interpolation between the surrounding readings —
    the emoncms fixed-interval feed materialization.  Grid points
    outside a node's observation range are dropped (no extrapolation).

    Shape: the grid generates from per-node min/max bounds (a tiny
    aggregate, exploded — never a driver loop); grid and observations
    UNION and a single pair of ignore-nulls window scans (backward for
    the previous reading, forward for the next) attaches the bracketing
    observations to every grid point; the interpolation itself is pure
    per-row arithmetic.  ONE shuffle on user_id serves both window
    directions.  At 100 TB: the union is linear in rows + grid points,
    state per node is O(1) — the same operator runs as a streaming
    LOCF-style applyInPandasWithState chain (streaming/state.py) when
    the grid must emit continuously."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.select("user_id", "ts", "event_id", "value")
    bounds = obs.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("t0"),
        F.max("ts").alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 6 HOURS"))
        ).alias("ts"),
    )
    unioned = grid.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_grid"),
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("v"),
    ).unionByName(
        obs.select(
            "user_id",
            "ts",
            F.lit(0).alias("is_grid"),
            "event_id",
            F.col("value").alias("v"),
        )
    )
    order = [F.col("ts"), F.col("is_grid"), F.col("event_id")]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_us = F.unix_micros("ts")
    obs_t = F.when(F.col("v").isNotNull(), t_us)
    scanned = unioned.select(
        "user_id",
        "ts",
        "is_grid",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(w_back).alias("pt"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(obs_t, ignorenulls=True).over(w_fwd).alias("nt"),
    )
    interp = F.when(F.col("nt") == F.col("pt"), F.col("pv")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (
            (t_us - F.col("pt"))
            / (F.col("nt") - F.col("pt")).cast("double")
        )
    )
    return (
        scanned.filter(
            (F.col("is_grid") == 1)
            & F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
        )
        .select(
            F.col("user_id").alias("node"),
            F.col("ts").alias("grid_ts"),
            F.round(interp, 6).alias("v_interp"),
        )
    )


@query(
    "q_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT user_id, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ), dev AS (
      SELECT e.user_id, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.user_id = m.user_id
    ), mad AS (
      SELECT user_id, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.user_id AS node,
           CAST(count(*) AS BIGINT) AS n,
           round(any_value(d.med), 6) AS med,
           round(any_value(m.mad), 6) AS mad,
           CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.user_id = m.user_id
    GROUP BY d.user_id
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-node outlier detection: median / median-absolute-
    deviation (the estimator that survives the exact spikes it is
    hunting — mean/stddev would be dragged by them), counting readings
    beyond 3 MAD.  The sensor-fault screen the reference's server side
    applies to incoming feeds.

    Shape: two grouped EXACT percentiles (median of values, then median
    of absolute deviations) and a final count — three aggregations all
    partitioned on user_id, so AQE reuses one exchange; the medians
    join back broadcast (per-node rows are tiny).  Exact percentile
    sorts within each group — at 100 TB swap in approx_percentile
    (t-digest sketch, no sort) and keep the identical plan; the suite
    pins the exact twin because it oracle-checks bit-for-bit."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(med, "user_id").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    joined = dev.join(mad, "user_id")
    return (
        joined.groupBy(F.col("user_id").alias("node"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.any_value("med"), 6).alias("med"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )
