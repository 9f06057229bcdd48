"""Local replica of the driver's DuckDB-oracle compare: row count, schema
arity, and order-insensitive value equality (columns sorted by name)."""

from __future__ import annotations

import math

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        s = out[c]
        if s.dtype == object and len(s) and isinstance(
            s.iloc[0], (list, np.ndarray)
        ):
            out[c] = s.map(lambda v: tuple(v))
            s = out[c]
        # DuckDB returns decimal/hugeint counts as object or different int
        # widths; unify numerics.
        if s.dtype == object and len(s) and isinstance(s.iloc[0], (int,)):
            out[c] = s.astype("int64")
        if str(s.dtype).startswith("datetime64"):
            out[c] = pd.to_datetime(s).dt.tz_localize(None)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame, name: str = "") -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    errs: list[str] = []
    if len(spark_df) != len(duck_df):
        errs.append(f"{name}: row count {len(spark_df)} != {len(duck_df)}")
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        errs.append(f"{name}: columns {sc} != {dc}")
        return errs
    if errs:
        return errs
    a, b = normalize(spark_df), normalize(duck_df)
    # The driver's value hash is dtype-sensitive: int64 75770367473 and
    # float64 7.577037e+10 hash differently even though the values are
    # equal (learned r6: q_dpp_prune's oracle summed BIGINT -> HUGEINT ->
    # pandas float64 while Spark returned int64).  Flag int-vs-float
    # column pairs so the mismatch is caught locally, before the driver.
    for c in a.columns:
        ka = a[c].dtype.kind
        kb = b[c].dtype.kind
        if {ka, kb} == {"i", "f"} or {ka, kb} == {"u", "f"}:
            errs.append(
                f"{name}: col {c} dtype mismatch spark={a[c].dtype} "
                f"oracle={b[c].dtype} (driver hash is dtype-sensitive; "
                f"CAST the aggregate, not just its input, to BIGINT)"
            )
    if errs:
        return errs
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) or isinstance(y, float):
                xf = float("nan") if x is None else float(x)
                yf = float("nan") if y is None else float(y)
                if math.isnan(xf) and math.isnan(yf):
                    continue
                if xf != yf:
                    errs.append(
                        f"{name}: col {c} row {i}: {x!r} != {y!r} (diff {xf - yf:g})"
                    )
                    break
            elif x != y:
                errs.append(f"{name}: col {c} row {i}: {x!r} != {y!r}")
                break
    return errs
