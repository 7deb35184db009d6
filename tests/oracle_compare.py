"""Order-insensitive DataFrame-vs-DuckDB comparison mirroring the
driver's correctness check: row count + column names + value equality
after canonical sorting (columns sorted by name, rows sorted by all
columns). Stricter than a hash: reports the first differing cells."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # lists (array columns) -> tuples so they sort/compare
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    key = [c for c in df.columns]
    df = df.sort_values(key, na_position="first").reset_index(drop=True)
    return df


def _cell_eq(a, b) -> bool:
    if a is None or (isinstance(a, float) and math.isnan(a)):
        return b is None or (isinstance(b, float) and math.isnan(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cell_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf  # exact: contract queries round on both sides
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return [f"column mismatch: spark={s_cols} duck={d_cols}"]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s, d = _canon(spark_pdf), _canon(duck_pdf)
    n = min(len(s), len(d))
    bad = 0
    for i in range(n):
        for c in s.columns:
            if not _cell_eq(s.iloc[i][c], d.iloc[i][c]):
                problems.append(
                    f"row {i} col {c}: spark={s.iloc[i][c]!r} duck={d.iloc[i][c]!r}"
                )
                bad += 1
                if bad >= 5:
                    problems.append("... (stopping after 5 cell mismatches)")
                    return problems
    return problems
