"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet
tables, normalizes both (columns sorted by name, rows sorted by all
columns), and compares values. Stricter than any reasonable hash — if this
passes, the driver's order-insensitive value-hash passes.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from floatchat_datapipeline_spark.catalog import ALL_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ALL_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        # DuckDB returns float32 lists; Spark returns float64-ish lists —
        # normalize any list column to tuples of rounded floats for sorting.
        elif out[c].dtype == object:
            out[c] = out[c].map(
                lambda v: tuple(round(float(x), 5) for x in v)
                if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, str)
                else v
            )
    out = out.sort_values(by=list(out.columns), na_position="first").reset_index(
        drop=True
    )
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "query"):
    """Raise AssertionError with a useful diff if Spark and DuckDB disagree."""
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch\n spark: {list(got.columns)}\n duckdb: {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        # The driver's value-hash renders values through pandas dtypes, so
        # an integral column on one side vs float on the other (e.g. DuckDB
        # sum(BIGINT) -> HUGEINT -> float64 vs Spark bigint) hashes `42` vs
        # `42.0` and FAILS even when values are equal. Mirror that
        # sensitivity: dtype KINDS must agree before values are compared.
        _KIND = {"i": "int", "u": "int", "f": "float", "b": "bool"}
        gk, wk = _KIND.get(g.dtype.kind), _KIND.get(w.dtype.kind)
        # object columns (strings, lists, decimals, HUGEINT-as-object) fall
        # through to the value comparison; int-vs-float is the hash killer.
        if gk is not None and wk is not None:
            assert gk == wk, (
                f"{name}: column {c!r} dtype-kind mismatch — spark "
                f"{g.dtype} vs duckdb {w.dtype}; the driver hash would "
                f"fail this even with equal values (cast the oracle)"
            )
        if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(w):
            both_nan = g.isna() & w.isna()
            eq = (g == w) | both_nan
        else:
            eq = (g.astype(object) == w.astype(object)) | (g.isna() & w.isna())
        if not eq.all():
            bad = (~eq).idxmax()
            n_bad = int((~eq).sum())
            raise AssertionError(
                f"{name}: column {c!r} mismatch on {n_bad}/{len(got)} rows; "
                f"first at row {bad}: spark={g.iloc[bad]!r} duckdb={w.iloc[bad]!r}"
            )
