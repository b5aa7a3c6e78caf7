"""Local replica of the driver's DuckDB-oracle comparison.

Stricter than the driver: exact cell-by-cell equality after sorting
columns by name and rows by value (the driver hashes order-insensitive
values, so exact match here implies a hash match there). Dtype families
must agree (int vs int, float vs float, ...) to protect the driver's
schema check.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from dgraph_etl_spark.catalog import BASE_TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in BASE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con


def _canon_cell(v):
    import numpy as np

    if isinstance(v, np.ndarray):  # duckdb .df() / arrow toPandas lists
        v = v.tolist()
    elif isinstance(v, np.generic):
        v = v.item()
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_canon_cell(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _canon_cell(x)) for k, x in v.items())))
    if isinstance(v, str):
        # tag strings distinctly from non-string scalars: a measure
        # drifting to a stringified value ("1.5" vs Decimal 1.5, both
        # in object columns) must NOT compare equal -- while numeric
        # cross-type equality (int 5 vs Decimal 5 from a DuckDB SUM)
        # stays intentional under the shared "v" tag
        return ("s", v)
    if isinstance(v, (bytes, bytearray)):
        # one canonical form: Spark toPandas() hands BinaryType back as
        # bytearray while DuckDB yields bytes -- identical values must
        # not mismatch on the container type
        return ("bytes", bytes(v).hex())
    return ("v", str(v))


def _dtype_family(dtype) -> str:
    # lowercase ONCE: pandas nullable/extension dtypes stringify in
    # mixed case (Int64, Float64, boolean) and previously fell through
    # to "obj", false-flagging a dtype-family mismatch against the
    # other lane's lowercase numpy dtype
    s = str(dtype).lower()
    if "int" in s:
        return "int"
    if "float" in s or "double" in s:
        return "float"
    if "bool" in s:
        return "bool"
    if "datetime" in s or "timestamp" in s:
        return "ts"
    if "decimal" in s:
        return "decimal"
    return "obj"


def _normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple], dict[str, str]]:
    cols = sorted(df.columns)
    fams = {c: _dtype_family(df[c].dtype) for c in cols}
    rows = []
    for rec in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(_canon_cell(v) for v in rec))
    rows.sort()
    return cols, rows, fams


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions; empty list == match."""
    problems: list[str] = []
    s_cols, s_rows, s_fams = _normalize(spark_pdf)
    o_cols, o_rows, o_fams = _normalize(oracle_pdf)
    if s_cols != o_cols:
        problems.append(f"column names differ: spark={s_cols} oracle={o_cols}")
        return problems
    for c in s_cols:
        if s_fams[c] != o_fams[c]:
            problems.append(
                f"dtype family differs on {c}: spark={spark_pdf[c].dtype} "
                f"oracle={oracle_pdf[c].dtype}"
            )
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
        return problems
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if a != b:
            problems.append(f"first differing sorted row #{i}: spark={a} oracle={b}")
            break
    return problems


def check_query(spark, sf_dir: str, name: str, fn, oracle: str) -> list[str]:
    sdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        # name in the error: a batch precert over failing oracles needs
        # attribution, and the finally closes the connection a broken
        # oracle would otherwise leak (one per failure, with all its
        # registered view state, across a whole precert sweep)
        try:
            odf = con.execute(oracle).df()
        except Exception as ex:
            raise RuntimeError(f"[{name}] oracle failed: {ex}") from ex
    finally:
        con.close()
    return compare_frames(sdf, odf)


def formatted_plan(df) -> str:
    """The JVM formatted-explain incantation, shared by every test
    that asserts on a hand-built DataFrame's physical plan (plan_of
    covers registry queries; this covers everything else)."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
