"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same fixture dir and
compares row multisets order-insensitively.  Stricter-or-equal to the
driver's hash check: values are compared after a canonical normalization
(Decimal -> float repr, timestamps -> isoformat, None -> sentinel), columns
sorted by name.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from mapreduce_grpc_spark.catalog import TABLES


def _norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return repr(v)


def duck_rows(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def spark_rows(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def assert_oracle_match(df, sql: str, sf_dir: str, name: str = "?"):
    s_cols, s_rows = spark_rows(df)
    d_cols, d_rows = duck_rows(sql, sf_dir)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_can = canonical(s_cols, s_rows)
    d_can = canonical(d_cols, d_rows)
    if s_can != d_can:
        diffs = [
            (a, b) for a, b in zip(s_can, d_can) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
