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
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t).upper() for t in rel.types]
    rows = rel.fetchall()
    con.close()
    return cols, rows, types


_DUCK_FAMILY = {
    "BIGINT": "i64",
    "INTEGER": "i32",
    "SMALLINT": "i16",
    "HUGEINT": "i128",
    "DOUBLE": "f64",
    "FLOAT": "f32",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts",
    "DATE": "date",
}

_SPARK_FAMILY = {
    "bigint": "i64",
    "int": "i32",
    "smallint": "i16",
    "double": "f64",
    "float": "f32",
    "string": "str",
    "boolean": "bool",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "date": "date",
}


def type_family(type_name: str) -> str:
    t = type_name.strip()
    if t.upper().startswith("DECIMAL") or t.lower().startswith("decimal"):
        return "dec"
    return _DUCK_FAMILY.get(t.upper()) or _SPARK_FAMILY.get(t.lower()) or t.lower()


def spark_rows(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def assert_oracle_match(df, sql: str, sf_dir: str, name: str = "?"):
    s_cols, s_rows = spark_rows(df)
    d_cols, d_rows, d_types = duck_rows(sql, sf_dir)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    s_types = dict(df.dtypes)
    for col, dt in zip(d_cols, d_types):
        sf, dfam = type_family(s_types[col]), type_family(dt)
        assert sf == dfam, (
            f"{name}: type mismatch on {col!r}: spark={s_types[col]} ({sf}) "
            f"duck={dt} ({dfam})"
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
