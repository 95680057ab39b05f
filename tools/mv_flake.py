"""Flake harness for matview_orders (the r11 red contract row).

Runs the full snapshot+CDC+incremental-MV pipeline N times against the
DuckDB oracle with EXACT ``str(Decimal)`` comparison — no float
normalization anywhere, strictly stricter than any driver hash.  Mixes
shared-session reps (the driver's shape) with fresh-session reps, and
can run under background CPU load (start pytest in another terminal).

Usage:
    python tools/mv_flake.py [--reps 100] [--fresh 5] [--sf DIR]
    python tools/mv_flake.py --probe   # demonstrate the Spark-vs-DuckDB
                                       # double->decimal(38,6) rounding
                                       # divergence the query now avoids

The --probe mode documents WHY matview_orders casts to DECIMAL(15,2)
at ingest: Spark HALF_UPs the shortest decimal repr of a double while
DuckDB scales the exact binary value, so doubles with information past
the target scale can round one micro-unit apart at DECIMAL(38,6).

Since r14 the hashed surface is integer cents (sum_cents BIGINT) — the
harness compares whatever the query/oracle pair currently projects, so
the reps now exercise the cents projection end-to-end.
"""
import argparse
import random
import sys
import time

sys.path.insert(0, "/root/repo")


def _session(tag: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName(f"mv-flake-{tag}")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _oracle_rows(sf_dir: str):
    import duckdb

    from mapreduce_grpc_spark.operators.snapshot_queries import (
        MATVIEW_ORDERS_SQL,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    cur = con.execute(MATVIEW_ORDERS_SQL)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in cur.fetchall())


def _spark_rows(spark, sf_dir: str):
    from mapreduce_grpc_spark.operators.snapshot_queries import matview_orders

    df = matview_orders(spark, sf_dir)
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(str(r[i]) for i in order) for r in [tuple(x) for x in df.collect()]
    )


def probe() -> None:
    """Measure the raw Spark-vs-DuckDB double->decimal(38,6) rounding
    divergence on adversarial near-boundary doubles."""
    import duckdb
    from pyspark.sql import functions as F

    random.seed(7)
    cands = [
        random.randint(10**7, 9 * 10**8) / 100.0 + random.random() * 1e-6
        for _ in range(200_000)
    ]
    near = [x for x in cands if abs((x * 1e6) % 1 - 0.5) < 1e-4]
    spark = _session("probe")
    df = spark.createDataFrame(
        list(enumerate(near)), "id long, v double"
    ).select("id", F.col("v").cast("decimal(38,6)").alias("d"))
    s = {r["id"]: str(r["d"]) for r in df.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(near)))
    d = {
        k: str(v)
        for k, v in con.execute(
            "SELECT id, CAST(v AS DECIMAL(38,6)) FROM t"
        ).fetchall()
    }
    diffs = [(k, near[k].hex(), s[k], d[k]) for k in s if s[k] != d[k]]
    print(
        f"near-boundary doubles: {len(near)}; "
        f"spark-vs-duckdb decimal(38,6) divergences: {len(diffs)}"
    )
    for row in diffs[:5]:
        print("  ", row)
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--fresh", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--probe", action="store_true")
    args = ap.parse_args()
    if args.probe:
        probe()
        return 0

    expected = _oracle_rows(args.sf)
    print(f"oracle: {len(expected)} rows (exact Decimal strings)")
    fails = 0
    t0 = time.time()

    spark = _session("shared")
    shared = max(0, args.reps - args.fresh)
    for i in range(shared):
        got = _spark_rows(spark, args.sf)
        ok = got == expected
        fails += not ok
        if not ok:
            print(f"rep {i} (shared): MISMATCH")
            for a, b in zip(got, expected):
                if a != b:
                    print("   spark:", a, "\n   oracle:", b)
        if (i + 1) % 10 == 0:
            print(
                f"rep {i + 1}/{shared} shared ok "
                f"({time.time() - t0:.0f}s, fails={fails})"
            )
    spark.stop()

    for i in range(args.fresh):
        spark = _session(f"fresh-{i}")
        got = _spark_rows(spark, args.sf)
        ok = got == expected
        fails += not ok
        print(f"rep fresh-{i}: {'ok' if ok else 'MISMATCH'}")
        spark.stop()

    print(
        f"DONE: {args.reps} reps ({shared} shared + {args.fresh} fresh), "
        f"fails={fails}, {time.time() - t0:.0f}s"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
