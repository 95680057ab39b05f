"""Deterministic hash expressions shared by Spark queries and DuckDB oracles.

Three families, all built-in-function-only (no Python UDFs — the hot path
stays inside WholeStageCodegen):

1. ``hash131`` — the reference's polynomial bucket hash
   ``h = (h*131 + byte) % R`` (/root/reference/src/mr_tasks.h:24-32).  We
   apply the modulus per step; since mod-R is a ring homomorphism this gives
   the same bucket as the reference for any R, without 64-bit overflow.

2. ``md5_long`` — a 60-bit integer digest derived from md5 (first 15 hex
   chars).  md5 is bit-identical across Spark and DuckDB, which makes every
   hash-derived operator (MinHash, SimHash, fingerprints) oracle-checkable.

3. ``affine_hashes`` — the classic universal family h_i(x) = (a_i*x + b_i)
   mod p used for MinHash signatures; coefficients come from a fixed seeded
   PRNG so Spark and the generated SQL agree literally.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# Large prime for the affine family / rolling hashes.  Small enough that
# (p-1)*131 + 255 and a*(x%p)+b stay well inside int64.
MOD_P = 1_000_000_007


def hash131(col: Column | str, n_buckets: int) -> Column:
    """Reference bucket hash: fold (h*131 + codepoint) % n_buckets over chars.

    Equivalent to /root/reference/src/mr_tasks.h:24-32 for ASCII keys (the
    reference folds bytes; we fold codepoints — identical on ASCII, which is
    all the reference's comma-separated KV format supports anyway).
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("int"),
        lambda acc, ch: (acc * F.lit(131) + F.coalesce(F.ascii(ch), F.lit(0)))
        % F.lit(n_buckets),
    )


def hash131_sql(expr: str, n_buckets: int) -> str:
    """DuckDB fragment equivalent to :func:`hash131`."""
    return (
        f"CAST(list_reduce(list_prepend(0, list_transform(string_split({expr}, ''), "
        f"c -> coalesce(ascii(c), 0))), (a, b) -> (a*131 + b) % {n_buckets}) AS INTEGER)"
    )


def md5_long(col: Column | str) -> Column:
    """60-bit non-negative integer digest of a string (md5-derived)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def affine_hashes(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """n fixed (a, b) pairs for h_i(x) = (a*(x%p) + b) % p."""
    rng = random.Random(seed)
    return [(rng.randrange(1, MOD_P), rng.randrange(0, MOD_P)) for _ in range(n)]


def affine_apply(x: Column, a: int, b: int) -> Column:
    """Spark column for (a*(x%p)+b)%p ; x must be a non-negative long."""
    return (F.lit(a) * (x % F.lit(MOD_P)) + F.lit(b)) % F.lit(MOD_P)


def affine_apply_sql(expr: str, a: int, b: int) -> str:
    return f"(({a} * ({expr} % {MOD_P}) + {b}) % {MOD_P})"


def rolling_hash(col: Column | str) -> Column:
    """Order-sensitive document fingerprint: fold (h*131+cp) % MOD_P."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(131) + F.coalesce(F.ascii(ch), F.lit(0)))
        % F.lit(MOD_P),
    )


def rolling_hash_sql(expr: str) -> str:
    return (
        f"CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(coalesce(ascii(c), 0) AS BIGINT))), "
        f"(a, b) -> (a*131 + b) % {MOD_P}) AS BIGINT)"
    )
