"""Tokenizer expressions reproducing the reference's word-count semantics.

The reference's shipped workload tokenizes with ``strtok(line, " ,.\\"'")``
(/root/reference/test/user_tasks.cc:15-20): split on the 5-char delimiter
class, case-sensitive, empty tokens impossible.  We reproduce that as a
regex split + empty filter, entirely with built-in (JVM-side) functions.

Every builder here has a twin that emits the equivalent DuckDB SQL fragment
so the driver's oracle check (order-insensitive value hash) can be generated
from the same single source of truth.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark regex for the reference delimiter class " ,.\"'" (one-or-more).
TOKEN_DELIM_RE = """[ ,."']+"""
# Same class escaped for embedding in a single-quoted DuckDB SQL literal
# (doubled apostrophe).  NB: this must be ONE Python literal — writing
# '[ ,."'']+' is adjacent-literal concatenation that silently drops the
# apostrophe from the class, so Spark and the oracle tokenize any text
# containing ' differently (latent with the apostrophe-free fixtures).
TOKEN_DELIM_RE_SQL = "[ ,.\"'']+"


def tokens(col: Column | str) -> Column:
    """array<string> of non-empty tokens of `col` (reference semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, TOKEN_DELIM_RE), lambda w: w != F.lit(""))


def tokens_sql(expr: str) -> str:
    """DuckDB fragment equivalent to :func:`tokens`."""
    return (
        f"list_filter(string_split_regex({expr}, '{TOKEN_DELIM_RE_SQL}'), "
        "w -> w <> '')"
    )


def token_count(col: Column | str) -> Column:
    """Number of non-empty tokens (bigint)."""
    return F.size(tokens(col)).cast("long")


def token_count_sql(expr: str) -> str:
    return f"CAST(len({tokens_sql(expr)}) AS BIGINT)"
