"""Corpus-curation operators: PII redaction and sequence packing.

Two more stages a pre-training data pipeline runs between raw text and
the trainer, both shaped for 100 TB:

 - ``redact_pii``    — regex scrub of emails / phone numbers, entirely
   row-local (codegen'd ``regexp_replace``, no shuffle, no Python).
   Patterns stay in the Java-regex ∩ RE2 common subset (no lookaround)
   so the DuckDB oracle runs the very same expressions.
 - ``pack_sequences`` — assign documents to fixed-token-budget training
   sequences by running token count.  The exact greedy packer (reset the
   budget when it overflows) is an inherently sequential scan; the
   scalable form used here bins by ``floor(cumulative_tokens / budget)``
   over a deterministic document order — one window over one sort,
   mergeable at any scale, bins overflow the budget by at most one
   document (the standard approximation real packers make per shard).

Both are AUX queries (contract at its 50 cap): DuckDB-hash-checked in
``tests/test_sampling.py::test_curation_oracle_parity`` and benched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.textfns import tokens, tokens_sql

# Java-regex ∩ RE2 subset (char classes, bounded quantifiers only)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9 ()-]{7,}[0-9]"

SEQ_TOKEN_BUDGET = 512


def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub emails then phones; report per-doc redaction counts."""
    docs = table(spark, sf_dir, "documents")
    no_email = F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
    n_emails = F.size(F.split(F.col("text"), EMAIL_RE)) - 1
    n_phones = F.size(F.split(no_email, PHONE_RE)) - 1
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_emails.cast("bigint").alias("n_emails"),
        n_phones.cast("bigint").alias("n_phones"),
    )


REDACT_PII_SQL = f"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       len(regexp_split_to_array(text, '{EMAIL_RE}')) - 1 AS n_emails,
       len(regexp_split_to_array(
             regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}')) - 1 AS n_phones
FROM documents
"""


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each doc to a training-sequence bin by running token count.

    Packing runs independently WITHIN each source shard (bins are
    ``(source, seq_id)``): one hash-partition shuffle on ``source``, then
    a per-shard sort — embarrassingly parallel, no global order, the
    shape that survives 100 TB (a single global ORDER BY window would
    funnel the corpus through one task).  Within a shard, deterministic
    doc_id order; ``seq_id = floor(tokens_before / budget)`` where
    tokens_before excludes the current doc — so a bin always accepts the
    document that crosses the budget boundary (bounded overflow) and
    every bin is dense.
    """
    docs = table(spark, sf_dir, "documents")
    with_n = docs.select(
        "doc_id", "source", F.size(tokens("text")).cast("bigint").alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return with_n.select(
        "doc_id",
        "source",
        "n_tok",
        F.floor(before / SEQ_TOKEN_BUDGET).cast("bigint").alias("seq_id"),
    )


PACK_SEQUENCES_SQL = f"""
SELECT doc_id, source, n_tok,
       CAST(floor(
         (COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0)
          * 1.0) / {SEQ_TOKEN_BUDGET}) AS BIGINT) AS seq_id
FROM (
  SELECT doc_id, source, CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tok
  FROM documents
) t
"""


QUERIES: dict = {}
ORACLES: dict = {}

AUX_QUERIES = {
    "redact_pii": redact_pii,
    "pack_sequences": pack_sequences,
}

AUX_ORACLES = {
    "redact_pii": REDACT_PII_SQL,
    "pack_sequences": PACK_SEQUENCES_SQL,
}
