"""HTML text extraction — the first step of every web-corpus pipeline.

CommonCrawl-class pretraining data arrives as HTML; before any quality
gate or dedup pass can run, the visible text has to come out: tags
stripped, ``script``/``style``/``template``/``noscript`` payloads and
comments dropped, character entities decoded, whitespace collapsed.
Real pipelines use trafilatura/jusText-class extractors; this is the
dependency-free stdlib core of that step (``html.parser`` is a real,
tolerant HTML tokenizer — not a regex), behind the same swap-the-codec
seam discipline as the multimodal decoders.

Execution shape: parsing is inherently procedural, so this is the
measured Python path done right — ``mapInPandas`` over Arrow record
batches (column-pruned input, no per-row UDF dispatch), scan-shaped,
zero shuffle; at 100 TB it scales with corpus bytes like any scan.

The AUX query ``html_extract`` puts the extractor under the DuckDB
hash by ROUND-TRIPPING fixture text through a deterministic HTML
template (title + headings + escaped body text + links + comment +
entity-bearing tail): the oracle rebuilds the expected extraction
closed-form in SQL, so entity decoding (&amp;/&lt;/&gt; — the body is
``html.escape``d and must come back verbatim), skip-element handling,
tag stripping, link counting, and whitespace collapsing are all
value-hash-checked.

The reference engine tokenizes plain text lines only
(/root/reference/test/user_tasks.cc:15-20); HTML never enters it —
north-star capability.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..catalog import table

#: elements whose text payload is never corpus text
SKIP_ELEMENTS = frozenset({"script", "style", "template", "noscript"})

#: elements that BREAK text flow (the browser block model): text on
#: either side of these never fuses into one word.  Inline elements
#: (a/b/i/em/span/code/...) are transparent — "intra<b>word</b>" stays
#: one word, exactly as rendered.
BLOCK_ELEMENTS = frozenset(
    {
        "p", "div", "br", "hr", "h1", "h2", "h3", "h4", "h5", "h6",
        "li", "ul", "ol", "dl", "dt", "dd", "tr", "td", "th", "table",
        "thead", "tbody", "caption", "section", "article", "header",
        "footer", "nav", "aside", "form", "fieldset", "figure",
        "figcaption", "blockquote", "pre", "title", "head", "body",
        "html", "main",
    }
)


class _TextExtractor(HTMLParser):
    """Tolerant visible-text extractor: stdlib tokenizer, entity
    decoding via ``convert_charrefs``, skip-element depth tracking
    (nested/unclosed skips handled; a self-closing ``<script/>`` never
    unbalances the depth), block-boundary separation, link counting."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self._skip = 0
        self._title = 0
        self.n_links = 0

    def _break(self, tag: str) -> None:
        if tag in BLOCK_ELEMENTS and not self._skip:
            self.parts.append("\n")

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_ELEMENTS:
            # a dropped payload must never fuse the words around it
            self._break("p")
            self._skip += 1
            return
        if tag == "title":
            self._title += 1
        if tag == "a":
            self.n_links += 1
        self._break(tag)

    def handle_startendtag(self, tag, attrs):
        # <script/> opens nothing: depth must not leak
        if tag == "a":
            self.n_links += 1
        self._break("p" if tag in SKIP_ELEMENTS else tag)

    def handle_endtag(self, tag):
        if tag in SKIP_ELEMENTS:
            if self._skip:
                self._skip -= 1
            self._break("p")
            return
        if tag == "title" and self._title:
            self._title -= 1
        self._break(tag)

    def handle_comment(self, data):
        # dropped like skip payloads — and like them, never a word fuser
        self._break("p")

    def handle_data(self, data):
        if not self._skip:
            self.parts.append(data)
            if self._title:
                self.title_parts.append(data)


def extract_html_text(html: str) -> dict:
    """Visible text + title + link count from one HTML string.

    Returns ``{"text", "title", "n_links"}`` with entity references
    decoded and whitespace collapsed to single spaces."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    return {
        "text": " ".join("".join(p.parts).split()),
        "title": " ".join("".join(p.title_parts).split()),
        "n_links": p.n_links,
    }


HTML_EXTRACT_SCHEMA = (
    "doc_id long, title string, text string, n_links int, n_chars long"
)


def html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap each fixture document in the deterministic HTML template,
    extract it back, and emit the recovered fields (see module
    docstring for what the round-trip pins)."""
    import html as _html

    docs = table(spark, sf_dir, "documents", spread=True).select("doc_id", "text")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                body = _html.escape(text or "", quote=False)
                links = "".join(
                    f'<a href="u{i}">L{i}</a>\n'
                    for i in range(1 + d % 3)
                )
                doc = (
                    f"<html><head><title>Doc {d} &amp; Co</title>\n"
                    f"<style>p{{color:red}}</style></head>\n"
                    f"<body><h1>Head {d}</h1>\n"
                    f"<script>ignore({d});</script>\n"
                    f"<p>{body}</p>\n{links}"
                    f"<!-- hidden {d} -->\n"
                    f"<p>Tail &lt;{d}&gt;</p></body></html>"
                )
                out = extract_html_text(doc)
                rows.append((
                    d, out["title"], out["text"], out["n_links"],
                    len(out["text"]),
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "title", "text", "n_links", "n_chars"],
            )

    return docs.mapInPandas(work, HTML_EXTRACT_SCHEMA)


# Closed-form mirror of the template round-trip: the extractor must
# return the title, the in-order visible text (entities decoded back
# to the ORIGINAL fixture text), the link count, and collapsed
# whitespace.  DuckDB's regexp_replace('g') collapses exactly like
# Python's " ".join(s.split()) on this alphabet.
HTML_EXTRACT_SQL = r"""
SELECT doc_id,
       'Doc ' || doc_id || ' & Co' AS title,
       trim(regexp_replace(
         'Doc ' || doc_id || ' & Co Head ' || doc_id || ' ' || text
           || ' L0'
           || CASE WHEN doc_id % 3 >= 1 THEN ' L1' ELSE '' END
           || CASE WHEN doc_id % 3 >= 2 THEN ' L2' ELSE '' END
           || ' Tail <' || doc_id || '>',
         '\s+', ' ', 'g')) AS text,
       CAST(1 + doc_id % 3 AS INTEGER) AS n_links,
       CAST(length(trim(regexp_replace(
         'Doc ' || doc_id || ' & Co Head ' || doc_id || ' ' || text
           || ' L0'
           || CASE WHEN doc_id % 3 >= 1 THEN ' L1' ELSE '' END
           || CASE WHEN doc_id % 3 >= 2 THEN ' L2' ELSE '' END
           || ' Tail <' || doc_id || '>',
         '\s+', ' ', 'g'))) AS BIGINT) AS n_chars
FROM documents
"""


def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization under the hash comparator — the dedup key
    every web pipeline computes before anything else.  Synthesizes a
    deterministic messy URL per document (uppercase scheme/host,
    default port, tracking params, unsorted query, fragment; http/https
    and fbclid presence cycled by doc parity), canonicalizes it with
    the BUILT-IN column expression (``functions/urls.canonical_url`` —
    the whole transform stays inside whole-stage codegen, the
    deliberate JVM contrast to the procedural HTML extractor), and
    emits the canonical form + host.  The oracle rebuilds the expected
    canonical string closed-form — scheme/host lowering, port strip,
    fragment drop, tracking-param removal, bytewise param sort, and
    trailing-slash trim are each load-bearing in the hash."""
    from pyspark.sql import functions as F

    from ..functions.urls import canonical_url, url_host

    docs = table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 4 == 0, F.lit("HTTP://")).otherwise(F.lit("HTTPS://")),
        F.lit("WWW.Site"), (d % 5).cast("string"), F.lit(".COM"),
        F.when(d % 4 == 0, F.lit(":80")).otherwise(F.lit(":443")),
        F.lit("/Path"), (d % 7).cast("string"), F.lit("/"),
        F.lit("?utm_source=s&b="), (d % 3).cast("string"), F.lit("&a=1"),
        F.when(d % 2 == 0, F.lit("&fbclid=xx")).otherwise(F.lit("")),
        F.lit("#frag"), d.cast("string"),
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        canonical_url(url).alias("canon"),
        url_host(url).alias("host"),
    )


URL_CANONICALIZE_SQL = """
SELECT doc_id,
       (CASE WHEN doc_id % 4 = 0 THEN 'HTTP://' ELSE 'HTTPS://' END)
         || 'WWW.Site' || (doc_id % 5) || '.COM'
         || (CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE ':443' END)
         || '/Path' || (doc_id % 7) || '/'
         || '?utm_source=s&b=' || (doc_id % 3) || '&a=1'
         || (CASE WHEN doc_id % 2 = 0 THEN '&fbclid=xx' ELSE '' END)
         || '#frag' || doc_id AS url,
       (CASE WHEN doc_id % 4 = 0 THEN 'http' ELSE 'https' END)
         || '://www.site' || (doc_id % 5) || '.com'
         || '/Path' || (doc_id % 7)
         || '?a=1&b=' || (doc_id % 3) AS canon,
       'www.site' || (doc_id % 5) || '.com' AS host
FROM documents
"""


def host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-site corpus statistics over CANONICAL hosts — the report
    every web pipeline runs before capping domains: documents, bytes,
    and mean document length per host, plus the corpus share.  Uses
    the same synthesized messy URLs as ``url_canonicalize`` so the
    host key exercises the real normalizer; one hash-partial groupBy,
    host cardinality is tiny next to the corpus (Zipf), so the shuffle
    is negligible at any scale."""
    from pyspark.sql import functions as F

    from ..functions.urls import url_host

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 4 == 0, F.lit("HTTP://")).otherwise(F.lit("HTTPS://")),
        F.lit("WWW.Site"), (d % 5).cast("string"), F.lit(".COM"),
        F.when(d % 4 == 0, F.lit(":80")).otherwise(F.lit(":443")),
        F.lit("/Path"), (d % 7).cast("string"),
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        docs.select(url_host(url).alias("host"), "n_chars")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            (F.sum("n_chars") / F.count(F.lit(1))).alias("mean_chars"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "host", "n_docs", "total_chars", "mean_chars",
            (F.col("n_docs").cast("double") / F.col("n_total"))
            .alias("corpus_share"),
        )
    )


HOST_STATS_SQL = """
WITH h AS (
  SELECT 'www.site' || (doc_id % 5) || '.com' AS host, n_chars
  FROM documents
), t AS (
  SELECT COUNT(*) AS n_total FROM documents
)
SELECT host,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
       CAST(COUNT(*) AS DOUBLE) / (SELECT n_total FROM t)
         AS corpus_share
FROM h
GROUP BY host
"""


QUERIES: dict = {}
ORACLES: dict = {}

AUX_QUERIES = {
    "html_extract": html_extract,
    "url_canonicalize": url_canonicalize,
    "host_stats": host_stats,
}

AUX_ORACLES = {
    "html_extract": HTML_EXTRACT_SQL,
    "url_canonicalize": URL_CANONICALIZE_SQL,
    "host_stats": HOST_STATS_SQL,
}
