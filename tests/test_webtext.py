"""HTML text extraction (`operators/webtext.py`): extractor unit edges
+ the round-trip DuckDB-hash AUX query.
"""

from __future__ import annotations

import pytest

from mapreduce_grpc_spark.operators.webtext import extract_html_text


def test_basic_extraction():
    out = extract_html_text(
        "<html><head><title>T &amp; U</title><style>p{}</style></head>"
        "<body><h1>H</h1><script>var x='<p>no</p>';</script>"
        "<p>hello <b>bold</b> world</p>"
        '<a href="x">one</a> <a href="y">two</a></body></html>'
    )
    assert out["title"] == "T & U"
    assert out["text"] == "T & U H hello bold world one two"
    assert out["n_links"] == 2
    # inline elements are transparent (browser block model): no space
    # is invented inside a word, and adjacent anchors fuse as rendered
    assert extract_html_text("<p>intra<b>word</b></p>")["text"] == "intraword"
    assert (
        extract_html_text('<a href="x">one</a><a href="y">two</a>')["text"]
        == "onetwo"
    )
    # block elements break flow even with no whitespace in the source
    assert extract_html_text("<p>a</p><p>b</p>")["text"] == "a b"
    assert extract_html_text("x<br/>y")["text"] == "x y"


def test_entities_and_charrefs_decode():
    out = extract_html_text("<p>a &lt;b&gt; &amp; &#65;&#x42; c</p>")
    assert out["text"] == "a <b> & AB c"


def test_skip_elements_nested_and_selfclosing():
    out = extract_html_text(
        "<body><script>a<template>b</template>c</script>visible"
        "<script/>still<style>x</style>yes<noscript>no</noscript>"
        "</body>"
    )
    # everything inside script (incl. the nested template) is dropped;
    # the self-closing script must not swallow the rest of the doc
    assert out["text"] == "visible still yes"


def test_comments_and_malformed_tolerated():
    out = extract_html_text(
        "<p>keep<!-- drop <p>this</p> -->going<p>unclosed"
        "<DIV>UPPER</DIV></p> trailing"
    )
    assert out["text"] == "keep going unclosed UPPER trailing"
    # stray end tags / empty input never raise
    assert extract_html_text("</div></script>text")["text"] == "text"
    assert extract_html_text("")["text"] == ""
    assert extract_html_text(None)["text"] == ""


def test_whitespace_collapse():
    out = extract_html_text("<p>  a\n\n\tb </p>\n<p>c</p>")
    assert out["text"] == "a b c"


ADVERSARIAL_URLS = [
    "HTTPS://Site.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
    "https://site.com/a/b?a=1&b=2",
    "http://HOST.org:80///",
    "http://host.org",
    "https://h.io/Path?fbclid=abc&gclid=x&msclkid=y&utm_campaign=z",
    "https://h.io/Path",
    "ftp://Weird.Host:443/file",          # non-http: port kept
    "https://h.io:8443/x?z=1&y=2&z=1",    # non-default port kept, dup keys
    "https://h.io/x?",                     # empty query
    "https://h.io/x#only-frag",
]


def test_canonical_url_rules(spark):
    from mapreduce_grpc_spark.functions.urls import canonical_url, url_host

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(ADVERSARIAL_URLS)], "i int, url string"
    )
    got = {
        r.i: (r.c, r.h)
        for r in df.select(
            "i",
            canonical_url("url").alias("c"),
            url_host("url").alias("h"),
        ).collect()
    }
    assert got[0] == ("https://site.com/a/b?a=1&b=2", "site.com")
    assert got[1] == ("https://site.com/a/b?a=1&b=2", "site.com")
    # the two spellings of the same page now dedup exactly
    assert got[0][0] == got[1][0]
    assert got[2] == ("http://host.org/", "host.org")
    assert got[3] == ("http://host.org/", "host.org")
    assert got[4] == ("https://h.io/Path", "h.io")      # case preserved
    assert got[5] == ("https://h.io/Path", "h.io")
    # canonical form keeps a NON-default port (it changes the
    # endpoint); the host grouping key strips any port
    assert got[6] == ("ftp://weird.host:443/file", "weird.host")
    assert got[7] == ("https://h.io:8443/x?y=2&z=1&z=1", "h.io")
    assert got[8] == ("https://h.io/x", "h.io")
    assert got[9] == ("https://h.io/x", "h.io")


def test_canonical_url_sql_twin_equivalence(spark, tmp_path):
    """The DuckDB fragment builder and the Spark column expression are
    generated from the same rules — pin them equal on the adversarial
    set (the tokens/tokens_sql single-source-of-truth discipline)."""
    import duckdb

    from mapreduce_grpc_spark.functions.urls import (
        canonical_url,
        canonical_url_sql,
        url_host,
        url_host_sql,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE u (i INT, url VARCHAR)")
    con.executemany(
        "INSERT INTO u VALUES (?, ?)", list(enumerate(ADVERSARIAL_URLS))
    )
    duck = {
        i: (c, h)
        for i, c, h in con.execute(
            f"SELECT i, {canonical_url_sql('url')}, "
            f"{url_host_sql('url')} FROM u"
        ).fetchall()
    }
    con.close()
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(ADVERSARIAL_URLS)], "i int, url string"
    )
    sp = {
        r.i: (r.c, r.h)
        for r in df.select(
            "i", canonical_url("url").alias("c"),
            url_host("url").alias("h"),
        ).collect()
    }
    assert sp == duck


def test_url_canonicalize_oracle_parity(spark, sf_dir):
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["url_canonicalize"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["url_canonicalize"],
        sf_dir,
        "url_canonicalize",
    )
    # the plan stays entirely JVM-side: no Python eval node anywhere
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan


def test_host_stats_oracle_parity(spark, sf_dir):
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["host_stats"](spark, sf_dir)
    assert_oracle_match(
        df, registry.AUX_ORACLES["host_stats"], sf_dir, "host_stats"
    )
    rows = df.collect()
    assert len(rows) == 5  # doc_id % 5 host cycle
    assert abs(sum(r.corpus_share for r in rows) - 1.0) < 1e-9


def test_html_extract_oracle_parity(spark, sf_dir):
    """The AUX query's DuckDB hash: fixture text wrapped in the HTML
    template must extract back verbatim — entity decode, skip
    elements, link counts, whitespace collapse all under the hash."""
    from mapreduce_grpc_spark import registry
    from tests.oracle import assert_oracle_match

    df = registry.AUX_QUERIES["html_extract"](spark, sf_dir)
    assert_oracle_match(
        df,
        registry.AUX_ORACLES["html_extract"],
        sf_dir,
        "html_extract",
    )
    # the original text is embedded in every extraction (round-trip
    # through html.escape -> parser entity decode)
    from mapreduce_grpc_spark.catalog import table

    joined = (
        df.alias("e")
        .join(table(spark, sf_dir, "documents").alias("d"), "doc_id")
        .selectExpr(
            "e.text AS got",
            r"trim(regexp_replace(d.text, '\\s+', ' ')) AS want",
        )
        .collect()
    )
    assert joined and all(r.want in r.got for r in joined if r.want)
