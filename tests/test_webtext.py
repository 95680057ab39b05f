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
