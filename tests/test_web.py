"""HTML→text extraction and link extraction (pipeline/web.py) — the
chain is pinned three ways: an independent Python `re` replay of the
same module constants (a third regex engine agreeing with Spark and
the DuckDB oracle), hand-asserted properties on a crafted document,
and NULL/edge behavior."""

import re

import pytest

from lotad_spark.pipeline.web import (
    HTML_ENTITY_STEPS,
    HTML_SPACE_STEPS,
    HTML_TEXT_STEPS,
    extract_links,
    html_to_text,
)

CRAFTED = (
    '<html><head><title>T</title><style>p { color: red; }</style>'
    '<script type="text/javascript">var a = "</div>"; if (1<2) {}'
    "</script></head>"
    "<body><h1>Head</h1><p>one &amp;amp; two&nbsp;&lt;tag&gt;</p>"
    '<!-- secret --><a href="https://x.com/a?b=1&amp;c=2">link text</a>'
    "<a href='/rel/path'>rel</a>"
    "<ul><li>i1</li><li>i2</li></ul></body></html>"
)


def _py_replay(html: str) -> str:
    """Independent executor of the published chain (Python re)."""
    out = html
    for pat, rep in HTML_TEXT_STEPS:
        out = re.sub(pat, rep, out)
    for lit, rep in HTML_ENTITY_STEPS:
        out = out.replace(lit, rep)
    for pat, rep in HTML_SPACE_STEPS:
        out = re.sub(pat, rep, out)
    return out


class TestHtmlToText:
    def test_crafted_document_properties(self, spark):
        df = spark.createDataFrame(
            [(1, CRAFTED), (2, None), (3, "plain, no tags")],
            "doc_id bigint, html string",
        )
        got = {r.doc_id: r.text for r in html_to_text(df).collect()}
        t = got[1]
        # invisible containers vanish WITH content — including the
        # '</div>' and '<' inside the script a naive stripper leaks
        assert "color" not in t and "var a" not in t
        assert "secret" not in t
        # entities decode single-pass: &amp;amp; is the LITERAL &amp;
        assert "one &amp; two <tag>" in t
        # block boundaries are newlines; inline anchors are not
        assert "Head" in t.split("\n")
        assert "i1" in t.split("\n") and "i2" in t.split("\n")
        assert "link text" in t and "rel" in t
        # title text is kept (title is not a block tag; documented)
        assert "T" in t.split("\n")[0]
        # NULL stays NULL (auditable), plain text passes through
        assert got[2] is None
        assert got[3] == "plain, no tags"

    def test_spark_matches_independent_python_replay(self, spark):
        cases = [
            (1, CRAFTED),
            (2, "a < b & c > d"),  # bare specials survive untouched
            (3, "<p>x</p><p></p><p>y</p>"),  # empty blocks collapse
            (4, "  lead <b>bold</b> trail  "),
            (5, "<SCRIPT>UPPER()</SCRIPT>ok<BR>line"),  # case-folding
            (6, "<div attr=\"k>v\">odd</div> tail"),  # documented limit
        ]
        df = spark.createDataFrame(cases, "doc_id bigint, html string")
        got = {r.doc_id: r.text for r in html_to_text(df).collect()}
        for doc_id, html in cases:
            assert got[doc_id] == _py_replay(html), doc_id

    def test_extract_links(self, spark):
        df = spark.createDataFrame(
            [
                (1, CRAFTED),
                (2, "no links here"),
                (3, None),
                # unquoted href, src, and the apostrophe-in-a-double-
                # quoted-URL case the mixed-quote class used to truncate
                (4, "<a href=/next>n</a><img src=\"/img/it's.png\">"),
            ],
            "doc_id bigint, html string",
        )
        rows = extract_links(df).collect()
        got = sorted((r.doc_id, r.link) for r in rows)
        assert got == [
            (1, "/rel/path"),
            (1, "https://x.com/a?b=1&amp;c=2"),  # raw href, pre-decode
            (4, "/img/it's.png"),
            (4, "/next"),
        ]
        # links feed the URL ladder
        from lotad_spark.pipeline.urls import canonicalize_urls

        canon = canonicalize_urls(
            extract_links(df), "link"
        ).collect()
        assert any(
            c.canonical_url and "x.com" in c.canonical_url for c in canon
        )


class TestWebExtractCli:
    def test_warc_mode_with_links(self, spark, tmp_path):
        from click.testing import CliRunner

        from lotad_spark.cli import cli
        from lotad_spark.sources.warc import write_warc_file

        import os

        d = str(tmp_path / "crawl")
        os.makedirs(d)
        write_warc_file(
            [
                (
                    "https://x.com/a",
                    "text/html",
                    b'<p>hello</p><a href="/next">n</a>',
                )
            ],
            os.path.join(d, "c.warc.gz"),
            gzip_members=True,
        )
        out = str(tmp_path / "out")
        r = CliRunner().invoke(
            cli,
            ["web-extract", "--warc", d, "--output", out, "--links"],
            catch_exceptions=False,
        )
        assert r.exit_code == 0, r.output
        text_rows = spark.read.parquet(f"{out}/text").collect()
        assert [(t.doc_id, t.text) for t in text_rows] == [
            ("https://x.com/a", "hello\nn")
        ]
        link_rows = spark.read.parquet(f"{out}/links").collect()
        assert [(l.doc_id, l.link) for l in link_rows] == [
            ("https://x.com/a", "/next")
        ]

    def test_mode_validation(self):
        from click.testing import CliRunner

        from lotad_spark.cli import cli

        r = CliRunner().invoke(cli, ["web-extract", "--output", "/tmp/x"])
        assert r.exit_code != 0 and "exactly one" in r.output
