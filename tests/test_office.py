"""Office/ZIP document extraction (pipeline/office.py, r18): the
hand-rolled central-directory walk vs stdlib-zipfile-built archives,
DOCX/EPUB text forms, hostile-input budgets, operator kinds."""

import io
import zipfile

import pytest


def make_zip(items, compress=zipfile.ZIP_DEFLATED):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compress) as z:
        for n, d in items:
            zi = zipfile.ZipInfo(n, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(zi, d, compress_type=compress)
    return buf.getvalue()


DOCX = make_zip([
    ("[Content_Types].xml", "<Types/>"),
    (
        "word/document.xml",
        "<w:document><w:body>"
        "<w:p><w:r><w:t>Hello </w:t></w:r>"
        '<w:r><w:t xml:space="preserve">world &amp; more</w:t></w:r>'
        "<w:tab/></w:p>"
        "<w:p><w:r><w:t>Second &#233; line</w:t></w:r></w:p>"
        "</w:body></w:document>",
    ),
])

EPUB = make_zip([
    ("mimetype", "application/epub+zip"),
    (
        "META-INF/container.xml",
        '<container><rootfiles><rootfile media-type="a" '
        'full-path="OEBPS/content.opf"/></rootfiles></container>',
    ),
    (
        "OEBPS/content.opf",
        '<package><manifest><item id="c2" href="ch2.xhtml"/>'
        '<item id="c1" href="ch1.xhtml"/></manifest>'
        '<spine><itemref idref="c1"/><itemref idref="c2"/></spine>'
        "</package>",
    ),
    (
        "OEBPS/ch1.xhtml",
        "<html><body><h1>Title One</h1>"
        "<p>First <i>chapter</i> text.</p></body></html>",
    ),
    ("OEBPS/ch2.xhtml", "<html><body><p>Second&#x20;chapter.</p></body></html>"),
])


class TestZipWalk:
    def test_members_roundtrip_both_methods(self):
        from lotad_spark.pipeline.office import zip_members

        for method in (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED):
            z = make_zip(
                [("a/b.txt", "hello"), ("c.bin", "\x00\x01\x02")],
                method,
            )
            got = zip_members(z)
            assert got == {
                "a/b.txt": b"hello", "c.bin": b"\x00\x01\x02"
            }

    def test_non_zip_and_truncation(self):
        from lotad_spark.pipeline.office import zip_members

        assert zip_members(b"") is None
        assert zip_members(b"PK\x03\x04 but no directory") is None
        z = make_zip([("a.txt", "x" * 500)])
        for k in range(0, len(z), 17):
            zip_members(z[:k])  # never raises
        # tearing the tail loses the EOCD: honest None
        assert zip_members(z[: len(z) // 2]) is None

    def test_bomb_member_is_skipped_not_inflated(self):
        import lotad_spark.pipeline.office as office

        z = make_zip([
            ("bomb.bin", b"\x00" * (4 << 20)),
            ("ok.txt", b"fine"),
        ])
        orig = office._MEMBER_BUDGET
        office._MEMBER_BUDGET = 1 << 20
        try:
            got = office.zip_members(z)
        finally:
            office._MEMBER_BUDGET = orig
        # the over-budget member is absent, the archive still reads
        assert got == {"ok.txt": b"fine"}

    def test_flip_fuzz_never_raises(self):
        import numpy as np

        from lotad_spark.pipeline.office import (
            docx_text,
            epub_text,
            zip_members,
        )

        rng = np.random.RandomState(23)
        for p in (DOCX, EPUB):
            for _ in range(60):
                b = bytearray(p)
                b[rng.randint(0, len(b))] = rng.randint(0, 256)
                raw = bytes(b)
                zip_members(raw); docx_text(raw); epub_text(raw)


class TestDocxEpubText:
    def test_docx_runs_tabs_entities(self):
        from lotad_spark.pipeline.office import docx_text

        assert docx_text(DOCX) == (
            "Hello world & more\t\nSecond é line"
        )

    def test_epub_spine_order_and_tag_strip(self):
        from lotad_spark.pipeline.office import epub_text

        # manifest lists c2 first, spine orders c1 then c2
        assert epub_text(EPUB) == (
            "Title One\nFirst chapter text.\nSecond chapter."
        )

    def test_missing_parts_are_none(self):
        from lotad_spark.pipeline.office import docx_text, epub_text

        plain = make_zip([("readme.txt", "hi")])
        assert docx_text(plain) is None
        assert epub_text(plain) is None
        # epub with a dangling spine chapter: chapter skipped
        broken = make_zip([
            ("META-INF/container.xml",
             '<container><rootfile full-path="p.opf"/></container>'),
            ("p.opf",
             '<package><manifest><item id="c" href="gone.xhtml"/>'
             '</manifest><spine><itemref idref="c"/></spine></package>'),
        ])
        assert epub_text(broken) == ""


class TestOfficeOperator:
    def test_kinds_and_plan(self, spark):
        from lotad_spark.pipeline.office import office_extract

        plain = make_zip([("a.txt", "x"), ("b.txt", "y")])
        df = spark.createDataFrame(
            [
                (1, bytearray(DOCX)),
                (2, bytearray(EPUB)),
                (3, bytearray(plain)),
                (4, bytearray(b"not a zip")),
                (5, None),
            ],
            "doc_id bigint, content binary",
        )
        got = {r.doc_id: r for r in office_extract(df).collect()}
        assert got[1].kind == "docx" and "Hello world" in got[1].text
        assert got[1].n_members == 2
        assert got[2].kind == "epub" and got[2].text.startswith("Title")
        assert got[3].kind == "zip" and got[3].text is None
        assert got[3].n_members == 2
        assert got[4].kind == "none" and got[4].n_members is None
        assert got[5].kind == "null"
        plan = (
            office_extract(df)._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert plan.count("MapInPandas") == 1
