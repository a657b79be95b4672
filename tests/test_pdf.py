"""PDF text-extraction tests (pipeline/pdf.py).

All documents here are hand-assembled from the public ISO 32000
layout, independent of the entry-module fixture writer — object
syntax, stream framing, filters, page trees, escapes, and the text
operators are each pinned on their own."""

import zlib

import pytest

from lotad_spark.pipeline.pdf import extract_pdf_text, pdf_text_pages


def build_pdf(objects: dict, root: int = 1, header: bytes = b"%PDF-1.4\n") -> bytes:
    """Assemble numbered objects (bytes bodies; (dict, data) tuples
    become streams) with a trailer pointing at `root`."""
    parts = [header]
    for num in sorted(objects):
        body = objects[num]
        if isinstance(body, tuple):
            d, data = body
            parts.append(
                f"{num} 0 obj\n".encode() + d + b"\nstream\n" + data
                + b"\nendstream\nendobj\n"
            )
        else:
            parts.append(f"{num} 0 obj\n".encode() + body + b"\nendobj\n")
    parts.append(
        b"trailer\n<< /Size " + str(max(objects) + 1).encode()
        + b" /Root " + str(root).encode() + b" 0 R >>\n%%EOF\n"
    )
    return b"".join(parts)


def content_obj(content: bytes) -> tuple:
    return (b"<< /Length " + str(len(content)).encode() + b" >>", content)


BASE = {
    1: b"<< /Type /Catalog /Pages 2 0 R >>",
    2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
    3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
}


def one_pager(content: bytes) -> bytes:
    return build_pdf({**BASE, 4: content_obj(content)})


class TestTextOperators:
    def test_tj_and_positioning(self):
        assert pdf_text_pages(
            one_pager(b"BT 72 720 Td (Hello) Tj ET")
        ) == ("Hello", 1)

    def test_tstar_quote_dquote_newlines(self):
        txt, n = pdf_text_pages(
            one_pager(
                b"BT (a) Tj T* (b) Tj (c) ' 1 2 (d) \" ET"
            )
        )
        assert (txt, n) == ("a\nb\nc\nd", 1)

    def test_td_newline_only_on_vertical_move(self):
        txt, _ = pdf_text_pages(
            one_pager(b"BT (a) Tj 10 0 Td (b) Tj 10 -14 Td (c) Tj ET")
        )
        assert txt == "ab\nc"

    def test_tj_array_concatenates_across_kerns(self):
        txt, _ = pdf_text_pages(
            one_pager(b"BT [(He) -20 (llo) 5 ( wo) (rld)] TJ ET")
        )
        assert txt == "Hello world"

    def test_inline_image_skipped(self):
        txt, _ = pdf_text_pages(
            one_pager(
                b"BT (a) Tj BI /W 1 /H 1 ID \xff\x00( Tj EI (b) Tj ET"
            )
        )
        assert txt == "ab"


class TestStrings:
    def test_escapes(self):
        content = rb"BT (oct \101\102, tab \t, nl \n, paren \( \), bs \\) Tj ET"
        txt, _ = pdf_text_pages(one_pager(content))
        assert txt == "oct AB, tab \t, nl \n, paren ( ), bs \\"

    def test_nested_unescaped_parens(self):
        txt, _ = pdf_text_pages(one_pager(b"BT (a (nested) b) Tj ET"))
        assert txt == "a (nested) b"

    def test_line_continuation_and_eol_normalization(self):
        # backslash-EOL disappears; a raw CR / CRLF inside the string
        # reads as LF per the spec
        content = b"BT (one\\\ntwo\rthree\r\nfour) Tj ET"
        txt, _ = pdf_text_pages(one_pager(content))
        assert txt == "onetwo\nthree\nfour"

    def test_hex_string_whitespace_and_odd_digit(self):
        # "Hi!" = 48 69 21; odd count pads a trailing zero: 486921 5 -> 'P'
        txt, _ = pdf_text_pages(one_pager(b"BT <48 69\n21 5> Tj ET"))
        assert txt == "Hi!P"

    def test_utf16be_bom_string(self):
        s = "déjà – 漢字"
        hexed = (b"\xfe\xff" + s.encode("utf-16-be")).hex().encode()
        txt, _ = pdf_text_pages(one_pager(b"BT <" + hexed + b"> Tj ET"))
        assert txt == s


class TestStructure:
    def test_multi_page_and_nested_pages_tree(self):
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 3 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            4: content_obj(b"BT (page one) Tj ET"),
            # nested subtree holding pages 2 and 3
            6: b"<< /Type /Pages /Parent 2 0 R /Kids [7 0 R 9 0 R] /Count 2 >>",
            7: b"<< /Type /Page /Parent 6 0 R /Contents 8 0 R >>",
            8: content_obj(b"BT (page two) Tj ET"),
            9: b"<< /Type /Page /Parent 6 0 R /Contents 10 0 R >>",
            10: content_obj(b"BT (page three) Tj ET"),
        }
        assert pdf_text_pages(build_pdf(objs)) == (
            "page one\npage two\npage three",
            3,
        )

    def test_contents_array_concatenates(self):
        objs = {
            **BASE,
            3: b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>",
            4: content_obj(b"BT (first) Tj"),
            5: content_obj(b"(, second) Tj ET"),
        }
        assert pdf_text_pages(build_pdf(objs)) == ("first, second", 1)

    def test_broken_xref_is_ignored(self):
        # the object scan must not depend on xref offsets being right
        payload = one_pager(b"BT (ok) Tj ET")
        payload += b"xref\n0 5\n" + b"9999999999 00000 n \n" * 5
        payload += b"startxref\n7\n%%EOF\n"
        assert pdf_text_pages(payload) == ("ok", 1)

    def test_catalog_found_without_root_entry(self):
        objs = {**BASE, 4: content_obj(b"BT (scan) Tj ET")}
        payload = build_pdf(objs)
        payload = payload.replace(b"/Root 1 0 R ", b"")  # strip trailer key
        assert pdf_text_pages(payload) == ("scan", 1)

    def test_incremental_update_later_definition_wins(self):
        # incremental saves append redefined objects at the tail
        base = build_pdf({**BASE, 4: content_obj(b"BT (old text) Tj ET")})
        new = content_obj(b"BT (new text) Tj ET")
        update = (
            b"4 0 obj\n" + new[0] + b"\nstream\n" + new[1]
            + b"\nendstream\nendobj\n"
            + b"trailer\n<< /Size 6 /Root 1 0 R /Prev 9 >>\n%%EOF\n"
        )
        assert pdf_text_pages(base + update) == ("new text", 1)

    def test_object_stream_expansion(self):
        inner = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
            (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
        ]
        offs, bodies, pos = [], [], 0
        for _n, b in inner:
            offs.append(pos)
            bodies.append(b)
            pos += len(b) + 1
        head = " ".join(
            f"{n} {o}" for (n, _), o in zip(inner, offs)
        ).encode() + b" "
        raw = zlib.compress(head + b" ".join(bodies))
        objs = {
            4: content_obj(b"BT (from objstm) Tj ET"),
            6: (
                b"<< /Type /ObjStm /N 3 /First " + str(len(head)).encode()
                + b" /Length " + str(len(raw)).encode()
                + b" /Filter /FlateDecode >>",
                raw,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) == ("from objstm", 1)


class TestFilters:
    def test_flate(self):
        c = b"BT (deflated text) Tj ET"
        raw = zlib.compress(c)
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(raw)).encode()
                + b" /Filter /FlateDecode >>",
                raw,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) == ("deflated text", 1)

    def test_flate_in_filter_array(self):
        c = b"BT (array filter) Tj ET"
        raw = zlib.compress(c)
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(raw)).encode()
                + b" /Filter [/FlateDecode] >>",
                raw,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) == ("array filter", 1)

    def test_asciihex(self):
        c = b"BT (hex) Tj ET"
        raw = c.hex().encode() + b">"
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(raw)).encode()
                + b" /Filter /ASCIIHexDecode >>",
                raw,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) == ("hex", 1)

    def test_ascii85(self):
        import base64

        c = b"BT (eighty five) Tj ET"
        raw = base64.a85encode(c) + b"~>"
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(raw)).encode()
                + b" /Filter /ASCII85Decode >>",
                raw,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) == ("eighty five", 1)

    def test_wrong_length_falls_back_to_endstream_scan(self):
        c = b"BT (bad length) Tj ET"
        objs = {**BASE, 4: (b"<< /Length 99999 >>", c)}
        assert pdf_text_pages(build_pdf(objs)) == ("bad length", 1)

    def test_indirect_length(self):
        c = b"BT (indirect len) Tj ET"
        objs = {
            **BASE,
            4: (b"<< /Length 7 0 R >>", c),
            7: str(len(c)).encode(),
        }
        assert pdf_text_pages(build_pdf(objs)) == ("indirect len", 1)

    def test_lzw(self):
        from __spark_entry__ import _lzw_encode_fixture

        raw = _lzw_encode_fixture(b"BT (lzw text) Tj ET")
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(raw)).encode()
                + b" /Filter /LZWDecode >>",
                raw,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) == ("lzw text", 1)

    def test_lzw_hand_built_vector(self):
        # Hand-packed 9-bit MSB-first codes: 256 (clear), 'a', 'b',
        # 258, 257 (EOD). Processing 'b' defines 258='ab', so the
        # third data code replays it: output "abab".
        codes = [256, 97, 98, 258, 257]
        acc = nbits = 0
        buf = bytearray()
        for code in codes:
            acc = (acc << 9) | code
            nbits += 9
            while nbits >= 8:
                buf.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            buf.append((acc << (8 - nbits)) & 0xFF)
        from lotad_spark.pipeline.pdf import _lzw_decode

        # 258 is the KwKwK code being defined while read: prev='b',
        # entry='b'+'b'[0]... prev at that point is 'b', table adds
        # 258='ab' when 'b' processed, so 258 decodes as 'ab'
        assert _lzw_decode(bytes(buf), 1, 1 << 20) == b"abab"

    def test_lzw_early_change_zero(self):
        from __spark_entry__ import _lzw_encode_fixture

        body = b"BT (early change zero " + b"xy" * 300 + b") Tj ET"
        raw = _lzw_encode_fixture(body, early=0)
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(raw)).encode()
                + b" /Filter /LZWDecode /DecodeParms "
                b"<< /EarlyChange 0 >> >>",
                raw,
            ),
        }
        got = pdf_text_pages(build_pdf(objs))
        assert got == ("early change zero " + "xy" * 300, 1)

    def test_lzw_width_bump_long_stream(self):
        # long enough to cross the 9->10->11 bit widths
        from __spark_entry__ import _lzw_encode_fixture

        words = " ".join(f"w{i % 97}q{i % 89}" for i in range(1200))
        body = ("BT (" + words + ") Tj ET").encode()
        raw = _lzw_encode_fixture(body)
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(raw)).encode()
                + b" /Filter /LZWDecode >>",
                raw,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) == (words, 1)

    def test_flate_png_predictors_all_types(self):
        from __spark_entry__ import _png_predict_fixture

        cols = 5
        body = b"BT (png predictor row filters) Tj ET"
        body += b" " * (-len(body) % cols)  # >= 7 rows: all 5 types
        raw = zlib.compress(_png_predict_fixture(body, cols))
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(raw)).encode()
                + b" /Filter /FlateDecode /DecodeParms "
                b"<< /Predictor 12 /Columns 5 >> >>",
                raw,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) == (
            "png predictor row filters",
            1,
        )

    def test_lzw_tiff_predictor(self):
        from __spark_entry__ import _lzw_encode_fixture

        cols = 8
        body = b"BT (tiff differencing) Tj ET"
        body += b" " * (-len(body) % cols)
        diffed = bytearray()
        for r in range(0, len(body), cols):
            row = body[r : r + cols]
            diffed += bytes(
                [(row[i] - (row[i - 1] if i else 0)) & 0xFF
                 for i in range(cols)]
            )
        raw = _lzw_encode_fixture(bytes(diffed))
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(raw)).encode()
                + b" /Filter /LZWDecode /DecodeParms "
                b"<< /Predictor 2 /Columns 8 >> >>",
                raw,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) == ("tiff differencing", 1)

    def test_filter_array_with_parallel_parms(self):
        from __spark_entry__ import _png_predict_fixture

        cols = 6
        body = b"BT (two stage) Tj ET"
        body += b" " * (-len(body) % cols)
        raw = zlib.compress(_png_predict_fixture(body, cols)).hex().encode() + b">"
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(raw)).encode()
                + b" /Filter [/ASCIIHexDecode /FlateDecode] /DecodeParms "
                b"[null << /Predictor 12 /Columns 6 >>] >>",
                raw,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) == ("two stage", 1)


class TestHonestNone:
    def test_not_a_pdf(self):
        assert pdf_text_pages(b"plain text, no header") is None

    def test_unsupported_filter(self):
        objs = {
            **BASE,
            4: (b"<< /Length 4 /Filter /DCTDecode >>", b"\xff\xd8\xff\xe0"),
        }
        assert pdf_text_pages(build_pdf(objs)) is None

    def test_bad_lzw_code(self):
        # 9-bit codes 256 (clear) then 511 — a code neither literal,
        # in the table, nor the one being defined
        objs = {
            **BASE,
            4: (b"<< /Length 3 /Filter /LZWDecode >>", b"\x80\x7f\xc0"),
        }
        assert pdf_text_pages(build_pdf(objs)) is None

    def test_unsupported_predictor_value(self):
        c = zlib.compress(b"BT (x) Tj ET")
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(c)).encode()
                + b" /Filter /FlateDecode /DecodeParms << /Predictor 5 >> >>",
                c,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) is None

    def test_truncated_predictor_row(self):
        # 10 bytes is not a multiple of rowlen+1 = 4 -> honest None,
        # never silently shifted bytes
        from __spark_entry__ import _png_predict_fixture

        filtered = _png_predict_fixture(b"BT (x) Tj ET", 3)[:10]
        c = zlib.compress(filtered)
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(c)).encode()
                + b" /Filter /FlateDecode /DecodeParms "
                b"<< /Predictor 12 /Columns 3 >> >>",
                c,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) is None

    def test_tiff_predictor_non8bpc_unsupported(self):
        c = zlib.compress(b"BT (x) Tj ET")
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(c)).encode()
                + b" /Filter /FlateDecode /DecodeParms "
                b"<< /Predictor 2 /Columns 4 /BitsPerComponent 4 >> >>",
                c,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) is None

    def test_corrupt_flate_stream(self):
        objs = {
            **BASE,
            4: (b"<< /Length 8 /Filter /FlateDecode >>", b"notflate"),
        }
        assert pdf_text_pages(build_pdf(objs)) is None

    def test_no_pages(self):
        objs = {1: b"<< /Type /Catalog >>"}
        assert pdf_text_pages(build_pdf(objs)) is None

    def test_missing_content_stream(self):
        objs = {**BASE}  # /Contents 4 0 R dangles
        assert pdf_text_pages(build_pdf(objs)) is None

    def test_reference_cycle(self):
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"2 0 R",  # self-referential
        }
        assert pdf_text_pages(build_pdf(objs)) is None

    def test_kids_cycle_is_linear_not_exponential(self):
        """A Pages node listing itself in /Kids (review-caught: the
        depth cap alone allowed ~2^64 walk calls — an executor hang
        from a ~200-byte payload). The visited set must make this
        return fast."""
        import time

        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [2 0 R 2 0 R 3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            4: content_obj(b"BT (survived the cycle) Tj ET"),
        }
        t0 = time.perf_counter()
        got = pdf_text_pages(build_pdf(objs))
        assert time.perf_counter() - t0 < 2.0
        assert got == ("survived the cycle", 1)

    def test_decompression_bomb_bounded(self):
        """A small FlateDecode stream inflating past the 64 MiB bound
        must yield honest-None WITHOUT materializing the output
        (review-caught: a single zlib.decompress allocated the whole
        bomb before the bound check)."""
        raw = zlib.compress(b"\x00" * (80 << 20), 9)  # ~80 MiB -> ~80 KiB
        objs = {
            **BASE,
            4: (
                b"<< /Length " + str(len(raw)).encode()
                + b" /Filter /FlateDecode >>",
                raw,
            ),
        }
        assert pdf_text_pages(build_pdf(objs)) is None

    def test_later_objstm_definition_wins(self):
        """Incremental-update semantics apply BETWEEN object streams
        too (review-caught: setdefault kept the stale copy)."""

        def objstm(body: bytes, onum: int) -> tuple:
            head = f"{onum} 0 ".encode()
            raw = zlib.compress(head + body)
            return (
                b"<< /Type /ObjStm /N 1 /First "
                + str(len(head)).encode()
                + b" /Length " + str(len(raw)).encode()
                + b" /Filter /FlateDecode >>",
                raw,
            )

        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            4: content_obj(b"BT (old) Tj ET"),
            5: content_obj(b"BT (new) Tj ET"),
            # object 3 (the page) defined in TWO ObjStms: the later
            # one points at the new content stream and must win
            6: objstm(b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", 3),
            7: objstm(b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>", 3),
        }
        assert pdf_text_pages(build_pdf(objs)) == ("new", 1)


class TestSparkOperator:
    def test_kind_contract(self, spark):
        df = spark.createDataFrame(
            [
                (1, bytearray(one_pager(b"BT (real pdf) Tj ET"))),
                (2, bytearray(b"%PDF-1.4 but otherwise garbage")),
                (3, bytearray(b"not even close")),
                (4, None),
            ],
            "media_id bigint, content binary",
        )
        got = {r.media_id: r for r in extract_pdf_text(df).collect()}
        assert got[1].kind == "pdf"
        assert got[1].text == "real pdf" and got[1].n_pages == 1
        assert got[2].kind == "bytes" and got[2].text is None
        assert got[3].kind == "bytes"
        assert got[4].kind == "null" and got[4].n_pages is None

    def test_fixture_round_trip_all_variants(self, spark):
        import __spark_entry__ as entry

        texts = ["plain", "déjà vu", "with (parens)", ""]
        rows = [
            (did, texts[did % len(texts)]) for did in range(12)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")

        def build(batches):
            for pdf in batches:
                payloads = [
                    entry._pdf_fixture(t or "", int(d))
                    for d, t in zip(pdf["doc_id"], pdf["text"])
                ]
                yield pdf.assign(content=payloads)[
                    ["doc_id", "content"]
                ].rename(columns={"doc_id": "media_id"})

        media = df.mapInPandas(
            build, schema="media_id bigint, content binary"
        )
        got = {r.media_id: r for r in extract_pdf_text(media).collect()}
        for did, text in rows:
            assert got[did].kind == "pdf"
            assert got[did].text == text, f"variant {did % 6}"


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


class TestInfoMetadata:
    """/Info extraction (r16): trailer location rules, text-string
    decode, NULL paths."""

    def _with_info(self, info_body: bytes) -> bytes:
        objs = {
            **BASE,
            4: content_obj(b"BT (x) Tj ET"),
            7: info_body,
        }
        pdf = build_pdf(objs)
        return pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Info 7 0 R")

    def test_basic_fields(self):
        from lotad_spark.pipeline.pdf import pdf_info_fields

        got = pdf_info_fields(
            self._with_info(
                b"<< /Title (My Doc) /Author (A. Writer) "
                b"/Producer (pen) /CreationDate (D:20260101) >>"
            )
        )
        assert got == ("My Doc", "A. Writer", None, "pen", "D:20260101")

    def test_utf16_title_and_escapes(self):
        from lotad_spark.pipeline.pdf import pdf_info_fields

        hexs = (b"\xfe\xff" + "Résumé 文書".encode("utf-16-be")).hex()
        got = pdf_info_fields(
            self._with_info(
                b"<< /Title <" + hexs.encode() + b"> "
                b"/Author (paren \\(quoted\\)) >>"
            )
        )
        assert got[0] == "Résumé 文書"
        assert got[1] == "paren (quoted)"

    def test_last_trailer_wins(self):
        from lotad_spark.pipeline.pdf import pdf_info_fields

        pdf = self._with_info(b"<< /Title (old) >>")
        # incremental update appends a new info object + trailer
        pdf += (
            b"8 0 obj\n<< /Title (new) >>\nendobj\n"
            b"trailer\n<< /Size 9 /Root 1 0 R /Info 8 0 R >>\n%%EOF\n"
        )
        assert pdf_info_fields(pdf)[0] == "new"

    def test_trailer_inside_stream_ignored(self):
        from lotad_spark.pipeline.pdf import pdf_info_fields

        pdf = self._with_info(b"<< /Title (real) >>")
        # a stream whose body embeds a fake trailer must not shadow
        fake = b"trailer\n<< /Info 9 0 R >>"
        pdf += (
            b"9 0 obj\n<< /Title (fake) >>\nendobj\n"
            b"10 0 obj\n<< /Length " + str(len(fake)).encode()
            + b" >>\nstream\n" + fake + b"\nendstream\nendobj\n"
        )
        assert pdf_info_fields(pdf)[0] == "real"

    def test_xref_stream_fallback(self):
        import zlib

        from lotad_spark.pipeline.pdf import pdf_info_fields

        # no classic trailer at all: /Info lives on the XRef stream
        # dict (modern writers)
        data = zlib.compress(b"\x00" * 6)
        objs = {
            **BASE,
            4: content_obj(b"BT (x) Tj ET"),
            7: b"<< /Title (from xref) >>",
            8: (
                b"<< /Type /XRef /Size 9 /W [1 2 1] /Info 7 0 R "
                b"/Root 1 0 R /Length " + str(len(data)).encode()
                + b" /Filter /FlateDecode >>",
                data,
            ),
        }
        parts = [b"%PDF-1.5\n"]
        for num in sorted(objs):
            body = objs[num]
            if isinstance(body, tuple):
                d, s = body
                parts.append(
                    f"{num} 0 obj\n".encode() + d + b"\nstream\n" + s
                    + b"\nendstream\nendobj\n"
                )
            else:
                parts.append(
                    f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
                )
        parts.append(b"startxref\n0\n%%EOF\n")
        assert pdf_info_fields(b"".join(parts))[0] == "from xref"

    def test_no_info_and_not_pdf(self):
        from lotad_spark.pipeline.pdf import pdf_info_fields

        assert pdf_info_fields(one_pager(b"BT (x) Tj ET")) == (
            None, None, None, None, None,
        )
        assert pdf_info_fields(b"not a pdf") is None

    def test_spark_operator_kinds(self, spark):
        from lotad_spark.pipeline.pdf import extract_pdf_metadata

        df = spark.createDataFrame(
            [
                (1, bytearray(self._with_info(b"<< /Title (T1) >>"))),
                (2, bytearray(b"junk")),
                (3, None),
            ],
            "media_id bigint, content binary",
        )
        got = {r.media_id: r for r in extract_pdf_metadata(df).collect()}
        assert got[1].kind == "pdf" and got[1].title == "T1"
        assert got[1].subject is None
        assert got[2].kind == "bytes" and got[2].title is None
        assert got[3].kind == "null"


class TestTrailerAnchoring:
    """r17 advice fix: a `trailer <<...>>` embedded mid-line in a
    literal string (or comment) must not parse as a later trailer and
    override the real /Info — the keyword is line-anchored per ISO
    32000 §7.5.5."""

    def _with_info(self, info_body: bytes) -> bytes:
        objs = {**BASE, 4: content_obj(b"BT (x) Tj ET"), 7: info_body}
        pdf = build_pdf(objs)
        return pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Info 7 0 R")

    def test_midline_string_spoof_ignored(self):
        from lotad_spark.pipeline.pdf import pdf_info_fields

        pdf = self._with_info(b"<< /Title (real) >>")
        # appended AFTER the real trailer, so under the old unanchored
        # last-match-wins scan the spoof parsed and won
        pdf += (
            b"9 0 obj\n<< /Title (fake) >>\nendobj\n"
            b"11 0 obj\n<< /T (x trailer << /Info 9 0 R >> y) >>\n"
            b"endobj\n"
        )
        assert pdf_info_fields(pdf)[0] == "real"

    def test_comment_spoof_ignored(self):
        from lotad_spark.pipeline.pdf import pdf_info_fields

        pdf = self._with_info(b"<< /Title (real) >>")
        pdf += (
            b"9 0 obj\n<< /Title (fake) >>\nendobj\n"
            b"% note: trailer << /Info 9 0 R >>\n"
        )
        assert pdf_info_fields(pdf)[0] == "real"

    def test_line_anchored_incremental_update_still_wins(self):
        from lotad_spark.pipeline.pdf import pdf_info_fields

        pdf = self._with_info(b"<< /Title (old) >>")
        pdf += (
            b"8 0 obj\n<< /Title (new) >>\nendobj\n"
            b"trailer\n<< /Size 9 /Root 1 0 R /Info 8 0 R >>\n"
            b"startxref\n0\n%%EOF\n"
        )
        assert pdf_info_fields(pdf)[0] == "new"
