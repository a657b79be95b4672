"""Zero-dependency PDF text extraction for crawl corpora.

PDFs are the second-most-common document format in web crawls after
HTML; a training-data pipeline that drops them loses a large,
high-quality text fraction. This module implements a REAL extractor
for the self-contained subset of ISO 32000 (PDF 1.x) that stdlib +
numpy can decode, with the honest-None contract the multimodal tier
uses everywhere: a payload the parser can't fully decode yields None
rather than silently partial text.

Supported (all from the public spec):

* object discovery by linear ``N G obj`` scan (robust to the broken
  xref tables that are endemic in crawled PDFs) plus expansion of
  object streams (``/Type /ObjStm`` — where modern writers put the
  catalog/page objects);
* indirect references, nested dicts/arrays, literal strings with the
  full escape set, hex strings, names with ``#xx`` escapes;
* stream filters: FlateDecode (stdlib zlib), LZWDecode (the TIFF
  variable-width 9-12 bit code variant PDF specifies, EarlyChange
  honored), ASCIIHexDecode, ASCII85Decode (stdlib base64), including
  filter arrays; /DecodeParms predictors on Flate/LZW streams — PNG
  row filters (None/Sub/Up/Average/Paeth, the /Predictor >= 10
  family) and TIFF horizontal differencing (/Predictor 2);
* the page tree (``/Root -> /Pages -> /Kids``; catalog-scan fallback),
  per-page ``/Contents`` (single stream or array);
* text operators inside content streams: Tj, ', ", TJ, with line
  breaks from T*/'/" and Td/TD with a vertical move; strings decode
  as UTF-16BE when BOM-prefixed, latin-1 otherwise (the simple-font
  convention).

Out of scope, returns None (swap in a real PDF library for these):
encryption, DCT/JBIG2/CCITT-filtered CONTENT streams (image filters),
and CID/Type0 composite-font decoding beyond the UTF-16BE string
convention — a wrong-text guess poisons training data in ways a
labeled fallback does not.

100 TB shape: the extractor runs per-payload inside the scan stage
(Arrow-batched mapInPandas), embarrassingly parallel and linear in
payload bytes (one regex object scan + zlib inflate); decompressed
bytes are bounded per document, so a decompression bomb degrades one
row, never an executor.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "pdf_text_pages",
    "extract_pdf_text",
    "pdf_info_fields",
    "extract_pdf_metadata",
]

# total inflated stream bytes allowed per document (bomb bound)
_MAX_DECODED = 64 << 20

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _PdfError(Exception):
    pass


def _lzw_decode(data: bytes, early: int, budget: int) -> bytes:
    """PDF LZWDecode: the TIFF variant — MSB-first variable-width codes
    (9 to 12 bits), 256 = ClearTable, 257 = EOD, code width bumps when
    the NEXT code to assign reaches ``(1 << width) - early``
    (/EarlyChange defaults to 1: the encoder switches one code early).
    ``budget`` bounds the output (the caller's decompression-bomb
    accounting); exceeding it raises like the Flate path."""
    out = bytearray()
    table: dict[int, bytes] = {}
    next_code = 258
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = ((acc << 8) | byte) & 0xFFFFFFFF
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table.clear()
                next_code = 258
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if code < 256:
                entry = bytes([code])
            elif code in table:
                entry = table[code]
            elif code == next_code and prev is not None:
                # the KwKwK case: the code being defined right now
                entry = prev + prev[:1]
            else:
                raise _PdfError("bad LZW code")
            out += entry
            if len(out) > budget:
                raise _PdfError("decoded size bound exceeded")
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code + early >= (1 << width) and width < 12:
                    width += 1
            prev = entry
    # EOD is formally required; crawled PDFs routinely truncate it
    return bytes(out)


def _apply_predictor(data: bytes, pred: int, colors: int, bpc: int,
                     columns: int) -> bytes:
    """Undo a /DecodeParms predictor on Flate/LZW output: 2 = TIFF
    horizontal differencing, >= 10 = PNG row filters (each row carries
    a leading filter-type byte; filters operate on the bytes-per-pixel
    stride). Truncated final rows raise — honest-None beats silently
    shifted bytes feeding the content-stream tokenizer."""
    if pred in (1, None):
        return data
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (colors * bpc * columns + 7) // 8
    if rowlen <= 0:
        raise _PdfError("bad predictor columns")
    if pred == 2:
        if bpc != 8:
            raise _PdfError("TIFF predictor with bpc != 8 unsupported")
        if len(data) % rowlen:
            raise _PdfError("truncated predictor row")
        out = bytearray(data)
        for r in range(0, len(out), rowlen):
            for i in range(r + bpp, r + rowlen):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    if pred < 10:
        raise _PdfError(f"unsupported predictor {pred}")
    if len(data) % (rowlen + 1):
        raise _PdfError("truncated predictor row")
    out = bytearray()
    prev_row = bytearray(rowlen)
    for pos in range(0, len(data), rowlen + 1):
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + rowlen])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev_row[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev_row[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev_row[i]
                c = prev_row[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    ref = a
                elif pb <= pc:
                    ref = b
                else:
                    ref = c
                row[i] = (row[i] + ref) & 0xFF
        else:
            raise _PdfError(f"bad PNG filter type {ft}")
        out += row
        prev_row = row
    return bytes(out)


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # % comment to EOL
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
        else:
            break
    return pos


def _parse_name(data: bytes, pos: int):
    # pos at '/'
    pos += 1
    out = bytearray()
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS or c in _DELIM:
            break
        if c == 0x23 and pos + 2 < n:  # #xx escape
            try:
                out.append(int(data[pos + 1 : pos + 3], 16))
                pos += 3
                continue
            except ValueError:
                pass
        out.append(c)
        pos += 1
    return ("name", bytes(out).decode("latin-1")), pos


def _parse_literal_string(data: bytes, pos: int):
    # pos at '('
    pos += 1
    depth = 1
    out = bytearray()
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash escape
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                pos += 1
            elif e in b"()\\":
                out.append(e)
                pos += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                oct_digits = bytearray()
                while pos < n and len(oct_digits) < 3 and 0x30 <= data[pos] <= 0x37:
                    oct_digits.append(data[pos])
                    pos += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                pos += 1
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:
                out.append(e)
                pos += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return ("str", bytes(out)), pos + 1
        if c == 0x0D:  # EOL in literal: CR / CRLF normalize to LF
            out.append(0x0A)
            pos += 1
            if pos < n and data[pos] == 0x0A:
                pos += 1
            continue
        out.append(c)
        pos += 1
    raise _PdfError("unterminated literal string")


def _parse_hex_string(data: bytes, pos: int):
    # pos at '<' (not '<<')
    end = data.find(b">", pos)
    if end < 0:
        raise _PdfError("unterminated hex string")
    digits = bytes(
        c for c in data[pos + 1 : end] if c not in _WS
    ).decode("latin-1")
    if len(digits) % 2:
        digits += "0"
    try:
        return ("str", bytes.fromhex(digits)), end + 1
    except ValueError as exc:
        raise _PdfError("bad hex string") from exc


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_KEYWORD_RE = re.compile(rb"[A-Za-z*'\"]+")


def _parse_value(data: bytes, pos: int):
    """One PDF object value at pos -> (value, newpos). Values:
    ("name", s) / ("str", b) / _Ref / int / float / bool / None /
    list / dict / ("kw", s) for bare keywords."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise _PdfError("eof")
    c = data[pos]
    if data.startswith(b"<<", pos):
        pos += 2
        d = {}
        while True:
            pos = _skip_ws(data, pos)
            if data.startswith(b">>", pos):
                return d, pos + 2
            key, pos = _parse_value(data, pos)
            if not (isinstance(key, tuple) and key[0] == "name"):
                raise _PdfError("dict key is not a name")
            val, pos = _parse_value(data, pos)
            d[key[1]] = val
    if c == 0x5B:  # [
        pos += 1
        arr = []
        while True:
            pos = _skip_ws(data, pos)
            if pos < len(data) and data[pos] == 0x5D:
                return arr, pos + 1
            v, pos = _parse_value(data, pos)
            arr.append(v)
    if c == 0x28:
        return _parse_literal_string(data, pos)
    if c == 0x3C:
        return _parse_hex_string(data, pos)
    if c == 0x2F:
        return _parse_name(data, pos)
    m = _NUM_RE.match(data, pos)
    if m:
        tok = m.group()
        pos = m.end()
        # reference lookahead: "N G R"
        if b"." not in tok:
            look = _skip_ws(data, pos)
            m2 = _NUM_RE.match(data, look)
            if m2 and b"." not in m2.group():
                look2 = _skip_ws(data, m2.end())
                if data.startswith(b"R", look2) and (
                    look2 + 1 >= len(data)
                    or data[look2 + 1] in _WS
                    or data[look2 + 1] in _DELIM
                ):
                    return _Ref(int(tok)), look2 + 1
        return (float(tok) if b"." in tok else int(tok)), pos
    m = _KEYWORD_RE.match(data, pos)
    if m:
        kw = m.group()
        pos = m.end()
        if kw == b"true":
            return True, pos
        if kw == b"false":
            return False, pos
        if kw == b"null":
            return None, pos
        return ("kw", kw.decode("latin-1")), pos
    raise _PdfError(f"unparseable value at {pos}")


_OBJ_RE = re.compile(rb"(?:^|[\x00\t\n\x0c\r >\]])(\d{1,9})\s+(\d{1,5})\s+obj\b")


class _Document:
    """Object map + lazy stream extraction over one PDF payload."""

    def __init__(self, payload: bytes):
        self.data = payload
        self.objs: dict[int, object] = {}
        self.streams: dict[int, tuple] = {}  # num -> (dict, raw_start)
        self._decoded_total = 0
        self._stream_spans: list[tuple[int, int]] = []
        # Position-driven scan: after recording a stream object the scan
        # jumps past its endstream, so object discovery never reads
        # stream payload bytes — compressed bytes that happen to match
        # "N G obj" and parse must not shadow a real earlier definition.
        scan = 0
        while True:
            m = _OBJ_RE.search(payload, scan)
            if m is None:
                break
            scan = m.end()
            num = int(m.group(1))
            try:
                val, pos = _parse_value(payload, m.end())
            except _PdfError:
                continue
            scan = pos
            pos2 = _skip_ws(payload, pos)
            if payload.startswith(b"stream", pos2):
                ds = pos2 + 6
                if payload.startswith(b"\r\n", ds):
                    ds += 2
                elif ds < len(payload) and payload[ds] in (0x0A, 0x0D):
                    ds += 1
                self.streams[num] = (val, ds)
                scan = self._stream_scan_end(val, ds)
                self._stream_spans.append((ds, scan))
            elif num in self.streams:
                self.streams.pop(num)
            # incremental updates append redefinitions: the LATER
            # definition wins (object-stream copies below never
            # override a direct object)
            self.objs[num] = val
        self._expand_object_streams()

    def _stream_scan_end(self, d, start: int) -> int:
        """Scan position just past this stream's endstream. A direct
        integer /Length wins when endstream actually follows it (the
        one case where the body may contain the literal bytes
        ``endstream``); otherwise — /Length indirect (possibly to a
        not-yet-scanned object) or wrong — the first endstream bounds
        the skip. No endstream at all: resume right after the dict so
        a truncated stream can't swallow the rest of the document."""
        data = self.data
        length = d.get("Length") if isinstance(d, dict) else None
        if isinstance(length, int) and 0 <= length <= len(data) - start:
            tail = _skip_ws(data, start + length)
            if data.startswith(b"endstream", tail):
                return tail + 9
        end = data.find(b"endstream", start)
        if end >= 0:
            return end + 9
        return start

    def resolve(self, v, depth: int = 0):
        while isinstance(v, _Ref):
            if depth > 32:
                raise _PdfError("reference cycle")
            v = self.objs.get(v.num)
            depth += 1
        return v

    def _raw_stream(self, num: int) -> bytes:
        d, start = self.streams[num]
        length = self.resolve(d.get("Length"))
        data = self.data
        if isinstance(length, int) and 0 <= length <= len(data) - start:
            raw = data[start : start + length]
            # trust /Length only when endstream actually follows
            tail = _skip_ws(data, start + length)
            if data.startswith(b"endstream", tail):
                return raw
        end = data.find(b"endstream", start)
        if end < 0:
            raise _PdfError("unterminated stream")
        raw = data[start:end]
        # strip the EOL that precedes endstream
        if raw.endswith(b"\r\n"):
            return raw[:-2]
        if raw.endswith((b"\n", b"\r")):
            return raw[:-1]
        return raw

    def stream_bytes(self, num: int) -> bytes:
        """Fully decoded stream content (filters applied, bomb-bounded)."""
        import base64
        import zlib

        d, _start = self.streams[num]
        raw = self._raw_stream(num)
        filters = self.resolve(d.get("Filter"))
        if filters is None:
            chain = []
        elif isinstance(filters, tuple):
            chain = [filters]
        elif isinstance(filters, list):
            chain = [self.resolve(f) for f in filters]
        else:
            raise _PdfError("bad /Filter")
        parms_raw = self.resolve(d.get("DecodeParms"))
        if isinstance(parms_raw, list):
            parms_list = [self.resolve(p) for p in parms_raw]
        else:
            parms_list = [parms_raw]
        parms_list += [None] * (len(chain) - len(parms_list))
        for f, parm in zip(chain, parms_list):
            name = f[1] if isinstance(f, tuple) else None
            if not isinstance(parm, dict):
                if parm not in (None, {}):
                    raise _PdfError("bad /DecodeParms entry")
                parm = {}
            if name in ("FlateDecode", "Fl"):
                # inflate INCREMENTALLY against the remaining budget:
                # a single zlib.decompress() would allocate the whole
                # output (~1000:1 max ratio) before the bound check —
                # the OOM path the bound exists to prevent
                budget = _MAX_DECODED - self._decoded_total
                try:
                    dec = zlib.decompressobj()
                    out = dec.decompress(raw, max(budget, 1) + 1)
                    if len(out) > budget or (
                        dec.unconsumed_tail and not dec.eof
                    ):
                        raise _PdfError("decoded size bound exceeded")
                    raw = out
                except zlib.error as exc:
                    raise _PdfError("bad flate stream") from exc
            elif name in ("LZWDecode", "LZW"):
                early = self.resolve(parm.get("EarlyChange", 1))
                if early not in (0, 1):
                    raise _PdfError("bad /EarlyChange")
                raw = _lzw_decode(
                    raw, early, _MAX_DECODED - self._decoded_total
                )
            elif name in ("ASCIIHexDecode", "AHx"):
                digits = raw.split(b">")[0]
                digits = bytes(c for c in digits if c not in _WS)
                if len(digits) % 2:
                    digits += b"0"
                try:
                    raw = bytes.fromhex(digits.decode("latin-1"))
                except ValueError as exc:
                    raise _PdfError("bad hex stream") from exc
            elif name in ("ASCII85Decode", "A85"):
                body = raw.split(b"~>")[0]
                try:
                    raw = base64.a85decode(
                        bytes(c for c in body if c not in _WS)
                    )
                except ValueError as exc:
                    raise _PdfError("bad ascii85 stream") from exc
            else:
                raise _PdfError(f"unsupported filter {name}")
            if name in ("FlateDecode", "Fl", "LZWDecode", "LZW"):
                pred = self.resolve(parm.get("Predictor", 1))
                if pred not in (None, 1):
                    raw = _apply_predictor(
                        raw,
                        pred,
                        self.resolve(parm.get("Colors", 1)),
                        self.resolve(parm.get("BitsPerComponent", 8)),
                        self.resolve(parm.get("Columns", 1)),
                    )
            self._decoded_total += len(raw)
            if self._decoded_total > _MAX_DECODED:
                raise _PdfError("decoded size bound exceeded")
        return raw

    def _expand_object_streams(self) -> None:
        # direct objects always win over ObjStm copies; BETWEEN object
        # streams, later definitions win (the incremental-update rule
        # applied consistently with the direct-object scan above)
        direct = set(self.objs)
        for num, (d, _s) in list(self.streams.items()):
            if not isinstance(d, dict) or self.resolve(d.get("Type")) != (
                "name",
                "ObjStm",
            ):
                continue
            try:
                content = self.stream_bytes(num)
                n_objs = self.resolve(d.get("N"))
                first = self.resolve(d.get("First"))
                if not (isinstance(n_objs, int) and isinstance(first, int)):
                    continue
                pos = 0
                pairs = []
                for _ in range(n_objs):
                    pos = _skip_ws(content, pos)
                    m1 = _NUM_RE.match(content, pos)
                    if m1 is None:
                        break
                    pos = _skip_ws(content, m1.end())
                    m2 = _NUM_RE.match(content, pos)
                    if m2 is None:
                        break
                    pos = m2.end()
                    pairs.append((int(m1.group()), int(m2.group())))
                for onum, off in pairs:
                    try:
                        val, _p = _parse_value(content, first + off)
                    except _PdfError:
                        continue
                    if onum not in direct:
                        self.objs[onum] = val
            except _PdfError:
                continue

    def info_dict(self):
        """The document-information dictionary (/Info) or None: classic
        trailers win (LAST one — incremental updates append), with the
        XRef-stream dict (/Type /XRef, where xref-stream writers put
        /Info) as the fallback. Trailer keywords inside stream bodies
        are ignored via the recorded stream extents — the same
        no-reading-payload-bytes rule as object discovery. The keyword
        must start a line (ISO 32000 §7.5.5 puts ``trailer`` on its own
        line after the xref table), so ``trailer <<...>>`` embedded
        mid-line in a literal string or comment can't parse as a later
        trailer and override the real /Info; and when the last
        ``startxref`` pointer is parseable, trailers at or after the
        xref section it points to are preferred over earlier ones
        (a string spoof would also need to sit past the live xref
        offset to win)."""
        data = self.data
        # the offset the last startxref points at (the live xref
        # section; its trailer follows it) — None when absent/garbled
        xref_off = None
        for m in re.finditer(rb"startxref[ \t]*\r?\n?[ \t]*(\d+)", data):
            if not any(
                s <= m.start() < e for s, e in self._stream_spans
            ):
                xref_off = int(m.group(1))
        best = best_after_xref = None
        for m in re.finditer(rb"(?:^|[\r\n])[ \t]*trailer\b", data):
            kw_start = m.start() + (data[m.start()] in b"\r\n")
            pos = m.end()
            if any(s <= kw_start < e for s, e in self._stream_spans):
                continue
            try:
                val, _ = _parse_value(data, _skip_ws(data, pos))
            except _PdfError:
                continue
            if isinstance(val, dict) and "Info" in val:
                best = val["Info"]
                if xref_off is not None and kw_start >= xref_off:
                    best_after_xref = val["Info"]
        info_ref = best_after_xref if best_after_xref is not None else best
        if info_ref is None:
            for d, _s in self.streams.values():
                if (
                    isinstance(d, dict)
                    and d.get("Type") == ("name", "XRef")
                    and "Info" in d
                ):
                    info_ref = d["Info"]
        if info_ref is None:
            return None
        info = self.resolve(info_ref)
        return info if isinstance(info, dict) else None

    # --- document structure ------------------------------------------

    def _catalog(self):
        m = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", self.data)
        if m:
            cat = self.resolve(_Ref(int(m.group(1))))
            if isinstance(cat, dict):
                return cat
        for v in self.objs.values():
            if isinstance(v, dict) and v.get("Type") == ("name", "Catalog"):
                return v
        raise _PdfError("no catalog")

    def pages(self) -> list:
        """Page dicts in document order (depth-first /Kids walk). A
        visited set over node identity bounds the walk LINEARLY in the
        object count: a depth cap alone still allows exponential
        traversal of a self-referential or shared /Kids subtree (a
        ~200-byte crafted PDF would otherwise hang the executor)."""
        cat = self._catalog()
        out: list = []
        seen: set = set()

        def walk(node, depth):
            key = node.num if isinstance(node, _Ref) else id(node)
            if key in seen or depth > 64:
                return
            seen.add(key)
            node = self.resolve(node)
            if not isinstance(node, dict):
                return
            t = node.get("Type")
            if t == ("name", "Page"):
                out.append(node)
            elif t == ("name", "Pages") or "Kids" in node:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, depth + 1)

        walk(cat.get("Pages"), 0)
        if not out:
            raise _PdfError("no pages")
        return out

    def page_content(self, page: dict) -> bytes:
        # keep REFS un-resolved: stream content is indexed by object
        # number, and resolving would hand back the stream's dict
        contents = page.get("Contents")
        resolved = self.resolve(contents)
        if isinstance(resolved, list):
            refs = resolved
        elif contents is None:
            refs = []
        else:
            refs = [contents]
        parts = []
        for r in refs:
            if not isinstance(r, _Ref) or r.num not in self.streams:
                raise _PdfError("contents is not a stream")
            parts.append(self.stream_bytes(r.num))
        return b"\n".join(parts)


def _decode_text_string(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1")


def _content_text(content: bytes) -> str:
    """Walk one content stream's operators, collecting shown text.
    Line breaks come from T*, ', \", and Td/TD with a vertical move —
    the standard extractor heuristic for untagged PDFs."""
    out: list[str] = []
    operands: list = []
    pos = 0
    n = len(content)
    while pos < n:
        pos = _skip_ws(content, pos)
        if pos >= n:
            break
        try:
            v, pos = _parse_value(content, pos)
        except _PdfError:
            pos += 1
            continue
        if isinstance(v, tuple) and v[0] == "kw":
            op = v[1]
            if op == "Tj" and operands:
                s = operands[-1]
                if isinstance(s, tuple) and s[0] == "str":
                    out.append(_decode_text_string(s[1]))
            elif op in ("'", '"') and operands:
                s = operands[-1]
                if isinstance(s, tuple) and s[0] == "str":
                    out.append("\n")
                    out.append(_decode_text_string(s[1]))
            elif op == "TJ" and operands:
                arr = operands[-1]
                if isinstance(arr, list):
                    for el in arr:
                        if isinstance(el, tuple) and el[0] == "str":
                            out.append(_decode_text_string(el[1]))
            elif op == "T*":
                out.append("\n")
            elif op in ("Td", "TD") and len(operands) >= 2:
                ty = operands[-1]
                if isinstance(ty, (int, float)) and ty != 0:
                    out.append("\n")
            elif op == "BI":
                # inline image: skip to EI (binary data would desync
                # the tokenizer)
                end = content.find(b"EI", pos)
                if end < 0:
                    break
                pos = end + 2
            operands = []
        else:
            operands.append(v)
    return "".join(out)


def pdf_text_pages(payload: bytes):
    """(full_text, n_pages) for a parseable PDF, None otherwise.
    Page texts join with '\\n'; a leading line break from the first
    positioning operator is trimmed per page."""
    if not payload.startswith(b"%PDF-"):
        return None
    try:
        doc = _Document(payload)
        pages = doc.pages()
        texts = []
        for p in pages:
            t = _content_text(doc.page_content(p))
            texts.append(t[1:] if t.startswith("\n") else t)
        return ("\n".join(texts), len(pages))
    except (_PdfError, RecursionError, MemoryError):
        return None


_INFO_FIELDS = ("Title", "Author", "Subject", "Producer", "CreationDate")


def pdf_info_fields(payload: bytes):
    """(title, author, subject, producer, creation_date) from the
    document-information dictionary, each None when absent — or None
    for a payload that isn't a parseable PDF. String values decode per
    the text-string convention (UTF-16BE when BOM-prefixed, latin-1
    otherwise); non-string values (malformed Info entries) map to
    None, never a guess."""
    if not payload.startswith(b"%PDF-"):
        return None
    try:
        doc = _Document(payload)
        info = doc.info_dict()
        out = []
        for field in _INFO_FIELDS:
            v = doc.resolve(info.get(field)) if info else None
            if isinstance(v, tuple) and len(v) == 2 and v[0] == "str":
                out.append(_decode_text_string(v[1]))
            else:
                out.append(None)
        return tuple(out)
    except (_PdfError, RecursionError, MemoryError):
        return None


def extract_pdf_metadata(
    df: DataFrame,
    content_col: str = "content",
    *,
    id_col: str = "media_id",
) -> DataFrame:
    """(id, kind, title, author, subject, producer, creation_date) per
    document via Arrow-batched mapInPandas — kind='pdf' for parseable
    payloads (fields NULL when the Info dict or a field is absent),
    kind='bytes' for unparseable payloads, kind='null' for NULL
    payloads. Runs per-payload inside the scan stage like the text
    extractor: embarrassingly parallel, linear in bytes."""
    id_type = df.schema[id_col].dataType.simpleString()
    field_cols = ("title", "author", "subject", "producer",
                  "creation_date")
    out_schema = f"`{id_col}` {id_type}, kind string, " + ", ".join(
        f"{c} string" for c in field_cols
    )

    def meta_batches(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = []
            for b in pdf_batch[content_col]:
                if b is None:
                    rows.append(("null",) + (None,) * 5)
                    continue
                got = pdf_info_fields(bytes(b))
                if got is None:
                    rows.append(("bytes",) + (None,) * 5)
                else:
                    rows.append(("pdf",) + got)
            out = pd.DataFrame(
                rows, columns=("kind",) + field_cols
            )
            out.insert(0, id_col, pdf_batch[id_col].values)
            yield out

    return df.mapInPandas(meta_batches, schema=out_schema)


def extract_pdf_text(
    df: DataFrame,
    content_col: str = "content",
    *,
    id_col: str = "media_id",
) -> DataFrame:
    """(id, kind, n_pages, text) per document via Arrow-batched
    mapInPandas — kind='pdf' with the extracted text for parseable
    payloads, kind='bytes' with NULLs for anything the zero-dep subset
    can't fully decode (never silently partial text), kind='null' for
    NULL payloads. The same honest-fallback contract as the image
    tier."""
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"`{id_col}` {id_type}, kind string, n_pages int, text string"
    )

    def pdf_batches(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            kinds, pages, texts = [], [], []
            for b in pdf_batch[content_col]:
                if b is None:
                    kinds.append("null")
                    pages.append(None)
                    texts.append(None)
                    continue
                got = pdf_text_pages(bytes(b))
                if got is None:
                    kinds.append("bytes")
                    pages.append(None)
                    texts.append(None)
                else:
                    kinds.append("pdf")
                    pages.append(got[1])
                    texts.append(got[0])
            yield pd.DataFrame(
                {
                    id_col: pdf_batch[id_col],
                    "kind": kinds,
                    "n_pages": pages,
                    "text": texts,
                }
            )

    return df.mapInPandas(pdf_batches, schema=out_schema)
