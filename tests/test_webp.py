"""Lossless-WebP decoder tests (pipeline/multimodal.py _webp_pixels).

Two independent verification angles:

* HAND-BUILT bitstreams — the vectors below are constructed bit-by-bit
  from the public VP8L spec (RFC 9649) with a test-local writer, so
  they share no layout decisions with either the decoder or the
  fixture encoder in __spark_entry__.py: simple prefix codes, the
  normal (code-length-coded) form, LZ77 with both the mapped
  short-distance form and the plain 120+dist form, the color-cache,
  subtract-green, and a bundled 2-color palette.
* ROUND TRIPS through the entry-module fixture encoder (a separate
  implementation of the spec) across all five encoding classes,
  including the predictor-transform class sweeping all 14 modes.
"""

import struct
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from lotad_spark.pipeline.multimodal import (  # noqa: E402
    _WEBP_DIST_MAP,
    _parse_webp,
    _vp8l_predict,
    _webp_pixels,
    decode_pixels,
)


class BW:
    """Test-local LSB-first bit writer (independent of the encoder's)."""

    def __init__(self):
        self.bits = []

    def put(self, val, n):
        for i in range(n):
            self.bits.append((val >> i) & 1)

    def tobytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def wrap(vp8l_body: bytes) -> bytes:
    data = b"\x2f" + vp8l_body
    pad = b"\x00" if len(data) & 1 else b""
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(data) + len(pad))
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(data))
        + data
        + pad
    )


def header(bw: BW, w: int, h: int) -> None:
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version


def simple1(bw: BW, sym: int) -> None:
    """Simple prefix code, one symbol (0-bit reads)."""
    bw.put(1, 1)
    bw.put(0, 1)
    if sym < 2:
        bw.put(0, 1)
        bw.put(sym, 1)
    else:
        bw.put(1, 1)
        bw.put(sym, 8)


def simple2(bw: BW, s0: int, s1: int) -> None:
    """Simple prefix code, two symbols (canonical: min(sym) -> bit 0)."""
    bw.put(1, 1)
    bw.put(1, 1)
    bw.put(1, 1)
    bw.put(s0, 8)
    bw.put(s1, 8)


class TestDistanceMap:
    # The spec lists the map as a literal table; this is its first five
    # rows (40 entries) — the generated tuple must reproduce them.
    SPEC_PREFIX = (
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    )

    def test_spec_prefix(self):
        assert _WEBP_DIST_MAP[:40] == self.SPEC_PREFIX

    def test_invariants(self):
        assert len(_WEBP_DIST_MAP) == 120
        assert len(set(_WEBP_DIST_MAP)) == 120
        assert all(
            -7 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in _WEBP_DIST_MAP
        )
        assert all(
            not (dy == 0 and dx <= 0) for dx, dy in _WEBP_DIST_MAP
        )
        keys = [
            (dx * dx + dy * dy, abs(dx), dx < 0) for dx, dy in _WEBP_DIST_MAP
        ]
        assert keys == sorted(keys)
        assert _WEBP_DIST_MAP[-1] == (8, 7)


class TestHandBuiltStreams:
    def test_single_pixel_simple_codes(self):
        bw = BW()
        header(bw, 1, 1)
        bw.put(0, 1)  # no transforms
        bw.put(0, 1)  # no cache
        bw.put(0, 1)  # no meta
        simple1(bw, 0x42)  # green
        simple1(bw, 0x17)  # red
        simple1(bw, 0x99)  # blue
        simple1(bw, 0xFF)  # alpha
        simple1(bw, 0)  # distance (unused)
        # all five codes are 0-bit: the single pixel costs no bits
        got = _webp_pixels(wrap(bw.tobytes()))
        assert got is not None
        w, h, arr = got
        assert (w, h) == (1, 1)
        assert tuple(arr[0, 0]) == (0x17, 0x42, 0x99)

    def _normal_green_two_syms(self, bw, s_a, s_b):
        """Hand-emit a normal-form green code over two symbols (one of
        them >= 256, which the simple form cannot carry): both length 1,
        canonical: min -> bit 0. The code-length code itself covers
        {1, 17, 18} (lengths 1, 2, 2 -> canonical 0, 10, 11)."""
        lo, hi = min(s_a, s_b), max(s_a, s_b)
        bw.put(0, 1)  # normal form
        bw.put(15, 4)  # all 19 code-length lengths, in order
        order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
        cl_len = {1: 1, 17: 2, 18: 2}
        for s in order:
            bw.put(cl_len.get(s, 0), 3)
        cl_code = {1: (0, 1), 17: (0b10, 2), 18: (0b11, 2)}
        bw.put(1, 1)  # bounded reads
        bw.put(3, 3)  # 8-bit field
        # ops: [zero-run to lo] 1 [zero-run to hi] 1
        ops = []
        pos = 0
        for target in (lo, hi):
            run = target - pos
            while run >= 11:
                r = min(run, 138)
                ops.append((18, r - 11, 7))
                run -= r
            if run >= 3:
                ops.append((17, run - 3, 3))
            assert run == 0 or run >= 3, "vector assumes no literal zeros"
            ops.append((1, 0, 0))
            pos = target + 1
        bw.put(len(ops) - 2, 8)
        for sym, ev, eb in ops:
            code, nb = cl_code[sym]
            for i in range(nb - 1, -1, -1):
                bw.put((code >> i) & 1, 1)
            if eb:
                bw.put(ev, eb)
        return {lo: 0, hi: 1}

    def test_lz77_mapped_distance(self):
        # 2x2: one literal (gray 10), then three len-1 backrefs with the
        # mapped distance (1, 0) -> previous pixel
        bw = BW()
        header(bw, 2, 2)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        codes = self._normal_green_two_syms(bw, 10, 256)  # 256 = len code 0 -> 1
        simple1(bw, 10)  # red
        simple1(bw, 10)  # blue
        simple1(bw, 255)  # alpha
        simple1(bw, 1)  # distance prefix 1 -> value 2 -> map (1, 0)
        bw.put(codes[10], 1)  # literal
        for _ in range(3):
            bw.put(codes[256], 1)  # backref, len extra 0 bits, dist 0 bits
        got = _webp_pixels(wrap(bw.tobytes()))
        assert got is not None
        assert (got[2][:, :, 1] == 10).all()

    def test_lz77_plain_distance(self):
        # 1x4: lit 10, lit 30, then two len-1 backrefs with the plain
        # form dist_code_value = 121 -> dist 1 (prefix 13, 5 extra bits)
        bw = BW()
        header(bw, 4, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        # green: three symbols -> hand canonical {10: len1, 30: len2, 256: len2}
        bw.put(0, 1)
        bw.put(15, 4)
        order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
        # cl symbols used: 1 and 2 (plus zero runs 17/18) -> lengths:
        # give 17, 18, 1, 2 each 2 bits
        cl_len = {17: 2, 18: 2, 1: 2, 2: 2}
        for s in order:
            bw.put(cl_len.get(s, 0), 3)
        # canonical cl codes (len, sym) order: 1->00, 2->01, 17->10, 18->11
        cl_code = {1: 0b00, 2: 0b01, 17: 0b10, 18: 0b11}

        def put_cl(sym):
            bw.put((cl_code[sym] >> 1) & 1, 1)
            bw.put(cl_code[sym] & 1, 1)

        bw.put(1, 1)
        bw.put(3, 3)
        # ops: zrun(10)=17(7), len1@10, zrun(19)=17? 19 needs 18? 17 max 10
        # -> 18 min is 11; 19 -> 18 with extra 8; len2@30, zrun(225) ->
        # 18(138-11=127) + 18(87-11=76), len2@256
        ops = [
            (17, 7, 3), (1, 0, 0), (18, 8, 7), (2, 0, 0),
            (18, 127, 7), (18, 76, 7), (2, 0, 0),
        ]
        bw.put(len(ops) - 2, 8)
        for sym, ev, eb in ops:
            put_cl(sym)
            if eb:
                bw.put(ev, eb)
        # canonical green: 10 -> 0 (len1); 30 -> 10, 256 -> 11 (len2)
        simple1(bw, 10)  # red (constant — decoded red equals 10)
        simple1(bw, 10)  # blue
        simple1(bw, 255)  # alpha
        simple1(bw, 13)  # distance prefix 13: base 97..128, 5 extra bits
        bw.put(0b0, 1)  # lit g=10
        bw.put(0b01, 2)  # lit g=30 (MSB-first: 1 then 0)
        for _ in range(2):
            bw.put(0b11, 2)  # green sym 256 -> len code 0 -> length 1
            bw.put(24, 5)  # dist extra: 96 + 24 + 1 = 121 -> dist 1
        got = _webp_pixels(wrap(bw.tobytes()))
        assert got is not None
        assert list(got[2][0, :, 1]) == [10, 30, 30, 30]

    def test_color_cache(self):
        # 1x4 with a 1-bit cache: lit A, lit B, then two cache hits.
        a = 0xFF000000 | (7 << 16) | (7 << 8) | 7
        b = 0xFF000000 | (16 << 16) | (16 << 8) | 16
        ia = ((0x1E35A7BD * a) & 0xFFFFFFFF) >> 31
        ib = ((0x1E35A7BD * b) & 0xFFFFFFFF) >> 31
        assert ia != ib  # distinct slots so both hits are meaningful
        bw = BW()
        header(bw, 4, 1)
        bw.put(0, 1)  # no transforms
        bw.put(1, 1)
        bw.put(1, 4)  # cache_bits = 1
        bw.put(0, 1)  # no meta
        # green alphabet 256+24+2; symbols {7, 9, 280+ia, 280+ib} len 2
        bw.put(0, 1)
        bw.put(15, 4)
        order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
        cl_len = {17: 2, 18: 2, 2: 2}
        for s in order:
            bw.put(cl_len.get(s, 0), 3)
        cl_code = {2: 0b00, 17: 0b01, 18: 0b10}

        def put_cl(sym):
            bw.put((cl_code[sym] >> 1) & 1, 1)
            bw.put(cl_code[sym] & 1, 1)

        lo_hit, hi_hit = sorted((280 + ia, 280 + ib))
        ops = []
        pos = 0
        for target in (7, 16, lo_hit, hi_hit):
            run = target - pos
            while run >= 11:
                r = min(run, 138)
                ops.append((18, r - 11, 7))
                run -= r
            if run >= 3:
                ops.append((17, run - 3, 3))
            elif run:
                ops.extend((0, 0, 0) for _ in range(run))
            ops.append((2, 0, 0))
            pos = target + 1
        bw.put(1, 1)
        bw.put(3, 3)
        bw.put(len(ops) - 2, 8)
        for sym, ev, eb in ops:
            put_cl(sym)
            if eb:
                bw.put(ev, eb)
        # canonical green (all len 2, symbol order): 7->00, 16->01,
        # lo_hit->10, hi_hit->11
        gcode = {7: 0b00, 16: 0b01, lo_hit: 0b10, hi_hit: 0b11}
        simple2(bw, 7, 16)  # red: 7->0, 16->1
        simple2(bw, 7, 16)  # blue
        simple1(bw, 255)  # alpha
        simple1(bw, 0)  # distance
        bw.put(gcode[7] >> 1, 1)
        bw.put(gcode[7] & 1, 1)
        bw.put(0, 1)  # red 7
        bw.put(0, 1)  # blue 7
        bw.put(gcode[16] >> 1, 1)
        bw.put(gcode[16] & 1, 1)
        bw.put(1, 1)  # red 16
        bw.put(1, 1)  # blue 16
        for p in (b, a):  # hits: last-inserted b then a
            sym = 280 + (((0x1E35A7BD * p) & 0xFFFFFFFF) >> 31)
            bw.put(gcode[sym] >> 1, 1)
            bw.put(gcode[sym] & 1, 1)
        got = _webp_pixels(wrap(bw.tobytes()))
        assert got is not None
        assert list(got[2][0, :, 1]) == [7, 16, 16, 7]

    def test_subtract_green_inverse(self):
        bw = BW()
        header(bw, 2, 1)
        bw.put(1, 1)
        bw.put(2, 2)  # subtract-green
        bw.put(0, 1)  # end transforms
        bw.put(0, 1)
        bw.put(0, 1)
        simple2(bw, 50, 100)  # green
        simple2(bw, 5, 250)  # red residuals
        simple2(bw, 0, 200)  # blue residuals
        simple1(bw, 255)
        simple1(bw, 0)
        # px0: g=50 (bit 0), r'=5 (bit 0), b'=200 (bit 1)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(1, 1)
        # px1: g=100 (bit 1), r'=250 (bit 1), b'=0 (bit 0)
        bw.put(1, 1)
        bw.put(1, 1)
        bw.put(0, 1)
        got = _webp_pixels(wrap(bw.tobytes()))
        assert got is not None
        assert tuple(got[2][0, 0]) == ((5 + 50) & 255, 50, (200 + 50) & 255)
        assert tuple(got[2][0, 1]) == ((250 + 100) & 255, 100, (0 + 100) & 255)

    def test_palette_with_bundling(self):
        # 8x1, 2-color palette -> width_bits 3 (8 indices per green byte)
        bw = BW()
        header(bw, 8, 1)
        bw.put(1, 1)
        bw.put(3, 2)  # color indexing
        bw.put(1, 8)  # palette size - 1 = 1
        # palette sub-image (2x1): entries delta-coded per channel
        # pal0 = opaque black, pal1 = opaque white -> delta g/r/b = 255
        bw.put(0, 1)  # sub-image: no cache
        simple2(bw, 0, 255)  # green
        simple2(bw, 0, 255)  # red
        simple2(bw, 0, 255)  # blue
        simple2(bw, 0, 255)  # alpha: pal0 a=255, delta a=0
        simple1(bw, 0)  # distance
        # pal0: g0 r0 b0 a255 -> bits 0,0,0,1 ; delta: 255,255,255,0 -> 1,1,1,0
        for bit in (0, 0, 0, 1, 1, 1, 1, 0):
            bw.put(bit, 1)
        bw.put(0, 1)  # end transforms
        bw.put(0, 1)  # no cache
        bw.put(0, 1)  # no meta
        packed = 0b10110010  # index of pixel k = bit k (LSB = leftmost)
        simple1(bw, packed)  # green carries the packed byte
        simple1(bw, 0)
        simple1(bw, 0)
        simple1(bw, 255)
        simple1(bw, 0)
        got = _webp_pixels(wrap(bw.tobytes()))
        assert got is not None
        expect = [255 * ((packed >> k) & 1) for k in range(8)]
        assert list(got[2][0, :, 1]) == expect


class TestPredictors:
    L, T, TL, TR = 0xFF0AC800, 0xFA1464FF, 0xFF1EFA80, 0x80FF0132

    def test_mode12_clamp_full(self):
        # per ARGB channel: clamp(L + T - TL)
        exp = 0
        for sh in (24, 16, 8, 0):
            v = ((self.L >> sh) & 255) + ((self.T >> sh) & 255) - (
                (self.TL >> sh) & 255
            )
            exp = (exp << 8) | max(0, min(255, v))
        assert _vp8l_predict(12, self.L, self.T, self.TL, self.TR) == exp

    def test_mode13_clamp_half_truncates_toward_zero(self):
        # avg has channels floor((L+T)/2); d = avg - TL may be negative:
        # the division truncates toward zero (C semantics), not floor
        avg = [((self.L >> s) & 255) + ((self.T >> s) & 255) for s in (24, 16, 8, 0)]
        avg = [a // 2 for a in avg]
        exp = 0
        for i, sh in enumerate((24, 16, 8, 0)):
            d = avg[i] - ((self.TL >> sh) & 255)
            half = d // 2 if d >= 0 else -((-d) // 2)
            exp = (exp << 8) | max(0, min(255, avg[i] + half))
        assert _vp8l_predict(13, self.L, self.T, self.TL, self.TR) == exp

    def test_mode11_select(self):
        # L == estimate -> pL = 0 < pT: Select returns L
        assert _vp8l_predict(11, self.T, self.T, self.T, 0) == self.T
        L, T, TL = 0xFF00000A, 0xFF000014, 0xFF000014
        # est b = 10+20-20 = 10 -> pL=0, pT=10 -> L
        assert _vp8l_predict(11, L, T, TL, 0) == L
        # tie (pL == pT) returns T per the strict < in the spec
        L2, T2, TL2 = 0xFF000000, 0xFF000004, 0xFF000002
        # est b = 2 -> pL = 2, pT = 2 -> T
        assert _vp8l_predict(11, L2, T2, TL2, 0) == T2

    def test_forward_inverse_agree_all_modes(self):
        import random

        from __spark_entry__ import _wp_predict

        rng = random.Random(3)
        for _ in range(200):
            args = [rng.randrange(1 << 32) for _ in range(4)]
            for mode in range(14):
                assert _vp8l_predict(mode, *args) == _wp_predict(mode, *args)


class TestRoundTrip:
    def _check(self, data, w, h, did):
        from __spark_entry__ import _wp_encode_fixture

        payload = _wp_encode_fixture(data, w, h, did)
        got = _webp_pixels(payload)
        assert got is not None, f"class {did % 5} decode failed"
        if did % 5 == 4:
            exp = np.array([(b % 4) * 85 for b in data], np.uint8)
        else:
            exp = np.frombuffer(data, np.uint8)
        exp = exp.reshape(h, w)
        assert (got[2][:, :, 0] == exp).all()
        assert (got[2][:, :, 1] == exp).all()
        assert (got[2][:, :, 2] == exp).all()

    def test_all_classes_fixture_sizes(self):
        import random

        rng = random.Random(11)
        for did in range(40):
            w, h = did % 6 + 3, did % 4 + 2
            data = bytes(rng.randrange(256) for _ in range(w * h))
            self._check(data, w, h, did)

    def test_all_classes_padded_text_shape(self):
        # the oracle fixture's actual shape: text bytes + 'x' padding
        for did in range(20):
            w, h = did % 6 + 3, did % 4 + 2
            data = f"Doc {did}!".encode()[: w * h].ljust(w * h, b"x")
            self._check(data, w, h, did)

    def test_all_classes_larger_images(self):
        import random

        rng = random.Random(5)
        for did in range(10, 15):  # one per class
            data = bytes(rng.randrange(256) for _ in range(31 * 17))
            self._check(data, 31, 17, did)

    def test_predictor_class_covers_all_modes(self):
        # class 3 tile modes are (did + tile) % 14: dids 3..59 step 5
        # sweep every mode as the first tile's mode
        seen = {(did % 14) for did in range(3, 73, 5)}
        assert seen == set(range(14))


class TestHonestNone:
    def test_lossy_vp8_is_metadata_only(self):
        # minimal VP8 keyframe header: 3-byte frame tag, sync, dims
        body = bytes([0, 0, 0]) + b"\x9d\x01\x2a" + struct.pack("<HH", 64, 48)
        payload = (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(body))
            + b"WEBP"
            + b"VP8 "
            + struct.pack("<I", len(body))
            + body
        )
        assert _parse_webp(payload) == (64, 48, "RGB")
        assert _webp_pixels(payload) is None

    def test_animation_returns_none(self):
        body = b"\x00" * 6
        payload = (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(body))
            + b"WEBP"
            + b"ANIM"
            + struct.pack("<I", len(body))
            + body
        )
        assert _webp_pixels(payload) is None

    def test_truncated_stream_returns_none(self):
        from __spark_entry__ import _wp_encode_fixture

        full = _wp_encode_fixture(b"hello!", 3, 2, 0)
        assert _webp_pixels(full) is not None
        assert _webp_pixels(full[: len(full) - 3]) is None

    def test_garbage_and_wrong_container(self):
        assert _webp_pixels(b"not a webp at all") is None
        assert _webp_pixels(b"RIFF\x04\x00\x00\x00WAVE") is None
        assert _parse_webp(b"RIFF\x04\x00\x00\x00WAVE") is None

    def test_bad_version_rejected(self):
        bw = BW()
        bw.put(0, 14)
        bw.put(0, 14)
        bw.put(0, 1)
        bw.put(5, 3)  # version != 0
        assert _webp_pixels(wrap(bw.tobytes())) is None


class TestMetadata:
    def test_vp8x_canvas(self):
        body = bytes([0x00]) + b"\x00" * 3 + (799).to_bytes(3, "little") + (
            599
        ).to_bytes(3, "little")
        payload = (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(body))
            + b"WEBP"
            + b"VP8X"
            + struct.pack("<I", len(body))
            + body
        )
        assert _parse_webp(payload) == (800, 600, "RGB")

    def test_vp8l_header_dims(self):
        from __spark_entry__ import _wp_encode_fixture

        payload = _wp_encode_fixture(bytes(range(12)), 4, 3, 1)
        assert _parse_webp(payload) == (4, 3, "RGB")

    def test_decode_pixels_routes_webp(self):
        from __spark_entry__ import _wp_encode_fixture

        data = b"RouteCheck12"
        payload = _wp_encode_fixture(data, 4, 3, 0)
        got = decode_pixels(payload)
        assert got is not None
        assert (
            got[2][:, :, 1] == np.frombuffer(data, np.uint8).reshape(3, 4)
        ).all()
