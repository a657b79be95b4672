"""Baseline-JPEG decoder tests (pipeline/multimodal.py _jpeg_pixels).

Test-side reference ENCODER below is independent of the decoder: it
computes the forward DCT with its own float basis, writes canonical
Huffman tables of its own shape (different code lengths than anything
the decoder assumes), does byte stuffing and restart markers per
T.81 — so a decode that inverts it exercises the real format, not a
shared implementation. Exactness claims are scoped honestly:

* constant 8×8 blocks (DC-only) round-trip EXACTLY — the pixel class
  the driver-checked oracle row (multimodal_jpeg_luma_hist) uses;
* arbitrary pixels at quant=1 round-trip within ±2 (the forward
  round(DCT)'s own quantization noise);
* a real quant table's decode matches an INDEPENDENT double-loop
  IDCT replay of the same dequantized coefficients within ±1 (float
  summation-order slack only).
"""

import numpy as np
import pytest

from lotad_spark.pipeline.multimodal import (
    _jpeg_pixels,
    _parse_jpeg,
    decode_pixels,
)

ZZ = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# Reference-encoder Huffman tables: DC = 12 categories at length 4;
# AC = EOB/ZRL plus (run 0-3, size 1-10), all at length 6 — shapes the
# decoder has no special knowledge of.
DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))
AC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(4) for s in range(1, 11)]
AC_BITS = [0, 0, 0, 0, 0, 42] + [0] * 10


def _dct_basis():
    u = np.arange(8)
    a = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) * np.sqrt(
        2.0 / 8
    )
    a[0] = np.sqrt(1.0 / 8)
    return a


def _dct2(block):
    a = _dct_basis()
    return a @ block @ a.T


def _canonical(bits, vals):
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


class _Writer:
    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def put(self, val, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.put(1, 1)
        return bytes(self.out)


def _cat(v):
    return int(abs(v)).bit_length()


def _seg(marker, payload):
    import struct

    return (
        b"\xff"
        + bytes([marker])
        + struct.pack(">H", len(payload) + 2)
        + payload
    )


def _emit_block(w, block_f, qnat, pred, dctab, actab):
    """Forward-transform one level-shifted 8×8 float block, quantize by
    qnat (natural order), Huffman-encode; returns the new DC pred."""
    qc = np.round(_dct2(block_f) / qnat).astype(int)
    zzv = qc.reshape(-1)[list(ZZ)]
    diff = int(zzv[0]) - pred
    t = _cat(diff)
    ln, code = dctab[t]
    w.put(code, ln)
    if t:
        w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k = 1
    while k < 64:
        if zzv[k] == 0:
            j = k
            while j < 64 and zzv[j] == 0:
                j += 1
            if j == 64:
                ln, code = actab[0x00]
                w.put(code, ln)
                break
            run = j - k
            while run > 15:
                ln, code = actab[0xF0]
                w.put(code, ln)
                run -= 16
            k = j
            v = int(zzv[k])
            s = _cat(v)
            ln, code = actab[(run << 4) | s]
            w.put(code, ln)
            w.put(v if v >= 0 else v + (1 << s) - 1, s)
            k += 1
        else:
            v = int(zzv[k])
            s = _cat(v)
            ln, code = actab[s]
            w.put(code, ln)
            w.put(v if v >= 0 else v + (1 << s) - 1, s)
            k += 1
    return int(zzv[0])


def encode_gray(pix, qtable=None, dri=0):
    """Grayscale baseline JPEG of pix (h, w uint8; multiples of 8)."""
    import struct

    h, w_ = pix.shape
    q = np.ones(64, int) if qtable is None else np.asarray(qtable, int)
    qnat = np.zeros(64, int)
    qnat[list(ZZ)] = q
    qnat = qnat.reshape(8, 8)
    dctab = _canonical(DC_BITS, DC_VALS)
    actab = _canonical(AC_BITS, AC_VALS)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in q))
    out += _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w_) + bytes([1, 1, 0x11, 0]),
    )
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    wtr = _Writer()
    pred = mcu = 0
    chunks = []
    for by in range(h // 8):
        for bx in range(w_ // 8):
            if dri and mcu and mcu % dri == 0:
                chunks.append(wtr.flush())
                chunks.append(
                    b"\xff" + bytes([0xD0 + ((mcu // dri - 1) % 8)])
                )
                wtr, pred = _Writer(), 0
            block = (
                pix[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float)
                - 128
            )
            pred = _emit_block(wtr, block, qnat, pred, dctab, actab)
            mcu += 1
    chunks.append(wtr.flush())
    out += b"".join(chunks)
    out += b"\xff\xd9"
    return bytes(out), qnat


def encode_color(y, cb, cr, sampling="420"):
    """3-component YCbCr baseline JPEG, quant=1. sampling: '444' (all
    planes full-size) or '420' (chroma planes half-size each way;
    dimensions multiples of 16)."""
    import struct

    h, w_ = y.shape
    qnat = np.ones((8, 8), int)
    dctab = _canonical(DC_BITS, DC_VALS)
    actab = _canonical(AC_BITS, AC_VALS)
    y_hv = 0x22 if sampling == "420" else 0x11
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += _seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w_)
        + bytes([3, 1, y_hv, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    wtr = _Writer()
    preds = [0, 0, 0]

    def emit(plane, bx, by, ci):
        block = (
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float)
            - 128
        )
        preds[ci] = _emit_block(wtr, block, qnat, preds[ci], dctab, actab)

    if sampling == "420":
        for mr in range(h // 16):
            for mc in range(w_ // 16):
                for by in range(2):
                    for bx in range(2):
                        emit(y, mc * 2 + bx, mr * 2 + by, 0)
                emit(cb, mc, mr, 1)
                emit(cr, mc, mr, 2)
    else:
        for mr in range(h // 8):
            for mc in range(w_ // 8):
                emit(y, mc, mr, 0)
                emit(cb, mc, mr, 1)
                emit(cr, mc, mr, 2)
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _const_blocks_image(grays):
    """(rows, cols) of gray values → pixel raster of constant blocks."""
    return np.kron(grays, np.ones((8, 8), int)).astype(np.uint8)


class TestJpegGray:
    def test_constant_blocks_exact(self):
        """The oracle row's pixel class: DC-only blocks round-trip a
        lossy codec exactly (all-ones quant table stores 8·(g−128)
        exactly; the IDCT of a lone DC is a constant)."""
        rng = np.random.RandomState(7)
        grays = rng.randint(0, 256, size=(2, 3))
        pix = _const_blocks_image(grays)
        payload, _ = encode_gray(pix)
        dec = _jpeg_pixels(payload)
        assert dec is not None
        w, h, arr = dec
        assert (w, h) == (24, 16)
        for c in range(3):  # grayscale replicates to RGB
            assert (arr[:, :, c] == pix).all()

    def test_ac_path_quant1_bounded(self):
        """Arbitrary pixels at quant=1: the only loss is the forward
        round(DCT) — decode must land within ±2 of the source, which
        pins Huffman AC decode (runs, ZRL, EOB) and the IDCT."""
        rng = np.random.RandomState(11)
        pix = rng.randint(0, 256, size=(16, 24)).astype(np.uint8)
        payload, _ = encode_gray(pix)
        dec = _jpeg_pixels(payload)
        assert dec is not None
        err = np.abs(dec[2][:, :, 0].astype(int) - pix.astype(int)).max()
        assert err <= 2, err

    def test_real_quant_table_matches_independent_idct(self):
        """With a non-trivial quant table the decode is lossy, so the
        check replays dequant + IDCT INDEPENDENTLY (double-loop cosine
        sum, different summation order than the decoder's einsum) from
        the encoder's own quantized coefficients."""
        rng = np.random.RandomState(13)
        pix = rng.randint(0, 256, size=(8, 16)).astype(np.uint8)
        # a non-flat table in the spirit of Annex K luminance
        qtable = (np.arange(64) % 7 + 2).tolist()
        payload, qnat = encode_gray(pix, qtable=qtable)
        dec = _jpeg_pixels(payload)
        assert dec is not None

        def idct_ref(coef):
            out = np.zeros((8, 8))
            for x in range(8):
                for yy in range(8):
                    s = 0.0
                    for u in range(8):
                        for v in range(8):
                            au = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
                            av = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
                            s += (
                                au
                                * av
                                * coef[u, v]
                                * np.cos((2 * x + 1) * u * np.pi / 16)
                                * np.cos((2 * yy + 1) * v * np.pi / 16)
                            )
                    out[x, yy] = s
            return out

        expected = np.zeros((8, 16), int)
        for bx in range(2):
            block = pix[:, bx * 8 : bx * 8 + 8].astype(float) - 128
            qc = np.round(_dct2(block) / qnat)
            rec = idct_ref(qc * qnat)
            expected[:, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(rec) + 128, 0, 255
            )
        err = np.abs(dec[2][:, :, 0].astype(int) - expected).max()
        assert err <= 1, err

    def test_restart_interval_and_stuffing(self):
        """DRI/RSTn: predictors reset per restart segment and the byte
        de-stuffing is exercised — pixels must equal the no-DRI encode
        of the same source."""
        rng = np.random.RandomState(17)
        pix = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
        plain, _ = encode_gray(pix)
        restarted, _ = encode_gray(pix, dri=1)
        a, b = _jpeg_pixels(plain), _jpeg_pixels(restarted)
        assert a is not None and b is not None
        assert (a[2] == b[2]).all()
        assert b"\xff\xd0" in restarted or b"\xff\xd1" in restarted

    def test_non_multiple_of_8_dimensions_cropped(self):
        """A 10×12 image is coded as 2×2 blocks and cropped back: the
        decoder must return the SOF dimensions, not the MCU grid."""
        grays = np.array([[40, 200], [90, 150]])
        pix = _const_blocks_image(grays)
        payload, _ = encode_gray(pix)
        # rewrite SOF dims to 12 wide × 10 high (crop, keep MCU grid)
        import struct

        i = payload.index(b"\xff\xc0")
        patched = (
            payload[: i + 5]
            + struct.pack(">HH", 10, 12)
            + payload[i + 9 :]
        )
        dec = _jpeg_pixels(patched)
        assert dec is not None
        w, h, arr = dec
        assert (w, h) == (12, 10)
        assert arr.shape == (10, 12, 3)
        assert (arr[:8, :8, 0] == 40).all()
        assert (arr[:8, 8:, 0] == 200).all()
        assert (arr[8:, :8, 0] == 90).all()


class TestJpegColor:
    def _const_mcu_planes(self, rng, h, w_):
        yv = rng.randint(0, 256, (h // 16, w_ // 16))
        cbv = rng.randint(0, 256, (h // 16, w_ // 16))
        crv = rng.randint(0, 256, (h // 16, w_ // 16))
        y = np.kron(yv, np.ones((16, 16), int)).astype(np.uint8)
        cb = np.kron(cbv, np.ones((8, 8), int)).astype(np.uint8)
        cr = np.kron(crv, np.ones((8, 8), int)).astype(np.uint8)
        return y, cb, cr

    @staticmethod
    def _jfif_rgb(y, cb, cr):
        yf, cbf, crf = (p.astype(float) for p in (y, cb, cr))
        return np.clip(
            np.round(
                np.stack(
                    [
                        yf + 1.402 * (crf - 128),
                        yf
                        - 0.344136 * (cbf - 128)
                        - 0.714136 * (crf - 128),
                        yf + 1.772 * (cbf - 128),
                    ],
                    axis=-1,
                )
            ),
            0,
            255,
        ).astype(np.uint8)

    def test_420_subsampling_exact_on_constant_mcus(self):
        rng = np.random.RandomState(19)
        y, cb, cr = self._const_mcu_planes(rng, 16, 32)
        payload = encode_color(y, cb, cr, sampling="420")
        assert _parse_jpeg(payload) == (32, 16, "RGB")
        dec = _jpeg_pixels(payload)
        assert dec is not None
        exp = self._jfif_rgb(
            y, cb.repeat(2, 0).repeat(2, 1), cr.repeat(2, 0).repeat(2, 1)
        )
        assert (dec[2] == exp).all()

    def test_444_exact_on_constant_blocks(self):
        rng = np.random.RandomState(23)
        vals = [rng.randint(0, 256, (2, 2)) for _ in range(3)]
        y, cb, cr = (_const_blocks_image(v) for v in vals)
        payload = encode_color(y, cb, cr, sampling="444")
        dec = _jpeg_pixels(payload)
        assert dec is not None
        assert (dec[2] == self._jfif_rgb(y, cb, cr)).all()


class TestJpegHonestNone:
    def _payload(self):
        pix = _const_blocks_image(np.array([[100]]))
        return encode_gray(pix)[0]

    def test_sof2_with_invalid_scan_script_returns_none(self):
        """Progressive DECODES since r14 (tests/test_jpeg_progressive
        pins it), so flipping a baseline file's SOF0 to SOF2 now means:
        metadata still reports dimensions, but the baseline-style scan
        (Ss=0, Se=63 — illegal for progressive, where DC scans need
        Se=0) must return honest None, not garbage pixels."""
        p = self._payload().replace(b"\xff\xc0", b"\xff\xc2", 1)
        assert _jpeg_pixels(p) is None
        assert _parse_jpeg(p) == (8, 8, "L")

    def test_arithmetic_rejected(self):
        p = self._payload().replace(b"\xff\xc0", b"\xff\xc9", 1)
        assert _jpeg_pixels(p) is None

    def test_16bit_quant_table_rejected(self):
        p = self._payload()
        i = p.index(b"\xff\xdb")
        p = p[: i + 4] + bytes([0x10]) + p[i + 5 :]  # Pq=1
        assert _jpeg_pixels(p) is None

    def test_truncated_and_garbage(self):
        p = self._payload()
        assert _jpeg_pixels(p[:20]) is None
        assert _jpeg_pixels(p[: len(p) - 2]) is not None  # EOI optional
        assert _jpeg_pixels(b"\xff\xd8\xff") is None
        assert _jpeg_pixels(b"definitely not a jpeg") is None
        assert _parse_jpeg(b"") is None

    def test_missing_huffman_table_rejected(self):
        p = self._payload()
        i = p.index(b"\xff\xc4")  # excise the DC DHT segment
        import struct

        ln = struct.unpack_from(">H", p, i + 2)[0]
        assert _jpeg_pixels(p[:i] + p[i + 2 + ln :]) is None

    def test_entropy_exhaustion_rejected(self):
        """SOF claims more blocks than the entropy data encodes."""
        p = self._payload()  # 8×8, one block
        import struct

        i = p.index(b"\xff\xc0")
        p = p[: i + 5] + struct.pack(">HH", 64, 64) + p[i + 9 :]
        assert _jpeg_pixels(p) is None


class TestJpegSparkIntegration:
    def test_luma_hist_kind_is_luma(self, spark):
        """decode_pixels must route JPEG payloads to the real decoder:
        the feature kernel labels the row kind='luma' and the histogram
        is the known constant-block answer."""
        from lotad_spark.pipeline.multimodal import extract_feature_counts

        grays = np.array([[10, 200, 100]])
        payload, _ = encode_gray(_const_blocks_image(grays))
        df = spark.createDataFrame(
            [(1, payload)], "media_id long, content binary"
        )
        rows = extract_feature_counts(df, kind="luma").collect()
        assert rows[0].kind == "luma"
        hist = rows[0].hist
        # luma of gray g is exactly g; bins g*16//256 → 0, 12, 6
        assert hist[0] == 64 and hist[12] == 64 and hist[6] == 64
        assert sum(hist) == 3 * 64

    def test_metadata_kernel_reports_jpeg(self, spark):
        from lotad_spark.pipeline.multimodal import with_decoded_metadata

        payload, _ = encode_gray(
            _const_blocks_image(np.array([[1, 2], [3, 4]]))
        )
        df = spark.createDataFrame(
            [(1, payload)], "media_id long, content binary"
        )
        got = with_decoded_metadata(df).collect()[0]
        assert (got.width, got.height, got.mode) == (16, 16, "L")

    def test_decode_pixels_front_door(self):
        payload, _ = encode_gray(_const_blocks_image(np.array([[77]])))
        dec = decode_pixels(payload)
        assert dec is not None and dec[:2] == (8, 8)
        assert (dec[2] == 77).all()
