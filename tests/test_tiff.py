"""Baseline-TIFF decoder tests (pipeline/multimodal.py _tiff_pixels).

The test-side encoder below writes both byte orders, inline AND
offset-stored IFD values, any RowsPerStrip split, and the WhiteIsZero
photometric — independent layout decisions, so a decode that inverts
it exercises the real TIFF 6.0 baseline, not a shared implementation.
"""

import struct

import numpy as np

from lotad_spark.pipeline.multimodal import (
    _parse_tiff,
    _tiff_pixels,
    decode_pixels,
)


def tiff_encode(
    arr: np.ndarray,
    *,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    white_is_zero: bool = False,
) -> bytes:
    bo = ">" if big_endian else "<"
    if arr.ndim == 2:
        h, w = arr.shape
        spp = 1
        photo = 0 if white_is_zero else 1
        data = (
            (255 - arr.astype(np.int16)).astype(np.uint8)
            if white_is_zero
            else arr
        )
    else:
        h, w, spp = arr.shape
        photo = 2
        data = arr
    rps = rows_per_strip or h
    strips = [
        bytes(data[y0 : y0 + rps].reshape(-1)) for y0 in range(0, h, rps)
    ]
    entries = [
        (256, 4, 1, [w]),
        (257, 4, 1, [h]),
        (258, 3, spp, [8] * spp),
        (259, 3, 1, [1]),
        (262, 3, 1, [photo]),
        (273, 4, len(strips), None),  # strip offsets, filled below
        (277, 3, 1, [spp]),
        (278, 4, 1, [rps]),
        (279, 4, len(strips), [len(s) for s in strips]),
    ]
    fmts = {3: "H", 4: "I"}
    sizes = {3: 2, 4: 4}
    ifd_off = 8
    extra_off = ifd_off + 2 + len(entries) * 12 + 4
    extra_len = sum(
        sizes[t] * c for _tag, t, c, _v in entries if sizes[t] * c > 4
    )
    pos = extra_off + extra_len
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = bytearray()
    body = b""
    for tag, typ, cnt, vals in entries:
        if vals is None:
            vals = strip_offsets
        e = struct.pack(bo + "HHI", tag, typ, cnt)
        if sizes[typ] * cnt > 4:
            e += struct.pack(bo + "I", extra_off + len(extra))
            extra += struct.pack(bo + fmts[typ] * cnt, *vals)
        else:
            packed = struct.pack(bo + fmts[typ] * cnt, *vals)
            e += packed + b"\x00" * (4 - len(packed))
        body += e
    return (
        (b"MM" if big_endian else b"II")
        + struct.pack(bo + "HI", 42, ifd_off)
        + struct.pack(bo + "H", len(entries))
        + body
        + struct.pack(bo + "I", 0)
        + bytes(extra)
        + b"".join(strips)
    )


class TestTiffPixels:
    def test_roundtrip_matrix(self):
        rng = np.random.RandomState(55)
        for w, h in [(1, 1), (5, 3), (9, 7)]:
            for be in (False, True):
                for rps in (None, 2):
                    g = rng.randint(0, 256, (h, w)).astype(np.uint8)
                    got = _tiff_pixels(
                        tiff_encode(g, big_endian=be, rows_per_strip=rps)
                    )
                    assert got and (got[0], got[1]) == (w, h)
                    assert (got[2][:, :, 0] == g).all(), (w, h, be, rps)
                    rgb = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                    got2 = _tiff_pixels(
                        tiff_encode(rgb, big_endian=be, rows_per_strip=rps)
                    )
                    assert got2 and (got2[2] == rgb).all(), (w, h, be, rps)

    def test_white_is_zero_inverts(self):
        g = np.array([[0, 128, 255]], dtype=np.uint8)
        got = _tiff_pixels(tiff_encode(g, white_is_zero=True))
        assert (got[2][:, :, 0] == g).all()  # encoder stored 255-g
        assert _parse_tiff(tiff_encode(g, white_is_zero=True)) == (3, 1, "L")

    def test_dispatch_and_metadata(self):
        g = np.arange(6, dtype=np.uint8).reshape(2, 3)
        p = tiff_encode(g)
        assert decode_pixels(p)[2].shape == (2, 3, 3)
        assert _parse_tiff(p) == (3, 2, "L")
        assert _parse_tiff(b"II*\x00") is None
        assert _parse_tiff(b"ZZ" + b"\x00" * 10) is None

    def test_honest_none(self):
        g = np.zeros((3, 4), dtype=np.uint8)
        full = bytearray(tiff_encode(g))
        for k in range(len(full)):  # every truncation point
            assert _tiff_pixels(bytes(full[:k])) is None
        # compression != 1: find the 259 entry and flip its value
        p = bytearray(tiff_encode(g))
        n = struct.unpack_from("<H", p, 8)[0]
        for e in range(n):
            base = 10 + e * 12
            if struct.unpack_from("<H", p, base)[0] == 259:
                struct.pack_into("<H", p, base + 8, 5)  # LZW
        assert _tiff_pixels(bytes(p)) is None
        # 16-bit depth refused
        p = bytearray(tiff_encode(g))
        for e in range(n):
            base = 10 + e * 12
            if struct.unpack_from("<H", p, base)[0] == 258:
                struct.pack_into("<H", p, base + 8, 16)
        assert _tiff_pixels(bytes(p)) is None
