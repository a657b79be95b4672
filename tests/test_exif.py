"""EXIF extraction tests (pipeline/multimodal.py exif_metadata).

Hand-assembled TIFF-structured blocks (independent of the entry
fixture writer) cover field layouts, and each carrying container is
built by hand: JPEG APP1 behind other APP segments, bare TIFF, WebP
EXIF chunk with/without the Exif\\0\\0 prefix, PNG eXIf."""

import struct
import zlib

from lotad_spark.pipeline.multimodal import (
    _exif_tags,
    exif_metadata,
    extract_exif,
)


def tiff_blob(entries_ifd0, entries_exif=None, bo="<", extra=b""):
    """Hand IFD assembly: entries are (tag, typ, cnt, raw4) tuples laid
    out verbatim; `extra` appends after both IFDs (callers compute
    their own offsets)."""
    n0 = len(entries_ifd0) + (1 if entries_exif is not None else 0)
    ifd0_off = 8
    exif_off = ifd0_off + 2 + n0 * 12 + 4

    def pack(entries):
        out = struct.pack(bo + "H", len(entries))
        for tag, typ, cnt, raw4 in entries:
            out += struct.pack(bo + "HHI", tag, typ, cnt) + raw4
        return out + struct.pack(bo + "I", 0)

    e0 = list(entries_ifd0)
    if entries_exif is not None:
        e0.append((34665, 4, 1, struct.pack(bo + "I", exif_off)))
        e0.sort(key=lambda e: e[0])
    body = pack(e0)
    if entries_exif is not None:
        body += pack(entries_exif)
    return (
        (b"II" if bo == "<" else b"MM")
        + struct.pack(bo + "HI", 42, ifd0_off)
        + body
        + extra
    )


def orientation_only(value, bo="<"):
    return tiff_blob(
        [(274, 3, 1, struct.pack(bo + "H", value) + b"\x00\x00")], bo=bo
    )


class TestBlockParsing:
    def test_orientation_both_byte_orders(self):
        for bo in ("<", ">"):
            assert exif_metadata(orientation_only(6, bo)) == (
                6, None, None, None, None, None,
            )

    def test_out_of_range_orientation_nulled(self):
        got = exif_metadata(orientation_only(9))
        assert got == (None, None, None, None, None, None)

    def test_inline_and_offset_ascii(self):
        # inline "ab\0" (3 bytes) and offset-stored "longcamera\0"
        make = b"longcamera\x00"
        # offsets: header 8 + ifd0 (2 + 2*12 + 4) = 38
        blob = tiff_blob(
            [
                (271, 2, len(make), struct.pack("<I", 38)),
                (272, 2, 3, b"ab\x00\x00"),
            ],
            extra=make,
        )
        assert exif_metadata(blob) == (
            None, "longcamera", "ab", None, None, None,
        )

    def test_exif_subifd_dimensions(self):
        blob = tiff_blob(
            [(274, 3, 1, struct.pack("<H", 3) + b"\x00\x00")],
            entries_exif=[
                (40962, 4, 1, struct.pack("<I", 640)),
                (40963, 4, 1, struct.pack("<I", 480)),
            ],
        )
        assert exif_metadata(blob) == (3, None, None, None, 640, 480)

    def test_datetime_original_fallback(self):
        dt = b"2020:05:06 07:08:09\x00"
        # IFD0 has only the sub-IFD pointer; DateTimeOriginal lives in
        # the sub-IFD at tag 36867. Offsets: 8 + (2+12+4) + (2+12+4) = 44
        blob = tiff_blob(
            [],
            entries_exif=[(36867, 2, len(dt), struct.pack("<I", 44))],
            extra=dt,
        )
        assert exif_metadata(blob) == (
            None, None, None, "2020:05:06 07:08:09", None, None,
        )

    def test_truncated_blob(self):
        blob = orientation_only(5)
        assert exif_metadata(blob[:10]) is None
        assert _exif_tags(b"II*\x00") is None

    def test_bad_magic(self):
        assert _exif_tags(b"II\x2b\x00" + b"\x00" * 8) is None


class TestContainers:
    def test_jpeg_app1_behind_other_segments(self):
        blob = orientation_only(8)
        app0 = b"\xff\xe0" + struct.pack(">H", 6) + b"JFIF"
        app1 = b"Exif\x00\x00" + blob
        payload = (
            b"\xff\xd8" + app0
            + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
            + b"\xff\xd9"
        )
        assert exif_metadata(payload)[0] == 8

    def test_jpeg_without_exif(self):
        app0 = b"\xff\xe0" + struct.pack(">H", 6) + b"JFIF"
        assert exif_metadata(b"\xff\xd8" + app0 + b"\xff\xd9") is None

    def test_webp_chunk_with_and_without_prefix(self):
        blob = orientation_only(2)
        for data in (blob, b"Exif\x00\x00" + blob):
            pad = b"\x00" if len(data) & 1 else b""
            chunk = b"EXIF" + struct.pack("<I", len(data)) + data + pad
            payload = (
                b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
            )
            assert exif_metadata(payload)[0] == 2

    def test_png_exif_chunk(self):
        blob = orientation_only(7)

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
            + chunk(b"eXIf", blob)
            + chunk(b"IEND", b"")
        )
        assert exif_metadata(payload)[0] == 7

    def test_bare_tiff(self):
        assert exif_metadata(orientation_only(4))[0] == 4

    def test_non_media_payloads(self):
        assert exif_metadata(b"not media") is None
        assert exif_metadata(b"") is None


class TestSparkOperator:
    def test_kind_contract(self, spark):
        import __spark_entry__ as entry

        df = spark.createDataFrame(
            [
                (1, bytearray(entry._exif_container(5))),
                (2, bytearray(b"\xff\xd8\xff\xd9")),  # JPEG, no EXIF
                (3, None),
            ],
            "media_id bigint, content binary",
        )
        got = {r.media_id: r for r in extract_exif(df).collect()}
        assert got[1].kind == "exif" and got[1].orientation == 5 % 8 + 1
        assert got[1].make == "Maker0" and got[1].pixel_w == 5 % 6 + 3
        assert got[2].kind == "none" and got[2].orientation is None
        assert got[3].kind == "null"


class TestOrientationNormalizedHashing:
    def test_transform_matches_numpy_reference(self):
        import numpy as np

        from lotad_spark.pipeline.multimodal import _apply_exif_orientation

        rng = np.random.default_rng(5)
        arr = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        ref = {
            1: arr,
            2: np.fliplr(arr),
            3: np.rot90(arr, 2),
            4: np.flipud(arr),
            5: arr.transpose(1, 0, 2),
            6: np.rot90(arr, -1),
            7: np.rot90(np.fliplr(arr), -1),
            8: np.rot90(arr, 1),
        }
        for o, expect in ref.items():
            assert (_apply_exif_orientation(arr, o) == expect).all(), o

    def test_sideways_shot_collapses_to_upright(self, spark):
        """A rotated-storage image with orientation metadata must hash
        equal to its upright twin once normalization is on — and NOT
        without it."""
        import numpy as np
        import struct
        import zlib

        from lotad_spark.pipeline.multimodal import image_hashes

        def gray_png(pix, exif_orientation=None):
            h, w = pix.shape

            def chunk(typ, data):
                return (
                    struct.pack(">I", len(data)) + typ + data
                    + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
                )

            rows = b"".join(
                b"\x00" + bytes(pix[y]) for y in range(h)
            )
            out = b"\x89PNG\r\n\x1a\n" + chunk(
                b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
            )
            if exif_orientation is not None:
                blob = (
                    b"II" + struct.pack("<HI", 42, 8)
                    + struct.pack("<H", 1)
                    + struct.pack("<HHI", 274, 3, 1)
                    + struct.pack("<H", exif_orientation) + b"\x00\x00"
                    + struct.pack("<I", 0)
                )
                out += chunk(b"eXIf", blob)
            return out + chunk(b"IDAT", zlib.compress(rows)) + chunk(
                b"IEND", b""
            )

        rng = np.random.default_rng(9)
        upright = rng.integers(0, 256, (6, 9), dtype=np.uint8)
        # camera stored it rotated 90 CCW; orientation 6 uprights it
        stored = np.rot90(upright[..., None].repeat(3, -1), 1)[..., 0]
        df = spark.createDataFrame(
            [
                (1, bytearray(gray_png(upright))),
                (2, bytearray(gray_png(stored, exif_orientation=6))),
            ],
            "media_id bigint, content binary",
        )
        norm = {
            r.media_id: (r.ahash_hi, r.ahash_lo)
            for r in image_hashes(
                df, normalize_orientation=True
            ).collect()
        }
        raw = {
            r.media_id: (r.ahash_hi, r.ahash_lo)
            for r in image_hashes(df).collect()
        }
        assert norm[1] == norm[2]
        assert raw[1] != raw[2]
        assert raw[1] == norm[1]  # no EXIF -> unchanged


class TestExifGps:
    """exif_gps (r16): DMS micro-degree fold, refs, malformed
    rationals, the no-GPS path."""

    def test_fixture_round_trip(self):
        import __spark_entry__ as entry
        from lotad_spark.pipeline.multimodal import exif_gps

        for did in range(12):
            payload = entry._exif_container(
                did, blob=entry._exif_gps_blob(did)
            )
            lat, lon, alt = exif_gps(payload)
            lat_mag = (
                (did % 90) * 1_000_000
                + ((did % 60) * 1_000_000) // 60
                + (((did % 600) * 10) * 1_000_000) // 360_000
            )
            assert lat == (lat_mag if did % 2 == 0 else -lat_mag), did
            assert (lon < 0) == (did % 3 == 0) or lon == 0, did
            assert (alt <= 0) == (did % 5 == 0) or alt == 0, did

    def test_no_gps_ifd_is_none(self):
        import __spark_entry__ as entry
        from lotad_spark.pipeline.multimodal import exif_gps

        assert exif_gps(entry._exif_container(4)) is None

    def test_zero_denominator_field_is_null(self):
        import struct

        from lotad_spark.pipeline.multimodal import exif_gps

        # hand-build: GPS IFD where the latitude seconds denominator
        # is 0 -> lat None; altitude still parses
        bo = "<"

        def entry_(tag, typ, cnt, val4):
            return struct.pack(bo + "HHI", tag, typ, cnt) + val4

        def u32(v):
            return struct.pack(bo + "I", v)

        def rat(n, d):
            return struct.pack(bo + "II", n, d)

        gps_off = 8 + 2 + 12 + 4
        data_off = gps_off + 2 + 3 * 12 + 4
        ifd0 = struct.pack(bo + "H", 1) + entry_(
            34853, 4, 1, u32(gps_off)
        ) + u32(0)
        gps = struct.pack(bo + "H", 3)
        gps += entry_(1, 2, 2, b"N\x00\x00\x00")
        gps += entry_(2, 5, 3, u32(data_off))
        gps += entry_(6, 5, 1, u32(data_off + 24))
        gps += u32(0)
        data = rat(10, 1) + rat(30, 1) + rat(5, 0) + rat(123, 10)
        blob = b"II" + struct.pack(bo + "HI", 42, 8) + ifd0 + gps + data
        got = exif_gps(blob)
        assert got == (None, None, 12_300)

    def test_spark_operator_kinds(self, spark):
        import __spark_entry__ as entry
        from lotad_spark.pipeline.multimodal import extract_exif_gps

        df = spark.createDataFrame(
            [
                (1, bytearray(entry._exif_container(
                    6, blob=entry._exif_gps_blob(6)))),
                (2, bytearray(entry._exif_container(4))),  # no GPS
                (3, bytearray(b"not media")),
                (4, None),
            ],
            "media_id bigint, content binary",
        )
        got = {r.media_id: r for r in extract_exif_gps(df).collect()}
        assert got[1].kind == "gps" and got[1].lat_micro_deg is not None
        assert got[2].kind == "none" and got[2].lat_micro_deg is None
        assert got[3].kind == "none"
        assert got[4].kind == "null"
