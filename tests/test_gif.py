"""GIF decoder tests (pipeline/multimodal.py _gif_pixels).

The test-side ENCODER below is a real greedy-longest-match GIF LZW
compressor with its own width schedule bookkeeping — independent of the
decoder's table walk — so a decode that inverts it exercises the actual
format: variable 3-12 bit codes, table growth across width boundaries,
the KwKwK (code == next_code) case, the 4096-entry reset, interlaced
row storage, global vs local color tables, and sub-block framing.
The KwKwK case is additionally pinned by a HAND-BUILT code sequence
(the spec's pathological pattern), not just fuzz.
"""

import struct

import numpy as np
import pytest

from lotad_spark.pipeline.multimodal import (
    _gif_lzw_decode,
    _gif_pixels,
    _parse_gif,
    decode_pixels,
)

_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _pack_codes(codes, min_code):
    """LSB-first bit packing, tracking the decoder's width schedule."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code + 1
    nxt = eoi + 1
    first = True
    for c in codes:
        assert c < (1 << width), (c, width)
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c == clear:
            width = min_code + 1
            nxt = eoi + 1
            first = True
        elif c == eoi:
            pass
        elif first:
            first = False
        elif nxt < 4096:
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_encode(data: bytes, min_code: int = 8) -> bytes:
    """Greedy longest-match GIF LZW with mid-stream clears at table
    exhaustion — a REAL compressor, not a literal-only emitter."""
    clear = 1 << min_code
    eoi = clear + 1
    d = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    codes = [clear]
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in d:
            w = wc
        else:
            codes.append(d[w])
            if nxt < 4096:
                d[wc] = nxt
                nxt += 1
            else:
                codes.append(clear)
                d = {bytes([i]): i for i in range(clear)}
                nxt = eoi + 1
            w = bytes([b])
    if w:
        codes.append(d[w])
    codes.append(eoi)
    return _pack_codes(codes, min_code)


def gif_encode(
    pix: np.ndarray,
    *,
    interlaced: bool = False,
    gray_palette: bool = True,
    local_table: bool = False,
    extension: bool = True,
    palette: bytes | None = None,
    more_frames: list | None = None,
    frame_offsets: list | None = None,
    transparent_frames: set | None = None,
) -> bytes:
    frames = [pix] + list(more_frames or [])
    h, w = pix.shape
    if palette is None:
        palette = bytes(v for i in range(256) for v in ((i, i, i) if gray_palette else (i, 255 - i, i ^ 0x55)))
    lsd_flags = 0x00 if local_table else 0xF7  # global table, 256 entries
    out = bytearray(b"GIF89a" + struct.pack("<HH", w, h) + bytes([lsd_flags, 0, 0]))
    if not local_table:
        out += palette
    for fi, fpix in enumerate(frames):
        fh, fw = fpix.shape
        left, top = (frame_offsets or {}).get(fi, (0, 0)) if isinstance(frame_offsets, dict) else (0, 0)
        if extension:  # a GCE the block walk must parse/skip per frame
            tbit = 0x01 if fi in (transparent_frames or set()) else 0x00
            out += bytes([0x21, 0xF9, 0x04, tbit, 0x0A, 0x00, 0x00, 0x00])
        id_flags = (0x80 | 0x07 if local_table else 0) | (0x40 if interlaced else 0)
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh) + bytes([id_flags])
        if local_table:
            out += palette
        epix = fpix
        if interlaced:
            order = [y for s, st in _PASSES for y in range(s, fh, st)]
            epix = fpix[order]
        stream = lzw_encode(bytes(epix.reshape(-1)))
        out.append(8)  # min code size
        for i in range(0, len(stream), 255):
            ch = stream[i : i + 255]
            out.append(len(ch))
            out += ch
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


class TestLzw:
    def test_kwkwk_hand_fixture(self):
        # min_code=2: clear=4, eoi=5. codes [clear, 1, 6]: 6 == next
        # code -> entry = prev + prev[0] = 1,1 -> output 1,1,1.
        stream = _pack_codes([4, 1, 6], 2)
        assert _gif_lzw_decode(stream, 2, 3) == bytes([1, 1, 1])

    def test_first_code_must_be_root(self):
        assert _gif_lzw_decode(_pack_codes([4, 6], 2), 2, 2) is None

    def test_code_beyond_next_rejected(self):
        assert _gif_lzw_decode(_pack_codes([4, 1, 7], 2), 2, 4) is None

    def test_eoi_before_npix_is_truncation(self):
        assert _gif_lzw_decode(_pack_codes([4, 1, 5], 2), 2, 9) is None

    @pytest.mark.parametrize("style", ["random", "lowcard", "cycle", "run"])
    def test_roundtrip_fuzz(self, style):
        rng = np.random.RandomState(hash(style) % 2**31)
        for n in (1, 13, 700, 6000):
            if style == "random":
                data = bytes(rng.randint(0, 256, n).astype(np.uint8))
            elif style == "lowcard":
                data = bytes(rng.randint(0, 4, n).astype(np.uint8))
            elif style == "cycle":
                data = bytes(np.tile(np.arange(17, dtype=np.uint8), n // 17 + 1)[:n])
            else:
                data = bytes([7]) * n
            assert _gif_lzw_decode(lzw_encode(data), 8, n) == data

    def test_4096_reset_roundtrip(self):
        rng = np.random.RandomState(3)
        data = bytes(rng.randint(0, 256, 12000).astype(np.uint8))
        assert _gif_lzw_decode(lzw_encode(data), 8, len(data)) == data


class TestGifPixels:
    def test_roundtrip_plain_and_interlaced(self):
        rng = np.random.RandomState(5)
        for w, h in [(1, 1), (7, 3), (16, 9), (40, 11)]:
            for inter in (False, True):
                pix = rng.randint(0, 256, (h, w)).astype(np.uint8)
                got = _gif_pixels(gif_encode(pix, interlaced=inter))
                assert got is not None
                gw, gh, arr = got
                assert (gw, gh) == (w, h)
                assert (arr == np.stack([pix] * 3, -1)).all(), (w, h, inter)

    def test_interlace_is_positional_not_just_multiset(self):
        # rows are distinct constants: a wrong deinterlace permutation
        # yields the same histogram but different rows — pin positions.
        pix = np.arange(9, dtype=np.uint8).repeat(4).reshape(9, 4)
        _, _, arr = _gif_pixels(gif_encode(pix, interlaced=True))
        assert (arr[:, :, 0] == pix).all()

    def test_color_palette_and_local_table(self):
        pix = np.array([[0, 1], [2, 254]], dtype=np.uint8)
        for local in (False, True):
            _, _, arr = _gif_pixels(
                gif_encode(pix, gray_palette=False, local_table=local)
            )
            want = np.stack(
                [pix, 255 - pix, pix ^ 0x55], axis=-1
            )
            assert (arr == want).all(), local

    def test_metadata_parse(self):
        pix = np.zeros((3, 5), dtype=np.uint8)
        payload = gif_encode(pix)
        assert _parse_gif(payload) == (5, 3, "P")
        assert _parse_gif(b"GIF89a" + b"\x00" * 3) is None
        assert _parse_gif(b"JIF89a" + b"\x00" * 10) is None

    def test_decode_pixels_dispatch(self):
        pix = np.array([[9, 200, 30]], dtype=np.uint8)
        w, h, arr = decode_pixels(gif_encode(pix))
        assert (w, h) == (3, 1) and (arr[:, :, 1] == pix).all()

    def test_honest_none(self):
        pix = np.arange(12, dtype=np.uint8).reshape(3, 4)
        full = gif_encode(pix)
        assert _gif_pixels(full[:40]) is None  # truncated mid-palette
        assert _gif_pixels(full[:-20]) is None  # truncated pixel data
        # no color table anywhere
        naked = (
            b"GIF89a" + struct.pack("<HH", 4, 3) + bytes([0, 0, 0])
            + b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 3) + b"\x00"
        )
        assert _gif_pixels(naked) is None
        # index beyond a 4-entry local table
        small_pal = gif_encode(pix % 4, local_table=True)
        # shrink the local table to 4 entries by rewriting flags+table:
        # rebuild manually instead — flags 0x81 => 2<<1 = 4 entries
        hdr = b"GIF89a" + struct.pack("<HH", 4, 3) + bytes([0, 0, 0])
        idesc = b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 3) + bytes([0x81])
        pal4 = bytes(v for i in range(4) for v in (i, i, i))
        stream = lzw_encode(bytes((pix % 4 + 2).reshape(-1)))  # index 5 > 3
        body = bytearray([8])
        for i in range(0, len(stream), 255):
            body.append(len(stream[i : i + 255]))
            body += stream[i : i + 255]
        body.append(0)
        assert _gif_pixels(hdr + idesc + pal4 + bytes(body) + b"\x3b") is None
        assert _gif_pixels(small_pal) is not None  # sanity: valid twin decodes

    def test_subrect_frame_decodes_at_own_dims(self):
        pix = np.array([[1, 2], [3, 4]], dtype=np.uint8)
        payload = bytearray(gif_encode(pix))
        struct.pack_into("<HH", payload, 6, 10, 10)  # logical screen 10x10
        got = _gif_pixels(bytes(payload))
        assert got is not None and got[0] == 2 and got[1] == 2


class TestGifOnSpark:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rng = np.random.RandomState(17)
        rows = []
        for i in range(24):
            w, h = i % 5 + 2, i % 3 + 1
            pix = rng.randint(0, 256, (h, w)).astype(np.uint8)
            rows.append(
                (i, bytes(pix.reshape(-1)), w, h,
                 gif_encode(pix, interlaced=bool(i % 2)))
            )
        df = spark.createDataFrame(
            rows,
            "media_id bigint, raw binary, w int, h int, content binary",
        )
        return rows, df

    def test_metadata_kernel(self, spark, media):
        from lotad_spark.pipeline.multimodal import with_decoded_metadata

        rows, df = media
        got = {
            r.media_id: (r.width, r.height, r.mode)
            for r in with_decoded_metadata(df.select("media_id", "content")).collect()
        }
        for i, _raw, w, h, _p in rows:
            assert got[i] == (w, h, "P")

    def test_luma_hist_runs_real_pixels(self, spark, media):
        from lotad_spark.pipeline.multimodal import extract_feature_counts

        rows, df = media
        got = {
            r.media_id: (r.kind, list(r.hist))
            for r in extract_feature_counts(
                df.select("media_id", "content"), kind="luma"
            ).collect()
        }
        for i, raw, _w, _h, _p in rows:
            want = [0] * 16
            for g in raw:  # gray palette: luma of (g,g,g) is exactly g
                want[g * 16 // 256] += 1
            assert got[i] == ("luma", want), i

    def test_resize_positional_on_interlaced(self, spark, media):
        from lotad_spark.pipeline.multimodal import (
            extract_feature_counts,
            resize_images,
        )

        rows, df = media
        resized = resize_images(df.select("media_id", "content"), width=4, height=2)
        kinds = {r.media_id: r.resize_kind for r in resized.collect()}
        assert set(kinds.values()) == {"pixel"}
        got = {
            r.media_id: list(r.hist)
            for r in extract_feature_counts(resized, kind="luma").collect()
        }
        for i, raw, w, h, _p in rows:
            pix = np.frombuffer(raw, np.uint8).reshape(h, w)
            want = [0] * 16
            for y in range(2):
                for x in range(4):
                    g = int(pix[y * h // 2, x * w // 4])
                    want[g * 16 // 256] += 1
            assert got[i] == want, i

    def test_corrupt_gif_falls_back_loudly(self, spark):
        from lotad_spark.pipeline.multimodal import extract_feature_counts

        df = spark.createDataFrame(
            [(1, b"GIF89a" + b"\x99" * 30)], "media_id bigint, content binary"
        )
        row = extract_feature_counts(df, kind="luma").collect()[0]
        assert row.kind == "bytes"


class TestAnimatedGifVideo:
    """Animated GIF through the video tier: full-canvas opaque frames
    decode as a frame list; sub-rect or transparent frames make the
    whole payload honest-None (compositing is a renderer's job)."""

    def test_frames_roundtrip_and_every_nth(self):
        from lotad_spark.pipeline.multimodal import decode_video_frames

        rng = np.random.RandomState(31)
        frames = [rng.randint(0, 256, (4, 6)).astype(np.uint8) for _ in range(5)]
        payload = gif_encode(frames[0], more_frames=frames[1:])
        got = decode_video_frames(payload)
        assert got is not None
        w, h, n, out = got
        assert (w, h, n) == (6, 4, 5) and len(out) == 5
        for want, arr in zip(frames, out):
            assert (arr[:, :, 0] == want).all()
        w2, h2, n2, out2 = decode_video_frames(payload, every_nth=2)
        assert n2 == 5 and len(out2) == 3
        assert (out2[1][:, :, 0] == frames[2]).all()

    def test_interlaced_animation(self):
        from lotad_spark.pipeline.multimodal import decode_video_frames

        rng = np.random.RandomState(37)
        frames = [rng.randint(0, 256, (9, 3)).astype(np.uint8) for _ in range(3)]
        got = decode_video_frames(
            gif_encode(frames[0], more_frames=frames[1:], interlaced=True)
        )
        assert got is not None and got[2] == 3
        for want, arr in zip(frames, got[3]):
            assert (arr[:, :, 0] == want).all()

    def test_subrect_frame_refused(self):
        from lotad_spark.pipeline.multimodal import decode_video_frames

        a = np.zeros((4, 6), dtype=np.uint8)
        b = np.zeros((2, 3), dtype=np.uint8)  # sub-rect second frame
        payload = gif_encode(a, more_frames=[b])
        assert decode_video_frames(payload) is None

    def test_transparent_frame_refused_for_video_but_first_frame_decodes(self):
        from lotad_spark.pipeline.multimodal import (
            _gif_pixels,
            decode_video_frames,
        )

        a = np.arange(12, dtype=np.uint8).reshape(3, 4)
        b = (a + 1) % 256
        payload = gif_encode(a, more_frames=[b], transparent_frames={1})
        assert decode_video_frames(payload) is None
        # the still-image face keeps its documented palette-color rule
        assert (_gif_pixels(payload)[2][:, :, 0] == a).all()

    def test_scene_cuts_on_animated_gif(self, spark):
        from lotad_spark.pipeline.multimodal import scene_cuts

        rng = np.random.RandomState(41)
        # two repeated scenes: frames 0-2 identical, 3-5 very different
        s1 = rng.randint(0, 40, (16, 16)).astype(np.uint8)
        s2 = 255 - s1
        payload = gif_encode(s1, more_frames=[s1, s1, s2, s2, s2])
        df = spark.createDataFrame(
            [(1, payload)], "media_id bigint, content binary"
        )
        rows = scene_cuts(df).collect()
        kinds = {r.media_id: r.kind for r in rows}
        assert kinds[1] != "bytes"  # the real video path ran


class TestDecoderCrashRobustness:
    """A corrupt image/audio/video payload in a 100 TB corpus must
    never kill the job: every decoder returns honest None (or the
    labeled fallback) on truncations, byte flips, and garbage — it
    never raises. Sweep every truncation point of one valid payload
    per family plus randomized flips and pure garbage."""

    def _payloads(self):
        import struct
        import zlib

        rng = np.random.RandomState(99)
        pix = rng.randint(0, 256, (3, 4)).astype(np.uint8)

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        out = {
            "gif": gif_encode(pix),
            "gif_anim": gif_encode(pix, more_frames=[pix, pix]),
            "ppm": b"P6\n4 3\n255\n"
            + bytes(rng.randint(0, 256, 36).astype(np.uint8)),
        }
        raw = bytes(rng.randint(0, 256, 36).astype(np.uint8))
        s = bytearray()
        for y in range(3):
            s.append(0)
            s.extend(raw[y * 12 : (y + 1) * 12])
        out["png"] = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(s)))
            + chunk(b"IEND", b"")
        )
        rows = b"".join(
            bytes(rng.randint(0, 256, 12).astype(np.uint8)) for _ in range(3)
        )
        out["bmp"] = (
            b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
            + struct.pack(
                "<IiiHHIIiiII", 40, 4, 3, 1, 24, 0, len(rows), 0, 0, 0, 0
            )
            + rows
        )
        data = bytes(rng.randint(0, 256, 32).astype(np.uint8))
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        out["wav"] = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        # progressive JPEG (r14): the multi-scan decoder joins the sweep
        import test_jpeg_progressive as tjp

        coefs = tjp._gen_coefs(rng, tjp.GRAY, 16, 16, density=0.2)
        out["jpeg_prog"] = tjp.encode_progressive(
            tjp.GRAY, coefs, 16, 16,
            [([0], 0, 0, 0, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 0, 0)],
            {0: bytes([1] * 64)},
        )
        # r15 parsers join the sweep: WebP (every encoder class), PDF
        # (every writer variant), EXIF (every carrying container)
        import __spark_entry__ as entry

        body = bytes(rng.randint(0, 256, 24).astype(np.uint8))
        for cls in range(5):
            out[f"webp_c{cls}"] = entry._wp_encode_fixture(body, 6, 4, cls)
        for v in range(6):  # r16: LZW and predictor writer variants join
            out[f"pdf_v{v}"] = entry._pdf_fixture("fuzz target (text)", v)
        for v in range(4):
            out[f"exif_c{v}"] = entry._exif_container(v)
        # r17 parsers join: MP4 (with and without the ilst splice),
        # MPEG audio with ID3 variants, the tag-carrying fixtures
        out["mp4_plain"] = entry._mp4_payload(7)
        out["mp4_ilst"] = entry._video_tags_fixture(2)
        out["mp3_id3v2"] = entry._mp3_payload(11)
        out["mp3_id3v1"] = entry._audio_tags_fixture(9)
        out["wav_info"] = entry._audio_tags_fixture(4)
        out["svg"] = (
            b'<?xml version="1.0"?>\n<svg xmlns="http://www.w3.org/'
            b'2000/svg" width="12" height="9"><rect/></svg>'
        )
        return out

    def test_never_raises(self):
        from lotad_spark.pipeline.multimodal import (
            _headers_decode,
            classify_decode_tier,
            decode_audio,
            decode_pixels,
            decode_video_frames,
            exif_metadata,
        )
        from lotad_spark.pipeline.pdf import pdf_text_pages

        rng = np.random.RandomState(7)
        from lotad_spark.pipeline.multimodal import (
            _mp3_scan,
            _mp4_parse,
            audio_fingerprint_payload,
            audio_tags_payload,
            exif_gps,
            image_provenance,
            mp4_tags_payload,
        )

        fns = (decode_pixels, decode_audio, decode_video_frames,
               _headers_decode, exif_metadata, pdf_text_pages,
               classify_decode_tier, exif_gps, image_provenance,
               _mp4_parse, _mp3_scan, audio_tags_payload,
               mp4_tags_payload, audio_fingerprint_payload)
        for name, p in self._payloads().items():
            for k in range(len(p)):  # every truncation point
                t = p[:k]
                for fn in fns:
                    fn(t)  # must not raise
            for _ in range(40):  # random byte flips
                b = bytearray(p)
                for _ in range(rng.randint(1, 6)):
                    b[rng.randint(0, len(b))] = rng.randint(0, 256)
                for fn in fns:
                    fn(bytes(b))
        for _ in range(150):  # pure garbage
            t = bytes(rng.randint(0, 256, rng.randint(0, 300)).astype(np.uint8))
            for fn in fns:
                fn(t)
