"""Progressive (SOF2) JPEG decode — encoder-independent pins.

A test-local T.81 Annex G encoder (flat canonical Huffman tables, full
spectral selection + successive approximation + restart intervals)
synthesizes streams from KNOWN quantized coefficients; the decoder's
pixels must equal the shared reconstruction (_jpeg_reconstruct) applied
to those ground-truth coefficients. This pins the progressive ENTROPY
machinery — DC point transform / refinement OR, EOB runs, ZRL,
newly-significant insertion, AC correction bits, restart state resets —
independently of any encoder the oracle row uses. Reference decoder
semantics per the public spec (ITU T.81 §G.2) as also documented by
libjpeg's jdphuff.c; both implementations here are original."""

import struct

import numpy as np
import pytest

from lotad_spark.pipeline.multimodal import (
    _JPEG_ZZ,
    _jpeg_pixels,
    _jpeg_progressive_pixels,
    _jpeg_reconstruct,
    _parse_jpeg,
    decode_pixels,
)

DC_LEN, AC_LEN = 5, 9  # flat tables: 16 DC syms @5 bits, 255 AC @9


class _BitWriter:
    def __init__(self):
        self.data = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, ln):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.data.append(self.acc)
                if self.acc == 0xFF:
                    self.data.append(0x00)
                self.acc, self.n = 0, 0

    def align(self):
        while self.n:
            self.put(1, 1)

    def raw_marker(self, m):
        self.align()
        self.data += bytes([0xFF, m])


def _seg(marker, payload):
    return (
        b"\xff"
        + bytes([marker])
        + struct.pack(">H", len(payload) + 2)
        + payload
    )


def _dht_flat():
    dc_bits = bytes([0] * 4 + [16] + [0] * 11)
    dc_vals = bytes(range(16))
    ac_bits = bytes([0] * 8 + [255] + [0] * 7)
    ac_vals = bytes(range(255))
    return _seg(0xC4, bytes([0x00]) + dc_bits + dc_vals) + _seg(
        0xC4, bytes([0x10]) + ac_bits + ac_vals
    )


def encode_progressive(comps_spec, coef_zz, w, h, scans, qts, dri=0):
    """comps_spec: [(cid, hi, vi, tq)]; coef_zz: per-component int
    arrays [by, bx, 64] in ZIGZAG order over the MCU-padded grid;
    qts: {tq: 64 zigzag bytes}; scans: [(comp_indices, Ss, Se, Ah,
    Al)]."""
    hmax = max(c[1] for c in comps_spec)
    vmax = max(c[2] for c in comps_spec)
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    grids = []
    for c in comps_spec:
        cw = -(-(w * c[1]) // hmax)
        ch = -(-(h * c[2]) // vmax)
        grids.append((-(-cw // 8), -(-ch // 8)))
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq in sorted(qts):
        out += _seg(0xDB, bytes([tq]) + qts[tq])
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps_spec)])
    for cid, hi, vi, tq in comps_spec:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xC2, sof)
    out += _dht_flat()
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    for comp_idx, ss, se, ah, al in scans:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            sos += bytes([comps_spec[ci][0], 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += _encode_scan(
            comps_spec, coef_zz, comp_idx, ss, se, ah, al, dri, grids,
            mx, my,
        )
    out += b"\xff\xd9"
    return bytes(out)


def _encode_scan(
    comps_spec, coef_zz, comp_idx, ss, se, ah, al, dri, grids, mx, my
):
    bw = _BitWriter()
    rst = 0

    if ss == 0:
        interleaved = len(comp_idx) > 1
        if interleaved:
            units = mx * my
        else:
            cbx0, cby0 = grids[comp_idx[0]]
            units = cbx0 * cby0
        preds = [0] * len(comp_idx)

        def dc_block(arr, by, bx, oi):
            coef = int(arr[by, bx, 0])
            if ah == 0:
                v = coef >> al  # DC point transform: arithmetic shift
                diff = v - preds[oi]
                preds[oi] = v
                t = abs(diff).bit_length()
                bw.put(t, DC_LEN)
                if t:
                    bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            else:
                bw.put((coef >> al) & 1, 1)

        for unit in range(units):
            if dri and unit and unit % dri == 0:
                bw.raw_marker(0xD0 + rst % 8)
                rst += 1
                preds[:] = [0] * len(comp_idx)
            if interleaved:
                r0, c0 = divmod(unit, mx)
                for oi, ci in enumerate(comp_idx):
                    _cid, hi, vi, _tq = comps_spec[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            dc_block(
                                coef_zz[ci], r0 * vi + by, c0 * hi + bx,
                                oi,
                            )
            else:
                ci = comp_idx[0]
                by, bx = divmod(unit, grids[ci][0])
                dc_block(coef_zz[ci], by, bx, 0)
        bw.align()
        return bytes(bw.data)

    # AC scan: single component (T.81 G.2)
    ci = comp_idx[0]
    arr = coef_zz[ci]
    cbx, cby = grids[ci]
    eobrun = 0
    be_bits = []  # correction bits pending under the EOB run

    def emit_eobrun():
        nonlocal eobrun, be_bits
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            bw.put(nbits << 4, AC_LEN)
            if nbits:
                bw.put(eobrun - (1 << nbits), nbits)
            eobrun = 0
            for b in be_bits:
                bw.put(b, 1)
            be_bits = []

    for unit in range(cbx * cby):
        if dri and unit and unit % dri == 0:
            emit_eobrun()
            bw.raw_marker(0xD0 + rst % 8)
            rst += 1
        block = arr[divmod(unit, cbx)]
        if ah == 0:
            r = 0
            started = False
            for k in range(ss, se + 1):
                c = int(block[k])
                # AC point transform truncates toward zero (T.81 G.1.2.2)
                v = c >> al if c >= 0 else -((-c) >> al)
                if v == 0:
                    r += 1
                    continue
                if not started:
                    emit_eobrun()
                    started = True
                while r > 15:
                    bw.put(0xF0, AC_LEN)
                    r -= 16
                t = abs(v).bit_length()
                bw.put((r << 4) | t, AC_LEN)
                bw.put(v if v >= 0 else v + (1 << t) - 1, t)
                r = 0
            if r > 0 or not started:
                eobrun += 1
                if eobrun == 0x7FFF:
                    emit_eobrun()
        else:
            # refinement (T.81 G.1.2.3; jcphuff.c structure)
            absv = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
            eob = -1
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eob = k
            r = 0
            br = []
            for k in range(ss, se + 1):
                temp = absv[k - ss]
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    emit_eobrun()
                    bw.put(0xF0, AC_LEN)
                    r -= 16
                    for b in br:
                        bw.put(b, 1)
                    br = []
                if temp > 1:
                    br.append(temp & 1)
                    continue
                emit_eobrun()
                bw.put((r << 4) | 1, AC_LEN)
                bw.put(1 if int(block[k]) >= 0 else 0, 1)
                for b in br:
                    bw.put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                be_bits.extend(br)
                if eobrun == 0x7FFF:
                    emit_eobrun()
    emit_eobrun()
    bw.align()
    return bytes(bw.data)


def _truth_pixels(comps_spec, coef_zz, qts_bytes, w, h):
    zz = np.array(_JPEG_ZZ)
    qts = {}
    for tq, raw in qts_bytes.items():
        nat = np.zeros(64, np.int32)
        nat[zz] = np.frombuffer(raw, np.uint8)
        qts[tq] = nat.reshape(8, 8)
    by_cid = {}
    for ci, c in enumerate(comps_spec):
        nat = np.zeros_like(coef_zz[ci])
        nat[..., zz] = coef_zz[ci]
        by_cid[c[0]] = nat
    hmax = max(c[1] for c in comps_spec)
    vmax = max(c[2] for c in comps_spec)
    return _jpeg_reconstruct(comps_spec, by_cid, qts, w, h, hmax, vmax)


def _gen_coefs(rng, comps_spec, w, h, density=0.2, amp=40):
    """Random ground truth: DC everywhere (interleaved DC scans cover
    the MCU-padded grid), AC only within the component's own block
    grid (non-interleaved AC scans never visit pad blocks)."""
    hmax = max(c[1] for c in comps_spec)
    vmax = max(c[2] for c in comps_spec)
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    out = []
    for cid, hi, vi, tq in comps_spec:
        arr = np.zeros((my * vi, mx * hi, 64), np.int64)
        arr[..., 0] = rng.randint(-200, 200, arr.shape[:2])
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        cbx, cby = -(-cw // 8), -(-ch // 8)
        mask = rng.rand(cby, cbx, 63) < density
        vals = rng.randint(-amp, amp + 1, (cby, cbx, 63))
        arr[:cby, :cbx, 1:] = np.where(mask, vals, 0)
        out.append(arr)
    return out


GRAY = [(1, 1, 1, 0)]
COLOR_420 = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]


def _roundtrip(comps_spec, w, h, scans, dri=0, density=0.2, seed=7):
    rng = np.random.RandomState(seed)
    qts = {c[3]: bytes([1] * 64) for c in comps_spec}
    coefs = _gen_coefs(rng, comps_spec, w, h, density)
    payload = encode_progressive(comps_spec, coefs, w, h, scans, qts, dri)
    want = _truth_pixels(comps_spec, coefs, qts, w, h)
    got = _jpeg_progressive_pixels(payload)
    assert got is not None
    assert got[:2] == want[:2]
    np.testing.assert_array_equal(got[2], want[2])
    return payload, want


class TestProgressiveDecode:
    def test_grayscale_full_sa_ladder(self):
        """DC SA ladder to Al=0 plus split AC bands, each refined —
        every scan kind in one stream."""
        _roundtrip(GRAY, 24, 16, [
            ([0], 0, 0, 0, 2), ([0], 0, 0, 2, 1), ([0], 0, 0, 1, 0),
            ([0], 1, 5, 0, 1), ([0], 6, 63, 0, 1),
            ([0], 1, 5, 1, 0), ([0], 6, 63, 1, 0),
        ])

    def test_grayscale_spectral_only_odd_dims(self):
        _roundtrip(GRAY, 17, 9, [
            ([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0),
        ])

    def test_color_420_interleaved_dc_with_sa(self):
        """4:2:0 color, interleaved DC over the MCU-padded grids +
        per-component non-interleaved AC (the component grid is
        smaller than the padded allocation at 37x21)."""
        _roundtrip(COLOR_420, 37, 21, [
            ([0, 1, 2], 0, 0, 0, 1), ([0, 1, 2], 0, 0, 1, 0),
            ([0], 1, 63, 0, 1), ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
            ([0], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0),
        ])

    def test_restart_intervals_reset_state(self):
        """DRI=2 inside every scan kind: predictors and EOB runs must
        reset at each RST or values diverge."""
        _roundtrip(GRAY, 40, 24, [
            ([0], 0, 0, 0, 1), ([0], 0, 0, 1, 0),
            ([0], 1, 63, 0, 1), ([0], 1, 63, 1, 0),
        ], dri=2)

    def test_dense_and_sparse_bands(self):
        """Dense coefficients exercise ZRL / long runs in refinement;
        sparse ones exercise multi-block EOB runs with buffered
        correction bits."""
        _roundtrip(GRAY, 32, 32, [
            ([0], 0, 0, 0, 1), ([0], 0, 0, 1, 0),
            ([0], 1, 20, 0, 1), ([0], 21, 63, 0, 1),
            ([0], 1, 20, 1, 0), ([0], 21, 63, 1, 0),
        ], density=0.5, seed=11)
        _roundtrip(GRAY, 64, 48, [
            ([0], 0, 0, 0, 1), ([0], 0, 0, 1, 0),
            ([0], 1, 63, 0, 1), ([0], 1, 63, 1, 0),
        ], density=0.01, seed=13)

    def test_metadata_and_routing(self):
        payload, want = _roundtrip(GRAY, 24, 16, [
            ([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0),
        ])
        assert _parse_jpeg(payload) == (24, 16, "L")
        via_dispatch = decode_pixels(payload)
        assert via_dispatch is not None
        np.testing.assert_array_equal(via_dispatch[2], want[2])
        # the baseline entry point routes SOF2 to the progressive path
        via_baseline = _jpeg_pixels(payload)
        assert via_baseline is not None
        np.testing.assert_array_equal(via_baseline[2], want[2])

    def test_truncation_returns_none(self):
        rng = np.random.RandomState(3)
        qts = {0: bytes([1] * 64)}
        coefs = _gen_coefs(rng, GRAY, 24, 16)
        full = encode_progressive(
            GRAY, coefs, 24, 16,
            [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)], qts,
        )
        for cut in (len(full) // 3, len(full) // 2, len(full) - 6):
            assert _jpeg_progressive_pixels(full[:cut]) is None

    def test_refinement_with_nonuniform_quant(self):
        qts = {0: bytes([min(255, 1 + (k % 7)) for k in range(64)])}
        rng = np.random.RandomState(21)
        coefs = _gen_coefs(rng, GRAY, 24, 16, density=0.3)
        scans = [
            ([0], 0, 0, 0, 1), ([0], 0, 0, 1, 0),
            ([0], 1, 63, 0, 2), ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0),
        ]
        payload = encode_progressive(GRAY, coefs, 24, 16, scans, qts)
        want = _truth_pixels(GRAY, coefs, qts, 24, 16)
        got = _jpeg_progressive_pixels(payload)
        assert got is not None
        np.testing.assert_array_equal(got[2], want[2])

    def test_entry_synthesis_roundtrips_exactly(self, spark, sf_dir):
        """The oracle face end-to-end: the progressive synthesis's
        constant-gray blocks decode to exactly the text bytes."""
        import sys

        sys.path.insert(0, "/root/repo")
        import __spark_entry__ as entry_mod

        docs = {
            r.doc_id: r.text
            for r in entry_mod._t(spark, sf_dir, "documents")
            .limit(200)
            .collect()
        }
        # Filter to the sampled docs BEFORE limiting: the builder's
        # output order is partition-dependent (the _spread parallelism
        # floor repartitions), so a bare limit(24) may miss the sample.
        rows = (
            entry_mod._doc_progressive_jpeg_media(spark, sf_dir)
            .where(
                entry_mod.F.col("media_id").isin([int(k) for k in docs])
            )
            .limit(24)
            .collect()
        )
        checked = 0
        for r in rows:
            did = int(r.media_id)
            if did not in docs:
                continue
            bx_n, by_n = did % 3 + 1, did % 2 + 1
            need = bx_n * by_n
            raw = (docs[did] or "").encode("utf-8")[:need].ljust(
                need, b"x"
            )
            got = _jpeg_progressive_pixels(bytes(r.content))
            assert got is not None, did
            w, h, px = got
            assert (w, h) == (bx_n * 8, by_n * 8)
            for b, g in enumerate(raw):
                by, bx = divmod(b, bx_n)
                blk = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
                assert (blk == g).all(), (did, b)
            checked += 1
        assert checked >= 10


    def test_randomized_scan_scripts(self):
        """Fuzz: random spectral splits and SA depths (the script
        space real encoders draw from) must all reconstruct the
        ground-truth coefficients exactly."""
        for seed in (101, 202, 303, 404, 505):
            rng = np.random.RandomState(seed)
            # random spectral partition of 1..63
            cuts = sorted(
                rng.choice(range(2, 63), rng.randint(0, 4), replace=False)
            )
            bands = []
            lo = 1
            for c in cuts:
                bands.append((lo, int(c) - 1))
                lo = int(c)
            bands.append((lo, 63))
            dc_al = int(rng.randint(0, 3))
            ac_al = int(rng.randint(0, 3))
            scans = [([0], 0, 0, 0, dc_al)]
            for a in range(dc_al, 0, -1):
                scans.append(([0], 0, 0, a, a - 1))
            for ss, se in bands:
                scans.append(([0], ss, se, 0, ac_al))
            for a in range(ac_al, 0, -1):
                for ss, se in bands:
                    scans.append(([0], ss, se, a, a - 1))
            w = int(rng.randint(8, 48))
            h = int(rng.randint(8, 40))
            dri = int(rng.choice([0, 0, 2, 3]))
            _roundtrip(
                GRAY, w, h, scans, dri=dri,
                density=float(rng.uniform(0.02, 0.5)), seed=seed,
            )
