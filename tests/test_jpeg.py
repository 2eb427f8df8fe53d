"""Baseline JPEG codec semantics (operators/jpeg.py): entropy layer
(canonical Huffman, DC prediction, stuffing, restarts), DCT exactness
on DC-only blocks, AC path vs a direct-summation IDCT reference, and
the honest color/progressive guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from blockchain_indexer_spark.operators.jpeg import (
    _A,
    BitReader,
    BitWriter,
    decode_jpeg_gray,
    encode_jpeg_gray,
    synth_jpeg_blob,
)


def _expected_pixels(doc_id: int) -> np.ndarray:
    nbx, nby = 1 + doc_id % 4, 1 + doc_id % 3
    bx = np.arange(nbx)[None, :]
    by = np.arange(nby)[:, None]
    v = (7 * doc_id + 13 * bx + 3 * by) % 256
    return np.kron(v, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)


def test_synth_roundtrip_is_exact():
    for doc_id in (0, 1, 5, 11, 97, 1234, 99999):
        w, h, px = decode_jpeg_gray(synth_jpeg_blob(doc_id))
        assert (w, h) == (8 * (1 + doc_id % 4), 8 * (1 + doc_id % 3))
        assert np.array_equal(px, _expected_pixels(doc_id))


def test_ac_coefficients_match_direct_summation_idct():
    blocks = np.full((1, 2, 8, 8), 128, dtype=np.uint8)
    blocks[0, 0, 0, :] = [120, 130, 140, 125, 135, 128, 122, 138]
    blocks[0, 1, :, 0] = [100, 110, 90, 140, 128, 135, 120, 128]
    _, _, px = decode_jpeg_gray(encode_jpeg_gray(blocks))
    for bi in range(2):
        spatial = blocks[0, bi].astype(np.float64) - 128.0
        q = np.round(_A @ spatial @ _A.T)
        ref = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv * q[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                ref[x, y] = s / 4
        ref = np.clip(np.round(ref + 128), 0, 255).astype(np.uint8)
        assert np.array_equal(px[:, bi * 8 : bi * 8 + 8], ref)


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 256, size=(3, 4), dtype=np.int64)
    solid = np.broadcast_to(
        vals[:, :, None, None], (3, 4, 8, 8)
    ).astype(np.uint8)
    plain = decode_jpeg_gray(encode_jpeg_gray(np.ascontiguousarray(solid)))[2]
    with_rst = decode_jpeg_gray(
        encode_jpeg_gray(np.ascontiguousarray(solid), restart_interval=2)
    )[2]
    assert np.array_equal(plain, with_rst)
    # the DRI stream really contains RST markers
    buf = encode_jpeg_gray(np.ascontiguousarray(solid), restart_interval=2)
    assert any(
        buf[i] == 0xFF and 0xD0 <= buf[i + 1] <= 0xD7 for i in range(2, len(buf) - 3)
    )


def test_out_of_sequence_restart_is_rejected():
    solid = np.full((1, 5, 8, 8), 99, dtype=np.uint8)
    buf = bytearray(encode_jpeg_gray(solid, restart_interval=2))
    # corrupt the first RST index (D0 -> D5)
    for i in range(2, len(buf) - 3):
        if buf[i] == 0xFF and buf[i + 1] == 0xD0:
            buf[i + 1] = 0xD5
            break
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg_gray(bytes(buf))


def test_bit_layer_stuffs_and_unstuffs_ff_bytes():
    bw = BitWriter()
    bw.write(0xFF, 8)
    bw.write(0xFF, 8)
    bw.write(0b101, 3)
    bw.pad_align()
    raw = bytes(bw.out)
    assert raw == b"\xff\x00\xff\x00\xbf"  # each 0xFF data byte stuffed
    br = BitReader(raw, 0)
    assert br.read_bits(8) == 0xFF
    assert br.read_bits(8) == 0xFF
    assert br.read_bits(3) == 0b101


def test_decode_symbol_lut_matches_plain_dict_walk():
    """Round 10: the 16-bit-LUT symbol decoder must consume exactly
    the same bits and return the same symbols as the per-bit dict walk
    (which still serves plain dicts), including the invalid-code and
    exhausted-stream error behavior."""
    from blockchain_indexer_spark.operators.jpeg import (
        DC_BITS,
        DC_VALS,
        build_huffman,
    )

    table = build_huffman(DC_BITS, DC_VALS)
    assert hasattr(table, "lut")
    plain = dict(table)  # no .lut -> exercises the fallback walk
    # encode a few symbols with the canonical codes, then decode both ways
    enc = {sym: lc for lc, sym in table.items()}
    bw = BitWriter()
    syms = [DC_VALS[0], DC_VALS[-1], DC_VALS[len(DC_VALS) // 2], DC_VALS[1]]
    for s in syms:
        ln, code = enc[s]
        bw.write(code, ln)
    bw.pad_align()
    raw = bytes(bw.out)
    fast = BitReader(raw, 0)
    slow = BitReader(raw, 0)
    for s in syms:
        assert fast.decode_symbol(table) == s
        assert slow.decode_symbol(plain) == s
    # exhausted stream: both raise EOFError once padding runs out
    for br, t in ((BitReader(b"", 0), table), (BitReader(b"", 0), plain)):
        with pytest.raises(EOFError):
            br.decode_symbol(t)


def test_planted_com_and_app0_are_skipped():
    buf = synth_jpeg_blob(3)
    assert b"synthetic fixture" in buf  # COM really present
    assert b"JFIF" in buf
    # decoding already proves they're skipped; also ensure the decoder
    # doesn't depend on them: strip COM and re-decode
    i = buf.index(b"\xff\xfe")
    (ln,) = struct.unpack(">H", buf[i + 2 : i + 4])
    stripped = buf[:i] + buf[i + 2 + ln :]
    assert np.array_equal(decode_jpeg_gray(stripped)[2], decode_jpeg_gray(buf)[2])


def test_truncated_sof_component_list_is_rejected():
    buf = bytearray(synth_jpeg_blob(1))
    i = bytes(buf).index(b"\xff\xc0")
    # SOF0 body: len(2) precision(1) h(2) w(2) nf(1) — forging nf=3 on
    # a 1-component body leaves the component list truncated
    buf[i + 9] = 3
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_gray(bytes(buf))


def test_relabeled_baseline_frame_is_rejected_as_malformed():
    """Progressive (SOF2) now DECODES (grayscale spectral selection);
    a baseline stream merely relabeled SOF2 is malformed — its single
    scan claims the full 0..63 band with Ss=0, which a real
    progressive stream cannot (T.81 G.1: a DC scan has Se=0)."""
    buf = bytearray(synth_jpeg_blob(1))
    i = bytes(buf).index(b"\xff\xc0")
    buf[i + 1] = 0xC2  # SOF2 progressive
    # the baseline fixture's DRI segment is accepted by the
    # progressive walk too (round 6); the malformed single full-band
    # scan then trips the DC-scan shape check
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg_gray(bytes(buf))
    # genuinely non-baseline frames (lossless/hierarchical) still guard
    buf = bytearray(synth_jpeg_blob(1))
    i = bytes(buf).index(b"\xff\xc0")
    buf[i + 1] = 0xC3  # SOF3 lossless
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg_gray(bytes(buf))


def test_decode_image_real_dispatches_jpeg(spark, sf_dir):
    from blockchain_indexer_spark.operators.multimodal import (
        attach_jpeg_blob,
        decode_image_real,
    )
    from blockchain_indexer_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = decode_image_real(attach_jpeg_blob(docs)).collect()
    assert len(out) == 20
    for r in out:
        expect = _expected_pixels(r["doc_id"])
        assert (r["width"], r["height"]) == (expect.shape[1], expect.shape[0])
        assert r["mean_b"] == r["mean_g"] == r["mean_r"] == expect.mean()


def test_color_roundtrip_matches_closed_form():
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg,
        synth_jpeg_color_blob,
    )

    for doc_id in (0, 1, 5, 7, 97, 99999):
        w, h, nch, px = decode_jpeg(synth_jpeg_color_blob(doc_id))
        nbx, nby = 1 + doc_id % 3, 1 + doc_id % 2
        assert (w, h, nch) == (8 * nbx, 8 * nby, 3)
        bx = np.arange(nbx)[None, :]
        by = np.arange(nby)[:, None]
        y = (5 * doc_id + 11 * bx + 3 * by) % 256
        cb = (3 * doc_id + 7 * bx + 5 * by) % 256
        cr = (2 * doc_id + 5 * bx + 7 * by) % 256
        r = np.clip(np.floor(y + 1.402 * (cr - 128) + 0.5), 0, 255)
        g = np.clip(
            np.floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5), 0, 255
        )
        b = np.clip(np.floor(y + 1.772 * (cb - 128) + 0.5), 0, 255)
        expect = np.stack(
            [np.kron(c, np.ones((8, 8))) for c in (r, g, b)], axis=2
        ).astype(np.uint8)
        assert np.array_equal(px, expect), doc_id


def test_color_per_component_predictors_and_restarts():
    from blockchain_indexer_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    comps = [
        np.broadcast_to(
            rng.integers(0, 256, (2, 4, 1, 1), dtype=np.int64), (2, 4, 8, 8)
        ).astype(np.uint8)
        for _ in range(3)
    ]
    comps = [np.ascontiguousarray(c) for c in comps]
    plain = decode_jpeg(encode_jpeg(comps))[3]
    with_rst = decode_jpeg(encode_jpeg(comps, restart_interval=3))[3]
    assert np.array_equal(plain, with_rst)


def test_unsupported_sampling_factors_raise_not_implemented():
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg,
        synth_jpeg_blob,
        synth_jpeg_color_blob,
    )

    buf = bytearray(synth_jpeg_color_blob(1))
    i = bytes(buf).index(b"\xff\xc0")
    buf[i + 11] = 0x55  # Y component claims 5x5 sampling (T.81 max is 4)
    with pytest.raises(ValueError, match="outside T.81 range"):
        decode_jpeg(bytes(buf))
    # NOTE: patching a 1x1-encoded stream's SOF to a non-dividing
    # ratio would desync the entropy walk — genuine non-dividing
    # coverage lives in test_non_dividing_sampling_decodes_exactly,
    # which ENCODES Y 3x1 / Cb 2x1 / Cr 1x1 streams (round-9 close
    # of the former NotImplementedError seam)


def _nondividing_expected():
    """Closed-form expected RGB for the Y 3x1 / Cb 2x1 / Cr 1x1
    fixture (2x1 MCUs, solid blocks): the pinned floor-replication
    formula — output x reads component sample x*H//Hmax — plus the
    JFIF matrix with floor(x+0.5), computed independently of the
    decoder's plane/gather machinery."""
    h, w = 8, 48
    yv = [10 + 7 * j for j in range(6)]
    cbv = [100 + 9 * j for j in range(4)]
    crv = [200 + 5 * j for j in range(2)]
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    for x in range(w):
        yy = float(yv[x // 8])
        cb = float(cbv[(x * 2 // 3) // 8]) - 128.0
        cr = float(crv[(x * 1 // 3) // 8]) - 128.0
        r = np.floor(yy + 1.402 * cr + 0.5)
        g = np.floor(yy - 0.344136 * cb - 0.714136 * cr + 0.5)
        b = np.floor(yy + 1.772 * cb + 0.5)
        rgb[:, x] = np.clip([r, g, b], 0, 255).astype(np.uint8)
    return yv, cbv, crv, rgb


def test_non_dividing_sampling_decodes_exactly():
    """Round-9 seam close: Y 3x1 against Cb 2x1 (hmax=3, 3%2 != 0 —
    fractional chroma replication) decodes exactly under the pinned
    floor-replication index formula, baseline AND progressive, against
    an independent closed-form expectation."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_progressive,
        encode_jpeg,
        encode_progressive_from_zz,
    )

    yv, cbv, crv, want = _nondividing_expected()
    sampling = [(3, 1), (2, 1), (1, 1)]

    def solid_blocks(vals, n):
        return np.ascontiguousarray(
            np.stack([np.full((8, 8), v, dtype=np.uint8) for v in vals]).reshape(
                1, n, 8, 8
            )
        )

    comps = [
        solid_blocks(yv, 6),
        solid_blocks(cbv, 4),
        solid_blocks(crv, 2),
    ]
    w_, h_, nch, got = decode_jpeg(encode_jpeg(comps, sampling=sampling))
    assert (w_, h_, nch) == (48, 8, 3)
    assert np.array_equal(got, want)
    # restart markers through the non-dividing interleaved walk
    _, _, _, got_rst = decode_jpeg(
        encode_jpeg(comps, sampling=sampling, restart_interval=1)
    )
    assert np.array_equal(got_rst, want)
    # progressive twin: DC-only solid blocks (DC = 8*(v-128) under the
    # orthonormal DCT with all-ones quant), same closed-form output
    def zz_list(vals):
        out = []
        for v in vals:
            zz = np.zeros(64, dtype=np.int64)
            zz[0] = 8 * (v - 128)
            out.append(zz)
        return out

    buf = encode_progressive_from_zz(
        [zz_list(yv), zz_list(cbv), zz_list(crv)], 1, 2, sampling=sampling
    )
    w_, h_, nch, gotp = decode_jpeg_progressive(buf)
    assert (w_, h_, nch) == (48, 8, 3)
    assert np.array_equal(gotp, want)
    # single-component scans are non-interleaved per T.81 and the
    # declared factors cancel (A.1.1: H = Hmax with one component):
    # any declared sampling must decode IDENTICALLY to the 1x1 twin
    # (round-9 seam close; formerly a NotImplementedError guard)
    base = synth_jpeg_blob(1)
    want = decode_jpeg(base)
    for patched in (0x22, 0x21, 0x14):
        buf = bytearray(base)
        i = bytes(buf).index(b"\xff\xc0")
        buf[i + 11] = patched
        got = decode_jpeg(bytes(buf))
        assert got[:3] == want[:3]
        assert (got[3] == want[3]).all(), hex(patched)
    # out-of-range factors on a single component stay malformed
    buf = bytearray(base)
    i = bytes(buf).index(b"\xff\xc0")
    buf[i + 11] = 0x52
    with pytest.raises(ValueError, match="outside T.81 range"):
        decode_jpeg(bytes(buf))


def test_420_roundtrip_matches_closed_form():
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg,
        synth_jpeg_420_blob,
    )

    for doc_id in range(24):
        nmx, nmy = 1 + doc_id % 2, 1 + doc_id % 3
        w, h, nch, px = decode_jpeg(synth_jpeg_420_blob(doc_id))
        assert (w, h, nch) == (16 * nmx, 16 * nmy, 3), doc_id
        expect = np.zeros((h, w, 3), dtype=np.uint8)
        for by in range(2 * nmy):
            for bx in range(2 * nmx):
                y = (5 * doc_id + 7 * bx + 11 * by) % 256
                cb = (3 * doc_id + 5 * (bx // 2) + 7 * (by // 2)) % 256
                cr = (2 * doc_id + 7 * (bx // 2) + 3 * (by // 2)) % 256
                r = min(255, max(0, int(np.floor(y + 1.402 * (cr - 128) + 0.5))))
                g = min(
                    255,
                    max(
                        0,
                        int(
                            np.floor(
                                y
                                - 0.344136 * (cb - 128)
                                - 0.714136 * (cr - 128)
                                + 0.5
                            )
                        ),
                    ),
                )
                b = min(255, max(0, int(np.floor(y + 1.772 * (cb - 128) + 0.5))))
                expect[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (r, g, b)
        assert np.array_equal(px, expect), doc_id


def test_420_luma_predictor_chains_inside_mcu():
    """Four luma blocks per MCU share ONE DC predictor chain; a decoder
    that resets it per block (or walks blocks column-major) shifts
    every later block's value. Random per-block solid values make the
    diffs nonzero in all four intra-MCU positions."""
    from blockchain_indexer_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    mby, mbx = 2, 3
    y = np.ascontiguousarray(
        np.broadcast_to(
            rng.integers(0, 256, (2 * mby, 2 * mbx, 1, 1), dtype=np.int64),
            (2 * mby, 2 * mbx, 8, 8),
        ).astype(np.uint8)
    )
    cb = np.ascontiguousarray(
        np.broadcast_to(
            rng.integers(0, 256, (mby, mbx, 1, 1), dtype=np.int64), (mby, mbx, 8, 8)
        ).astype(np.uint8)
    )
    cr = np.ascontiguousarray(
        np.broadcast_to(
            rng.integers(0, 256, (mby, mbx, 1, 1), dtype=np.int64), (mby, mbx, 8, 8)
        ).astype(np.uint8)
    )
    sampling = [(2, 2), (1, 1), (1, 1)]
    w, h, nch, px = decode_jpeg(encode_jpeg([y, cb, cr], sampling=sampling))
    assert (w, h, nch) == (16 * mbx, 16 * mby, 3)
    # luma recovers exactly: invert the JFIF matrix is unnecessary —
    # check against an independently-computed expectation instead
    expect_y = np.repeat(np.repeat(y[:, :, 0, 0], 8, axis=0), 8, axis=1)
    expect_cb = np.repeat(np.repeat(cb[:, :, 0, 0], 16, axis=0), 16, axis=1)
    expect_cr = np.repeat(np.repeat(cr[:, :, 0, 0], 16, axis=0), 16, axis=1)
    yf = expect_y.astype(np.float64)
    cbf = expect_cb.astype(np.float64) - 128.0
    crf = expect_cr.astype(np.float64) - 128.0
    expect = np.clip(
        np.floor(
            np.stack(
                [
                    yf + 1.402 * crf,
                    yf - 0.344136 * cbf - 0.714136 * crf,
                    yf + 1.772 * cbf,
                ],
                axis=2,
            )
            + 0.5
        ),
        0,
        255,
    ).astype(np.uint8)
    assert np.array_equal(px, expect)
    # restarts reset all predictors mid-stream without changing pixels
    with_rst = decode_jpeg(
        encode_jpeg([y, cb, cr], sampling=sampling, restart_interval=2)
    )[3]
    assert np.array_equal(px, with_rst)


def test_progressive_solid_blocks_match_baseline():
    """Spectral-selection progressive (SOF2) of the same block data
    must decode pixel-identical to the baseline stream — the DC scan
    plus all-zero AC bands coded as genuine T.81 G.1.2.2 EOBn runs
    spanning many blocks. Also exercises decode_jpeg's SOF2 dispatch."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_gray,
        decode_jpeg_progressive,
        encode_jpeg_gray,
        encode_jpeg_progressive_gray,
    )

    rng = np.random.default_rng(11)
    for trial in range(8):
        nby, nbx = 1 + trial % 3, 1 + trial % 4
        v = rng.integers(0, 256, (nby, nbx, 1, 1), dtype=np.int64)
        blocks = np.ascontiguousarray(
            np.broadcast_to(v, (nby, nbx, 8, 8)).astype(np.uint8)
        )
        base = decode_jpeg_gray(encode_jpeg_gray(blocks))[2]
        prog_buf = encode_jpeg_progressive_gray(blocks)
        assert np.array_equal(base, decode_jpeg_progressive(prog_buf)[3]), trial
        assert np.array_equal(base, decode_jpeg(prog_buf)[3]), trial


def test_progressive_ac_bands_decode_planted_coefficients():
    """Planted zigzag coefficients through the zz seam: EOBn runs,
    run/size symbols, ZRL inside a band, and a band whose LAST
    coefficient is nonzero (no trailing EOB per T.81) must all decode
    to the direct-IDCT ground truth across split band scans."""
    from blockchain_indexer_spark.operators.jpeg import (
        ZIGZAG,
        decode_jpeg_progressive,
        encode_progressive_from_zz,
        idct_block,
    )

    zz = [np.zeros(64, dtype=np.int64) for _ in range(6)]
    zz[0][0] = 96
    zz[0][1] = 1
    zz[0][3] = -1  # band1: run0 then run1
    zz[1][0] = 200  # all-zero AC: joins an EOBn run
    zz[2][0] = 40
    zz[2][7] = 1  # band2-only coefficient
    zz[3][0] = 8
    zz[4][0] = 250
    zz[4][10] = -1
    zz[4][63] = 1  # band-end coef: 52 zeros = 3x ZRL + run4, NO EOB after
    zz[5][0] = 128
    zz[5][6] = 1
    zz[5][23] = -1  # exactly 16 zeros = one ZRL + run0
    buf = encode_progressive_from_zz(zz, 2, 3)
    w, h, nch, px = decode_jpeg_progressive(buf)
    assert (w, h, nch) == (24, 16, 1)
    expect = np.zeros((16, 24), dtype=np.uint8)
    i = 0
    for by in range(2):
        for bx in range(3):
            dez = np.zeros(64, dtype=np.int64)
            dez[ZIGZAG] = zz[i]
            sp = idct_block(dez.reshape(8, 8)) + 128.0
            expect[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(sp), 0, 255
            )
            i += 1
    assert np.array_equal(px, expect)


def test_progressive_guards_stay_honest():
    """Sampling factors outside the T.81 1..4 envelope are malformed
    (factors 1..4 decode in-repo as of round 8); an SA scan with
    inconsistent Ah != Al+1 is rejected as malformed."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg_progressive,
        encode_progressive_from_zz,
    )

    zz = [np.zeros(64, dtype=np.int64)]
    zz[0][0] = 100
    buf = bytearray(encode_progressive_from_zz(zz, 1, 1))
    i = bytes(buf).index(b"\xff\xda")
    buf[i + 2 + 2 + 5] = 0x13  # AhAl: Ah=1, Al=3 on the DC scan
    with pytest.raises(ValueError, match="Ah = Al\\+1"):
        decode_jpeg_progressive(bytes(buf))
    zz3 = [[np.zeros(64, dtype=np.int64)] for _ in range(3)]
    for c in zz3:
        c[0][0] = 50
    buf = bytearray(encode_progressive_from_zz(zz3, 1, 1))
    i = bytes(buf).index(b"\xff\xc2")
    buf[i + 2 + 2 + 5 + 2] = 0x55  # luma claims 5x5 sampling (max is 4)
    with pytest.raises(ValueError, match="outside T.81 range"):
        decode_jpeg_progressive(bytes(buf))
    # sampled SINGLE-component progressive normalizes to the 1x1 walk
    # (T.81 A.1.1 — round-9 seam close, same rule as baseline)
    base = encode_progressive_from_zz(zz, 1, 1)
    want = decode_jpeg_progressive(base)
    buf = bytearray(base)
    i = bytes(buf).index(b"\xff\xc2")
    buf[i + 2 + 2 + 5 + 2] = 0x22  # nf == 1 with sampling != 1x1
    got = decode_jpeg_progressive(bytes(buf))
    assert got[:3] == want[:3] and (got[3] == want[3]).all()


def test_progressive_color_matches_baseline():
    """4:4:4 color progressive (interleaved DC scan with per-component
    predictors + non-interleaved per-component AC band scans) decodes
    pixel-identical to the baseline color stream of the same blocks,
    through both entry points."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_progressive,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(19)
    for trial in range(5):
        nby, nbx = 1 + trial % 2, 1 + trial % 3
        comps = [
            np.ascontiguousarray(
                np.broadcast_to(
                    rng.integers(0, 256, (nby, nbx, 1, 1), dtype=np.int64),
                    (nby, nbx, 8, 8),
                ).astype(np.uint8)
            )
            for _ in range(3)
        ]
        base = decode_jpeg(encode_jpeg(comps))[3]
        prog_buf = encode_jpeg_progressive(comps)
        assert np.array_equal(base, decode_jpeg_progressive(prog_buf)[3]), trial
        assert np.array_equal(base, decode_jpeg(prog_buf)[3]), trial


def test_422_horizontal_subsampling_roundtrip():
    """4:2:2 (H=2, V=1 luma): two luma blocks + one chroma block per
    MCU; the pinned floor upsample replicates chroma horizontally."""
    from blockchain_indexer_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    mby, mbx = 2, 2
    y = np.ascontiguousarray(
        np.broadcast_to(
            rng.integers(0, 256, (mby, 2 * mbx, 1, 1), dtype=np.int64),
            (mby, 2 * mbx, 8, 8),
        ).astype(np.uint8)
    )
    cb = np.ascontiguousarray(
        np.broadcast_to(
            rng.integers(0, 256, (mby, mbx, 1, 1), dtype=np.int64), (mby, mbx, 8, 8)
        ).astype(np.uint8)
    )
    cr = np.ascontiguousarray(
        np.broadcast_to(
            rng.integers(0, 256, (mby, mbx, 1, 1), dtype=np.int64), (mby, mbx, 8, 8)
        ).astype(np.uint8)
    )
    w, h, nch, px = decode_jpeg(
        encode_jpeg([y, cb, cr], sampling=[(2, 1), (1, 1), (1, 1)])
    )
    assert (w, h, nch) == (16 * mbx, 8 * mby, 3)
    yf = np.repeat(np.repeat(y[:, :, 0, 0], 8, axis=0), 8, axis=1).astype(np.float64)
    cbf = (
        np.repeat(np.repeat(cb[:, :, 0, 0], 8, axis=0), 16, axis=1).astype(np.float64)
        - 128.0
    )
    crf = (
        np.repeat(np.repeat(cr[:, :, 0, 0], 8, axis=0), 16, axis=1).astype(np.float64)
        - 128.0
    )
    expect = np.clip(
        np.floor(
            np.stack(
                [
                    yf + 1.402 * crf,
                    yf - 0.344136 * cbf - 0.714136 * crf,
                    yf + 1.772 * cbf,
                ],
                axis=2,
            )
            + 0.5
        ),
        0,
        255,
    ).astype(np.uint8)
    assert np.array_equal(px, expect)


def test_decode_image_real_handles_progressive_blobs(spark):
    """A progressive grayscale blob flows through the Arrow
    mapInPandas decode stage via decode_jpeg's SOF2 dispatch — the
    Spark-side plumbing needs no special-casing."""
    import pandas as pd
    from pyspark.sql import functions as F

    from blockchain_indexer_spark.operators.jpeg import (
        encode_jpeg_progressive_gray,
    )
    from blockchain_indexer_spark.operators.multimodal import decode_image_real

    def blob(doc_id: int) -> bytes:
        nbx, nby = 1 + doc_id % 3, 1 + doc_id % 2
        v = (11 * doc_id + np.arange(nby)[:, None] * 3 + np.arange(nbx)[None, :] * 7) % 256
        blocks = np.ascontiguousarray(
            np.broadcast_to(
                v[:, :, None, None].astype(np.uint8), (nby, nbx, 8, 8)
            )
        )
        return encode_jpeg_progressive_gray(blocks)

    _blob = F.pandas_udf(lambda ids: ids.map(lambda i: blob(int(i))), "binary")

    docs = spark.range(8).select(F.col("id").alias("doc_id")).withColumn(
        "blob", _blob("doc_id")
    ).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.length("blob").alias("nbytes"),
            F.lit("jpeg-gray8-progressive-v1").alias("codec"),
        ),
    )
    out = {r["doc_id"]: r for r in decode_image_real(docs).collect()}
    assert len(out) == 8
    for doc_id, r in out.items():
        nbx, nby = 1 + doc_id % 3, 1 + doc_id % 2
        assert (r["width"], r["height"]) == (8 * nbx, 8 * nby)
        v = (11 * doc_id + np.arange(nby)[:, None] * 3 + np.arange(nbx)[None, :] * 7) % 256
        assert r["mean_b"] == v.mean()


def test_synth_jpeg_progressive_blob_cycles_six_shapes():
    """The mm_real_jpeg_progressive fixture round-trips its closed
    forms through the real SOF2 multi-scan decode for all six stream
    shapes (doc_id % 6): gray / 4:4:4 color / 4:2:0 subsampled, each
    in spectral-selection and successive-approximation variants — the
    same arithmetic the DuckDB oracle enumerates."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg,
        synth_jpeg_progressive_blob,
    )

    def jfif(y, cb, cr):
        y = y.astype(np.float64)
        cb = cb.astype(np.float64) - 128.0
        cr = cr.astype(np.float64) - 128.0
        rgb = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=2,
        )
        return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)

    for doc_id in range(18):
        shape = doc_id % 6
        buf = synth_jpeg_progressive_blob(doc_id)
        assert buf[:2] == b"\xff\xd8"
        assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf  # SOF2, not SOF0
        w, h, nch, px = decode_jpeg(buf)
        if shape in (0, 2):
            nbx, nby = 1 + doc_id % 4, 1 + doc_id % 3
            assert (w, h, nch) == (8 * nbx, 8 * nby, 1)
            bx = np.arange(nbx)[None, :]
            by = np.arange(nby)[:, None]
            v = (7 * doc_id + 13 * bx + 3 * by) % 256
            assert np.array_equal(px, np.repeat(np.repeat(v, 8, 0), 8, 1))
        elif shape in (1, 3):
            nbx, nby = 1 + doc_id % 3, 1 + doc_id % 2
            assert (w, h, nch) == (8 * nbx, 8 * nby, 3)
            bx = np.arange(nbx)[None, :]
            by = np.arange(nby)[:, None]
            expect = jfif(
                (5 * doc_id + 11 * bx + 3 * by) % 256,
                (3 * doc_id + 7 * bx + 5 * by) % 256,
                (2 * doc_id + 5 * bx + 7 * by) % 256,
            )
            assert np.array_equal(px, np.repeat(np.repeat(expect, 8, 0), 8, 1))
        else:
            nmx, nmy = 1 + doc_id % 2, 1 + doc_id % 3
            assert (w, h, nch) == (16 * nmx, 16 * nmy, 3)
            bx = np.arange(2 * nmx)[None, :]
            by = np.arange(2 * nmy)[:, None]
            expect = jfif(
                (5 * doc_id + 7 * bx + 11 * by) % 256,
                (3 * doc_id + 5 * (bx // 2) + 7 * (by // 2)) % 256,
                (2 * doc_id + 7 * (bx // 2) + 3 * (by // 2)) % 256,
            )
            assert np.array_equal(px, np.repeat(np.repeat(expect, 8, 0), 8, 1))


def _idct_reference(zz_list, nby, nbx):
    """Direct-IDCT ground truth of pre-quantized zigzag blocks."""
    from blockchain_indexer_spark.operators.jpeg import ZIGZAG, idct_block

    out = np.zeros((nby * 8, nbx * 8), dtype=np.uint8)
    i = 0
    for by in range(nby):
        for bx in range(nbx):
            dez = np.zeros(64, dtype=np.int64)
            dez[ZIGZAG] = zz_list[i]
            sp = idct_block(dez.reshape(8, 8)) + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(sp), 0, 255
            )
            i += 1
    return out


def test_successive_approximation_planted_coefficients():
    """Every SA decode path through the zz seam at al=1: DC bit
    refinement (odd and even DC, negative DC), newly-significant AC
    at each level (|c|=1 appears only in the refinement scan; |c|=2,3
    appear in the first scan and take correction bits 0/1), ZRL runs
    of zero-history positions, and EOBn runs that carry correction
    bits for trailing nonzero history."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg_progressive,
        encode_progressive_sa_from_zz,
    )

    zz = [np.zeros(64, dtype=np.int64) for _ in range(6)]
    zz[0][0] = 97    # odd DC: refinement bit 1
    zz[0][1] = 3     # first scan t=1, correction bit 1
    zz[0][3] = -2    # first scan t=-1, correction bit 0
    zz[0][5] = 1     # newly significant in refinement (positive)
    zz[1][0] = -6    # negative even DC
    zz[1][2] = -1    # newly significant in refinement (negative)
    zz[2][0] = 40    # all-zero AC: EOBn in both scans
    zz[3][0] = 8
    zz[3][63] = 1    # band-end new significance after a long zero run
    zz[4][0] = 250
    zz[4][6] = 2     # correction bit 0 rides an EOBn run (no new coef
    zz[4][23] = -3   # in this block at refinement time -> buffered)
    zz[5][0] = 128
    zz[5][1] = 1
    zz[5][40] = 1    # two new coefs, 38 zero-history between: 2x ZRL
    buf = encode_progressive_sa_from_zz(zz, 2, 3, al=1)
    w, h, nch, px = decode_jpeg_progressive(buf)
    assert (w, h, nch) == (24, 16, 1)
    assert np.array_equal(px, _idct_reference(zz, 2, 3))


def test_successive_approximation_two_levels():
    """al=2: two refinement levels per coefficient — DC restores two
    raw bits, AC coefficients become significant at different levels
    (|c|=4..7 in the first scan, 2..3 at level 1, 1 at level 0) and
    then take correction bits at every later level."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg_progressive,
        encode_progressive_sa_from_zz,
    )

    zz = [np.zeros(64, dtype=np.int64) for _ in range(4)]
    zz[0][0] = 103   # bits 1,1 restored across two DC refinements
    zz[0][1] = 7     # first scan t=1, corrections 1 then 1
    zz[0][2] = -4    # first scan t=-1, corrections 0 then 0
    zz[0][3] = 3     # new at level 1, correction 1 at level 0
    zz[0][4] = -2    # new at level 1, correction 0 at level 0
    zz[0][5] = 1     # new at level 0
    zz[1][0] = -77
    zz[1][10] = -5   # first scan, corrections 0 then 1
    zz[2][0] = 0
    zz[2][63] = -1   # new at level 0 at the band end
    zz[3][0] = 255
    buf = encode_progressive_sa_from_zz(zz, 2, 2, al=2)
    w, h, nch, px = decode_jpeg_progressive(buf)
    assert (w, h, nch) == (16, 16, 1)
    assert np.array_equal(px, _idct_reference(zz, 2, 2))


def test_successive_approximation_solid_blocks_match_baseline():
    """SA-encoded solid blocks (gray and 4:4:4 color) decode to the
    same pixels as the baseline encoder — the closed-form fixture
    convention survives the extra scan structure."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_progressive_sa,
    )

    for doc_id in (0, 3, 7):
        nbx, nby = 1 + doc_id % 3, 1 + doc_id % 2
        bx = np.arange(nbx)[None, :]
        by = np.arange(nby)[:, None]

        def plane(a, b, c):
            v = (a * doc_id + b * bx + c * by) % 256
            return np.ascontiguousarray(
                np.broadcast_to(
                    v[:, :, None, None].astype(np.uint8), (nby, nbx, 8, 8)
                )
            )

        gray = plane(7, 13, 3)
        base = decode_jpeg(encode_jpeg_gray(gray))
        prog = decode_jpeg(encode_jpeg_progressive_sa([gray], al=1))
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3])
        comps = [plane(5, 11, 3), plane(3, 7, 5), plane(2, 5, 7)]
        base = decode_jpeg(encode_jpeg(comps))
        prog = decode_jpeg(encode_jpeg_progressive_sa(comps, al=2))
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3])


def test_successive_approximation_randomized_roundtrip():
    """Deterministic pseudo-random coefficient fields (|c| <= 3, the
    SA fixture envelope) across many blocks and both al levels decode
    bit-exactly — the brute-force sweep over run/EOBn/correction-bit
    interleavings no hand-planted case can cover."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg_progressive,
        encode_progressive_sa_from_zz,
    )

    rng = np.random.RandomState(1234)
    for al in (1, 2):
        for trial in range(12):
            nby, nbx = rng.randint(1, 4), rng.randint(1, 4)
            n = nby * nbx
            zz = []
            for _ in range(n):
                b = np.zeros(64, dtype=np.int64)
                b[0] = rng.randint(-300, 301)
                # sparse AC up to the al-level envelope (2^(al+1) - 1):
                # al=2 reaches |c|=7, so the INTERMEDIATE refinement
                # level sees t>1 correction bits too
                hi = (1 << (al + 1)) - 1
                idx = rng.choice(np.arange(1, 64), size=8, replace=False)
                b[idx] = rng.randint(1, hi + 1, size=8) * rng.choice(
                    [-1, 1], size=8
                )
                # some all-zero-AC blocks to force EOBn runs
                if rng.rand() < 0.3:
                    b[1:] = 0
                zz.append(b)
            buf = encode_progressive_sa_from_zz(zz, nby, nbx, al=al)
            w, h, nch, px = decode_jpeg_progressive(buf)
            assert (w, h, nch) == (nbx * 8, nby * 8, 1)
            assert np.array_equal(px, _idct_reference(zz, nby, nbx)), (
                al,
                trial,
            )


def test_subsampled_progressive_solid_blocks_match_baseline():
    """4:2:0 progressive — spectral-selection AND successive
    approximation — decodes solid-block fixtures to the same pixels
    as the baseline 4:2:0 decoder (a fully independent code path:
    MCU walk + immediate IDCT vs multi-scan coefficient
    accumulation)."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
        encode_jpeg_progressive_sa,
    )

    def blocks(v, nby_, nbx_):
        return np.ascontiguousarray(
            np.broadcast_to(v[:, :, None, None].astype(np.uint8), (nby_, nbx_, 8, 8))
        )

    s420 = [(2, 2), (1, 1), (1, 1)]
    s422 = [(2, 1), (1, 1), (1, 1)]
    for doc_id in (0, 3, 5):
        nmx, nmy = 1 + doc_id % 2, 1 + doc_id % 3
        mx = np.arange(nmx)[None, :]
        my = np.arange(nmy)[:, None]
        cb = blocks((3 * doc_id + 5 * mx + 7 * my) % 256, nmy, nmx)
        cr = blocks((2 * doc_id + 7 * mx + 3 * my) % 256, nmy, nmx)
        # 4:2:0
        ybx = np.arange(2 * nmx)[None, :]
        yby = np.arange(2 * nmy)[:, None]
        y = blocks((5 * doc_id + 7 * ybx + 11 * yby) % 256, 2 * nmy, 2 * nmx)
        base = decode_jpeg(encode_jpeg([y, cb, cr], sampling=s420))
        prog = decode_jpeg(encode_jpeg_progressive([y, cb, cr], sampling=s420))
        qt = np.ones((8, 8), dtype=np.int64)
        qt[0, 0] = 8  # DC quant 8 -> quantized DC = v-128, real SA bits
        sa = decode_jpeg(
            encode_jpeg_progressive_sa([y, cb, cr], quant=qt, al=2, sampling=s420)
        )
        assert base[:3] == prog[:3] == sa[:3]
        assert np.array_equal(base[3], prog[3])
        assert np.array_equal(base[3], sa[3])
        # 4:2:2 (horizontal-only subsampling)
        y2 = blocks((5 * doc_id + 7 * ybx + 11 * my) % 256, nmy, 2 * nmx)
        base = decode_jpeg(encode_jpeg([y2, cb, cr], sampling=s422))
        prog = decode_jpeg(encode_jpeg_progressive([y2, cb, cr], sampling=s422))
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3])


def test_subsampled_progressive_planted_ac_coefficients():
    """Nonzero AC structure in a 4:2:0 SA progressive stream (via the
    zz seam, |c| <= 3 envelope): luma and chroma coefficients land in
    the right blocks of the right component grids, verified against a
    direct per-component IDCT + pinned floor-upsample + JFIF-matrix
    reference."""
    from blockchain_indexer_spark.operators.jpeg import (
        ZIGZAG,
        decode_jpeg_progressive,
        encode_progressive_sa_from_zz,
        idct_block,
    )

    rng = np.random.RandomState(77)
    nmx, nmy = 2, 1  # luma 2x4 blocks, chroma 1x2; image 32x16
    s = [(2, 2), (1, 1), (1, 1)]
    zz_comps = []
    for nblocks in (4 * nmx * nmy, nmx * nmy, nmx * nmy):
        blocks = []
        for _ in range(nblocks):
            b = np.zeros(64, dtype=np.int64)
            b[0] = rng.randint(-200, 201)
            idx = rng.choice(np.arange(1, 64), size=6, replace=False)
            b[idx] = rng.randint(1, 4, size=6) * rng.choice([-1, 1], size=6)
            blocks.append(b)
        zz_comps.append(blocks)
    buf = encode_progressive_sa_from_zz(zz_comps, nmy, nmx, al=1, sampling=s)
    w, h, nch, px = decode_jpeg_progressive(buf)
    assert (w, h, nch) == (16 * nmx, 16 * nmy, 3)

    def comp_plane(blocks, cby, cbx):
        p = np.zeros((cby * 8, cbx * 8))
        i = 0
        for by in range(cby):
            for bx in range(cbx):
                dez = np.zeros(64, dtype=np.int64)
                dez[ZIGZAG] = blocks[i]
                p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.round(idct_block(dez.reshape(8, 8)) + 128.0), 0, 255
                )
                i += 1
        return p

    y = comp_plane(zz_comps[0], 2 * nmy, 2 * nmx)
    cb = np.repeat(np.repeat(comp_plane(zz_comps[1], nmy, nmx), 2, 0), 2, 1) - 128.0
    cr = np.repeat(np.repeat(comp_plane(zz_comps[2], nmy, nmx), 2, 0), 2, 1) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    expect = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    assert np.array_equal(px, expect)


def test_partial_mcu_progressive_crops_correctly():
    """A 20x12 4:2:0 progressive image (MCU grid 2x1, luma blocks 3x2
    against a 4x2 padded grid, chroma 2x1): the interleaved DC scan
    carries the padding column (zero diffs the decoder discards), AC
    scans skip it, and reconstruction crops luma to 20x12 and chroma
    to 10x6 before the floor upsample — both spectral-selection and
    SA variants, against the closed-form solid-block expectation."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg_progressive,
        encode_progressive_from_zz,
        encode_progressive_sa_from_zz,
    )

    h, w = 12, 20
    s = [(2, 2), (1, 1), (1, 1)]
    # luma 3x2 blocks, chroma 2x1 — DC-only solid values
    yv = np.array([[40, 90, 140], [190, 230, 20]], dtype=np.int64)
    cbv = np.array([[100, 160]], dtype=np.int64)
    crv = np.array([[80, 200]], dtype=np.int64)

    def zz_of(vals):
        out = []
        for v in vals.reshape(-1):
            b = np.zeros(64, dtype=np.int64)
            b[0] = 8 * (int(v) - 128)  # DC of a solid block, q=1
            out.append(b)
        return out

    zz = [zz_of(yv), zz_of(cbv), zz_of(crv)]

    def expect_pixels():
        yp = np.repeat(np.repeat(yv, 8, 0), 8, 1)[:h, :w].astype(np.float64)
        cbp = np.repeat(np.repeat(cbv, 8, 0), 8, 1)[: -(-h // 2), : -(-w // 2)]
        crp = np.repeat(np.repeat(crv, 8, 0), 8, 1)[: -(-h // 2), : -(-w // 2)]
        cbu = np.repeat(np.repeat(cbp, 2, 0), 2, 1)[:h, :w] - 128.0
        cru = np.repeat(np.repeat(crp, 2, 0), 2, 1)[:h, :w] - 128.0
        rgb = np.stack(
            [yp + 1.402 * cru, yp - 0.344136 * cbu - 0.714136 * cru, yp + 1.772 * cbu],
            axis=2,
        )
        return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)

    for buf in (
        encode_progressive_from_zz(zz, 1, 2, sampling=s, size=(h, w)),
        encode_progressive_sa_from_zz(zz, 1, 2, al=1, sampling=s, size=(h, w)),
    ):
        dw, dh, nch, px = decode_jpeg_progressive(buf)
        assert (dw, dh, nch) == (w, h, 3)
        assert np.array_equal(px, expect_pixels())

    # grayscale odd size: the plane crop path with no subsampling
    gv = np.array([[10, 250, 33], [77, 128, 199]], dtype=np.int64)
    buf = encode_progressive_from_zz(zz_of(gv), 2, 3, size=(12, 20))
    dw, dh, nch, px = decode_jpeg_progressive(buf)
    assert (dw, dh, nch) == (20, 12, 1)
    assert np.array_equal(px, np.repeat(np.repeat(gv, 8, 0), 8, 1)[:12, :20])


def test_progressive_restart_intervals_round_trip():
    """DRI + RSTn in progressive FIRST scans: streams at several
    intervals decode pixel-identical to the marker-free stream, the
    markers are genuinely present, and DC-predictor resets are
    exercised (varied solid blocks make every diff non-zero)."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_progressive,
        encode_jpeg_progressive,
        encode_jpeg_progressive_gray,
    )

    def solid(vals, nby, nbx):
        v = np.array(vals, dtype=np.uint8).reshape(nby, nbx)
        return np.ascontiguousarray(
            np.broadcast_to(v[:, :, None, None], (nby, nbx, 8, 8))
        )

    vals = [(7 * 3 + 13 * bx + 3 * by) % 256 for by in range(3) for bx in range(4)]
    blocks = solid(vals, 3, 4)
    base = decode_jpeg_progressive(encode_jpeg_progressive_gray(blocks))[3]
    for ri in (1, 2, 5):
        buf = encode_jpeg_progressive_gray(blocks, restart_interval=ri)
        assert any(bytes((0xFF, 0xD0 + i)) in buf for i in range(8)), ri
        assert np.array_equal(base, decode_jpeg_progressive(buf)[3]), ri
        assert np.array_equal(base, decode_jpeg(buf)[3]), ri  # dispatch

    # 4:2:0 subsampled: the restart MCU is the interleaved 4Y+Cb+Cr
    # group in the DC scan and one block in the AC scans
    nmx, nmy = 3, 2
    y = solid(
        [(5 + 7 * bx + 11 * by) % 256 for by in range(2 * nmy) for bx in range(2 * nmx)],
        2 * nmy, 2 * nmx,
    )
    cb = solid([(3 + 5 * mx + 7 * my) % 256 for my in range(nmy) for mx in range(nmx)], nmy, nmx)
    cr = solid([(2 + 7 * mx + 3 * my) % 256 for my in range(nmy) for mx in range(nmx)], nmy, nmx)
    s420 = [(2, 2), (1, 1), (1, 1)]
    base = decode_jpeg_progressive(encode_jpeg_progressive([y, cb, cr], sampling=s420))
    for ri in (1, 2):
        buf = encode_jpeg_progressive([y, cb, cr], sampling=s420, restart_interval=ri)
        got = decode_jpeg_progressive(buf)
        assert got[:3] == base[:3] and np.array_equal(base[3], got[3]), ri


def test_progressive_restart_sequence_checked():
    """A stream whose first RSTn is out of sequence is rejected — the
    decoder tracks the per-scan modulo-8 marker counter."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg_progressive,
        encode_jpeg_progressive_gray,
    )

    def solid(vals, nby, nbx):
        v = np.array(vals, dtype=np.uint8).reshape(nby, nbx)
        return np.ascontiguousarray(
            np.broadcast_to(v[:, :, None, None], (nby, nbx, 8, 8))
        )

    buf = bytearray(
        encode_jpeg_progressive_gray(solid([10, 70, 130, 190], 1, 4), restart_interval=1)
    )
    sos = bytes(buf).index(b"\xff\xda")
    first_rst = bytes(buf).index(b"\xff\xd0", sos)
    buf[first_rst + 1] = 0xD1  # claim RST1 where RST0 is due
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg_progressive(bytes(buf))


def test_progressive_sa_restart_intervals_round_trip():
    """DRI + RSTn through REFINEMENT scans (the round-6 PIL seam,
    closed in round 7): successive-approximation streams at several
    intervals decode pixel-identical to the marker-free stream, with
    markers genuinely present — so the raw-bit DC refinement resync
    and the AC refinement's interval-bounded EOBn runs (with their
    buffered correction bits) are all exercised."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg_progressive,
        encode_jpeg_progressive_sa,
    )

    def solid(vals, nby, nbx):
        v = np.array(vals, dtype=np.uint8).reshape(nby, nbx)
        return np.ascontiguousarray(
            np.broadcast_to(v[:, :, None, None], (nby, nbx, 8, 8))
        )

    qt = np.ones((8, 8), dtype=np.int64)
    qt[0, 0] = 8  # quantized DC = v-128: real refinement bits
    vals = [(7 * 3 + 13 * bx + 3 * by) % 256 for by in range(3) for bx in range(4)]
    gray = solid(vals, 3, 4)
    base = decode_jpeg_progressive(encode_jpeg_progressive_sa([gray], quant=qt, al=2))
    for ri in (1, 2, 5):
        buf = encode_jpeg_progressive_sa([gray], quant=qt, al=2, restart_interval=ri)
        assert any(bytes((0xFF, 0xD0 + i)) in buf for i in range(8)), ri
        got = decode_jpeg_progressive(buf)
        assert got[:3] == base[:3] and np.array_equal(base[3], got[3]), ri

    # 4:2:0 subsampled SA: restart MCU is the 4Y+Cb+Cr group in the
    # DC scans (first AND raw-bit refinement) and one block in AC
    nmx, nmy = 3, 2
    y = solid(
        [(5 + 7 * bx + 11 * by) % 256 for by in range(2 * nmy) for bx in range(2 * nmx)],
        2 * nmy, 2 * nmx,
    )
    cb = solid([(3 + 5 * mx + 7 * my) % 256 for my in range(nmy) for mx in range(nmx)], nmy, nmx)
    cr = solid([(2 + 7 * mx + 3 * my) % 256 for my in range(nmy) for mx in range(nmx)], nmy, nmx)
    s420 = [(2, 2), (1, 1), (1, 1)]
    base = decode_jpeg_progressive(
        encode_jpeg_progressive_sa([y, cb, cr], quant=qt, al=2, sampling=s420)
    )
    for ri in (1, 2):
        buf = encode_jpeg_progressive_sa(
            [y, cb, cr], quant=qt, al=2, sampling=s420, restart_interval=ri
        )
        assert any(bytes((0xFF, 0xD0 + i)) in buf for i in range(8)), ri
        got = decode_jpeg_progressive(buf)
        assert got[:3] == base[:3] and np.array_equal(base[3], got[3]), ri


def test_progressive_sa_restart_desync_rejected():
    """Splicing a DRI segment into an SA stream ENCODED WITHOUT
    restarts must fail loudly at the first missed boundary (the
    decoder expects a marker that is not there), never silently
    desync the refinement correction bits."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg_progressive,
        encode_progressive_sa_from_zz,
    )

    zz = [np.zeros(64, dtype=np.int64) for _ in range(4)]
    for i, b in enumerate(zz):
        b[0] = 40 * (i + 1)
    buf = bytes(encode_progressive_sa_from_zz(zz, 1, 4, al=1))
    sos = buf.index(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x01"  # DRI: Ri = 1, but no RSTn bytes
    spliced = buf[:sos] + dri + buf[sos:]
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg_progressive(spliced)


def test_progressive_sa_refinement_restart_sequence_checked():
    """An out-of-sequence RSTn inside a REFINEMENT scan is rejected —
    the per-scan modulo-8 counter covers refinement scans too."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg_progressive,
        encode_jpeg_progressive_sa,
    )

    def solid(vals, nby, nbx):
        v = np.array(vals, dtype=np.uint8).reshape(nby, nbx)
        return np.ascontiguousarray(
            np.broadcast_to(v[:, :, None, None], (nby, nbx, 8, 8))
        )

    qt = np.ones((8, 8), dtype=np.int64)
    qt[0, 0] = 8
    buf = bytearray(
        encode_jpeg_progressive_sa(
            [solid([10, 70, 130, 190], 1, 4)], quant=qt, al=2, restart_interval=1
        )
    )
    # find the LAST scan (an AC refinement scan at Ah=1, Al=0) and
    # corrupt its first restart marker
    raw = bytes(buf)
    last_sos = raw.rindex(b"\xff\xda")
    first_rst = raw.index(b"\xff\xd0", last_sos)
    buf[first_rst + 1] = 0xD3  # claim RST3 where RST0 is due
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg_progressive(bytes(buf))


def test_progressive_fixture_all_shapes_carry_restarts():
    """ALL six driver fixture shapes embed DRI=2 streams (round 7
    extended the restart coverage through the SA rows' refinement
    scans); decoded pixels are unchanged (the gate oracle is
    pixel-only) and the markers are really in the bytes."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg_progressive,
        synth_jpeg_progressive_blob,
    )

    for doc_id in (6, 7, 8, 9, 10, 11):  # all six shapes
        buf = synth_jpeg_progressive_blob(doc_id)
        assert b"\xff\xdd" in buf, doc_id
    # every shape except 3 reaches a restart boundary; shape 3's
    # closed form (id ≡ 3 mod 6 ⇒ 3 | id ⇒ nbx = 1+id%3 = 1, nby = 2)
    # is always a 2-MCU grid, which DRI=2 never splits — the stream
    # still carries the DRI segment and decodes through the same path
    for doc_id in (6, 7, 8, 10, 11):
        buf = synth_jpeg_progressive_blob(doc_id)
        assert any(bytes((0xFF, 0xD0 + i)) in buf for i in range(8)), doc_id
    # gray shapes: pixels still the closed form (the six-shape pixel
    # test covers the color/subsampled shapes through the same path)
    for doc_id in (6, 8):  # spectral and SA gray
        assert np.array_equal(
            decode_jpeg_progressive(synth_jpeg_progressive_blob(doc_id))[3],
            _expected_pixels(doc_id),
        )


def _solid_blocks(rng, mby, mbx, hi, vi):
    return np.ascontiguousarray(
        np.broadcast_to(
            rng.integers(0, 256, (mby * vi, mbx * hi, 1, 1), dtype=np.int64),
            (mby * vi, mbx * hi, 8, 8),
        ).astype(np.uint8)
    )


def _expect_rgb(y, cb, cr, sampling):
    """Independent floor-replication + JFIF reference from solid-block
    planes (one value per 8x8 block)."""
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    planes = []
    for comp, (hi, vi) in zip((y, cb, cr), sampling):
        p = np.repeat(np.repeat(comp[:, :, 0, 0], 8 * (vmax // vi), axis=0),
                      8 * (hmax // hi), axis=1).astype(np.float64)
        planes.append(p)
    yf, cbf, crf = planes[0], planes[1] - 128.0, planes[2] - 128.0
    return np.clip(
        np.floor(
            np.stack(
                [yf + 1.402 * crf,
                 yf - 0.344136 * cbf - 0.714136 * crf,
                 yf + 1.772 * cbf], axis=2
            ) + 0.5
        ), 0, 255,
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "sampling",
    [
        [(4, 1), (1, 1), (1, 1)],  # 4:1:1 (DV-style)
        [(3, 1), (1, 1), (1, 1)],  # 3:1:1 — the round-8 seam close
        [(1, 3), (1, 1), (1, 1)],  # vertical 3-factor twin
        [(4, 2), (2, 1), (1, 1)],  # mixed dividing ladder 4/2/1
        [(3, 3), (1, 1), (1, 1)],  # 3x3 luma
    ],
)
def test_wide_sampling_factors_roundtrip(sampling):
    """Round-8 seam close (VERDICT r7 'Next round' #4): sampling
    factors in the full T.81 1..4 envelope decode bit-exact — the MCU
    walk and floor-replication upsample were already generic in
    (H, V); only the guards said {1, 2}."""
    from blockchain_indexer_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(sum(h * 16 + v for h, v in sampling))
    mby, mbx = 2, 3
    h0, v0 = sampling[0]
    comps = [_solid_blocks(rng, mby, mbx, hi, vi) for hi, vi in sampling]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    w, h, nch, px = decode_jpeg(encode_jpeg(comps, sampling=sampling))
    assert (w, h, nch) == (8 * hmax * mbx, 8 * vmax * mby, 3)
    assert np.array_equal(px, _expect_rgb(*comps, sampling))


def test_wide_sampling_factors_progressive_matches_baseline():
    """Progressive decode under the widened envelope: 4:1:1 and 3:1:1
    solid-block streams must equal their baseline twins pixel-exact."""
    from blockchain_indexer_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    for sampling in ([(4, 1), (1, 1), (1, 1)], [(3, 1), (1, 1), (1, 1)]):
        rng = np.random.default_rng(13 + sampling[0][0])
        comps = [_solid_blocks(rng, 2, 2, hi, vi) for hi, vi in sampling]
        base = decode_jpeg(encode_jpeg(comps, sampling=sampling))
        prog = decode_jpeg(encode_jpeg_progressive(comps, sampling=sampling))
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3]), sampling


def test_wide_sampling_envelope_randomized():
    """Seeded sweep across the whole T.81 envelope: random dividing
    (H, V) ladders, random MCU grids, random solid-block values — the
    decode must equal the independent replication+JFIF reference for
    every draw. Complements the five hand-picked configs above."""
    from blockchain_indexer_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(97)
    dividers = {1: [1], 2: [1, 2], 3: [1, 3], 4: [1, 2, 4]}
    for trial in range(20):
        hmax = int(rng.integers(1, 5))
        vmax = int(rng.integers(1, 5))
        sampling = [(hmax, vmax)]
        for _ in range(2):
            sampling.append(
                (int(rng.choice(dividers[hmax])), int(rng.choice(dividers[vmax])))
            )
        mby, mbx = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        comps = [_solid_blocks(rng, mby, mbx, hi, vi) for hi, vi in sampling]
        w, h, nch, px = decode_jpeg(encode_jpeg(comps, sampling=sampling))
        assert (w, h, nch) == (8 * hmax * mbx, 8 * vmax * mby, 3), (trial, sampling)
        assert np.array_equal(px, _expect_rgb(*comps, sampling)), (trial, sampling)
