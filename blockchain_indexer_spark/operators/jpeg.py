"""Pure-Python/numpy baseline JPEG codec (grayscale).

The third REAL compressed decode path (after PNG and GIF in
operators/multimodal.py): a genuine ITU-T.81 baseline sequential
decoder — marker walk, DQT/DHT/SOF0/DRI/SOS parse, canonical Huffman
decode with byte unstuffing and restart-marker handling, dequantize,
de-zigzag, float64 IDCT, level shift — plus the fixture encoder that
synthesizes real JPEG streams whose decoded pixels are closed-form.

Scope: 8-bit baseline GRAYSCALE (one component). Color scans raise
NotImplementedError — the chroma upsample + YCbCr matrix introduces
engine-specific rounding that has no cross-engine oracle, so color
JPEG stays behind the PIL seam in decode_image_real (the same honest
input-domain guard as non-24bpp BMP / non-PCM WAV).

Exactness contract (what makes a LOSSY format oracle-gateable): the
fixture encoder emits solid 8x8 blocks with an all-ones quantization
table. A constant block's FDCT is DC-only with S00 = 8*(v-128) — an
integer, exact under round(), exact under q=1 quantization — and the
float64 IDCT of a DC-only block is constant to ~1e-13, so the decoder
recovers v EXACTLY after rounding. The entropy layer is still fully
real: per-block DC prediction diffs, canonical Huffman codes of
varying lengths, EOB per block, 0xFF byte stuffing, restart markers
with predictor reset. The AC path (runs, ZRL, magnitude categories)
is exercised by tests against a direct-summation IDCT reference.

Cited parity seam: the reference indexer has no media surface; this
extends SURVEY.md SS2's multimodal column family (decode stubs ->
real parsers, VERDICT r2 #5 / r3 #5 lineage).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

#: Annex K DC luminance code lengths: BITS[i] = #codes of length i+1.
DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
#: categories 0..11 in canonical order.
DC_VALS = tuple(range(12))

#: Compact valid AC table (canonical, Kraft sum < 1): EOB, ZRL and the
#: small run/size symbols the tests drive. Fixtures only emit EOB.
AC_BITS = (0, 1, 3, 4, 3, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0)
AC_VALS = (
    0x00,                    # len 2: EOB
    0x01, 0x02, 0x11,        # len 3
    0x03, 0x21, 0x12, 0x31,  # len 4
    0x04, 0x13, 0x22,        # len 5
    0x41,                    # len 6
    0x05,                    # len 7
    0xF0,                    # len 8: ZRL
)
# (2+2+3+1+1 = 9 symbols: len2 x2, len3 x2... see BITS; last is ZRL)


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag scan order, generated (not typed) — entry k
    is the (row*8+col) raster index of the k-th zigzag position."""
    order = []
    r = c = 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return np.asarray(order, dtype=np.int64)


ZIGZAG = _zigzag_order()

#: Orthonormal 8-point DCT basis: A[u, x] = 0.5 * C_u * cos((2x+1)u pi/16),
#: C_0 = 1/sqrt(2), else 1. IDCT(S) = A.T @ S @ A (T.81 formula).
_A = np.array(
    [
        [
            0.5 * (1.0 / np.sqrt(2.0) if u == 0 else 1.0) * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)


def idct_block(coefs: np.ndarray) -> np.ndarray:
    """Float64 2-D inverse DCT of one 8x8 coefficient block."""
    return _A.T @ coefs.astype(np.float64) @ _A


# ----------------------------------------------------------- huffman bits


def build_huffman(bits: tuple[int, ...], vals: tuple[int, ...]) -> dict[tuple[int, int], int]:
    """Canonical Huffman table per T.81 C.2: {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("BITS/HUFFVAL length mismatch")
    return table


def _encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code) for the encoder."""
    return {sym: lc for lc, sym in build_huffman(bits, vals).items()}


class BitWriter:
    """MSB-first bit writer with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def pad_align(self) -> None:
        """Fill the current byte with 1-bits (T.81 F.1.2.3)."""
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)

    def raw_marker(self, byte2: int) -> None:
        """Emit an unstuffed 0xFF <byte2> marker (RSTn)."""
        self.pad_align()
        self.out.extend((0xFF, byte2))


class BitReader:
    """MSB-first reader over entropy-coded data: unstuffs 0xFF00,
    stops at markers, surfaces RSTn for the MCU loop."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None  # pending non-RST marker

    def _next_byte(self) -> int | None:
        while True:
            if self.pos >= len(self.buf):
                return None
            b = self.buf[self.pos]
            self.pos += 1
            if b != 0xFF:
                return b
            nxt = self.buf[self.pos] if self.pos < len(self.buf) else None
            if nxt == 0x00:
                self.pos += 1
                return 0xFF
            # a real marker: do not consume here, record and stop
            self.marker = nxt
            self.pos -= 1
            return None

    def read_bit(self) -> int:
        if self._n == 0:
            b = self._next_byte()
            if b is None:
                raise EOFError("entropy data exhausted")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def sync_restart(self) -> int:
        """Byte-align and consume an expected RSTn; return its index."""
        self._n = 0
        if (
            self.pos + 1 < len(self.buf)
            and self.buf[self.pos] == 0xFF
            and 0xD0 <= self.buf[self.pos + 1] <= 0xD7
        ):
            m = self.buf[self.pos + 1]
            self.pos += 2
            self.marker = None
            return m - 0xD0
        raise ValueError("expected restart marker")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 magnitude extension."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v != 0 else 0


def _magnitude_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


# ---------------------------------------------------------------- encoder


def encode_jpeg_gray(
    blocks: np.ndarray,
    restart_interval: int = 0,
    quant: np.ndarray | None = None,
) -> bytes:
    """Encode a grayscale image given as an array of spatial 8x8
    blocks, shape (nby, nbx, 8, 8) uint8 — a REAL baseline stream:
    FDCT + quantize + zigzag + DC-diff/AC-run Huffman coding with the
    module tables, optional restart markers, planted APP0 + COM
    segments. The AC symbols used must exist in AC_VALS (the fixture
    path emits solid blocks -> EOB only)."""
    nby, nbx = blocks.shape[:2]
    h, w = nby * 8, nbx * 8
    qt = np.ones((8, 8), dtype=np.int64) if quant is None else quant.astype(np.int64)
    dc_enc = _encode_table(DC_BITS, DC_VALS)
    ac_enc = _encode_table(AC_BITS, AC_VALS)

    bw = BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.raw_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                pred = 0
            spatial = blocks[by, bx].astype(np.float64) - 128.0
            coefs = _A @ spatial @ _A.T  # forward DCT (orthonormal)
            q = np.round(coefs / qt).astype(np.int64)
            zz = q.reshape(64)[ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            size = _category(diff)
            ln, code = dc_enc[size]
            bw.write(code, ln)
            if size:
                bw.write(_magnitude_bits(diff, size), size)
            # AC: run-length of zeros, then (run, size) symbol + bits
            k = 1
            while k < 64:
                run = 0
                while k < 64 and zz[k] == 0:
                    run += 1
                    k += 1
                if k == 64:
                    ln, code = ac_enc[0x00]  # EOB
                    bw.write(code, ln)
                    break
                while run >= 16:
                    ln, code = ac_enc[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                v = int(zz[k])
                size = _category(v)
                sym = (run << 4) | size
                if sym not in ac_enc:
                    raise ValueError(f"AC symbol {sym:#x} not in fixture table")
                ln, code = ac_enc[sym]
                bw.write(code, ln)
                bw.write(_magnitude_bits(v, size), size)
                k += 1
            mcu += 1
    bw.pad_align()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes(int(qt.reshape(64)[ZIGZAG][i]) for i in range(64)))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes((1, 0x11, 0)))
    dht = seg(
        0xC4,
        b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
        + b"\x10" + bytes(AC_BITS) + bytes(AC_VALS),
    )
    sos = seg(0xDA, bytes((1, 1, 0x00)) + bytes((0, 63, 0)))
    parts = [
        b"\xff\xd8",  # SOI
        seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
        seg(0xFE, b"synthetic fixture"),  # COM — parsers must skip it
        dqt,
        sof,
        dht,
    ]
    if restart_interval:
        parts.append(seg(0xDD, struct.pack(">H", restart_interval)))
    parts += [sos, bytes(bw.out), b"\xff\xd9"]
    return b"".join(parts)


# ---------------------------------------------------------------- decoder


def decode_jpeg_gray(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline sequential GRAYSCALE JPEG.

    Returns (width, height, uint8 array of shape (height, width)).
    Raises NotImplementedError for color scans / progressive frames
    (PIL seam) and ValueError for malformed streams.
    """
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = 0
    comp_qt = 0
    restart_interval = 0
    scan_dc_id = scan_ac_id = 0

    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seg_len,) = struct.unpack(">H", buf[pos : pos + 2])
        body = buf[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT — possibly several tables
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    vals = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                qt = np.zeros(64, dtype=np.int64)
                qt[ZIGZAG] = vals
                qtables[tq] = qt.reshape(8, 8)
        elif marker == 0xC4:  # DHT — possibly several tables
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                i += 1
                bits = tuple(body[i : i + 16])
                i += 16
                n = sum(bits)
                vals = tuple(body[i : i + n])
                i += n
                htables[(tc, th)] = build_huffman(bits, vals)
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, nf = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if nf != 1:
                raise NotImplementedError(
                    "color JPEG not supported in-repo (PIL seam)"
                )
            comp_qt = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("non-baseline JPEG frame (PIL seam)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise NotImplementedError("multi-component scan (PIL seam)")
            scan_dc_id, scan_ac_id = body[2] >> 4, body[2] & 0x0F
            break
        # APPn / COM / others: skipped
    else:
        raise ValueError("no SOS marker")

    if not h or not w:
        raise ValueError("SOS before SOF0")
    qt = qtables[comp_qt]
    dc_tab = htables[(0, scan_dc_id)]
    ac_tab = htables[(1, scan_ac_id)]

    nbx, nby = (w + 7) // 8, (h + 7) // 8
    pixels = np.zeros((nby * 8, nbx * 8), dtype=np.uint8)
    br = BitReader(buf, pos)
    pred = 0
    expected_rst = 0
    mcu = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                got = br.sync_restart()
                if got != expected_rst:
                    raise ValueError("restart marker out of sequence")
                expected_rst = (expected_rst + 1) % 8
                pred = 0
            zz = np.zeros(64, dtype=np.int64)
            size = br.decode_symbol(dc_tab)
            diff = _extend(br.read_bits(size), size) if size else 0
            pred += diff
            zz[0] = pred
            k = 1
            while k < 64:
                rs = br.decode_symbol(ac_tab)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += rs >> 4
                if k > 63:
                    raise ValueError("AC run past block end")
                s = rs & 0x0F
                zz[k] = _extend(br.read_bits(s), s)
                k += 1
            coefs = np.zeros(64, dtype=np.int64)
            coefs[ZIGZAG] = zz
            spatial = idct_block(coefs.reshape(8, 8) * qt) + 128.0
            pixels[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(spatial), 0, 255
            ).astype(np.uint8)
            mcu += 1
    return w, h, pixels[:h, :w]


# --------------------------------------------------------------- fixtures


def synth_jpeg_blob(doc_id: int) -> bytes:
    """The fixture stream for mm_real_jpeg: solid 8x8 blocks whose
    gray values are closed-form in (doc_id, bx, by) —

        width = 8*(1 + id%4), height = 8*(1 + id%3)
        v(bx, by) = (7*id + 13*bx + 3*by) % 256

    so a DuckDB oracle enumerates block values by arithmetic, while
    the decoder runs the full real pipeline (markers, canonical
    Huffman with DC prediction diffs, restart every 3 MCUs with
    predictor reset, 0xFF stuffing, all-ones quantization, IDCT)."""
    nbx, nby = 1 + doc_id % 4, 1 + doc_id % 3
    bx = np.arange(nbx, dtype=np.int64)[None, :]
    by = np.arange(nby, dtype=np.int64)[:, None]
    v = (7 * doc_id + 13 * bx + 3 * by) % 256
    blocks = np.broadcast_to(
        v[:, :, None, None].astype(np.uint8), (nby, nbx, 8, 8)
    )
    return encode_jpeg_gray(np.ascontiguousarray(blocks), restart_interval=3)
