"""Pure-Python/numpy baseline JPEG codec.

The third REAL compressed decode path (after PNG and GIF in
operators/multimodal.py): a genuine ITU-T.81 baseline sequential
decoder — marker walk, DQT/DHT/SOF0/DRI/SOS parse, canonical Huffman
decode with byte unstuffing and restart-marker handling, dequantize,
de-zigzag, float64 IDCT, level shift — plus the fixture encoder that
synthesizes real JPEG streams whose decoded pixels are closed-form.

Scope: 8-bit baseline, GRAYSCALE, interleaved 4:4:4 color, and
chroma-subsampled color with factors in the full T.81 1..4 envelope
(4:2:0 / 4:2:2 / 4:1:1 / 3:1:1 and friends — widened from {1, 2} in
round 8) under
a PINNED floor-replication upsample (decode_jpeg docstring) and the
JFIF YCbCr matrix with floor(x+0.5) rounding — every rounding choice
closed-form so the DuckDB oracles reproduce decoded pixels exactly —
plus PROGRESSIVE (SOF2) grayscale AND 4:4:4 color with BOTH
progressive dimensions: spectral selection (multi-scan coefficient
accumulation, an interleaved DC scan with per-component predictors,
non-interleaved per-component AC band scans, T.81 G.1.2.2 EOBn
end-of-band run decoding) and SUCCESSIVE APPROXIMATION (T.81
G.1.2.1/G.1.2.3: point-transformed first scans, raw-bit DC
refinement, and AC refinement scans that insert newly-significant
+-1<<Al coefficients while streaming correction bits for the
already-nonzero history — including correction bits carried inside
EOBn runs), in decode_jpeg_progressive — and SUBSAMPLED progressive
with factors in {1, 2} (MCU-interleaved DC scans over padded grids,
per-component non-interleaved AC scans, the same pinned floor
upsample as baseline; same 1..4 envelope). RESTART INTERVALS (DRI +
RSTn, T.81 E.2.4)
are honored in every scan kind — baseline, progressive first AND
refinement scans: byte-aligned resync with marker-sequence checks,
DC-predictor resets, EOB runs (with their buffered refinement
correction bits) bounded by the interval. Sampling factors outside
1..4 are malformed per T.81 B.2.2 (ValueError). Two former seams
closed in round 9: sampled SINGLE-component frames decode natively
(with one component the declared factors cancel — T.81 A.1.1, x_i =
ceil(X·H_i/Hmax) with H = Hmax — and one-component scans are
non-interleaved anyway, so the factors normalize to 1x1, test-pinned
equal to the 1x1-declared twin on patched SOF bytes); and
NON-DIVIDING sampling ratios (e.g. Y 3x1 against Cb 2x1) decode
natively too — the pinned floor-replication upsample was always an
index formula, (x·H_i // Hmax, y·V_i // Vmax), which expresses
fractional replication as naturally as integral, so the divisibility
guard was the only blocker (the gather form is bit-identical to the
old np.repeat for dividing ratios, test-pinned).

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


def _fdct_zz_blocks(comp: np.ndarray, qt: np.ndarray) -> list:
    """FDCT + quantize + zigzag every 8x8 block of a (nby, nbx, 8, 8)
    component in one batched matmul; returns raster-order rows of 64
    quantized zigzag coefficients. Bit-identical to the former
    per-block ``_A @ s @ _A.T`` loop: numpy's stacked matmul runs the
    same dgemm per slice (round 10, guide §4.2)."""
    spatial = comp.reshape(-1, 8, 8).astype(np.float64) - 128.0
    coefs = np.matmul(np.matmul(_A, spatial), _A.T)
    q = np.round(coefs / qt).astype(np.int64)
    return list(q.reshape(-1, 64)[:, ZIGZAG])


# ----------------------------------------------------------- huffman bits


class _HuffTable(dict):
    """Canonical Huffman table {(length, code): symbol} carrying a
    16-bit-window lookup list for the fast decoder: ``lut[w]`` packs
    (code_length << 8) | symbol for every 16-bit window ``w`` whose
    prefix is that code, 0 where no code matches. Plain-dict reads
    behave exactly as before; the LUT is an access-path optimization
    only (round 10, guide §4.2 — the per-bit dict walk dominated the
    JPEG entropy decode)."""

    __slots__ = ("lut",)


#: build_huffman is a pure function of its (bits, vals) spec; the
#: fixture streams reuse a handful of tables across every blob, so the
#: table (and its 64k-entry LUT) is built once per Python worker
#: instead of once per blob. This caches decoder STRUCTURE derived
#: from the table spec — never data or results.
_HUFF_CACHE: dict[tuple[tuple[int, ...], tuple[int, ...]], _HuffTable] = {}


def build_huffman(bits: tuple[int, ...], vals: tuple[int, ...]) -> dict[tuple[int, int], int]:
    """Canonical Huffman table per T.81 C.2: {(length, code): symbol}."""
    key = (tuple(bits), tuple(vals))
    cached = _HUFF_CACHE.get(key)
    if cached is not None:
        return cached
    table = _HuffTable()
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
    lut = [0] * 65536
    for (length, c), sym in table.items():
        start = c << (16 - length)
        lut[start : start + (1 << (16 - length))] = [(length << 8) | sym] * (
            1 << (16 - length)
        )
    table.lut = lut
    _HUFF_CACHE[key] = table
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
        # multi-bit accumulate (round 10): drains whole bytes instead
        # of shifting bit-at-a-time — same bits out, ~nbits x fewer
        # interpreted steps (the writer was the synth UDFs' hot path)
        if not nbits:
            return
        acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        n = self._n + nbits
        out = self.out
        while n >= 8:
            n -= 8
            b = (acc >> n) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        self._acc = acc & ((1 << n) - 1)
        self._n = n

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
    stops at markers, surfaces RSTn for the MCU loop.

    Round 10 (guide §4.2): instead of a per-bit loop with per-byte
    stuffing/marker logic, the whole entropy SEGMENT (up to the next
    real marker) is unstuffed once with C-speed ``bytes`` primitives,
    bits are served from a Python-int accumulator, and Huffman symbols
    resolve through the table's 16-bit-window LUT in O(1). Same bits,
    same EOFError/ValueError behavior on malformed streams, same
    ``pos`` contract (``pos`` = one past the last byte consumed, which
    at a segment boundary is the 0xFF of the pending marker)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self._bitbuf = 0
        self._nbits = 0
        self.marker: int | None = None  # pending non-RST marker
        self._seg_start = pos
        self._load_segment()

    def _load_segment(self) -> None:
        """Unstuff from _seg_start to the next real marker (or EOF):
        every 0xFF00 becomes a 0xFF data byte; a 0xFF followed by
        anything else (or by nothing) ends the segment."""
        buf = self.buf
        i = start = self._seg_start
        n = len(buf)
        chunks = []
        while True:
            j = buf.find(b"\xff", i)
            if j < 0:
                chunks.append(buf[start:n])
                break
            if j + 1 < n and buf[j + 1] == 0x00:
                chunks.append(buf[start : j + 1])  # keep 0xFF, drop stuffing
                i = start = j + 2
                continue
            chunks.append(buf[start:j])  # marker (or trailing 0xFF): stop
            break
        self._data = b"".join(chunks)
        self._dpos = 0

    @property
    def pos(self) -> int:
        # original-buffer offset after the last consumed byte: each
        # consumed 0xFF data byte also consumed its stuffed 0x00
        d = self._dpos
        return self._seg_start + d + self._data.count(0xFF, 0, d)

    def _fill(self, need: int) -> None:
        take = (need - self._nbits + 7) >> 3
        p = self._dpos
        avail = len(self._data) - p
        if take > avail:
            take = avail
        if take > 0:
            self._bitbuf = (self._bitbuf << (8 * take)) | int.from_bytes(
                self._data[p : p + take], "big"
            )
            self._nbits += 8 * take
            self._dpos = p + take

    def read_bit(self) -> int:
        n = self._nbits
        if n == 0:
            self._fill(1)
            n = self._nbits
            if n == 0:
                raise EOFError("entropy data exhausted")
        n -= 1
        self._nbits = n
        v = (self._bitbuf >> n) & 1
        self._bitbuf &= (1 << n) - 1
        return v

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self._nbits < n:
            self._fill(n)
            if self._nbits < n:
                raise EOFError("entropy data exhausted")
        rem = self._nbits - n
        self._nbits = rem
        v = self._bitbuf >> rem
        self._bitbuf &= (1 << rem) - 1
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        lut = getattr(table, "lut", None)
        if lut is None:  # externally-built plain dict: original walk
            code = 0
            for length in range(1, 17):
                code = (code << 1) | self.read_bit()
                sym = table.get((length, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid Huffman code in scan")
        n = self._nbits
        if n < 16:
            self._fill(16)
            n = self._nbits
        window = (
            (self._bitbuf >> (n - 16)) if n >= 16 else (self._bitbuf << (16 - n))
        ) & 0xFFFF
        entry = lut[window]
        length = entry >> 8
        if length == 0 or length > n:
            if n < 16:
                # ran out of data before any code could complete
                raise EOFError("entropy data exhausted")
            raise ValueError("invalid Huffman code in scan")
        rem = n - length
        self._nbits = rem
        self._bitbuf &= (1 << rem) - 1
        return entry & 0xFF

    def sync_restart(self) -> int:
        """Byte-align and consume an expected RSTn; return its index."""
        self._bitbuf = 0
        self._nbits = 0
        buf = self.buf
        p = self.pos
        if (
            self._dpos == len(self._data)
            and p + 1 < len(buf)
            and buf[p] == 0xFF
            and 0xD0 <= buf[p + 1] <= 0xD7
        ):
            m = buf[p + 1]
            self.marker = None
            self._seg_start = p + 2
            self._load_segment()
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


def _encode_block(
    bw: BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_enc: dict[int, tuple[int, int]],
    ac_enc: dict[int, tuple[int, int]],
) -> int:
    """Entropy-code one zigzagged quantized block; returns the new DC
    predictor."""
    if isinstance(zz, np.ndarray):
        zz = zz.tolist()  # the run loops below are per-element: Python
        # ints beat numpy scalar reads ~5x (round 10, guide §4.2)
    diff = zz[0] - pred
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
        v = zz[k]
        size = _category(v)
        sym = (run << 4) | size
        if sym not in ac_enc:
            raise ValueError(f"AC symbol {sym:#x} not in fixture table")
        ln, code = ac_enc[sym]
        bw.write(code, ln)
        bw.write(_magnitude_bits(v, size), size)
        k += 1
    return zz[0]


def encode_jpeg(
    components: list[np.ndarray],
    restart_interval: int = 0,
    quant: np.ndarray | None = None,
    sampling: list[tuple[int, int]] | None = None,
) -> bytes:
    """Encode a baseline stream from 1 (grayscale) or 3 (YCbCr)
    component arrays of spatial 8x8 blocks: FDCT + quantize + zigzag
    + DC-diff/AC-run Huffman coding with the module tables,
    INTERLEAVED MCUs (per-component DC predictors), optional restart
    markers (all predictors reset), planted APP0 + COM segments. The
    AC symbols used must exist in AC_VALS (the fixture path emits
    solid blocks -> EOB only).

    ``sampling``: per-component (H, V) factors, default all (1, 1)
    (grayscale / 4:4:4). For 4:2:0 pass [(2, 2), (1, 1), (1, 1)]:
    with an MCU grid of (mby, mbx), component ci must be shaped
    (mby * V_i, mbx * H_i, 8, 8) and each MCU interleaves its blocks
    row-major (Y00 Y01 Y10 Y11 Cb Cr for 4:2:0, T.81 A.2.3)."""
    nf = len(components)
    if nf not in (1, 3):
        raise ValueError("1 (gray) or 3 (YCbCr) components")
    if sampling is None:
        sampling = [(1, 1)] * nf
    if len(sampling) != nf:
        raise ValueError("one (H, V) pair per component")
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    h0, v0 = sampling[0]
    mby, mbx = components[0].shape[0] // v0, components[0].shape[1] // h0
    for ci, comp in enumerate(components):
        hi, vi = sampling[ci]
        if comp.shape != (mby * vi, mbx * hi, 8, 8):
            raise ValueError(
                f"component {ci}: expected block dims "
                f"{(mby * vi, mbx * hi, 8, 8)}, got {comp.shape}"
            )
    h, w = mby * vmax * 8, mbx * hmax * 8
    qt = np.ones((8, 8), dtype=np.int64) if quant is None else quant.astype(np.int64)
    dc_enc = _encode_table(DC_BITS, DC_VALS)
    ac_enc = _encode_table(AC_BITS, AC_VALS)

    # FDCT + quantize + zigzag for ALL blocks per component in one
    # batched matmul (round 10, guide §4.2) — numpy's stacked matmul
    # runs the identical dgemm per 8x8 slice, so the quantized
    # coefficients are bit-identical to the former per-block loop
    # (synth outputs byte-compared against the old path, test-pinned)
    zz_all = []
    for comp in components:
        spatial = comp.reshape(-1, 8, 8).astype(np.float64) - 128.0
        coefs = np.matmul(np.matmul(_A, spatial), _A.T)
        q = np.round(coefs / qt).astype(np.int64)
        zz_all.append(q.reshape(-1, 64)[:, ZIGZAG].tolist())

    bw = BitWriter()
    preds = [0] * nf
    mcu = 0
    rst = 0
    for by in range(mby):
        for bx in range(mbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.raw_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * nf
            for ci in range(nf):
                hi, vi = sampling[ci]
                row_blocks = mbx * hi
                for vy in range(vi):
                    for vx in range(hi):
                        zz = zz_all[ci][
                            (by * vi + vy) * row_blocks + bx * hi + vx
                        ]
                        preds[ci] = _encode_block(bw, zz, preds[ci], dc_enc, ac_enc)
            mcu += 1
    bw.pad_align()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes(int(qt.reshape(64)[ZIGZAG][i]) for i in range(64)))
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, nf)
        + b"".join(
            bytes((cid + 1, (sampling[cid][0] << 4) | sampling[cid][1], 0))
            for cid in range(nf)
        ),
    )
    dht = seg(
        0xC4,
        b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
        + b"\x10" + bytes(AC_BITS) + bytes(AC_VALS),
    )
    sos = seg(
        0xDA,
        bytes((nf,))
        + b"".join(bytes((cid + 1, 0x00)) for cid in range(nf))
        + bytes((0, 63, 0)),
    )
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


def encode_jpeg_gray(
    blocks: np.ndarray,
    restart_interval: int = 0,
    quant: np.ndarray | None = None,
) -> bytes:
    """Single-component convenience wrapper over ``encode_jpeg``."""
    return encode_jpeg([blocks], restart_interval, quant)


# ---------------------------------------------------------------- decoder


def decode_jpeg(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline sequential JPEG: GRAYSCALE, 4:4:4 or
    chroma-subsampled (4:2:0 / 4:2:2) YCbCr color — interleaved MCUs
    carrying H_i x V_i blocks per component in row-major order with
    per-component DC predictors (T.81 A.2.3).

    Returns (width, height, n_channels, pixels): shape (h, w) uint8
    for grayscale, (h, w, 3) uint8 RGB for color. Subsampled chroma
    planes are upsampled by PINNED floor-replication — output pixel
    (x, y) reads chroma sample (x * H_i // Hmax, y * V_i // Vmax),
    i.e. nearest-neighbor block replication, NOT libjpeg's triangular
    interpolation. The convention is part of this codec's contract:
    it is closed-form (a SQL oracle indexes the chroma grid with
    integer division), and fancier filters differ only inside
    gradient images, never on the solid-block fixtures. The
    YCbCr -> RGB transform is the JFIF matrix evaluated in float64 on
    the (upsampled) integer planes with floor(x + 0.5) rounding — a
    closed-form expression a SQL oracle mirrors exactly (np.round's
    half-to-even vs SQL round's half-away would diverge on exact .5).
    Sampling factors cover the full T.81 envelope 1..4 per axis
    (4:2:0/4:2:2/4:1:1/3:1:1 and friends — the round-8 seam close),
    INCLUDING non-dividing ratios like Y 3x1 with Cb 2x1 (round 9:
    the floor-replication index formula expresses fractional
    replication directly); factors outside 1..4 are malformed per
    T.81 B.2.2 and raise ValueError; progressive (SOF2) streams dispatch to
    decode_jpeg_progressive, which handles spectral selection,
    successive approximation, and the same sampling envelope;
    malformed streams raise ValueError.
    """
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = 0
    frame_comps: list[tuple[int, int, int, int]] = []  # (cid, tq, H, V)
    scan_tabs: dict[int, tuple[int, int]] = {}  # comp id -> (dc, ac)
    scan_order: list[int] = []
    restart_interval = 0

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
            if nf not in (1, 3):
                raise NotImplementedError(
                    f"{nf}-component JPEG not supported in-repo (PIL seam)"
                )
            if len(body) < 6 + 3 * nf:
                raise ValueError("truncated SOF0 component list")
            for ci in range(nf):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hs, vs = sampling >> 4, sampling & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    # T.81 B.2.2: H/V in 1..4; anything else is a
                    # malformed frame, not a seam
                    raise ValueError(
                        f"sampling factor {hs}x{vs} outside T.81 range"
                    )
                if nf == 1:
                    # T.81 A.1.1: with a single component H = Hmax and
                    # V = Vmax, so the declared factors cancel in
                    # x_i = ceil(X·H_i/Hmax) — the component raster is
                    # full-size — and a one-component scan is
                    # non-interleaved (MCU = one data unit, A.2.3)
                    # regardless of H/V: the 1x1 walk IS the correct
                    # walk. Normalize instead of raising (the former
                    # "sampled single-component (PIL seam)" guard —
                    # closed in round 9; equality with the 1x1-declared
                    # twin is test-pinned on patched SOF bytes).
                    hs = vs = 1
                frame_comps.append((cid, tq, hs, vs))
        elif marker == 0xC2:
            # progressive: multi-scan coefficient accumulation — its
            # own walk (grayscale spectral selection in-repo; color /
            # successive approximation guard inside)
            return decode_jpeg_progressive(buf)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("non-baseline JPEG frame (PIL seam)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != len(frame_comps):
                raise NotImplementedError(
                    "partial-component scan (PIL seam)"
                )
            frame_ids = {cid for cid, _, _, _ in frame_comps}
            for ci in range(ns):
                cid = body[1 + 2 * ci]
                tt = body[2 + 2 * ci]
                if cid not in frame_ids:
                    raise ValueError(f"SOS references unknown component {cid}")
                scan_tabs[cid] = (tt >> 4, tt & 0x0F)
                scan_order.append(cid)
            break
        # APPn / COM / others: skipped
    else:
        raise ValueError("no SOS marker")

    if not h or not w or not frame_comps:
        raise ValueError("SOS before SOF0")
    comp_qt = {cid: qtables[tq] for cid, tq, _, _ in frame_comps}
    comp_hv = {cid: (hs, vs) for cid, _, hs, vs in frame_comps}
    hmax = max(hs for _, _, hs, _ in frame_comps)
    vmax = max(vs for _, _, _, vs in frame_comps)

    # MCU grid covers the image at FULL resolution in hmax*8 x vmax*8
    # tiles; each component stores its own (possibly smaller) plane.
    mbx, mby = (w + 8 * hmax - 1) // (8 * hmax), (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        cid: np.zeros((mby * vs * 8, mbx * hs * 8), dtype=np.uint8)
        for cid, _, hs, vs in frame_comps
    }
    br = BitReader(buf, pos)
    preds = {cid: 0 for cid in scan_order}
    pend: dict[int, list] = {cid: [] for cid in scan_order}
    expected_rst = 0
    mcu = 0
    for by in range(mby):
        for bx in range(mbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                got = br.sync_restart()
                if got != expected_rst:
                    raise ValueError("restart marker out of sequence")
                expected_rst = (expected_rst + 1) % 8
                preds = {cid: 0 for cid in scan_order}
            for cid in scan_order:
                dc_tab = htables[(0, scan_tabs[cid][0])]
                ac_tab = htables[(1, scan_tabs[cid][1])]
                hs, vs = comp_hv[cid]
                for vy in range(vs):
                    for vx in range(hs):
                        zz = [0] * 64  # Python ints: the scatter below
                        # converts once, beats 64 numpy scalar writes
                        size = br.decode_symbol(dc_tab)
                        diff = _extend(br.read_bits(size), size) if size else 0
                        preds[cid] += diff
                        zz[0] = preds[cid]
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
                            sz = rs & 0x0F
                            zz[k] = _extend(br.read_bits(sz), sz)
                            k += 1
                        # defer dequant + IDCT: batched per component
                        # after the walk (one stacked matmul — same
                        # dgemm per slice, bit-identical; round 10)
                        pend[cid].append((by * vs + vy, bx * hs + vx, zz))
            mcu += 1
    for cid, items in pend.items():
        if not items:
            continue
        dez = np.zeros((len(items), 64), dtype=np.int64)
        dez[:, ZIGZAG] = np.array([zz for _, _, zz in items], dtype=np.int64)
        blocks8 = (dez.reshape(-1, 8, 8) * comp_qt[cid]).astype(np.float64)
        spatial = np.matmul(np.matmul(_A.T, blocks8), _A) + 128.0
        out8 = np.clip(np.round(spatial), 0, 255).astype(np.uint8)
        pl = planes[cid]
        for (byy, bxx, _), blk in zip(items, out8):
            pl[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = blk
    # Floor-replication upsample of subsampled planes (see docstring:
    # pinned convention) — output pixel (x, y) reads chroma sample
    # (x·H_i // Hmax, y·V_i // Vmax). Index-gather instead of
    # np.repeat (round 9): the same bits for dividing ratios (y·vs //
    # vmax == y // (vmax/vs) when vs | vmax) AND the natural
    # fractional replication for non-dividing ones (the former
    # "non-dividing sampling ratio (PIL seam)" guard), sized to the
    # image directly so no separate crop is needed.
    cropped = []
    for cid, _, hs, vs in frame_comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            yi = (np.arange(h, dtype=np.int64) * vs) // vmax
            xi = (np.arange(w, dtype=np.int64) * hs) // hmax
            p = p[yi[:, None], xi[None, :]]
        cropped.append(p[:h, :w])
    if len(cropped) == 1:
        return w, h, 1, cropped[0]
    # JFIF YCbCr -> RGB on the integer planes, floor(x+0.5) rounding
    # (mirrorable in SQL; np.round half-to-even is not)
    y = cropped[0].astype(np.float64)
    cb = cropped[1].astype(np.float64) - 128.0
    cr = cropped[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    rgb = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return w, h, 3, rgb


def decode_jpeg_gray(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Grayscale-only convenience wrapper over ``decode_jpeg``; a
    color stream raises NotImplementedError (callers wanting color
    use decode_jpeg directly)."""
    w, h, nch, px = decode_jpeg(buf)
    if nch != 1:
        raise NotImplementedError("color stream: use decode_jpeg")
    return w, h, px


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

def synth_jpeg_color_blob(doc_id: int) -> bytes:
    """The fixture stream for mm_real_jpeg_color: a genuine baseline
    4:4:4 YCbCr stream with solid 8x8 blocks closed-form in
    (doc_id, bx, by) —

        width = 8*(1 + id%3), height = 8*(1 + id%2)
        Y(bx, by)  = (5*id + 11*bx + 3*by) % 256
        Cb(bx, by) = (3*id + 7*bx + 5*by) % 256
        Cr(bx, by) = (2*id + 5*bx + 7*by) % 256

    so a DuckDB oracle reproduces the decoded RGB per block with the
    same JFIF matrix + floor(x+0.5) + clip arithmetic, while the
    decoder exercises the full interleaved color path: three blocks
    per MCU, per-component DC predictors, restart every 2 MCUs
    resetting all three, and the color transform."""
    nbx, nby = 1 + doc_id % 3, 1 + doc_id % 2
    bx = np.arange(nbx, dtype=np.int64)[None, :]
    by = np.arange(nby, dtype=np.int64)[:, None]

    def plane(a, b, c):
        v = (a * doc_id + b * bx + c * by) % 256
        return np.ascontiguousarray(
            np.broadcast_to(v[:, :, None, None].astype(np.uint8), (nby, nbx, 8, 8))
        )

    comps = [plane(5, 11, 3), plane(3, 7, 5), plane(2, 5, 7)]
    return encode_jpeg(comps, restart_interval=2)


def synth_jpeg_420_blob(doc_id: int) -> bytes:
    """The fixture stream for mm_real_jpeg_420: a genuine baseline
    4:2:0 YCbCr stream — the subsampling real-world JPEGs
    overwhelmingly use. MCU grid (nmx, nmy) = (1 + id%2, 1 + id%3),
    image = 16*nmx x 16*nmy. Solid 8x8 luma blocks (bx in [0, 2*nmx),
    by in [0, 2*nmy)) and ONE solid chroma block per MCU
    (mx = bx // 2, my = by // 2):

        Y(bx, by)  = (5*id + 7*bx + 11*by) % 256
        Cb(mx, my) = (3*id + 5*mx + 7*my) % 256
        Cr(mx, my) = (2*id + 7*mx + 3*my) % 256

    Decoded under the pinned floor-replication upsample, every pixel
    of luma block (bx, by) gets the chroma of MCU (bx//2, by//2), so
    a DuckDB oracle enumerates the 64-pixel blocks by arithmetic and
    applies the same JFIF matrix + floor(x+0.5) + clip. The decoder
    meanwhile exercises the full 4:2:0 path: six blocks per MCU
    (Y00 Y01 Y10 Y11 Cb Cr), per-component DC prediction where Y's
    predictor chains across four blocks inside one MCU, restart every
    2 MCUs resetting all three, and the subsampled-plane upsample."""
    nmx, nmy = 1 + doc_id % 2, 1 + doc_id % 3
    ybx = np.arange(2 * nmx, dtype=np.int64)[None, :]
    yby = np.arange(2 * nmy, dtype=np.int64)[:, None]
    mx = np.arange(nmx, dtype=np.int64)[None, :]
    my = np.arange(nmy, dtype=np.int64)[:, None]

    def blocks(v, nby_, nbx_):
        return np.ascontiguousarray(
            np.broadcast_to(v[:, :, None, None].astype(np.uint8), (nby_, nbx_, 8, 8))
        )

    y = blocks((5 * doc_id + 7 * ybx + 11 * yby) % 256, 2 * nmy, 2 * nmx)
    cb = blocks((3 * doc_id + 5 * mx + 7 * my) % 256, nmy, nmx)
    cr = blocks((2 * doc_id + 7 * mx + 3 * my) % 256, nmy, nmx)
    return encode_jpeg(
        [y, cb, cr], restart_interval=2, sampling=[(2, 2), (1, 1), (1, 1)]
    )


def synth_jpeg_progressive_blob(doc_id: int) -> bytes:
    """The fixture stream for mm_real_jpeg_progressive: a genuine
    PROGRESSIVE (SOF2) stream per document cycling through SIX stream
    shapes (doc_id % 6) so the driver hashes every component path,
    both progressive dimensions, AND chroma subsampling:

        0: GRAYSCALE spectral selection — mm_real_jpeg closed form
            width = 8*(1 + id%4), height = 8*(1 + id%3)
            v(bx, by) = (7*id + 13*bx + 3*by) % 256
        1: 4:4:4 YCbCr spectral — mm_real_jpeg_color closed form
            width = 8*(1 + id%3), height = 8*(1 + id%2)
            Y=(5*id+11*bx+3*by)%256  Cb=(3*id+7*bx+5*by)%256
            Cr=(2*id+5*bx+7*by)%256
        2: grayscale SUCCESSIVE APPROXIMATION (al=2)
        3: 4:4:4 color SA (al=2)
        4: 4:2:0 SUBSAMPLED spectral — mm_real_jpeg_420 closed form
            MCU grid (1 + id%2, 1 + id%3), image 16nmx x 16nmy
            Y(bx, by) = (5*id + 7*bx + 11*by) % 256
            Cb(mx, my) = (3*id + 5*mx + 7*my) % 256
            Cr(mx, my) = (2*id + 7*mx + 3*my) % 256
        5: 4:2:0 subsampled SA (al=2)

    SA rows use a DC quant entry of 8, so the quantized DC equals
    v-128 (any parity) and the raw-bit DC refinement scans carry REAL
    bits while IDCT of dc*8 still reconstructs v exactly — one
    closed-form oracle covers all six shapes. ALL six shapes carry a
    RESTART INTERVAL of 2 MCUs (DRI + RSTn markers with predictor
    resets and interval-bounded EOBn runs in every scan — since
    round 7 that includes the SA rows' raw-bit DC refinement and
    correction-bit AC refinement scans), so the driver hashes the
    restart resync path through every scan kind; restarts do not
    change decoded pixels, keeping the oracle untouched. Solid blocks keep the
    decoded pixels closed-form, but the entropy layer is genuinely
    progressive: interleaved (MCU-ordered when subsampled) DC first
    scan with per-component predictors, per-component non-interleaved
    AC band scans over the (1-5, 6-63) split coded as T.81 G.1.2.2
    EOBn runs, point-transformed first scans plus two refinement
    levels for the SA rows, and the pinned floor-replication chroma
    upsample + JFIF matrix with floor(x+0.5) for the color rows."""
    shape = doc_id % 6
    sa = shape in (2, 3, 5)
    qt = np.ones((8, 8), dtype=np.int64)
    qt[0, 0] = 8  # quantized DC = v-128: real refinement bits

    def solid(v, nby_, nbx_):
        return np.ascontiguousarray(
            np.broadcast_to(v[:, :, None, None].astype(np.uint8), (nby_, nbx_, 8, 8))
        )

    if shape in (0, 2):  # grayscale
        nbx, nby = 1 + doc_id % 4, 1 + doc_id % 3
        bx = np.arange(nbx, dtype=np.int64)[None, :]
        by = np.arange(nby, dtype=np.int64)[:, None]
        blocks = solid((7 * doc_id + 13 * bx + 3 * by) % 256, nby, nbx)
        if sa:
            return encode_jpeg_progressive_sa(
                [blocks], quant=qt, al=2, restart_interval=2
            )
        return encode_jpeg_progressive_gray(blocks, restart_interval=2)
    if shape in (1, 3):  # 4:4:4 color
        nbx, nby = 1 + doc_id % 3, 1 + doc_id % 2
        bx = np.arange(nbx, dtype=np.int64)[None, :]
        by = np.arange(nby, dtype=np.int64)[:, None]

        def plane(a, b, c):
            return solid((a * doc_id + b * bx + c * by) % 256, nby, nbx)

        comps = [plane(5, 11, 3), plane(3, 7, 5), plane(2, 5, 7)]
        if sa:
            return encode_jpeg_progressive_sa(
                comps, quant=qt, al=2, restart_interval=2
            )
        return encode_jpeg_progressive(comps, restart_interval=2)
    # shapes 4, 5: 4:2:0 (the synth_jpeg_420_blob closed form)
    nmx, nmy = 1 + doc_id % 2, 1 + doc_id % 3
    ybx = np.arange(2 * nmx, dtype=np.int64)[None, :]
    yby = np.arange(2 * nmy, dtype=np.int64)[:, None]
    mx = np.arange(nmx, dtype=np.int64)[None, :]
    my = np.arange(nmy, dtype=np.int64)[:, None]
    y = solid((5 * doc_id + 7 * ybx + 11 * yby) % 256, 2 * nmy, 2 * nmx)
    cb = solid((3 * doc_id + 5 * mx + 7 * my) % 256, nmy, nmx)
    cr = solid((2 * doc_id + 7 * mx + 3 * my) % 256, nmy, nmx)
    s420 = [(2, 2), (1, 1), (1, 1)]
    if sa:
        return encode_jpeg_progressive_sa(
            [y, cb, cr], quant=qt, al=2, sampling=s420, restart_interval=2
        )
    return encode_jpeg_progressive([y, cb, cr], sampling=s420, restart_interval=2)


# ------------------------------------------------- progressive (SOF2)

#: AC table for PROGRESSIVE scans: EOBn run symbols (r<<4 | 0) plus the
#: small run/size symbols the tests drive, and ZRL. Canonical, Kraft
#: sum 2/4 + 2/8 + 2/16 + 1/32 = 0.90625 < 1 (valid incomplete tree).
#: Kept separate from the baseline AC table so baseline streams are
#: byte-identical to earlier rounds.
PROG_AC_BITS = (0, 2, 2, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
PROG_AC_VALS = (
    0x00, 0x10,  # len 2: EOB (run 1), EOBn r=1 (runs 2-3)
    0x20, 0x01,  # len 3: EOBn r=2 (runs 4-7), run0/size1
    0x11, 0x41,  # len 4: run1/size1, run4/size1
    0xF0,        # len 5: ZRL
)


def encode_jpeg_progressive_gray(
    blocks: np.ndarray,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode a PROGRESSIVE (SOF2) grayscale stream with spectral
    selection: one DC scan (Ss=Se=0) followed by one scan per AC band
    in ``bands``, no successive approximation (Ah=Al=0 everywhere).
    All-zero bands are coded with T.81 G.1.2.2 EOBn run symbols
    ((r << 4) | 0 followed by r appended bits, run = (1 << r) +
    appended), so a solid-block fixture genuinely exercises the
    progressive entropy structure — band runs spanning many blocks —
    that baseline streams cannot. Blocks are (nby, nbx, 8, 8) uint8."""
    return encode_jpeg_progressive([blocks], bands, quant, restart_interval=restart_interval)


def _prog_mcu_grid(
    components: list[np.ndarray], sampling: list[tuple[int, int]] | None
) -> tuple[list[tuple[int, int]], int, int]:
    """Validate component block dims against ``sampling`` and return
    (sampling, mcuy, mcux). Fixture-grade: component grids must be
    exact MCU multiples (the synth fixtures always are)."""
    nf = len(components)
    s = sampling or [(1, 1)] * nf
    if len(s) != nf:
        raise ValueError("sampling length must match components")
    v0 = s[0][1]
    h0 = s[0][0]
    mcuy, mcux = components[0].shape[0] // v0, components[0].shape[1] // h0
    for comp, (hs, vs) in zip(components, s):
        if comp.shape[:2] != (mcuy * vs, mcux * hs):
            raise ValueError(
                "component block dims must be exact MCU multiples of "
                "their sampling factors"
            )
    return s, mcuy, mcux


def _prog_dc_order(nf: int, mcuy: int, mcux: int, sampling):
    """(ci, raster-index) pairs in interleaved DC-scan order: MCU
    raster, components in frame order, each contributing its v x h
    sub-blocks (T.81 A.2.3). All-1x1 degenerates to the flat walk."""
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nf):
                hs, vs = sampling[ci]
                for vy in range(vs):
                    for vx in range(hs):
                        yield ci, (my * vs + vy) * (mcux * hs) + (mx * hs + vx)


def encode_jpeg_progressive(
    components: list[np.ndarray],
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
    quant: np.ndarray | None = None,
    sampling: list[tuple[int, int]] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) encoder for 1 (grayscale) or 3 (YCbCr)
    components: one interleaved DC scan, then per-component AC band
    scans (T.81 G.1: AC progressive scans are non-interleaved).
    ``sampling`` (default all 1x1) enables chroma subsampling — e.g.
    ``[(2, 2), (1, 1), (1, 1)]`` for 4:2:0 — with per-component block
    dims that are exact MCU multiples."""
    nf = len(components)
    if nf not in (1, 3):
        raise ValueError("1 (gray) or 3 (YCbCr) components")
    s, mcuy, mcux = _prog_mcu_grid(components, sampling)
    qt = np.ones((8, 8), dtype=np.int64) if quant is None else quant.astype(np.int64)
    zz_comps = [_fdct_zz_blocks(comp, qt) for comp in components]
    return encode_progressive_from_zz(
        zz_comps, mcuy, mcux, bands, qt, sampling=s,
        restart_interval=restart_interval,
    )


def _prog_comp_dims(
    nf: int, h: int, w: int, s: list[tuple[int, int]]
) -> list[tuple[int, int]]:
    """Per-component NON-padded block dims (cby, cbx) for image (h, w)
    — ceil(ceil(dim * factor / max) / 8), T.81 A.1.1/A.2.4."""
    hmax = max(hs for hs, _ in s)
    vmax = max(vs for _, vs in s)
    return [
        (-(-(h * vs) // (8 * vmax)), -(-(w * hs) // (8 * hmax)))
        for hs, vs in s
    ]


def encode_progressive_from_zz(
    zz_comps,
    nby: int,
    nbx: int,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
    qt: np.ndarray | None = None,
    sampling: list[tuple[int, int]] | None = None,
    size: tuple[int, int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Assemble a progressive stream from pre-quantized zigzag blocks
    (raster order; one list per component, or a bare single-component
    list) — the seam tests use to plant exact AC structure that no
    integer spatial block could quantize to. With ``sampling``,
    (nby, nbx) are the MCU grid and each component's list covers its
    own (nby*V, nbx*H) block grid; the DC scan interleaves by MCU,
    AC scans stay component-raster (non-interleaved per T.81 G.1).
    ``size=(h, w)`` declares a PARTIAL-MCU image: each component's
    list then covers only its non-padded ceil grid, the interleaved
    DC scan emits zero diffs for the right/bottom padding blocks
    (which decoders discard), and AC scans skip them entirely.
    ``restart_interval`` emits a DRI segment and RSTn markers every
    that many MCUs per T.81 E.2.4 — in the DC scan an MCU is the
    interleaved block group, in the non-interleaved AC scans it is
    one block; DC predictors reset and pending EOBn runs flush at
    every boundary, and the marker index cycles 0-7 per scan."""
    if zz_comps and isinstance(zz_comps[0], np.ndarray):
        zz_comps = [zz_comps]
    nf = len(zz_comps)
    s = sampling or [(1, 1)] * nf
    hmax = max(hs for hs, _ in s)
    vmax = max(vs for _, vs in s)
    h, w = size if size is not None else (nby * 8 * vmax, nbx * 8 * hmax)
    if (w + 8 * hmax - 1) // (8 * hmax) != nbx or (h + 8 * vmax - 1) // (8 * vmax) != nby:
        raise ValueError("size inconsistent with the MCU grid")
    cdims = _prog_comp_dims(nf, h, w, s)
    for ci in range(nf):
        if len(zz_comps[ci]) != cdims[ci][0] * cdims[ci][1]:
            raise ValueError(
                f"component {ci}: {len(zz_comps[ci])} blocks, "
                f"expected {cdims[ci][0]}x{cdims[ci][1]}"
            )
    qt = np.ones((8, 8), dtype=np.int64) if qt is None else qt.astype(np.int64)
    dc_enc = _encode_table(DC_BITS, DC_VALS)
    ac_enc = _encode_table(PROG_AC_BITS, PROG_AC_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    # DC scan: interleaved across components, per-component predictors.
    # The walk covers the PADDED grid; padding blocks (beyond the
    # component's ceil grid) emit a zero diff — the decoder stores the
    # repeated predictor there and never IDCTs them.
    bw = BitWriter()
    preds = [0] * nf
    rst = 0
    bpm = sum(hs * vs for hs, vs in s)  # blocks per interleaved MCU
    _dc0 = [[int(z[0]) for z in comp] for comp in zz_comps]
    for bcnt, (ci, bi) in enumerate(_prog_dc_order(nf, nby, nbx, s)):
        if restart_interval and bcnt and bcnt % (bpm * restart_interval) == 0:
            bw.raw_marker(0xD0 + (rst & 7))
            rst += 1
            preds = [0] * nf  # E.2.4: predictors reset at every restart
        cby, cbx = cdims[ci]
        pbx = nbx * s[ci][0]  # padded grid row stride
        by, bx = bi // pbx, bi % pbx
        if by < cby and bx < cbx:
            dc = _dc0[ci][by * cbx + bx]
        else:
            dc = preds[ci]  # padding block: zero diff
        diff = dc - preds[ci]
        size = _category(diff)
        ln, code = dc_enc[size]
        bw.write(code, ln)
        if size:
            bw.write(_magnitude_bits(diff, size), size)
        preds[ci] = dc
    bw.pad_align()
    dc_body = bytes((nf,)) + b"".join(
        bytes((ci + 1, 0x00)) for ci in range(nf)
    ) + bytes((0, 0, 0))
    scans = [(seg(0xDA, dc_body), bytes(bw.out))]
    # AC band scans per component: EOBn runs over all-zero bands
    for ci in range(nf):
        # one tolist per block instead of per-element numpy scalar
        # reads in the run loops below (round 10, guide §4.2)
        _zzl = [
            z.tolist() if isinstance(z, np.ndarray) else list(z)
            for z in zz_comps[ci]
        ]
        for ss, se in bands:
            bw = BitWriter()
            eobrun = 0
            rst = 0

            def _flush(bw, run):
                r = run.bit_length() - 1
                if (r << 4) not in ac_enc:
                    raise ValueError(f"EOBn r={r} not in PROG_AC_VALS")
                ln, code = ac_enc[r << 4]
                bw.write(code, ln)
                if r:
                    bw.write(run - (1 << r), r)

            for bidx, zz in enumerate(_zzl):
                if restart_interval and bidx and bidx % restart_interval == 0:
                    # the pending EOBn run belongs to the previous
                    # interval: flush it before the marker (G.1.2.2 —
                    # EOB runs shall not cross a restart boundary)
                    if eobrun:
                        _flush(bw, eobrun)
                        eobrun = 0
                    bw.raw_marker(0xD0 + (rst & 7))
                    rst += 1
                if not any(zz[ss : se + 1]):
                    eobrun += 1
                    # bounded by the table's largest EOBn (r=2 → run ≤ 7)
                    if eobrun == 7:
                        _flush(bw, eobrun)
                        eobrun = 0
                    continue
                if eobrun:
                    _flush(bw, eobrun)
                    eobrun = 0
                k = ss
                while k <= se:
                    run = 0
                    while k <= se and zz[k] == 0:
                        run += 1
                        k += 1
                    if k > se:
                        _flush(bw, 1)  # EOB for this block
                        break
                    while run >= 16:
                        ln, code = ac_enc[0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    v = zz[k]
                    size = _category(v)
                    sym = (run << 4) | size
                    if sym not in ac_enc:
                        raise ValueError(f"AC symbol {sym:#x} not in PROG_AC_VALS")
                    ln, code = ac_enc[sym]
                    bw.write(code, ln)
                    bw.write(_magnitude_bits(v, size), size)
                    k += 1
                    # T.81 G.1.2.2: a band whose LAST coefficient is
                    # nonzero emits no EOB — the while simply exits
            if eobrun:
                _flush(bw, eobrun)
            bw.pad_align()
            scans.append(
                (seg(0xDA, bytes((1, ci + 1, 0x00, ss, se, 0))), bytes(bw.out))
            )

    dqt = seg(0xDB, b"\x00" + bytes(int(qt.reshape(64)[ZIGZAG][i]) for i in range(64)))
    sof = seg(
        0xC2,
        struct.pack(">BHHB", 8, h, w, nf)
        + b"".join(
            bytes((ci + 1, (s[ci][0] << 4) | s[ci][1], 0)) for ci in range(nf)
        ),
    )
    dht = seg(
        0xC4,
        b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
        + b"\x10" + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS),
    )
    parts = [b"\xff\xd8", seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"), dqt, sof, dht]
    if restart_interval:
        parts.append(seg(0xDD, struct.pack(">H", restart_interval)))
    for sos, data in scans:
        parts += [sos, data]
    parts.append(b"\xff\xd9")
    return b"".join(parts)


#: AC table for SUCCESSIVE-APPROXIMATION scans: EOB short, then every
#: run/size-1 symbol (refinement scans only ever code size 1 — T.81
#: G.1.2.3), EOBn r=1..5 (runs to 63) and ZRL, all length 5.
#: Canonical; Kraft sum 1/4 + 22/32 = 0.9375 < 1 (valid incomplete
#: tree). A separate table id so earlier progressive fixtures stay
#: byte-identical.
SA_AC_BITS = (0, 1, 0, 0, 22, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
SA_AC_VALS = (
    0x00,                                      # len 2: EOB (run 1)
    0x10, 0x20, 0x30, 0x40, 0x50,              # EOBn r=1..5
    0x01, 0x11, 0x21, 0x31, 0x41, 0x51, 0x61, 0x71,
    0x81, 0x91, 0xA1, 0xB1, 0xC1, 0xD1, 0xE1, 0xF1,  # run/size-1
    0xF0,                                      # ZRL
)


def encode_jpeg_progressive_sa(
    components: list[np.ndarray],
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
    quant: np.ndarray | None = None,
    al: int = 1,
    sampling: list[tuple[int, int]] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) encoder with SUCCESSIVE APPROXIMATION for 1
    (grayscale) or 3 (YCbCr) components: first scans carry the
    point-transformed coefficients (DC arithmetic-shifted ``al`` bits,
    AC sign-magnitude shifted), then ``al`` refinement levels restore
    one bit each — the dominant progressive mode in real corpora
    (spectral-selection-only streams are comparatively rare).
    ``sampling`` enables chroma subsampling as in
    ``encode_jpeg_progressive``. Blocks are (nby, nbx, 8, 8) uint8
    per component."""
    nf = len(components)
    if nf not in (1, 3):
        raise ValueError("1 (gray) or 3 (YCbCr) components")
    s, mcuy, mcux = _prog_mcu_grid(components, sampling)
    qt = np.ones((8, 8), dtype=np.int64) if quant is None else quant.astype(np.int64)
    zz_comps = [_fdct_zz_blocks(comp, qt) for comp in components]
    return encode_progressive_sa_from_zz(
        zz_comps, mcuy, mcux, bands, qt, al, sampling=s,
        restart_interval=restart_interval,
    )


def _encode_ac_first_sa(
    bw: "BitWriter",
    blocks,
    ss: int,
    se: int,
    al: int,
    ac_enc,
    restart_interval: int = 0,
) -> None:
    """AC first scan (Ah=0, Al=al): the spectral-selection band coding
    of encode_progressive_from_zz over the point-transformed values
    sign * (|coef| >> al), T.81 G.1.2.1. ``restart_interval`` emits a
    RSTn every that many blocks (non-interleaved: one block per MCU),
    flushing the pending EOBn run first (G.1.2.2)."""
    eobrun = 0
    rst = 0

    def _flush(run: int) -> None:
        r = run.bit_length() - 1
        ln, code = ac_enc[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(run - (1 << r), r)

    if len(blocks):
        # vectorized point transform sign * (|coef| >> al) across the
        # whole scan (round 10): one numpy pass + tolist instead of a
        # per-element Python loop per block
        arr = np.stack([np.asarray(z) for z in blocks])[:, ss : se + 1]
        t = np.abs(arr) >> al
        vals_per_block = np.where(arr < 0, -t, t).tolist()
    else:
        vals_per_block = []
    for bidx, v in enumerate(vals_per_block):
        if restart_interval and bidx and bidx % restart_interval == 0:
            if eobrun:
                _flush(eobrun)
                eobrun = 0
            bw.raw_marker(0xD0 + (rst & 7))
            rst += 1
        if not any(v):
            eobrun += 1
            if eobrun == 63:  # table EOBn caps at r=5
                _flush(eobrun)
                eobrun = 0
            continue
        if eobrun:
            _flush(eobrun)
            eobrun = 0
        i = 0
        while i < len(v):
            run = 0
            while i < len(v) and v[i] == 0:
                run += 1
                i += 1
            if i >= len(v):
                _flush(1)  # EOB for this block
                break
            while run >= 16:
                ln, code = ac_enc[0xF0]
                bw.write(code, ln)
                run -= 16
            x = v[i]
            size = _category(x)
            sym = (run << 4) | size
            if sym not in ac_enc:
                raise ValueError(f"AC symbol {sym:#x} not in SA_AC_VALS")
            ln, code = ac_enc[sym]
            bw.write(code, ln)
            bw.write(_magnitude_bits(x, size), size)
            i += 1
    if eobrun:
        _flush(eobrun)


def _encode_ac_refine(
    bw: "BitWriter",
    blocks,
    ss: int,
    se: int,
    al: int,
    ac_enc,
    restart_interval: int = 0,
) -> None:
    """AC refinement scan (Ah=al+1, Al=al), T.81 G.1.2.3 (the libjpeg
    encode_mcu_AC_refine shape): per block, newly-significant
    coefficients (|c| >> al == 1) are coded as run/size-1 symbols
    whose runs count only ZERO-HISTORY positions, with a sign bit and
    the buffered correction bits of already-nonzero coefficients
    passed on the way; blocks with nothing new fold into EOBn runs
    whose correction bits ride right after the EOBn symbol.
    ``restart_interval`` emits a RSTn every that many blocks, flushing
    the pending EOBn run (and its buffered correction bits) first —
    EOB runs shall not cross a restart boundary (G.1.2.2)."""
    eobrun = 0
    be_bits: list[int] = []
    rst = 0

    def emit_eobrun() -> None:
        nonlocal eobrun, be_bits
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            ln, code = ac_enc[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(eobrun - (1 << r), r)
            for b in be_bits:
                bw.write(b, 1)
            eobrun = 0
            be_bits = []

    if len(blocks):
        # same vectorization as the first scan: |coef| >> al and signs
        # for every block in one numpy pass
        _arr = np.stack([np.asarray(z) for z in blocks])[:, ss : se + 1]
        _absv_all = (np.abs(_arr) >> al).tolist()
        _neg_all = (_arr < 0).tolist()
    else:
        _absv_all, _neg_all = [], []
    for bidx, absv in enumerate(_absv_all):
        if restart_interval and bidx and bidx % restart_interval == 0:
            emit_eobrun()
            bw.raw_marker(0xD0 + (rst & 7))
            rst += 1
        # position of the last newly-significant coefficient: pending
        # ZRLs are only emitted up to here — beyond it, zero runs and
        # correction bits fold into the EOB run (T.81 figure G.7 /
        # the libjpeg k <= EOB guard)
        eob_i = -1
        for i, t in enumerate(absv):
            if t == 1:
                eob_i = i
        r = 0
        br_bits: list[int] = []
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            # any nonzero coefficient flushes pending ZRLs first, so
            # the decoder's 16-position walk and the correction bits
            # it reads on the way stay aligned
            while r > 15 and i <= eob_i:
                emit_eobrun()
                r -= 16
                ln, code = ac_enc[0xF0]
                bw.write(code, ln)
                for b in br_bits:
                    bw.write(b, 1)
                br_bits = []
            if t > 1:  # already nonzero before this scan: correction bit
                br_bits.append(t & 1)
                continue
            # newly significant (t == 1; r <= 15 by the guard above)
            emit_eobrun()
            ln, code = ac_enc[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(0 if _neg_all[bidx][i] else 1, 1)
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            eobrun += 1
            be_bits.extend(br_bits)
            if eobrun == 63:
                emit_eobrun()
    emit_eobrun()


def encode_progressive_sa_from_zz(
    zz_comps,
    nby: int,
    nbx: int,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
    qt: np.ndarray | None = None,
    al: int = 1,
    sampling: list[tuple[int, int]] | None = None,
    size: tuple[int, int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Assemble a successive-approximation progressive stream from
    pre-quantized zigzag blocks: one interleaved DC first scan at
    Al=al, per-component AC first scans per band at Al=al, then per
    refinement level (Ah, Al) = (al, al-1) ... (1, 0): one raw-bit
    interleaved DC refinement scan and per-component AC refinement
    scans. The fixture constraint for the SA_AC table is |shifted AC
    value| <= 1 in first scans (i.e. |coef| < 2^(al+1)), which still
    drives every decode path: new significance at each level,
    correction bits of both values, ZRL runs and EOBn-carried
    correction bits. ``restart_interval`` emits a DRI segment and
    RSTn markers every that many MCUs in EVERY scan — including the
    refinement scans (T.81 E.2.4 puts restarts in any scan kind):
    the raw-bit DC refinement byte-aligns at each boundary, and AC
    refinement flushes its pending EOBn run + buffered correction
    bits before the marker (G.1.2.2)."""
    if zz_comps and isinstance(zz_comps[0], np.ndarray):
        zz_comps = [zz_comps]
    if al < 1:
        raise ValueError("al must be >= 1 (use encode_progressive_from_zz)")
    nf = len(zz_comps)
    s = sampling or [(1, 1)] * nf
    hmax = max(hs for hs, _ in s)
    vmax = max(vs for _, vs in s)
    h, w = size if size is not None else (nby * 8 * vmax, nbx * 8 * hmax)
    if (w + 8 * hmax - 1) // (8 * hmax) != nbx or (h + 8 * vmax - 1) // (8 * vmax) != nby:
        raise ValueError("size inconsistent with the MCU grid")
    cdims = _prog_comp_dims(nf, h, w, s)
    for ci in range(nf):
        if len(zz_comps[ci]) != cdims[ci][0] * cdims[ci][1]:
            raise ValueError(
                f"component {ci}: {len(zz_comps[ci])} blocks, "
                f"expected {cdims[ci][0]}x{cdims[ci][1]}"
            )
    qt = np.ones((8, 8), dtype=np.int64) if qt is None else qt.astype(np.int64)
    dc_enc = _encode_table(DC_BITS, DC_VALS)
    ac_enc = _encode_table(SA_AC_BITS, SA_AC_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def _dc_at(ci: int, bi: int, fallback: int) -> int:
        """Padded-walk DC lookup: padding blocks return ``fallback``
        (the running predictor → zero diff / repeated bits)."""
        cby, cbx = cdims[ci]
        pbx = nbx * s[ci][0]
        by, bx = bi // pbx, bi % pbx
        if by < cby and bx < cbx:
            return _dc0[ci][by * cbx + bx]
        return fallback

    _dc0 = [[int(z[0]) for z in comp] for comp in zz_comps]
    scans = []
    bpm = sum(hs * vs for hs, vs in s)  # blocks per interleaved MCU
    # DC first scan (Ah=0, Al=al): diffs of arithmetic-shifted DC
    bw = BitWriter()
    preds = [0] * nf
    rst = 0
    for bcnt, (ci, bi) in enumerate(_prog_dc_order(nf, nby, nbx, s)):
        if restart_interval and bcnt and bcnt % (bpm * restart_interval) == 0:
            bw.raw_marker(0xD0 + (rst & 7))
            rst += 1
            preds = [0] * nf  # E.2.4: predictors reset at every restart
        dc = _dc_at(ci, bi, preds[ci] << al) >> al
        diff = dc - preds[ci]
        size = _category(diff)
        ln, code = dc_enc[size]
        bw.write(code, ln)
        if size:
            bw.write(_magnitude_bits(diff, size), size)
        preds[ci] = dc
    bw.pad_align()
    dc_body = bytes((nf,)) + b"".join(
        bytes((ci + 1, 0x00)) for ci in range(nf)
    ) + bytes((0, 0, al))
    scans.append((seg(0xDA, dc_body), bytes(bw.out)))
    # AC first scans (Ah=0, Al=al), per component per band
    for ci in range(nf):
        for ss, se in bands:
            bw = BitWriter()
            _encode_ac_first_sa(
                bw, zz_comps[ci], ss, se, al, ac_enc, restart_interval
            )
            bw.pad_align()
            scans.append(
                (seg(0xDA, bytes((1, ci + 1, 0x00, ss, se, al))), bytes(bw.out))
            )
    # refinement levels al-1 .. 0
    for lvl in range(al - 1, -1, -1):
        ah = lvl + 1
        # DC refinement: one raw bit per block per component, same
        # interleaved MCU order as the first scan (padding blocks
        # emit a 0 bit the decoder discards); restart boundaries
        # byte-align the raw-bit stream like any other scan
        bw = BitWriter()
        rst = 0
        for bcnt, (ci, bi) in enumerate(_prog_dc_order(nf, nby, nbx, s)):
            if restart_interval and bcnt and bcnt % (bpm * restart_interval) == 0:
                bw.raw_marker(0xD0 + (rst & 7))
                rst += 1
            bw.write((_dc_at(ci, bi, 0) >> lvl) & 1, 1)
        bw.pad_align()
        dcr_body = bytes((nf,)) + b"".join(
            bytes((ci + 1, 0x00)) for ci in range(nf)
        ) + bytes((0, 0, (ah << 4) | lvl))
        scans.append((seg(0xDA, dcr_body), bytes(bw.out)))
        # AC refinement per component per band
        for ci in range(nf):
            for ss, se in bands:
                bw = BitWriter()
                _encode_ac_refine(
                    bw, zz_comps[ci], ss, se, lvl, ac_enc, restart_interval
                )
                bw.pad_align()
                scans.append(
                    (
                        seg(0xDA, bytes((1, ci + 1, 0x00, ss, se, (ah << 4) | lvl))),
                        bytes(bw.out),
                    )
                )
    dqt = seg(0xDB, b"\x00" + bytes(int(qt.reshape(64)[ZIGZAG][i]) for i in range(64)))
    sof = seg(
        0xC2,
        struct.pack(">BHHB", 8, h, w, nf)
        + b"".join(
            bytes((ci + 1, (s[ci][0] << 4) | s[ci][1], 0)) for ci in range(nf)
        ),
    )
    dht = seg(
        0xC4,
        b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
        + b"\x10" + bytes(SA_AC_BITS) + bytes(SA_AC_VALS),
    )
    parts = [b"\xff\xd8", seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"), dqt, sof, dht]
    if restart_interval:
        parts.append(seg(0xDD, struct.pack(">H", restart_interval)))
    for sos, data in scans:
        parts += [sos, data]
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def decode_jpeg_progressive(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a PROGRESSIVE (SOF2) JPEG with spectral selection —
    AND successive approximation — grayscale or 4:4:4 YCbCr color
    (all sampling factors 1x1): coefficients accumulate across scans
    (one interleaved DC first scan + any partition of 1..63 into
    per-component AC band scans — T.81 G.1 requires AC progressive
    scans to be non-interleaved — each with EOBn end-of-band run
    decoding per G.1.2.2). Successive approximation per G.1.2.1/3:
    first scans carry point-transformed coefficients (values << Al on
    decode), DC refinement scans one raw bit per block, and AC
    refinement scans insert newly-significant +-1<<Al coefficients
    with runs counting only zero-history positions while streaming
    correction bits for the already-nonzero history — correction
    bits ride inside EOBn runs too. Dequant + IDCT run once after
    the last scan, then the same JFIF matrix + floor(x+0.5) color
    transform as the baseline decoder. Restart intervals (DRI + RSTn
    every Ri MCUs, T.81 E.2.4) are honored in EVERY scan kind —
    byte-align, marker-sequence check, DC-predictor reset in DC first
    scans, EOB runs (and their buffered refinement correction bits)
    bounded by the interval in AC scans, plain byte-aligned resync in
    the raw-bit DC refinement scans."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = 0
    comp_order: list[int] = []  # frame order of component ids
    comp_tq: dict[int, int] = {}
    comp_hv: dict[int, tuple[int, int]] = {}  # cid -> (H, V)
    comp_dims: dict[int, tuple[int, int]] = {}  # cid -> non-padded (cby, cbx)
    coefs: dict[int, np.ndarray] | None = None  # cid -> (pby, pbx, 64), padded
    hmax = vmax = 1
    mcux = mcuy = 0
    restart_interval = 0
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack(">H", buf[pos : pos + 2])
        body = buf[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 128 if pq else 64
                raw = (
                    np.frombuffer(body[i : i + n], dtype=">u2" if pq else np.uint8)
                    .astype(np.int64)
                )
                i += n
                qt = np.zeros(64, dtype=np.int64)
                qt[ZIGZAG] = raw
                qtables[tq] = qt  # kept zigzag-inverted flat
        elif marker == 0xC4:
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
        elif marker == 0xC2:
            precision, h, w, nf = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if nf not in (1, 3):
                raise NotImplementedError(
                    f"{nf}-component progressive JPEG (PIL seam)"
                )
            for ci in range(nf):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hs, vs = sampling >> 4, sampling & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    # T.81 B.2.2: H/V in 1..4; anything else is a
                    # malformed frame, not a seam
                    raise ValueError(
                        f"sampling factor {hs}x{vs} outside T.81 range"
                    )
                if nf == 1:
                    # same normalization as the baseline walk (T.81
                    # A.1.1: single-component factors cancel; scans
                    # are non-interleaved) — round-9 seam close
                    hs = vs = 1
                comp_order.append(cid)
                comp_tq[cid] = tq
                comp_hv[cid] = (hs, vs)
            hmax = max(hs for hs, _ in comp_hv.values())
            vmax = max(vs for _, vs in comp_hv.values())
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = {}
            for cid in comp_order:
                hs, vs = comp_hv[cid]
                # padded grid (the interleaved DC scan codes every
                # MCU's blocks, incl. right/bottom padding); the
                # non-padded dims bound the non-interleaved AC scans
                # and the final IDCT (T.81 A.2.4)
                coefs[cid] = np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64)
                cx = -(-(w * hs) // (8 * hmax))  # ceil(ceil(w*hs/hmax)/8)
                cy = -(-(h * vs) // (8 * vmax))
                comp_dims[cid] = (cy, cx)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if coefs is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan_ids = [body[1 + 2 * ci] for ci in range(ns)]
            scan_tts = [body[2 + 2 * ci] for ci in range(ns)]
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if any(cid not in coefs for cid in scan_ids):
                raise ValueError("SOS references unknown component")
            br = BitReader(buf, pos)
            rst_n = 0  # per-scan RSTn sequence (T.81 E.2.4)
            if ss == 0:  # DC scan
                if se != 0:
                    raise ValueError("DC scan must have Se=0")

                def _dc_blocks():
                    """(mcu, cid, tt, by, bx) in scan order:
                    MCU-interleaved over the padded grids when ns > 1
                    (T.81 A.2.3), component-raster over the non-padded
                    grid when ns == 1 (non-interleaved, A.2.4 — the
                    restart MCU is then one block)."""
                    if ns == 1:
                        cid, tt = scan_ids[0], scan_tts[0]
                        cy, cx = comp_dims[cid]
                        for by in range(cy):
                            for bx in range(cx):
                                yield by * cx + bx, cid, tt, by, bx
                        return
                    for my in range(mcuy):
                        for mx in range(mcux):
                            for cid, tt in zip(scan_ids, scan_tts):
                                hs, vs = comp_hv[cid]
                                for vy in range(vs):
                                    for vx in range(hs):
                                        yield (
                                            my * mcux + mx,
                                            cid,
                                            tt,
                                            my * vs + vy,
                                            mx * hs + vx,
                                        )

                if ah == 0:  # first scan: diffs of the shifted DC
                    preds = {cid: 0 for cid in scan_ids}
                    prev_mcu = 0
                    for mcu, cid, tt, by, bx in _dc_blocks():
                        if (
                            restart_interval
                            and mcu != prev_mcu
                            and mcu % restart_interval == 0
                        ):
                            if br.sync_restart() != (rst_n & 7):
                                raise ValueError("restart marker out of sequence")
                            rst_n += 1
                            preds = {c: 0 for c in scan_ids}
                        prev_mcu = mcu
                        dc_tab = htables[(0, tt >> 4)]
                        size = br.decode_symbol(dc_tab)
                        diff = _extend(br.read_bits(size), size) if size else 0
                        preds[cid] += diff
                        coefs[cid][by, bx, 0] = preds[cid] << al
                else:  # refinement: one raw bit per block per component
                    if ah != al + 1:
                        raise ValueError("DC refinement must have Ah = Al+1")
                    prev_mcu = 0
                    for mcu, cid, _tt, by, bx in _dc_blocks():
                        if (
                            restart_interval
                            and mcu != prev_mcu
                            and mcu % restart_interval == 0
                        ):
                            # E.2.4: byte-align + RSTn; the raw-bit
                            # stream carries no predictors or EOB
                            # runs, so resync is the whole story
                            if br.sync_restart() != (rst_n & 7):
                                raise ValueError("restart marker out of sequence")
                            rst_n += 1
                        prev_mcu = mcu
                        if br.read_bit():
                            coefs[cid][by, bx, 0] += 1 << al
            else:  # AC band scan: non-interleaved per T.81 G.1
                if ns != 1:
                    raise ValueError(
                        "progressive AC scans must be single-component"
                    )
                cid, tt = scan_ids[0], scan_tts[0]
                ac_tab = htables[(1, tt & 0x0F)]
                cc = coefs[cid]
                cby, cbx = comp_dims[cid]  # non-interleaved: no padding
                eobrun = 0
                bidx = 0
                if ah == 0:  # first scan (values point-transformed << al)
                    for by in range(cby):
                        for bx in range(cbx):
                            if (
                                restart_interval
                                and bidx
                                and bidx % restart_interval == 0
                            ):
                                if eobrun:
                                    # G.1.2.2: an EOBn run shall end
                                    # within its restart interval
                                    raise ValueError(
                                        "EOB run crosses a restart boundary"
                                    )
                                if br.sync_restart() != (rst_n & 7):
                                    raise ValueError(
                                        "restart marker out of sequence"
                                    )
                                rst_n += 1
                            bidx += 1
                            if eobrun:
                                eobrun -= 1
                                continue
                            k = ss
                            while k <= se:
                                rs = br.decode_symbol(ac_tab)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:  # ZRL
                                        k += 16
                                        continue
                                    eobrun = (1 << r) + (br.read_bits(r) if r else 0) - 1
                                    break  # this block's band ends here
                                k += r
                                if k > se:
                                    raise ValueError("AC run past band end")
                                cc[by, bx, k] = _extend(br.read_bits(s), s) << al
                                k += 1
                else:  # refinement scan, T.81 G.1.2.3
                    if ah != al + 1:
                        raise ValueError("AC refinement must have Ah = Al+1")
                    p1, m1 = 1 << al, -1 << al
                    for by in range(cby):
                        for bx in range(cbx):
                            if (
                                restart_interval
                                and bidx
                                and bidx % restart_interval == 0
                            ):
                                if eobrun:
                                    # G.1.2.2: an EOBn run (and its
                                    # buffered correction bits) shall
                                    # end within its restart interval
                                    raise ValueError(
                                        "EOB run crosses a restart boundary"
                                    )
                                if br.sync_restart() != (rst_n & 7):
                                    raise ValueError(
                                        "restart marker out of sequence"
                                    )
                                rst_n += 1
                            bidx += 1
                            blk = cc[by, bx]
                            k = ss
                            if eobrun == 0:
                                while k <= se:
                                    rs = br.decode_symbol(ac_tab)
                                    r, s = rs >> 4, rs & 0x0F
                                    newval = 0
                                    if s == 0:
                                        if r != 15:  # EOBn: run + trailing bits
                                            eobrun = (1 << r) + (
                                                br.read_bits(r) if r else 0
                                            )
                                            break
                                        # ZRL: 16 zero-history positions
                                    else:
                                        if s != 1:
                                            raise ValueError(
                                                "AC refinement size must be 1"
                                            )
                                        newval = p1 if br.read_bit() else m1
                                    # advance past r zero-history coefs,
                                    # correcting nonzero ones on the way
                                    while k <= se:
                                        if blk[k] != 0:
                                            if br.read_bit() and (
                                                int(blk[k]) & p1
                                            ) == 0:
                                                blk[k] += p1 if blk[k] >= 0 else m1
                                        else:
                                            if r == 0:
                                                break
                                            r -= 1
                                        k += 1
                                    if newval:
                                        if k > se:
                                            raise ValueError(
                                                "refinement run past band end"
                                            )
                                        blk[k] = newval
                                    k += 1
                            if eobrun > 0:
                                # EOBn covers this block from k on: its
                                # nonzero history still takes correction bits
                                while k <= se:
                                    if blk[k] != 0:
                                        if br.read_bit() and (
                                            int(blk[k]) & p1
                                        ) == 0:
                                            blk[k] += p1 if blk[k] >= 0 else m1
                                    k += 1
                                eobrun -= 1
            pos = br.pos  # continue the marker walk after the scan
        # APPn / COM: skipped
    if coefs is None:
        raise ValueError("no SOF2 frame")
    planes = []
    for cid in comp_order:
        qt = qtables[comp_tq[cid]]
        hs, vs = comp_hv[cid]
        cby, cbx = comp_dims[cid]
        # dequant + IDCT batched over the component's non-padded grid
        # (one stacked matmul — same dgemm per slice, bit-identical to
        # the former per-block idct_block loop; round 10)
        cc = coefs[cid][:cby, :cbx].reshape(-1, 64)
        dez = np.zeros((len(cc), 64), dtype=np.int64)
        dez[:, ZIGZAG] = cc
        blocks8 = (dez * qt).reshape(-1, 8, 8).astype(np.float64)
        spatial = np.matmul(np.matmul(_A.T, blocks8), _A) + 128.0
        plane = (
            np.clip(np.round(spatial), 0, 255)
            .astype(np.uint8)
            .reshape(cby, cbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(cby * 8, cbx * 8)
        )
        # crop to the component's true size, then the baseline path's
        # pinned floor-replication upsample (decode_jpeg docstring) —
        # the same index-gather form, covering non-dividing ratios
        plane = plane[: -(-(h * vs) // vmax), : -(-(w * hs) // hmax)]
        if hs != hmax or vs != vmax:
            yi = (np.arange(h, dtype=np.int64) * vs) // vmax
            xi = (np.arange(w, dtype=np.int64) * hs) // hmax
            plane = plane[yi[:, None], xi[None, :]]
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return w, h, 1, planes[0]
    # JFIF YCbCr -> RGB, floor(x+0.5) — identical to the baseline path
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return w, h, 3, np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
