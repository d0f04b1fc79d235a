"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Closes the last multimodal stub the way PNG was closed: real entropy
coding, real DCT — no image library. Supported: huffman-coded grayscale
(1 component) and YCbCr color (3 components) at any integer-ratio
sampling layout — 4:4:4, 4:2:2, and (since r05) the dominant real-world
4:2:0 chroma-subsampled form, decoded via the T.81 A.2.3 MCU interleave
(e.g. 4 Y + 1 Cb + 1 Cr blocks per 16x16 MCU) with pixel-replication
upsampling — in BOTH framings: baseline sequential (SOF0) and (since
r05) PROGRESSIVE (SOF2, T.81 Annex G: multi-scan spectral selection +
successive approximation, EOB runs, per-bit refinement) — plus restart
intervals, multi-table DQT/DHT segments, APPn/COM skip. The encoder can
emit 4:4:4 and 4:2:0 in both framings (encode_jpeg /
encode_jpeg_progressive; progressive follows libjpeg's standard
6-scan script, and its decode is pinned bit-identical to the baseline
decode of the same image). Loudly rejected
(NotImplementedError/ValueError): arithmetic coding, lossless/
differential modes, 12-bit precision, non-integer sampling ratios — the
same honest-gate policy the PNG decoder applies to interlaced/16-bit
payloads.

The encoder writes its OWN canonical Huffman tables into DHT (flat code
lengths — generated, not the T.81 Annex K examples) and an all-ones
quantization table by default, making the codec near-lossless: the only
loss is the round() on DCT coefficients. Images that are constant within
every 8x8 block — or, for 4:2:0, within every 16x16 MCU (box-averaging a
constant is the constant; replication restores it) — roundtrip EXACTLY
(all the synthetic fixtures' JPEGs: tiny images pad by edge replication
into one constant block), which is what lets the suite oracle state
decoded pixel_sum in closed form.

Reference parity note: the reference treats image bytes as opaque Jina
Document payloads (executor.py:6) — this module is part of the [NOT IN
REFERENCE] multimodal mandate.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --- shared constants -------------------------------------------------------


def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return a


_DCT = _dct_matrix()  # orthonormal: block = _DCT.T @ coeffs @ _DCT


def _zigzag_order() -> list[int]:
    """Standard zigzag scan: diagonals of increasing u+v, direction
    alternating (odd diagonals top-right -> bottom-left)."""
    cells = sorted(
        (u + v, u if (u + v) % 2 else -u, u, v) for u in range(8) for v in range(8)
    )
    return [u * 8 + v for _, _, u, v in cells]


ZIGZAG = _zigzag_order()

# Our canonical Huffman tables (encoder-side; the decoder reads whatever
# DHT declares). Flat code lengths keep the table generation trivial and
# obviously valid: 12 DC category symbols at 5 bits (<< 31, so the
# all-ones code stays unused as T.81 requires), 176 AC symbols at 9 bits
# (<< 511): the 162 sequential (run,size) symbols plus the 14 EOBn
# end-of-band run symbols (r<<4, r=1..14) progressive scans use.
# Compression suffers; correctness doesn't.
_DC_SYMBOLS = list(range(12))  # DC size categories 0..11
_AC_SYMBOLS = sorted(
    {0x00, 0xF0}
    | {(run << 4) | size for run in range(16) for size in range(1, 11)}
    | {r << 4 for r in range(1, 15)}
)
_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, idx = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, additional bits) for a DC diff / AC coefficient."""
    size = int(v != 0 and abs(v).bit_length())
    if v < 0:
        v += (1 << size) - 1
    return size, v


# --- bit I/O ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in entropy data")
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Drop pad bits, expect a marker, return its second byte."""
        self._acc = 0
        self._n = 0
        while self.data[self.pos] == 0xFF and self.data[self.pos + 1] in (0xFF, 0x00):
            # FF FF = legal fill byte; FF 00 = a stuffed pad byte whose bits
            # were never consumed (an all-ones pad byte gets stuffed like
            # any other 0xFF) — both are pre-marker padding here
            self.pos += 1 if self.data[self.pos + 1] == 0xFF else 2
        if self.data[self.pos] != 0xFF:
            raise ValueError("expected a marker in entropy data")
        m = self.data[self.pos + 1]
        self.pos += 2
        return m


# --- encoder ----------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w, 3) float64 YCbCr (JFIF/BT.601), unrounded."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _pad_edge(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (h + mult - 1) // mult * mult
    pw = (w + mult - 1) // mult * mult
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _prep_components(width, height, pixels, channels, quant, subsampling):
    """Shared encoder input prep: validate, color-convert, pad, subsample.
    Returns ([(plane, hs, vs)], quant array in natural order)."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"expected {width * height * channels} pixel bytes, got {len(pixels)}"
        )
    q = np.array(quant if quant is not None else [1] * 64, dtype=np.float64)
    if q.shape != (64,) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be 64 values in [1, 255]")

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels == 3:
        planes = _rgb_to_ycbcr(arr.astype(np.float64))
    else:
        planes = arr.astype(np.float64)

    # comps: (plane padded to its own block grid, hs, vs)
    if channels == 3 and subsampling == "420":
        y = _pad_to(planes[..., 0], 16)
        # chroma from the 16-aligned luma grid by 2x2 box average -> the
        # half-res planes are 8-aligned by construction
        sub = [
            (
                _pad_to(planes[..., c], 16)
                .reshape(y.shape[0] // 2, 2, y.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )
            for c in (1, 2)
        ]
        comps = [(y, 2, 2), (sub[0], 1, 1), (sub[1], 1, 1)]
    else:
        comps = [(_pad_edge(planes[..., c]), 1, 1) for c in range(channels)]
    return comps, q


def _encode_block(bw: _BitWriter, block: np.ndarray, qtab: np.ndarray, pred: int) -> int:
    """DCT + quantize + huffman-encode one 8x8 block (level-shifted input);
    returns the new DC predictor."""
    coeffs = _DCT @ (block - 128.0) @ _DCT.T
    qc = np.rint(coeffs / qtab).astype(np.int64)
    zz = qc.reshape(64)[ZIGZAG]
    # DC: differential, category + magnitude bits
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    size, extra = _magnitude(diff)
    code, length = _DC_CODES[size]
    bw.write(code, length)
    if size:
        bw.write(extra, size)
    # AC: run-length of zeros + (run,size) symbols
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = _AC_CODES[0xF0]
            bw.write(zc, zl)
            run -= 16
        size, extra = _magnitude(v)
        code, length = _AC_CODES[(run << 4) | size]
        bw.write(code, length)
        bw.write(extra, size)
        run = 0
    if last_nz < 63:
        ec, el = _AC_CODES[0x00]
        bw.write(ec, el)
    return pred


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 1,
    quant: list[int] | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG from a top-down 8-bit raster (gray: w*h bytes; RGB:
    w*h*3 bytes, encoded as YCbCr). quant is the 64-entry natural-order
    quantization table shared by all components (default all ones —
    near-lossless). subsampling: '444' (every component full-resolution,
    one 8x8 MCU) or '420' (chroma box-averaged 2x2, 16x16 MCUs of
    4 Y + 1 Cb + 1 Cr blocks — the dominant real-world camera/web layout);
    ignored for grayscale. restart_interval > 0 emits a DRI segment and
    RSTn markers every that-many MCUs (byte-aligned, DC predictors reset
    — the error-resilience feature real encoders emit)."""
    comps, q = _prep_components(width, height, pixels, channels, quant, subsampling)
    hmax = max(hs for _, hs, _ in comps)
    vmax = max(vs for _, _, vs in comps)
    qtab = q.reshape(8, 8)
    bw = _BitWriter()
    pred = [0] * channels
    n_my = comps[0][0].shape[0] // (8 * vmax)
    n_mx = comps[0][0].shape[1] // (8 * hmax)
    mcu = rst = 0
    for my in range(n_my):
        for mx in range(n_mx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                pred = [0] * channels
            for ci, (plane, hs, vs) in enumerate(comps):
                for v in range(vs):
                    for u in range(hs):
                        py = (my * vs + v) * 8
                        px = (mx * hs + u) * 8
                        pred[ci] = _encode_block(
                            bw, plane[py : py + 8, px : px + 8], qtab, pred[ci]
                        )
            mcu += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qz = np.array([int(x) for x in q], dtype=np.int64)[ZIGZAG]
    dqt = seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in qz))
    sof_comps = b"".join(
        struct.pack(">BBB", ci + 1, (hs << 4) | vs, 0)
        for ci, (_, hs, vs) in enumerate(comps)
    )
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, channels) + sof_comps)
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMBOLS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMBOLS),
    )
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos_comps = b"".join(struct.pack(">BB", cid + 1, 0x00) for cid in range(channels))
    sos = seg(0xFFDA, bytes([channels]) + sos_comps + bytes([0, 63, 0]))
    return b"\xff\xd8" + dqt + sof0 + dht + dri + sos + bytes(bw.out) + b"\xff\xd9"


# --- progressive (SOF2) encode ---------------------------------------------
#
# Emits libjpeg's standard "simple progression" scan script (jcparam.c):
#   1. DC, all components interleaved, successive approximation Al=1
#   2. AC band [1,5]   per component, first scan at Al=2
#   3. AC band [6,63]  per component, first scan at Al=2
#   4. AC band [1,63]  per component, refinement Ah=2 -> Al=1
#   5. DC refinement (one raw bit per block), Ah=1 -> Al=0
#   6. AC band [1,63]  per component, refinement Ah=1 -> Al=0
# so the decoder's every progressive path — spectral selection, successive
# approximation, EOB runs, ZRL-in-refinement, correction bits — is
# exercised by our own streams. The scan encoders transcribe the libjpeg
# jcphuff.c algorithms (the proven interoperable counterparts of the
# T.81 G.1.2 decode flowcharts).

_EOBRUN_CAP = 0x7FFF  # 14-bit EOBn symbol ceiling, as libjpeg


class _ProgACState:
    """Per-scan AC state: the pending end-of-band run and its buffered
    correction bits (libjpeg's EOBRUN/BE), plus the current block's
    correction bits since the last emitted symbol (BR)."""

    def __init__(self, bw: _BitWriter) -> None:
        self.bw = bw
        self.eobrun = 0
        self.run_bits: list[int] = []
        self.cur_bits: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, length = _AC_CODES[r << 4]
            self.bw.write(code, length)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.run_bits:
            self.bw.write(b, 1)
        self.run_bits = []

    def emit_cur_bits(self) -> None:
        for b in self.cur_bits:
            self.bw.write(b, 1)
        self.cur_bits = []

    def end_block(self, tail_pending: bool) -> None:
        if tail_pending or self.cur_bits:
            self.eobrun += 1
            self.run_bits.extend(self.cur_bits)
            self.cur_bits = []
            if self.eobrun >= _EOBRUN_CAP:
                self.flush_eobrun()


def _encode_ac_first_block(st: _ProgACState, zz, ss: int, se: int, al: int) -> None:
    bw = st.bw
    r = 0
    any_emitted = False
    for k in range(ss, se + 1):
        coef = int(zz[k])
        t = (abs(coef) >> al)
        if t == 0:
            r += 1
            continue
        while r > 15:
            st.flush_eobrun()
            zc, zl = _AC_CODES[0xF0]
            bw.write(zc, zl)
            r -= 16
        st.flush_eobrun()
        v = t if coef > 0 else -t
        size, extra = _magnitude(v)
        code, length = _AC_CODES[(r << 4) | size]
        bw.write(code, length)
        bw.write(extra, size)
        r = 0
        any_emitted = True
    if r > 0 or not any_emitted:
        st.eobrun += 1
        if st.eobrun >= _EOBRUN_CAP:
            st.flush_eobrun()


def _encode_ac_refine_block(st: _ProgACState, zz, ss: int, se: int, al: int) -> None:
    bw = st.bw
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob_pos = ss - 1
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob_pos = k
    r = 0
    for k in range(ss, se + 1):
        t = absv[k - ss]
        coef = int(zz[k])
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob_pos:
            st.flush_eobrun()
            zc, zl = _AC_CODES[0xF0]
            bw.write(zc, zl)
            r -= 16
            st.emit_cur_bits()
        if t > 1:  # history coefficient: buffer its correction bit
            st.cur_bits.append(t & 1)
            continue
        # newly significant at this level
        st.flush_eobrun()
        code, length = _AC_CODES[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if coef > 0 else 0, 1)
        st.emit_cur_bits()
        r = 0
    st.end_block(tail_pending=r > 0)


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 1,
    quant: list[int] | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Progressive JPEG (SOF2) from the same raster contract as
    encode_jpeg. The quantized coefficients are IDENTICAL to the baseline
    encoder's (same DCT, same quant, same rounding) — only their
    arrangement into scans differs — so for any input,
    decode_jpeg(encode_jpeg_progressive(x)) == decode_jpeg(encode_jpeg(x))
    bit-for-bit; the tests pin exactly that differential.
    restart_interval > 0 emits RSTn markers every that-many restart units
    (MCUs in the interleaved DC scans, blocks in the per-component AC
    scans) with predictors/EOB runs flushed — per T.81 the RST counter
    restarts at D0 in every scan."""
    comps, q = _prep_components(width, height, pixels, channels, quant, subsampling)
    hmax = max(hs for _, hs, _ in comps)
    vmax = max(vs for _, _, vs in comps)
    qtab = q.reshape(8, 8)
    n_my = comps[0][0].shape[0] // (8 * vmax)
    n_mx = comps[0][0].shape[1] // (8 * hmax)

    # quantize everything up front: per component (bh, bw, 64) zigzag-order
    zblocks = []
    for plane, hs, vs in comps:
        bh, bwid = plane.shape[0] // 8, plane.shape[1] // 8
        zb = np.zeros((bh, bwid, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bwid):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                qc = np.rint((_DCT @ block @ _DCT.T) / qtab).astype(np.int64)
                zb[by, bx] = qc.reshape(64)[ZIGZAG]
        zblocks.append(zb)

    def comp_grid(ci: int) -> tuple[int, int]:
        # the component's OWN block grid (what non-interleaved scans cover)
        _, hs, vs = comps[ci]
        cw = (width * hs + hmax - 1) // hmax
        ch = (height * vs + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = (
            bytes([len(comp_ids)])
            + b"".join(struct.pack(">BB", ci + 1, 0x00) for ci in comp_ids)
            + bytes([ss, se, (ah << 4) | al])
        )
        return seg(0xFFDA, body)

    out = bytearray(b"\xff\xd8")
    qz = np.array([int(x) for x in q], dtype=np.int64)[ZIGZAG]
    out += seg(0xFFDB, bytes([0x00]) + bytes(int(v) for v in qz))
    sof_comps = b"".join(
        struct.pack(">BBB", ci + 1, (hs << 4) | vs, 0)
        for ci, (_, hs, vs) in enumerate(comps)
    )
    out += seg(0xFFC2, struct.pack(">BHHB", 8, height, width, channels) + sof_comps)
    out += seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMBOLS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMBOLS),
    )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))

    def dc_scan(emit_mcu, reset_pred) -> bytearray:
        """Interleaved MCU walk with restart handling shared by both DC
        scans; emit_mcu(bw, my, mx) encodes one MCU's blocks."""
        bw = _BitWriter()
        mcu = rst = 0
        for my in range(n_my):
            for mx in range(n_mx):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    bw.flush()
                    bw.out += bytes([0xFF, 0xD0 + rst % 8])
                    rst += 1
                    reset_pred()
                emit_mcu(bw, my, mx)
                mcu += 1
        bw.flush()
        return bw.out

    # scan 1: DC first, interleaved, Al=1
    pred = [0] * channels

    def dc_first_mcu(bw, my, mx):
        for ci, (_, hs, vs) in enumerate(comps):
            for v in range(vs):
                for u in range(hs):
                    t = int(zblocks[ci][my * vs + v, mx * hs + u, 0]) >> 1
                    size, extra = _magnitude(t - pred[ci])  # G.1.2.1
                    pred[ci] = t
                    code, length = _DC_CODES[size]
                    bw.write(code, length)
                    if size:
                        bw.write(extra, size)

    def _reset_pred():
        for ci in range(channels):
            pred[ci] = 0

    out += sos(list(range(channels)), 0, 0, 0, 1)
    out += dc_scan(dc_first_mcu, _reset_pred)

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytearray:
        bw = _BitWriter()
        st = _ProgACState(bw)
        bh, bwid = comp_grid(ci)
        enc = _encode_ac_first_block if ah == 0 else _encode_ac_refine_block
        unit = rst = 0
        for by in range(bh):
            for bx in range(bwid):
                if restart_interval and unit and unit % restart_interval == 0:
                    st.flush_eobrun()
                    bw.flush()
                    bw.out += bytes([0xFF, 0xD0 + rst % 8])
                    rst += 1
                enc(st, zblocks[ci][by, bx], ss, se, al)
                unit += 1
        st.flush_eobrun()
        bw.flush()
        return bw.out

    # scans 2-4: AC first scans at Al=2, then refinement Ah=2 -> Al=1
    for ss, se, ah, al in ((1, 5, 0, 2), (6, 63, 0, 2), (1, 63, 2, 1)):
        for ci in range(channels):
            out += sos([ci], ss, se, ah, al)
            out += ac_scan(ci, ss, se, ah, al)

    # scan 5: DC refinement — one raw bit per block, interleaved
    def dc_refine_mcu(bw, my, mx):
        for ci, (_, hs, vs) in enumerate(comps):
            for v in range(vs):
                for u in range(hs):
                    bw.write(int(zblocks[ci][my * vs + v, mx * hs + u, 0]) & 1, 1)

    out += sos(list(range(channels)), 0, 0, 1, 0)
    out += dc_scan(dc_refine_mcu, lambda: None)

    # scan 6: final AC refinement Ah=1 -> Al=0
    for ci in range(channels):
        out += sos([ci], 1, 63, 1, 0)
        out += ac_scan(ci, 1, 63, 1, 0)

    out += b"\xff\xd9"
    return bytes(out)


# --- decoder ----------------------------------------------------------------


class _HuffTable:
    """DHT table -> (length, code) -> symbol lookup via bit-serial walk."""

    def __init__(self, bits: list[int], values: bytes) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code, idx = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[idx]
                code += 1
                idx += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.bit()
            length += 1
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in entropy data")


def _extend(v: int, size: int) -> int:
    if size and v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


_SOF_UNSUPPORTED = {
    0xC1: "extended sequential",
    0xC3: "lossless",
    0xC5: "differential sequential",
    0xC6: "differential progressive",
    0xC7: "differential lossless",
    0xC9: "arithmetic sequential",
    0xCA: "arithmetic progressive",
    0xCB: "arithmetic lossless",
    0xCD: "differential arithmetic sequential",
    0xCE: "differential arithmetic progressive",
    0xCF: "differential arithmetic lossless",
}


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG -> (width, height, channels, top-down raster bytes:
    gray for 1 component, RGB for 3). Raises NotImplementedError for
    progressive/arithmetic/12-bit/subsampled streams, ValueError for
    malformed ones."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    frame = None  # (w, h, [(comp_id, hs, vs, qtab_id)])
    restart_interval = 0
    progressive = False
    coeffs: dict[int, np.ndarray] | None = None  # cid -> (bh, bw, 64) natural order

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            if progressive and coeffs is not None:
                return _finish_progressive(frame, coeffs, qtables)
            raise ValueError("EOI before SOS — no image data")
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (may hold several tables)
            o = 0
            while o < len(body):
                prec, tid = body[o] >> 4, body[o] & 0x0F
                o += 1
                if prec == 0:
                    tab = np.frombuffer(body, np.uint8, 64, o).astype(np.float64)
                    o += 64
                else:
                    tab = np.frombuffer(body, ">u2", 64, o).astype(np.float64)
                    o += 128
                nat = np.zeros(64)
                nat[ZIGZAG] = tab  # DQT stores zigzag order
                qtables[tid] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may hold several tables)
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                values = body[o + 17 : o + 17 + n]
                (dc_tables if cls == 0 else ac_tables)[tid] = _HuffTable(bits, values)
                o += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            depth, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if depth != 8:
                raise NotImplementedError(f"{depth}-bit JPEG not supported (8-bit baseline only)")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG not supported (gray or YCbCr)")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + ci * 3)
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"sampling factors {hs}/{vs} out of T.81 range")
                if nc == 1:
                    # a single-component scan is non-interleaved: its MCU is
                    # ONE data unit and the declared factors play no role
                    # (T.81 A.2.2) — some encoders still write 0x22 here
                    hs = vs = 1
                comps.append((cid, hs, vs, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for cid, hs, vs, _ in comps:
                # integer-ratio upsampling only — every real-world layout
                # (4:4:4, 4:2:2, 4:2:0, 4:1:1) divides evenly; a 3:2-style
                # ratio would need fractional resampling
                if hmax % hs or vmax % vs:
                    raise NotImplementedError(
                        f"non-integer sampling ratio (component {cid}: "
                        f"{hs}/{vs} vs max {hmax}/{vmax}) not supported"
                    )
            frame = (w, h, comps)
            if progressive:
                # full coefficient store, MCU-padded so interleaved DC scans
                # can index it; AC scans write only the component's own
                # (ceil-sized) block grid
                n_mx = (w + 8 * hmax - 1) // (8 * hmax)
                n_my = (h + 8 * vmax - 1) // (8 * vmax)
                coeffs = {
                    cid: np.zeros((n_my * vs, n_mx * hs, 64), dtype=np.int64)
                    for cid, hs, vs, _ in comps
                }
        elif marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(f"{_SOF_UNSUPPORTED[marker]} JPEG not supported (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns == 0:
                # T.81 requires 1 <= Ns <= 4; a zero-component scan is a
                # corrupt stream — reject loudly rather than IndexError on
                # scan_order[0] deeper in the DC/AC unit loops
                raise ValueError("SOS declares zero scan components")
            scan_tabs = {}
            scan_order = []
            for si in range(ns):
                cid, tt = struct.unpack_from(">BB", body, 1 + si * 2)
                scan_tabs[cid] = (tt >> 4, tt & 0x0F)
                scan_order.append(cid)
            if progressive:
                ss, se, ahal = struct.unpack_from(">BBB", body, 1 + ns * 2)
                pos = _decode_progressive_scan(
                    payload, pos, frame, coeffs, scan_order, scan_tabs,
                    dc_tables, ac_tables, restart_interval,
                    ss, se, ahal >> 4, ahal & 0x0F,
                )
            else:
                return _decode_scan(
                    payload, pos, frame, scan_tabs, qtables, dc_tables, ac_tables,
                    restart_interval,
                )
        # else: APPn / COM / others — skipped
    raise ValueError(
        "no EOI after progressive scans — truncated JPEG"
        if progressive
        else "no SOS marker — truncated JPEG"
    )


def _decode_scan(payload, pos, frame, scan_tabs, qtables, dc_tables, ac_tables, dri):
    w, h, comps = frame
    nc = len(comps)
    # loud gates, not KeyErrors: T.81 allows a baseline image to arrive as
    # several non-interleaved scans (one component each); this decoder
    # supports only the single interleaved scan every common encoder emits
    if set(scan_tabs) != {cid for cid, _, _, _ in comps}:
        raise NotImplementedError(
            f"non-interleaved multi-scan JPEG not supported (scan covers "
            f"{sorted(scan_tabs)} of components {sorted(c for c, _, _, _ in comps)})"
        )
    for cid, _, _, tq in comps:
        if tq not in qtables:
            raise ValueError(f"component {cid} references undeclared quant table {tq}")
        dc_id, ac_id = scan_tabs[cid]
        if dc_id not in dc_tables or ac_id not in ac_tables:
            raise ValueError(
                f"component {cid} references undeclared huffman table "
                f"(dc={dc_id}, ac={ac_id})"
            )
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    # MCU grid covers the image at the MAX sampling resolution; each MCU
    # carries hs*vs blocks of every component in row-major interleave order
    # (T.81 A.2.3) — for 4:2:0 that is 4 Y blocks then 1 Cb then 1 Cr
    n_mx = (w + 8 * hmax - 1) // (8 * hmax)
    n_my = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((n_my * 8 * vs, n_mx * 8 * hs)) for _, hs, vs, _ in comps
    ]
    br = _BitReader(payload, pos)
    pred = [0] * nc
    mcu = 0
    for my in range(n_my):
        for mx in range(n_mx):
            if dri and mcu and mcu % dri == 0:
                m = br.align_to_marker()
                if not 0xD0 <= m <= 0xD7:
                    raise ValueError(f"expected RST marker, got 0xFF{m:02X}")
                pred = [0] * nc
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                dc_id, ac_id = scan_tabs[cid]
                dc_tab, ac_tab = dc_tables[dc_id], ac_tables[ac_id]
                qtab = qtables[tq]
                for v in range(vs):
                    for u in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        size = dc_tab.decode(br)
                        if size > 11:
                            raise ValueError(f"DC category {size} out of range")
                        pred[ci] += _extend(br.bits(size), size) if size else 0
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = ac_tab.decode(br)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError("AC run overruns block")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        coeffs = np.zeros(64)
                        coeffs[ZIGZAG] = zz
                        block = _DCT.T @ (coeffs.reshape(8, 8) * qtab) @ _DCT + 128.0
                        py = (my * vs + v) * 8
                        px = (mx * hs + u) * 8
                        planes[ci][py : py + 8, px : px + 8] = block
            mcu += 1
    return _planes_to_raster(planes, comps, hmax, vmax, w, h)


def _planes_to_raster(planes, comps, hmax, vmax, w, h):
    """Upsample subsampled planes to full resolution by pixel replication
    (JFIF nearest-neighbor; fancy triangle filtering is a decoder QoS
    choice, not part of the format), crop to the declared size, and
    convert YCbCr->RGB for 3 components."""
    cropped = []
    for (cid, hs, vs, _), p in zip(comps, planes):
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        cropped.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.rint(cropped[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    y, cb, cr = cropped
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


# --- progressive (SOF2) decode ---------------------------------------------
#
# T.81 Annex G, huffman-coded progressive DCT: the image's quantized
# coefficients arrive across MULTIPLE scans — spectral selection (each scan
# carries one zigzag band [Ss, Se]) and successive approximation (each band
# first arrives at a coarse magnitude scale 2^Al, then per-bit refinement
# scans sharpen it). DC scans may interleave all components in MCU order;
# AC scans are per-component over that component's own block grid. The
# decoder accumulates everything into one coefficient store and runs
# dequant + IDCT once at EOI.


def _comp_block_grid(frame, cid):
    """(block_rows, block_cols) of a component's OWN sampling grid — what a
    non-interleaved scan covers (ceil of the component's sample dims, NOT
    the MCU-padded grid)."""
    w, h, comps = frame
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    for c, hs, vs, _ in comps:
        if c == cid:
            cw = (w * hs + hmax - 1) // hmax
            ch = (h * vs + vmax - 1) // vmax
            return (ch + 7) // 8, (cw + 7) // 8
    raise ValueError(f"scan references undeclared component {cid}")


def _decode_dc_unit(br, dc_tab, zz, pred, ah, al):
    if ah == 0:
        size = dc_tab.decode(br)
        if size > 11:
            raise ValueError(f"DC category {size} out of range")
        pred += _extend(br.bits(size), size) if size else 0
        zz[0] = pred << al
    else:
        if br.bit():
            zz[0] |= 1 << al  # two's-complement OR appends the bit for
            # negatives exactly like the arithmetic-shifted first scan
    return pred


def _decode_ac_first(br, ac_tab, zz, ss, se, al, eobrun):
    """One block of an AC first scan (Ah == 0), T.81 G.1.2.2 — returns the
    remaining end-of-band run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = ac_tab.decode(br)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run overruns spectral band")
        zz[k] = _extend(br.bits(s), s) << al
        k += 1
    return eobrun


def _refine_nonzero(br, zz, k, p1):
    """Correction bit for a coefficient that already has history."""
    if br.bit():
        mag = zz[k] if zz[k] > 0 else -zz[k]
        if (mag & p1) == 0:
            zz[k] += p1 if zz[k] > 0 else -p1


def _decode_ac_refine(br, ac_tab, zz, ss, se, al, eobrun):
    """One block of an AC refinement scan (Ah > 0), T.81 G.1.2.3: newly
    significant coefficients arrive as (run-of-zero-history, ±2^Al) while
    every already-nonzero coefficient passed over receives one correction
    bit. Returns the remaining end-of-band run."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = ac_tab.decode(br)
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s == 0:
                if r != 15:  # EOBn: band ends here (after history corrections)
                    # the run INCLUDES this block (its tail corrections are
                    # read below before the decrement), unlike the first-scan
                    # EOB where the current block simply ends
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # ZRL: skip 16 zero-history slots (corrections en route)
            elif s == 1:
                newval = p1 if br.bit() else -p1
            else:
                raise ValueError("AC refinement magnitude category must be 1")
            while k <= se:
                if zz[k] != 0:
                    _refine_nonzero(br, zz, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                _refine_nonzero(br, zz, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _next_marker_pos(data, pos):
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    raise ValueError("truncated JPEG: no marker after scan data")


def _decode_progressive_scan(
    payload, pos, frame, coeffs, scan_order, scan_tabs,
    dc_tables, ac_tables, dri, ss, se, ah, al,
):
    """Decode one progressive scan's entropy data into the coefficient
    store; returns the payload offset of the next marker segment."""
    w, h, comps = frame
    by_cid = {cid: (hs, vs) for cid, hs, vs, _ in comps}
    for cid in scan_order:
        if cid not in by_cid:
            raise ValueError(f"scan references undeclared component {cid}")
    br = _BitReader(payload, pos)
    if ss == 0:  # DC scan (spectral band [0,0])
        if se != 0:
            raise ValueError("DC scan must have Se = 0")
        for cid in scan_order:
            if ah == 0 and scan_tabs[cid][0] not in dc_tables:
                raise ValueError(f"undeclared DC huffman table for component {cid}")
        hmax = max(hs for _, hs, _, _ in comps)
        vmax = max(vs for _, _, vs, _ in comps)
        pred = {cid: 0 for cid in scan_order}
        if len(scan_order) > 1:  # interleaved MCU order over the padded grid
            n_mx = (w + 8 * hmax - 1) // (8 * hmax)
            n_my = (h + 8 * vmax - 1) // (8 * vmax)
            mcu = 0
            for my in range(n_my):
                for mx in range(n_mx):
                    if dri and mcu and mcu % dri == 0:
                        m = br.align_to_marker()
                        if not 0xD0 <= m <= 0xD7:
                            raise ValueError(f"expected RST marker, got 0xFF{m:02X}")
                        pred = {cid: 0 for cid in scan_order}
                    for cid in scan_order:
                        hs, vs = by_cid[cid]
                        for v in range(vs):
                            for u in range(hs):
                                zz = coeffs[cid][my * vs + v, mx * hs + u]
                                pred[cid] = _decode_dc_unit(
                                    br, dc_tables.get(scan_tabs[cid][0]),
                                    zz, pred[cid], ah, al,
                                )
                    mcu += 1
        else:  # single component: its own block grid, one unit per "MCU"
            cid = scan_order[0]
            bh, bw = _comp_block_grid(frame, cid)
            unit = 0
            for by in range(bh):
                for bx in range(bw):
                    if dri and unit and unit % dri == 0:
                        m = br.align_to_marker()
                        if not 0xD0 <= m <= 0xD7:
                            raise ValueError(f"expected RST marker, got 0xFF{m:02X}")
                        pred[cid] = 0
                    pred[cid] = _decode_dc_unit(
                        br, dc_tables.get(scan_tabs[cid][0]),
                        coeffs[cid][by, bx], pred[cid], ah, al,
                    )
                    unit += 1
    else:  # AC scan: exactly one component (T.81 G.1.1.1.1)
        if len(scan_order) != 1:
            raise ValueError("progressive AC scan must cover exactly one component")
        cid = scan_order[0]
        ac_id = scan_tabs[cid][1]
        if ah == 0 and ac_id not in ac_tables:
            raise ValueError(f"undeclared AC huffman table for component {cid}")
        ac_tab = ac_tables.get(ac_id)
        if ac_tab is None:
            raise ValueError(f"undeclared AC huffman table for component {cid}")
        bh, bw = _comp_block_grid(frame, cid)
        eobrun = 0
        unit = 0
        decode_block = _decode_ac_first if ah == 0 else _decode_ac_refine
        for by in range(bh):
            for bx in range(bw):
                if dri and unit and unit % dri == 0:
                    m = br.align_to_marker()
                    if not 0xD0 <= m <= 0xD7:
                        raise ValueError(f"expected RST marker, got 0xFF{m:02X}")
                    eobrun = 0
                eobrun = decode_block(
                    br, ac_tab, coeffs[cid][by, bx], ss, se, al, eobrun
                )
                unit += 1
    return _next_marker_pos(payload, br.pos)


def _finish_progressive(frame, coeffs, qtables):
    """Dequantize + inverse DCT the accumulated coefficient store — the
    same reconstruction math as the baseline path, then the shared
    upsample/crop/color-convert tail. Coefficient slices are in ZIGZAG
    order (as decoded); natural order is restored per block here."""
    w, h, comps = frame
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    planes = []
    for cid, hs, vs, tq in comps:
        if tq not in qtables:
            raise ValueError(f"component {cid} references undeclared quant table {tq}")
        qtab = qtables[tq]
        store = coeffs[cid]
        bh, bw = store.shape[:2]
        plane = np.zeros((bh * 8, bw * 8))
        for by in range(bh):
            for bx in range(bw):
                nat = np.zeros(64)
                nat[ZIGZAG] = store[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT.T @ (nat.reshape(8, 8) * qtab) @ _DCT + 128.0
                )
        planes.append(plane)
    return _planes_to_raster(planes, comps, hmax, vmax, w, h)
