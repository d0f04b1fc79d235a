"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Closes the last multimodal stub the way PNG was closed: real entropy
coding, real DCT — no image library. Supported: baseline huffman-coded
grayscale (1 component) and YCbCr color (3 components) at any
integer-ratio sampling layout — 4:4:4, 4:2:2, and (since r05) the
dominant real-world 4:2:0 chroma-subsampled form, decoded via the T.81
A.2.3 MCU interleave (e.g. 4 Y + 1 Cb + 1 Cr blocks per 16x16 MCU) with
pixel-replication upsampling — plus restart intervals, multi-table
DQT/DHT segments, APPn/COM skip. The encoder can emit both 4:4:4 and
4:2:0 (2x2 box-averaged chroma). Loudly rejected
(NotImplementedError/ValueError): progressive (SOF2), arithmetic coding,
12-bit precision, non-integer sampling ratios — the same honest-gate
policy the PNG decoder applies to interlaced/16-bit payloads.

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
# all-ones code stays unused as T.81 requires), 162 AC symbols at 9 bits
# (<< 511). Compression suffers; correctness doesn't.
_DC_SYMBOLS = list(range(12))  # DC size categories 0..11
_AC_SYMBOLS = sorted({0x00, 0xF0} | {(run << 4) | size for run in range(16) for size in range(1, 11)})
_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0]


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
        while self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes before a marker are legal
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
) -> bytes:
    """Baseline JPEG from a top-down 8-bit raster (gray: w*h bytes; RGB:
    w*h*3 bytes, encoded as YCbCr). quant is the 64-entry natural-order
    quantization table shared by all components (default all ones —
    near-lossless). subsampling: '444' (every component full-resolution,
    one 8x8 MCU) or '420' (chroma box-averaged 2x2, 16x16 MCUs of
    4 Y + 1 Cb + 1 Cr blocks — the dominant real-world camera/web layout);
    ignored for grayscale."""
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

    hmax = max(hs for _, hs, _ in comps)
    vmax = max(vs for _, _, vs in comps)
    qtab = q.reshape(8, 8)
    bw = _BitWriter()
    pred = [0] * channels
    n_my = comps[0][0].shape[0] // (8 * vmax)
    n_mx = comps[0][0].shape[1] // (8 * hmax)
    for my in range(n_my):
        for mx in range(n_mx):
            for ci, (plane, hs, vs) in enumerate(comps):
                for v in range(vs):
                    for u in range(hs):
                        py = (my * vs + v) * 8
                        px = (mx * hs + u) * 8
                        pred[ci] = _encode_block(
                            bw, plane[py : py + 8, px : px + 8], qtab, pred[ci]
                        )
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
    sos_comps = b"".join(struct.pack(">BB", cid + 1, 0x00) for cid in range(channels))
    sos = seg(0xFFDA, bytes([channels]) + sos_comps + bytes([0, 63, 0]))
    return b"\xff\xd8" + dqt + sof0 + dht + sos + bytes(bw.out) + b"\xff\xd9"


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
    0xC2: "progressive",
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
    frame = None  # (w, h, [(comp_id, qtab_id)])
    restart_interval = 0

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
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
        elif marker == 0xC0:  # SOF0 baseline
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
        elif marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(f"{_SOF_UNSUPPORTED[marker]} JPEG not supported (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_tabs = {}
            for si in range(ns):
                cid, tt = struct.unpack_from(">BB", body, 1 + si * 2)
                scan_tabs[cid] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                payload, pos, frame, scan_tabs, qtables, dc_tables, ac_tables,
                restart_interval,
            )
        # else: APPn / COM / others — skipped
    raise ValueError("no SOS marker — truncated JPEG")


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
    # upsample subsampled planes to full resolution by pixel replication
    # (JFIF nearest-neighbor; fancy triangle filtering is a decoder QoS
    # choice, not part of the format) and crop to the declared size
    cropped = []
    for (cid, hs, vs, _), p in zip(comps, planes):
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        cropped.append(p[:h, :w])
    if nc == 1:
        out = np.clip(np.rint(cropped[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    y, cb, cr = cropped
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()
