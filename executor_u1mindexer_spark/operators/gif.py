"""From-scratch GIF89a codec (palette + LZW), pure Python.

Completes the lossless-container set (PPM/BMP/PNG + now GIF) for the
multimodal decode path: GIF is palette-indexed and LZW-compressed, so a
<=256-unique-color RGB image roundtrips EXACTLY — which is what lets the
suite's closed-form pixel_sum oracle cover it with no decoding on the
oracle side, same as the other lossless containers.

Implemented per the public GIF89a specification:
- logical screen descriptor + global color table;
- extension blocks (graphic control / comment / application) parsed and
  skipped via their sub-block chains;
- image descriptor with optional local color table and interlace flag
  (4-pass row ordering);
- variable-width LZW with CLEAR/EOI, code widths 3..12, dictionary reset
  at 4096 entries, sub-block-chunked data stream.

Decode returns the FIRST frame (animated GIFs: subsequent frames are
compositing state — out of scope, rejected loudly if requested).
Transparency is ignored by design: the transparent index still maps
through the palette, keeping pixel_sum well-defined.

[NOT IN REFERENCE — executor.py has no image surface; this is part of the
mandated multimodal breadth.]
"""

from __future__ import annotations

import struct

MAX_CODE_WIDTH = 12
DICT_LIMIT = 1 << MAX_CODE_WIDTH  # 4096


# -- LZW ---------------------------------------------------------------------


class _BitWriter:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated GIF LZW stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF variable-width LZW. Width grows as soon as a code equal to
    1<<width exists in the dictionary (the GIF "early change" the decoder
    below mirrors); CLEAR + dictionary reset at 4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def reset():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    bw.write(clear, width)
    buf = b""
    for b in indices:
        nxt = buf + bytes([b])
        if nxt in table:
            buf = nxt
            continue
        bw.write(table[buf], width)
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < MAX_CODE_WIDTH:
            width += 1
        if next_code >= DICT_LIMIT:
            bw.write(clear, width)
            table, next_code, width = reset()
        buf = bytes([b])
    if buf:
        bw.write(table[buf], width)
    bw.write(eoi, width)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = bytearray()

    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        code = br.read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("invalid first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} ahead of dictionary")
        out.extend(entry)
        prev = entry
        # mirror of the encoder's growth rule: once a value == 1<<width is
        # assignable the stream switches to wider codes
        if len(table) + 1 > (1 << width) and width < MAX_CODE_WIDTH:
            width += 1


# -- container ---------------------------------------------------------------


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    return [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]


def encode_gif(w: int, h: int, rgb: bytes, *, interlace: bool = False) -> bytes:
    """Encode an RGB image with <= 256 unique colors as a GIF89a payload."""
    if len(rgb) != w * h * 3:
        raise ValueError(f"expected {w * h * 3} RGB bytes, got {len(rgb)}")
    palette: dict[bytes, int] = {}
    indices = bytearray()
    for i in range(0, len(rgb), 3):
        c = rgb[i : i + 3]
        if c not in palette:
            if len(palette) == 256:
                raise ValueError("GIF encoding needs <= 256 unique colors")
            palette[c] = len(palette)
        indices.append(palette[c])
    # palette size must be a power of two >= 2; min_code_size >= 2 per spec
    exp = max(1, (max(len(palette) - 1, 1)).bit_length())
    size = 1 << exp
    mcs = max(2, exp)
    gct = b"".join(palette) + b"\x00\x00\x00" * (size - len(palette))

    if interlace:
        order = _interlace_order(h)
        indices = bytearray(
            b for r in order for b in indices[r * w : (r + 1) * w]
        )

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((exp - 1) & 0x07))  # GCT present, 2^exp entries
    out += b"\x00\x00"  # bg color index, aspect
    out += gct
    out.append(0x2C)  # image descriptor
    out += struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0x00)
    out.append(mcs)
    data = lzw_encode(bytes(indices), mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode the first frame of a GIF87a/89a payload -> (w, h, 3, rgb).

    Truncated payloads raise ValueError (never a bare IndexError/
    struct.error from running off the buffer)."""
    try:
        return _decode_gif(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated GIF payload: {e}") from e


def _decode_gif(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-block chain
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02X}")
        left, top, w, h = struct.unpack_from("<HHHH", payload, pos)
        pos += 8
        iflags = payload[pos]
        pos += 1
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has neither global nor local color table")
        mcs = payload[pos]
        pos += 1
        if not (2 <= mcs <= 11):
            raise ValueError(f"invalid LZW minimum code size {mcs}")
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = lzw_decode(bytes(data), mcs)
        if len(indices) < w * h:
            raise ValueError(
                f"GIF pixel data short: {len(indices)} indices for {w}x{h}"
            )
        indices = indices[: w * h]
        if iflags & 0x40:  # interlaced: invert the 4-pass row order
            rows = [
                indices[i * w : (i + 1) * w] for i in range(h)
            ]
            deinter = [b""] * h
            for src, dst in enumerate(_interlace_order(h)):
                deinter[dst] = rows[src]
            indices = b"".join(deinter)
        npal = len(pal) // 3
        rgb = bytearray()
        for idx in indices:
            if idx >= npal:
                raise ValueError(f"palette index {idx} out of range ({npal})")
            rgb += pal[idx * 3 : idx * 3 + 3]
        # first frame only; its descriptor must cover the logical screen
        # for the (w, h) contract to hold
        if (left, top, w, h) != (0, 0, sw, sh):
            raise NotImplementedError(
                "GIF sub-rectangle frames (animation compositing) not supported"
            )
        return w, h, 3, bytes(rgb)
    raise ValueError("GIF payload contains no image data")
