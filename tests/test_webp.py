"""VP8L (lossless WebP) codec: constant-table pinning, roundtrip
property tests across every encode lane, and loud-gate behavior.

The distance-map test is the module's verification keystone: the table
is generated from its ordering rule in webp.py and pinned here against
the literal table as printed in the spec — two independent recollections
that must agree entry-for-entry (see webp.py's provenance note)."""

from __future__ import annotations

import random

import pytest

from executor_u1mindexer_spark.operators import webp as W

# the 120-entry (dx, dy) table as printed in RFC 9649 §4.2.2
_SPEC_DIST_TABLE = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]

_LANES = [
    dict(),
    dict(cache_bits=4),
    dict(cache_bits=6),
    dict(use_lz77=False),
    dict(transforms=("subtract_green",)),
    dict(transforms=("predictor",)),
    dict(transforms=("color",)),
    dict(transforms=("palette",)),
    dict(transforms=("subtract_green", "predictor"), meta_split=True),
    dict(meta_split=True, cache_bits=3),
]


def test_distance_map_matches_spec_table():
    assert len(W._DIST_MAP) == 120
    assert list(W._DIST_MAP) == _SPEC_DIST_TABLE


def test_distance_map_roundtrips_through_codes():
    for width in (1, 3, 8, 17, 300):
        for dist in (1, 2, width, width + 3, 500):
            code = W._dist_code_for(dist, width)
            assert W._map_distance(code, width) == dist


def _images(rng: random.Random, n: int):
    for trial in range(n):
        w, h = rng.randrange(1, 17), rng.randrange(1, 13)
        style = trial % 4
        if style == 0:  # noise
            rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        elif style == 1:  # constant (cache/LZ77 heavy)
            rgb = bytes(rng.randrange(256) for _ in range(3)) * (w * h)
        elif style == 2:  # few colors (palette bundling paths)
            pal = [
                bytes(rng.randrange(256) for _ in range(3))
                for _ in range(rng.choice([1, 2, 3, 4, 9, 17]))
            ]
            rgb = b"".join(rng.choice(pal) for _ in range(w * h))
        else:  # striped rows (2D distance codes)
            rgb = bytes(rng.randrange(256) for _ in range(w * 3)) * h
        yield w, h, rgb


def test_roundtrip_all_lanes_all_styles():
    rng = random.Random(20260814)
    for w, h, rgb in _images(rng, 24):
        for lane in _LANES:
            enc = W.encode_webp(w, h, rgb, **lane)
            dw, dh, drgb = W.decode_webp_rgb(enc)
            assert (dw, dh) == (w, h), lane
            assert drgb == rgb, (w, h, lane)


def test_roundtrip_exercises_all_predictor_modes():
    # 32x16 at block bits 2 -> 8x4 = 32 blocks; the encoder's (bx+by)%14
    # sweep covers every mode at least once
    rng = random.Random(7)
    w, h = 32, 16
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    enc = W.encode_webp(w, h, rgb, transforms=("predictor",))
    assert W.decode_webp_rgb(enc) == (w, h, rgb)


def test_palette_bundling_widths():
    # palettes of 2/4/16/17 colors hit width_bits 3/2/1/0
    for n_colors, wb in ((2, 3), (4, 2), (16, 1), (17, 0)):
        assert W._width_bits(n_colors) == wb
        rng = random.Random(n_colors)
        pal = [bytes((i * 37 % 256, i * 59 % 256, i * 83 % 256)) for i in range(n_colors)]
        w, h = 13, 5
        rgb = b"".join(pal[rng.randrange(n_colors)] for _ in range(w * h))
        # force every palette entry to appear so the palette is full-size
        rgb = b"".join(pal) + rgb[n_colors * 3 :]
        enc = W.encode_webp(w, h, rgb, transforms=("palette",))
        assert W.decode_webp_rgb(enc) == (w, h, rgb)


def test_color_cache_tokens_actually_used():
    # a two-color checkerboard with LZ77 off must produce cache hits
    w, h = 8, 8
    pix = [
        W._argb(0xFF, 200, 10, 30) if (x + y) % 2 else W._argb(0xFF, 5, 250, 99)
        for y in range(h)
        for x in range(w)
    ]
    tokens = W._tokenize(pix, w, cache_bits=4, use_lz77=False)
    kinds = {t[0] for t in tokens}
    assert "cache" in kinds and "lit" in kinds


def test_lossy_vp8_raises_loudly():
    fake = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        W.decode_webp(fake)


def test_malformed_payloads_raise_value_error():
    with pytest.raises(ValueError, match="RIFF"):
        W.decode_webp(b"NOPE")
    enc = W.encode_webp(3, 3, bytes(27))
    with pytest.raises(ValueError):
        W.decode_webp(enc[:20])  # truncated mid-bitstream
    bad_sig = bytearray(enc)
    bad_sig[20] ^= 0xFF  # first VP8L payload byte (the 0x2f signature)
    with pytest.raises(ValueError):
        W.decode_webp(bytes(bad_sig))


def test_one_by_one_image():
    for lane in (dict(), dict(cache_bits=2), dict(transforms=("palette",))):
        enc = W.encode_webp(1, 1, b"\x07\x83\xc1", **lane)
        assert W.decode_webp_rgb(enc) == (1, 1, b"\x07\x83\xc1")


def test_palette_must_be_alone():
    with pytest.raises(ValueError, match="alone"):
        W.encode_vp8l(2, 2, bytes(12), transforms=("palette", "subtract_green"))


def test_oversized_header_rejected_before_allocation():
    bw = W._BitWriter()
    bw.write(0x2F, 8)
    bw.write(16383, 14)  # width 16384
    bw.write(16383, 14)  # height 16384 -> 2^28 pixels
    bw.write(0, 1)
    bw.write(0, 3)
    with pytest.raises(ValueError, match="pixel budget"):
        W.decode_vp8l(bw.getvalue())


# -- hypothesis property tests (no Spark; the codec is pure Python) ----------

from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def _rand_image(draw):
    w = draw(st.integers(min_value=1, max_value=12))
    h = draw(st.integers(min_value=1, max_value=10))
    style = draw(st.sampled_from(["noise", "palette", "stripes"]))
    if style == "noise":
        rgb = bytes(
            draw(st.lists(st.integers(0, 255), min_size=w * h * 3,
                          max_size=w * h * 3))
        )
    elif style == "palette":
        pal = [
            bytes(draw(st.lists(st.integers(0, 255), min_size=3, max_size=3)))
            for _ in range(draw(st.integers(1, 5)))
        ]
        rgb = b"".join(
            pal[draw(st.integers(0, len(pal) - 1))] for _ in range(w * h)
        )
    else:
        row = bytes(
            draw(st.lists(st.integers(0, 255), min_size=w * 3, max_size=w * 3))
        )
        rgb = row * h
    lane = draw(st.sampled_from(_LANES))
    return w, h, rgb, lane


@settings(max_examples=40, deadline=None)
@given(_rand_image())
def test_roundtrip_property(data):
    w, h, rgb, lane = data
    enc = W.encode_webp(w, h, rgb, **lane)
    assert W.decode_webp_rgb(enc) == (w, h, rgb)


def test_alpha_channel_roundtrip():
    """Non-opaque alpha gives the alpha prefix code a real alphabet
    (otherwise it is always a degenerate single-symbol code)."""
    rng = random.Random(13)
    for lane in (dict(), dict(cache_bits=4),
                 dict(transforms=("subtract_green", "predictor"))):
        w, h = 9, 7
        rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
        alpha = bytes(rng.randrange(256) for _ in range(w * h))
        enc = W.encode_webp(w, h, rgb, alpha=alpha, **lane)
        dw, dh, ch, rgba = W.decode_webp(enc)
        assert (dw, dh, ch) == (w, h, 4)
        got_rgb = bytes(
            b for i in range(w * h) for b in rgba[i * 4 : i * 4 + 3]
        )
        got_a = bytes(rgba[i * 4 + 3] for i in range(w * h))
        assert got_rgb == rgb and got_a == alpha, lane


def test_decode_handcrafted_minimal_stream():
    """Decoder vs a HAND-SPECIFIED bitstream (packed by a local one-off
    packer, not the module's _BitWriter): a 1x1 image, no transforms/
    cache/meta, five simple prefix codes each degenerate to one symbol,
    zero pixel bits. Checks the field order and bit layout of the
    header + simple-code path independently of the encoder."""
    fields = [
        (0x2F, 8),   # signature
        (0, 14),     # width - 1
        (0, 14),     # height - 1
        (0, 1),      # alpha hint
        (0, 3),      # version
        (0, 1),      # no transforms
        (0, 1),      # no color cache
        (0, 1),      # no meta prefix codes
        # green: simple, 1 symbol, 8-bit, symbol 42
        (1, 1), (0, 1), (1, 1), (42, 8),
        # red: symbol 7
        (1, 1), (0, 1), (1, 1), (7, 8),
        # blue: symbol 99
        (1, 1), (0, 1), (1, 1), (99, 8),
        # alpha: symbol 255
        (1, 1), (0, 1), (1, 1), (255, 8),
        # distance: simple, 1 symbol, 1-bit, symbol 0
        (1, 1), (0, 1), (0, 1), (0, 1),
    ]
    acc = 0
    nbits = 0
    for val, n in fields:
        acc |= (val & ((1 << n) - 1)) << nbits
        nbits += n
    payload = acc.to_bytes((nbits + 7) // 8, "little")
    w, h, pix = W.decode_vp8l(payload)
    assert (w, h) == (1, 1)
    assert pix == [W._argb(255, 7, 42, 99)]


def _pack(fields):
    acc = 0
    nbits = 0
    for val, n in fields:
        acc |= (val & ((1 << n) - 1)) << nbits
        nbits += n
    return acc.to_bytes((nbits + 7) // 8, "little")


def _header_1x1():
    return [(0x2F, 8), (0, 14), (0, 14), (0, 1), (0, 3),
            (0, 1), (0, 1), (0, 1)]  # no transforms/cache/meta


def test_decoder_rejects_out_of_alphabet_simple_symbols():
    # distance simple code with an 8-bit symbol 255 >= 40 -> ValueError
    fields = _header_1x1()
    for sym in (42, 7, 99, 255):  # four valid 8-bit simple codes
        fields += [(1, 1), (0, 1), (1, 1), (sym, 8)]
    fields += [(1, 1), (0, 1), (1, 1), (255, 8)]  # dist symbol 255: invalid
    with pytest.raises(ValueError, match="out of alphabet"):
        W.decode_vp8l(_pack(fields))


def test_decoder_rejects_code_length_repeat_past_alphabet():
    # green code via the NORMAL path whose 18-code zero-run overruns the
    # 280-symbol alphabet: num_cl=5 transmits lengths for order
    # (17, 18, 0, 1, 2); give symbol 18 length 1 and symbol 0 length 1,
    # then emit enough 18-runs to blow past the alphabet
    fields = _header_1x1()
    fields += [(0, 1)]           # normal code
    fields += [(5 - 4, 4)]       # num_code_lengths = 5
    # 3-bit lengths for cl symbols 17, 18, 0, 1, 2
    fields += [(0, 3), (1, 3), (1, 3), (0, 3), (0, 3)]
    fields += [(0, 1)]           # no max_symbol trimming
    # canonical: symbols {18: len1, 0: len1} -> codes 0 (sym 0), 1 (sym 18)
    # emit 18-code (bit 1) with max run 138, three times: 414 > 280
    for _ in range(3):
        fields += [(1, 1), (127, 7)]
    with pytest.raises(ValueError, match="repeat past alphabet"):
        W.decode_vp8l(_pack(fields))


def test_decoder_rejects_oversubscribed_prefix_code():
    # code-length code claiming three symbols of length 1 is
    # over-subscribed; construction must fail loudly
    with pytest.raises(ValueError, match="over-subscribed"):
        W._PrefixCode([1, 1, 1])


# -- r09 (VERDICT r08 #6): hand-specified fixtures for the remaining decode
# lanes — color cache, meta prefix codes, color-indexing bit-bundling —
# packed by the local _pack one-off, NOT the module's encoder, so each lane
# has a check that cannot self-cancel with a shared encoder misreading.


def test_decode_handcrafted_color_cache_stream():
    """2x1 image, 1-bit color cache: pixel 0 is the literal ARGB
    (255,1,2,3), pixel 1 is a cache hit of it. The green code is a
    NORMAL (code-length-coded) prefix code — cache symbols live above
    255 so no simple code can reach them — which also pins the
    code-length-code order, the 18-token zero runs, and the canonical
    construction against the spec, independently of the encoder."""
    px = 0xFF010203
    ci = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> 31  # spec §4.3, 1-bit cache
    S = 256 + 24 + ci  # the cache-hit green symbol
    fields = [
        (0x2F, 8), (1, 14), (0, 14), (0, 1), (0, 3),  # header, 2x1
        (0, 1),              # no transforms
        (1, 1), (1, 4),      # color cache, cache_bits = 1
        (0, 1),              # no meta prefix codes
        # green: NORMAL code over 282 symbols; lengths: sym2 -> 1, S -> 1
        (0, 1),              # not simple
        (0, 4),              # num_cl = 4 -> CL_ORDER prefix 17,18,0,1
        (0, 3),              # len(cl 17) = 0
        (2, 3),              # len(cl 18) = 2
        (1, 3),              # len(cl 0)  = 1
        (2, 3),              # len(cl 1)  = 2
        (0, 1),              # no max-symbol trimming
        # canonical cl codes: 0 -> '0', 1 -> '10', 18 -> '11'
        (0, 1), (0, 1),                  # green syms 0,1: length 0
        (1, 1), (0, 1),                  # green sym 2: length 1
        (1, 1), (1, 1), (127, 7),        # 18: 138 zeros
        (1, 1), (1, 1), (127, 7),        # 18: 138 more
    ]
    fields += [(0, 1)] * (1 + ci)        # remaining zeros up to S
    fields += [(1, 1), (0, 1)]           # green sym S: length 1
    fields += [(0, 1)] * (1 - ci)        # zeros after S (alphabet 282)
    fields += [
        # red / blue / alpha: simple 1-symbol 8-bit codes (0 pixel bits)
        (1, 1), (0, 1), (1, 1), (1, 8),
        (1, 1), (0, 1), (1, 1), (3, 8),
        (1, 1), (0, 1), (1, 1), (255, 8),
        # distance: simple 1-symbol 1-bit code
        (1, 1), (0, 1), (0, 1), (0, 1),
        # pixels: green '0' = literal sym 2; green '1' = cache hit S
        (0, 1),
        (1, 1),
    ]
    w, h, pix = W.decode_vp8l(_pack(fields))
    assert (w, h) == (2, 1)
    assert pix == [px, px]


def test_decode_handcrafted_meta_prefix_stream():
    """8x1 image with meta prefix codes, meta_bits=2: the 1x2 entropy
    image assigns tiles x<4 to group 0 (green literal 10) and x>=4 to
    group 1 (green literal 20). All ten main codes are degenerate, so
    group SELECTION alone determines the pixels — a wrong meta_bits
    offset, subsample size, or group-id extraction (bits 8..23) breaks
    the split point."""
    fields = [
        (0x2F, 8), (7, 14), (0, 14), (0, 1), (0, 3),  # header, 8x1
        (0, 1),              # no transforms
        (0, 1),              # no color cache
        (1, 1), (0, 3),      # meta prefix codes, meta_bits = 0 + 2
        # entropy image (2x1, no cache flag of its own first):
        (0, 1),              # entropy image: no color cache
        # its green code: simple, 2 symbols, 1-bit first: 0 then 1
        (1, 1), (1, 1), (0, 1), (0, 1), (1, 8),
        # red / blue / alpha / distance: 1-symbol 1-bit 0
        (1, 1), (0, 1), (0, 1), (0, 1),
        (1, 1), (0, 1), (0, 1), (0, 1),
        (1, 1), (0, 1), (0, 1), (0, 1),
        (1, 1), (0, 1), (0, 1), (0, 1),
        # entropy pixels: green '0' (group 0) then '1' (group 1)
        (0, 1), (1, 1),
        # group 0: green = single symbol 10; r/b 0; alpha 255; dist 0
        (1, 1), (0, 1), (1, 1), (10, 8),
        (1, 1), (0, 1), (0, 1), (0, 1),
        (1, 1), (0, 1), (0, 1), (0, 1),
        (1, 1), (0, 1), (1, 1), (255, 8),
        (1, 1), (0, 1), (0, 1), (0, 1),
        # group 1: green = single symbol 20; r/b 0; alpha 255; dist 0
        (1, 1), (0, 1), (1, 1), (20, 8),
        (1, 1), (0, 1), (0, 1), (0, 1),
        (1, 1), (0, 1), (0, 1), (0, 1),
        (1, 1), (0, 1), (1, 1), (255, 8),
        (1, 1), (0, 1), (0, 1), (0, 1),
        # main pixels: every code degenerate -> zero bits
    ]
    w, h, pix = W.decode_vp8l(_pack(fields))
    assert (w, h) == (8, 1)
    assert pix == [W._argb(255, 0, 10, 0)] * 4 + [W._argb(255, 0, 20, 0)] * 4


def test_decode_handcrafted_palette_bundling_stream():
    """5x1 image through the color-indexing transform with a 4-color
    palette: width_bits=2, so FOUR 2-bit indices bundle into each packed
    green byte and the packed width is ceil(5/4)=2. Palette entries are
    component-delta coded (greens 7, +10, +10, +10). Packed greens
    57 = 1|2<<2|3<<4|0<<6 and 2 encode indices [1,2,3,0,2] — any slip in
    delta accumulation, sub-pixel bit order, packed-width rounding, or
    palette lookup rearranges the output colors."""
    fields = [
        (0x2F, 8), (4, 14), (0, 14), (0, 1), (0, 3),  # header, 5x1
        (1, 1), (3, 2),      # transform present: color indexing
        (3, 8),              # palette size - 1 = 3
        # palette image (4x1): no cache
        (0, 1),
        # green: simple 2-symbol 8-bit: 7 and 10
        (1, 1), (1, 1), (1, 1), (7, 8), (10, 8),
        # red / blue: 1-symbol 1-bit 0
        (1, 1), (0, 1), (0, 1), (0, 1),
        (1, 1), (0, 1), (0, 1), (0, 1),
        # alpha: simple 2-symbol 8-bit: 255 and 0
        (1, 1), (1, 1), (1, 1), (255, 8), (0, 8),
        # distance: 1-symbol 1-bit 0
        (1, 1), (0, 1), (0, 1), (0, 1),
        # palette pixels (green, alpha): (7,255) then 3x delta (10,0)
        # canonical: green 7->'0' 10->'1'; alpha 0->'0' 255->'1'
        (0, 1), (1, 1),
        (1, 1), (0, 1),
        (1, 1), (0, 1),
        (1, 1), (0, 1),
        (0, 1),              # end of transforms
        # main (packed 2x1): no cache, no meta
        (0, 1), (0, 1),
        # green: simple 2-symbol 8-bit: 2 and 57
        (1, 1), (1, 1), (1, 1), (2, 8), (57, 8),
        # red / blue / alpha / distance: 1-symbol 1-bit 0
        (1, 1), (0, 1), (0, 1), (0, 1),
        (1, 1), (0, 1), (0, 1), (0, 1),
        (1, 1), (0, 1), (0, 1), (0, 1),
        (1, 1), (0, 1), (0, 1), (0, 1),
        # packed pixels: '1' (57) then '0' (2)
        (1, 1), (0, 1),
    ]
    w, h, pix = W.decode_vp8l(_pack(fields))
    assert (w, h) == (5, 1)
    p = [W._argb(255, 0, 7 + 10 * i, 0) for i in range(4)]
    assert pix == [p[1], p[2], p[3], p[0], p[2]]
