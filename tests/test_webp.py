"""WebP / VP8L codec: spec-anchored goldens + encoder roundtrips.

The goldens are hand-assembled bitstreams following the public WebP
Lossless Bitstream Specification — they validate the DECODER against the
spec itself, independent of the in-repo encoder."""

import struct

import numpy as np
import pytest

from iceberg_rust_spark.functions.webp import (_LSBWriter, decode_vp8l,
                                               decode_webp,
                                               encode_webp_lossless,
                                               webp_dimensions)


def _vp8l(bits_fn) -> bytes:
    w = _LSBWriter()
    bits_fn(w)
    return b"\x2F" + w.flush()


def _simple2(w, s0, s1):
    """Simple prefix code with two 8-bit symbols."""
    w.write(1, 1)           # simple
    w.write(1, 1)           # two symbols
    w.write(1, 1)           # first symbol is 8 bits
    w.write(s0, 8)
    w.write(s1, 8)


def _simple1(w, s):
    w.write(1, 1)           # simple
    w.write(0, 1)           # one symbol
    if s < 2:
        w.write(0, 1)
        w.write(s, 1)
    else:
        w.write(1, 1)
        w.write(s, 8)


def test_vp8l_golden_literals():
    """2x1 literal image through hand-written simple codes: header
    layout, cache/meta flag order, G-R-B-A literal read order."""
    def bits(w):
        w.write(1, 14)      # width - 1
        w.write(0, 14)      # height - 1
        w.write(0, 1)       # alpha hint
        w.write(0, 3)       # version
        w.write(0, 1)       # no transforms
        w.write(0, 1)       # no color cache
        w.write(0, 1)       # no meta prefix codes
        _simple2(w, 20, 50)     # green
        _simple2(w, 10, 40)     # red
        _simple2(w, 30, 60)     # blue
        _simple1(w, 255)        # alpha
        _simple1(w, 0)          # distance
        w.write(0, 1)       # p0 green -> 20
        w.write(0, 1)       # p0 red   -> 10
        w.write(0, 1)       # p0 blue  -> 30
        w.write(1, 1)       # p1 green -> 50
        w.write(1, 1)       # p1 red   -> 40
        w.write(1, 1)       # p1 blue  -> 60
    rgba = decode_vp8l(_vp8l(bits))
    assert rgba.shape == (1, 2, 4)
    assert rgba[0, 0].tolist() == [10, 20, 30, 255]
    assert rgba[0, 1].tolist() == [40, 50, 60, 255]


def test_vp8l_golden_subtract_green():
    """Subtract-green transform: decoder must add G back to R and B."""
    def bits(w):
        w.write(0, 14)
        w.write(0, 14)
        w.write(0, 1)
        w.write(0, 3)
        w.write(1, 1)       # a transform follows
        w.write(2, 2)       # SUBTRACT_GREEN
        w.write(0, 1)       # no more transforms
        w.write(0, 1)       # no cache
        w.write(0, 1)       # no meta
        _simple1(w, 100)    # green
        _simple1(w, 50)     # red residual
        _simple1(w, 200)    # blue residual
        _simple1(w, 255)    # alpha
        _simple1(w, 0)      # distance
    rgba = decode_vp8l(_vp8l(bits))
    assert rgba[0, 0].tolist() == [(50 + 100) % 256, 100,
                                   (200 + 100) % 256, 255]


def test_vp8l_golden_color_indexing_packed():
    """Color-indexing transform with 1-bit packing: 4x1 image, 2-color
    palette (delta-coded), indices packed LSB-first into one green byte."""
    def bits(w):
        w.write(3, 14)      # width 4
        w.write(0, 14)
        w.write(0, 1)
        w.write(0, 3)
        w.write(1, 1)       # transform
        w.write(3, 2)       # COLOR_INDEXING
        w.write(1, 8)       # n_colors - 1 = 1
        # palette sub-image (2x1), delta coded: c0=(g1,r2,b3,a255),
        # delta=(g10,r20,b30,a0) -> c1=(11,22,33,255)
        w.write(0, 1)       # no cache (sub-image)
        _simple2(w, 1, 10)      # green deltas
        _simple2(w, 2, 20)      # red
        _simple2(w, 3, 30)      # blue
        _simple2(w, 255, 0)     # alpha
        _simple1(w, 0)          # distance
        for bit in (0, 0, 0, 0):    # palette pixel 0 -> symbol index 0
            w.write(bit, 1)
        for bit in (1, 1, 1, 1):    # palette pixel 1 -> deltas
            w.write(bit, 1)
        w.write(0, 1)       # no more transforms
        # main image is ceil(4/8)=1 wide: one green byte of packed indices
        w.write(0, 1)       # no cache
        w.write(0, 1)       # no meta
        _simple1(w, 0b1101)     # indices x0=1, x1=0, x2=1, x3=1 (LSB first)
        _simple1(w, 0)          # red (unused)
        _simple1(w, 0)          # blue
        _simple1(w, 0)          # alpha
        _simple1(w, 0)          # distance
    rgba = decode_vp8l(_vp8l(bits))
    c0 = [2, 1, 3, 255]
    c1 = [22, 11, 33, 255]
    assert rgba.shape == (1, 4, 4)
    assert [px.tolist() for px in rgba[0]] == [c1, c0, c1, c1]


def test_vp8l_golden_predictor_mode2():
    """Predictor transform, mode 2 (T) everywhere: (0,0) predicts opaque
    black, row 0 predicts L, column 0 predicts T, interior predicts T."""
    def bits(w):
        w.write(1, 14)      # 2x2
        w.write(1, 14)
        w.write(0, 1)
        w.write(0, 3)
        w.write(1, 1)       # transform
        w.write(0, 2)       # PREDICTOR
        w.write(0, 3)       # size_bits = 2 (4x4 blocks -> one block)
        # predictor sub-image 1x1: green = mode 2
        w.write(0, 1)       # no cache
        _simple1(w, 2)          # green = predictor mode
        _simple1(w, 0)
        _simple1(w, 0)
        _simple1(w, 0)
        _simple1(w, 0)
        w.write(0, 1)       # no more transforms
        w.write(0, 1)       # no cache
        w.write(0, 1)       # no meta
        # residuals: all pixels (g=5, r=7, b=9, a=1)
        _simple1(w, 5)
        _simple1(w, 7)
        _simple1(w, 9)
        _simple1(w, 1)
        _simple1(w, 0)
    rgba = decode_vp8l(_vp8l(bits))
    # (0,0): res + (0,0,0,255) = (7,5,9,0)  [alpha 1+255 wraps to 0]
    assert rgba[0, 0].tolist() == [7, 5, 9, 0]
    # (0,1): pred = L -> (14,10,18,1)
    assert rgba[0, 1].tolist() == [14, 10, 18, 1]
    # (1,0): pred = T -> (14,10,18,1)
    assert rgba[1, 0].tolist() == [14, 10, 18, 1]
    # (1,1): mode 2 (T) -> above (0,1) + res = (21,15,27,2)
    assert rgba[1, 1].tolist() == [21, 15, 27, 2]


def test_vp8l_golden_lz77_cache_and_normal_code():
    """One hand-assembled stream exercising the normal (code-length-coded)
    prefix code reader with RLE zeros + explicit max_symbol, an LZ77
    length-1 copy through the 2D distance map ((1,0) -> previous pixel),
    and a color-cache hit. 4x1 image; every pixel ends up identical."""
    from iceberg_rust_spark.functions.webp import _hash_pixel

    cache_bits = 4
    px = (10, 77, 33, 255)              # (g, r, b, a)
    idx = _hash_pixel(px, cache_bits)
    cache_sym = 280 + idx               # green alphabet = 256+24+16

    def write_msb(w, code, ln):
        for b in range(ln - 1, -1, -1):
            w.write((code >> b) & 1, 1)

    def bits(w):
        w.write(3, 14)                  # 4x1
        w.write(0, 14)
        w.write(0, 1)
        w.write(0, 3)
        w.write(0, 1)                   # no transforms
        w.write(1, 1)                   # color cache
        w.write(cache_bits, 4)
        w.write(0, 1)                   # no meta
        # --- green: NORMAL code, lengths {10:1, 256:2, cache_sym:2} ---
        w.write(0, 1)                   # not simple
        # code-length code over {1:len1, 2:len2, 17:len3, 18:len3}
        # _CL_ORDER prefix: [17, 18, 0, 1, 2, 3, ...] -> need 5 entries
        w.write(5 - 4, 4)               # num_code_lengths = 5
        for ln in (3, 3, 0, 1, 2):      # lengths of 17, 18, 0, 1, 2
            w.write(ln, 3)
        # canonical: 1->"0", 2->"10", 17->"110", 18->"111"
        cl = {1: (0b0, 1), 2: (0b10, 2), 17: (0b110, 3), 18: (0b111, 3)}
        w.write(1, 1)                   # explicit max symbol
        w.write(1, 3)                   # length_nbits = 2 + 2*1 = 4
        w.write(5, 4)                   # max_symbol = 2 + 5 = 7 = op count
        ops = [(17, 7, 3),              # 10 zeros  (3 + 7)
               (1, None, None),         # lengths[10] = 1
               (18, 127, 7),            # 138 zeros
               (18, 96, 7),             # 107 zeros -> at 256
               (2, None, None),         # lengths[256] = 2
               (18, 23 + idx - 11, 7),  # zeros up to cache_sym
               (2, None, None)]         # lengths[cache_sym] = 2
        for sym, extra, nbits in ops:
            code, ln = cl[sym]
            write_msb(w, code, ln)
            if extra is not None:
                w.write(extra, nbits)
        # --- red/blue/alpha/distance: single-symbol simple codes ---
        _simple1(w, 77)
        _simple1(w, 33)
        _simple1(w, 255)
        _simple1(w, 1)                  # distance sym 1 -> value 2 -> (1,0)
        # green canonical: 10->"0", 256->"10", cache_sym->"11"
        w.write(0, 1)                   # p0: literal (10,77,33,255)
        write_msb(w, 0b10, 2)           # p1: length code 256 -> length 1,
        #                                 dist map[2-1]=(1,0) -> copy p0
        write_msb(w, 0b11, 2)           # p2: color cache hit
        write_msb(w, 0b10, 2)           # p3: copy p2
    rgba = decode_vp8l(_vp8l(bits))
    assert rgba.shape == (1, 4, 4)
    for x in range(4):
        assert rgba[0, x].tolist() == [77, 10, 33, 255], x


def test_webp_dimensions_all_flavors():
    img = np.zeros((7, 9, 3), dtype=np.uint8)
    assert webp_dimensions(encode_webp_lossless(img)) == (9, 7)
    # VP8 (lossy) header
    vp8 = (b"RIFF" + struct.pack("<I", 22) + b"WEBP"
           + b"VP8 " + struct.pack("<I", 10)
           + b"\x00\x00\x00" + b"\x9d\x01\x2a"
           + struct.pack("<HH", 640, 480))
    assert webp_dimensions(vp8) == (640, 480)
    with pytest.raises(ValueError, match="lossy"):
        decode_webp(vp8)
    # VP8X canvas
    vp8x = (b"RIFF" + struct.pack("<I", 22) + b"WEBP"
            + b"VP8X" + struct.pack("<I", 10) + bytes(4)
            + (99).to_bytes(3, "little") + (41).to_bytes(3, "little"))
    assert webp_dimensions(vp8x) == (100, 42)
    with pytest.raises(ValueError):
        webp_dimensions(b"RIFX not webp")


def test_webp_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(st.integers(1, 16), st.integers(1, 16), st.integers(0, 2**32 - 1))
    def roundtrip(h, w, seed):
        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)

    roundtrip()


def test_webp_feeds_multimodal(spark):
    """WebP lossless payloads flow through the REAL pixel path in
    features/meta — identical histogram to the same pixels as PNG."""
    from iceberg_rust_spark.functions.media_codecs import encode_png
    from iceberg_rust_spark.operators.multimodal import (decode_image_meta,
                                                         extract_features)
    px = (np.indices((10, 14)).sum(0) % 8 * 30).astype(np.uint8)
    px = np.stack([px] * 3, axis=2)
    wp = encode_webp_lossless(px)
    meta = decode_image_meta(wp, "image/webp")
    assert (meta["width"], meta["height"]) == (14, 10)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(px))), (2, bytearray(wp))],
        "media_id long, payload binary")
    feats = {r["media_id"]: list(r["features"])
             for r in extract_features(df).collect()}
    assert feats[1] == feats[2]


def test_vp8l_golden_single_cl_symbol_zero_bits():
    """A normal code whose code-length code has ONE live symbol: compliant
    decoders (libwebp BuildHuffmanTable) read ZERO bits per symbol length,
    so 'all 256 red values share length 8' costs no header bits at all.
    Regression: the CL code used to be built as a 1-bit canonical code,
    desyncing on exactly this spec-valid stream."""
    from iceberg_rust_spark.functions.webp import _CL_ORDER

    def bits(w):
        w.write(1, 14)      # width 2
        w.write(0, 14)      # height 1
        w.write(0, 1)       # alpha hint
        w.write(0, 3)       # version
        w.write(0, 1)       # no transforms
        w.write(0, 1)       # no color cache
        w.write(0, 1)       # no meta prefix codes
        _simple1(w, 7)      # green
        # red: normal code, CL lengths all zero except symbol 8 -> single
        w.write(0, 1)       # normal (non-simple) code
        w.write(13 - 4, 4)  # n_cl = 13 covers order position of symbol 8
        for i in range(13):
            w.write(1 if _CL_ORDER[i] == 8 else 0, 3)
        w.write(0, 1)       # no explicit max symbol
        # ZERO symbol-length bits follow: every red length becomes 8
        _simple1(w, 9)      # blue
        _simple1(w, 255)    # alpha
        _simple1(w, 0)      # distance
        # canonical all-length-8 code assigns symbol i the MSB-first code i
        for v in (17, 250):
            for b in range(7, -1, -1):
                w.write((v >> b) & 1, 1)
    rgba = decode_vp8l(_vp8l(bits))
    assert rgba.shape == (1, 2, 4)
    assert rgba[0, 0].tolist() == [17, 7, 9, 255]
    assert rgba[0, 1].tolist() == [250, 7, 9, 255]


def test_webp_roundtrip_uniform_length_channels():
    """Every channel a permutation of 0..255 (uniform frequency -> all
    lengths 8 -> single-CL-symbol header) must round-trip; with the golden
    above pinning the spec's zero-bit read, this proves the ENCODER emits
    the compliant zero-bit form too."""
    rng = np.random.default_rng(7)
    img = np.stack([rng.permutation(256).reshape(16, 16).astype(np.uint8)
                    for _ in range(3)], axis=2)
    assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)


def test_vp8_bool_decoder_split_arithmetic():
    """Pin the RFC 6386 split formula (the +1 and (range-1) details) with
    hand-computed micro-cases: at prob 128 on a fresh decoder the split
    register is exactly 0x8000, so the first bool is the stream's top bit."""
    from iceberg_rust_spark.functions.webp import _VP8BoolDecoder
    d = _VP8BoolDecoder(bytes([0x80, 0x00]))
    assert d.read(128) == 1          # value 0x8000 >= SPLIT 0x8000
    d = _VP8BoolDecoder(bytes([0x7F, 0xFF]))
    assert d.read(128) == 0          # value 0x7FFF < SPLIT 0x8000
    # prob 0 -> split 1, SPLIT 0x100: only a near-zero value decodes 0
    d = _VP8BoolDecoder(bytes([0x00, 0xFF]))
    assert d.read(0) == 0
    d = _VP8BoolDecoder(bytes([0x01, 0x00]))
    assert d.read(0) == 1


def test_vp8_keyframe_header_roundtrip_and_boundaries():
    from iceberg_rust_spark.functions.webp import (_VP8BoolDecoder,
                                                   _VP8BoolEncoder,
                                                   encode_vp8_keyframe_header,
                                                   vp8_keyframe_info)
    hdr = encode_vp8_keyframe_header(1023, 77, y_ac_qi=103, filter_level=33,
                                     segmentation_quant_deltas=[10, -3, 0, 127])
    info = vp8_keyframe_info(hdr)
    assert (info["width"], info["height"]) == (1023, 77)
    assert info["y_ac_qi"] == 103 and info["filter_level"] == 33
    assert info["segmentation"]["quantizer_deltas"] == [10, -3, 0, 127]
    assert info["dct_partition_count"] == 1
    assert info["first_partition_size"] == len(hdr) - 10

    # non-keyframe and bad magic must raise (stub fallback boundary)
    import pytest
    bad = bytearray(hdr)
    bad[0] |= 1                      # interframe bit
    with pytest.raises(ValueError):
        vp8_keyframe_info(bytes(bad))
    with pytest.raises(ValueError):
        vp8_keyframe_info(hdr[:3] + b"XXX" + hdr[6:])

    # long random bool sequences roundtrip at arbitrary probs (carry path)
    import random
    rng = random.Random(11)
    probs = [rng.randrange(1, 255) for _ in range(4000)]
    bits = [rng.randrange(2) for _ in range(4000)]
    e = _VP8BoolEncoder()
    for p, b in zip(probs, bits):
        e.write(p, b)
    stream = e.flush()
    d = _VP8BoolDecoder(stream)
    assert [d.read(p) for p in probs] == bits


def test_vp8_info_inside_webp_container():
    from iceberg_rust_spark.functions.webp import (encode_vp8_keyframe_header,
                                                   vp8_keyframe_info,
                                                   webp_dimensions)
    frame = encode_vp8_keyframe_header(48, 32, y_ac_qi=12)
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunk += b"\x00"
    webp = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert webp_dimensions(webp) == (48, 32)
    info = vp8_keyframe_info(webp)
    assert (info["width"], info["height"], info["y_ac_qi"]) == (48, 32, 12)
