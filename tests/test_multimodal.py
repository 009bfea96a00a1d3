"""Multimodal codec kernels (pure-Python header parsers + stubs)."""

import pytest


def test_jpeg_sof_parser_kernel():
    """Real JPEG header parse (ITU-T T.81 SOF walk), no codec libs."""
    from iceberg_rust_spark.operators.multimodal import (_jpeg_dimensions,
                                                         decode_image_meta,
                                                         synthetic_jpeg)
    assert _jpeg_dimensions(synthetic_jpeg(640, 480)) == (640, 480)
    assert _jpeg_dimensions(synthetic_jpeg(1, 1)) == (1, 1)
    assert _jpeg_dimensions(synthetic_jpeg(65535, 3, b"xx")) == (65535, 3)
    # progressive SOF2 also carries dimensions
    prog = synthetic_jpeg(33, 44).replace(b"\xff\xc0", b"\xff\xc2")
    assert _jpeg_dimensions(prog) == (33, 44)
    # truncated / non-JPEG inputs return None (stub path takes over)
    assert _jpeg_dimensions(b"\xff\xd8\xff") is None
    assert _jpeg_dimensions(b"GIF89a") is None
    meta = decode_image_meta(synthetic_jpeg(12, 7), "image/jpeg")
    assert (meta["width"], meta["height"]) == (12, 7)


# ---- real stdlib codec kernels (functions/media_codecs) -------------------

def test_png_roundtrip_all_color_types():
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import (decode_png,
                                                           encode_png)
    rng = np.random.RandomState(5)
    for ch in (1, 2, 3, 4):
        px = rng.randint(0, 256, size=(5, 7, ch), dtype=np.uint8)
        out = decode_png(encode_png(px))
        assert out.shape == (5, 7, ch)
        assert (out == px).all()


def test_png_unfilter_golden_values():
    """Hand-filtered scanlines (Sub, Up, Average, Paeth) must reconstruct
    the exact pixel values from the PNG spec's filter definitions."""
    import struct
    import zlib

    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import decode_png

    def build_png(w, h, raw):
        def chunk(ctype, payload):
            crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
            return (struct.pack(">I", len(payload)) + ctype + payload
                    + struct.pack(">I", crc))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    # 4x4 grayscale, one filter type per row:
    # row0 Sub:  deltas 10,5,5,5        -> 10,15,20,25
    # row1 Up:   deltas 1,1,1,1         -> 11,16,21,26
    # row2 Avg:  line x, pred=(left+up)>>1
    # row3 Paeth
    raw = bytes([1, 10, 5, 5, 5]) + bytes([2, 1, 1, 1, 1]) \
        + bytes([3, 6, 3, 2, 1]) + bytes([4, 1, 2, 3, 4])
    px = decode_png(build_png(4, 4, raw))[:, :, 0].astype(int)
    assert px[0].tolist() == [10, 15, 20, 25]
    assert px[1].tolist() == [11, 16, 21, 26]
    # row2: avg pred uses left (reconstructed) and up (row1)
    r2 = []
    for x in range(4):
        left = r2[x - 1] if x else 0
        up = px[1][x]
        r2.append((raw[11 + x] + ((left + up) >> 1)) & 0xFF)
    assert px[2].tolist() == r2
    # row3: paeth
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)
    r3 = []
    for x in range(4):
        left = r3[x - 1] if x else 0
        ul = px[2][x - 1] if x else 0
        r3.append((raw[16 + x] + paeth(left, px[2][x], ul)) & 0xFF)
    assert px[3].tolist() == r3


def test_png_rejects_unsupported():
    import pytest as _pytest

    from iceberg_rust_spark.functions.media_codecs import decode_png
    with _pytest.raises(ValueError):
        decode_png(b"\xff\xd8\xff\xe0 not a png")


def test_wav_parse_and_resample_golden():
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import (encode_wav,
                                                           parse_wav,
                                                           resample_linear)
    ramp = np.arange(0, 800, 100, dtype=np.int16)     # 8 frames at 8 kHz
    rate, ch, samples = parse_wav(encode_wav(8000, ramp))
    assert (rate, ch) == (8000, 1)
    assert samples[:, 0].tolist() == ramp.tolist()
    # 2:1 downsample of a ramp: linear interp lands exactly on even samples
    down = resample_linear(samples, 8000, 4000)
    assert down[:, 0].tolist() == [0, 200, 400, 600]
    # 1:2 upsample: midpoints appear exactly
    up = resample_linear(samples, 8000, 16000)
    assert up[:4, 0].tolist() == [0, 50, 100, 150]


def test_resize_images_real_png_kernel(spark):
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import (decode_png,
                                                           encode_png)
    from iceberg_rust_spark.operators.multimodal import resize_images
    px = np.array([[[0, 0, 0], [255, 0, 0]],
                   [[0, 255, 0], [0, 0, 255]]], dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_png(px)))],
                               "media_id long, payload binary")
    out = resize_images(df, 4, 4).collect()[0]
    resized = decode_png(bytes(out["resized"]))
    assert resized.shape == (4, 4, 3)
    # nearest-neighbor: each source pixel becomes a 2x2 block
    assert (resized[:2, :2] == px[0, 0]).all()
    assert (resized[:2, 2:] == px[0, 1]).all()
    assert (resized[2:, :2] == px[1, 0]).all()
    assert (resized[2:, 2:] == px[1, 1]).all()


def test_resample_audio_distributed(spark):
    from iceberg_rust_spark.functions.media_codecs import parse_wav
    from iceberg_rust_spark.operators.multimodal import (resample_audio,
                                                         synthetic_audio_df)
    audio = synthetic_audio_df(spark, n=6, rate=8000)
    out = resample_audio(audio, 4000).collect()
    assert len(out) == 6
    for r in out:
        rate, ch, samples = parse_wav(bytes(r["audio"]))
        assert rate == 4000 and ch == 1
        assert r["n_frames"] == samples.shape[0]
    # non-audio rows are dropped, audio rows keep flowing
    from iceberg_rust_spark.operators.multimodal import synthetic_media_df
    mixed = synthetic_media_df(spark, 8).unionByName(audio)
    assert resample_audio(mixed, 4000).count() == 6


def test_extract_features_real_histogram(spark):
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import encode_png
    from iceberg_rust_spark.operators.multimodal import (FEATURE_DIM,
                                                         extract_features)
    # constant gray image (value away from a bin edge): all mass in one bin
    px = np.full((4, 4, 3), 130, dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_png(px)))],
                               "media_id long, payload binary")
    feats = extract_features(df).collect()[0]["features"]
    assert len(feats) == FEATURE_DIM
    assert abs(sum(feats) - 1.0) < 1e-6
    assert feats[130 * FEATURE_DIM // 256] == 1.0


# ---- property tests: random payloads through the stdlib codecs -----------

def test_png_roundtrip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iceberg_rust_spark.functions.media_codecs import (decode_png,
                                                           encode_png)

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 12), st.integers(1, 12),
           st.sampled_from([1, 2, 3, 4]), st.integers(0, 2**32 - 1))
    def roundtrip(h, w, ch, seed):
        px = np.random.RandomState(seed).randint(
            0, 256, size=(h, w, ch), dtype=np.uint8)
        assert (decode_png(encode_png(px)) == px).all()

    roundtrip()


def test_wav_roundtrip_and_resample_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iceberg_rust_spark.functions.media_codecs import (encode_wav,
                                                           parse_wav,
                                                           resample_linear)

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 200), st.sampled_from([1, 2]),
           st.sampled_from([4000, 8000, 16000]), st.integers(0, 2**32 - 1))
    def roundtrip(frames, ch, rate, seed):
        s = np.random.RandomState(seed).randint(
            -32768, 32767, size=(frames, ch), dtype=np.int16)
        r, c, out = parse_wav(encode_wav(rate, s))
        assert (r, c) == (rate, ch) and (out == s).all()
        # resample to the same rate is identity; 2x then back keeps length
        assert (resample_linear(s, rate, rate) == s).all()
        up = resample_linear(s, rate, rate * 2)
        assert up.shape[0] == frames * 2
        # interpolated samples stay within the local min/max envelope
        assert up.max() <= s.max() and up.min() >= s.min()

    roundtrip()


# ---- baseline JPEG codec (r5): golden + property tests --------------------

def test_jpeg_flat_blocks_exact():
    """Flat 8x8-aligned images are DC-only: the quantize/dequant round trip
    is exact, pinning the DCT normalization and the YCbCr matrices."""
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import (decode_jpeg,
                                                           encode_jpeg)
    for color in ((128, 128, 128), (200, 30, 90), (0, 0, 0), (255, 255, 255)):
        px = np.zeros((16, 24, 3), dtype=np.uint8)
        px[:] = color
        out = decode_jpeg(encode_jpeg(px, quality=90))
        assert out.shape == (16, 24, 3)
        assert (out == np.array(color, dtype=np.uint8)).all(), color


def test_jpeg_idct_golden_value():
    """A single quantized DC coefficient must reconstruct to the exact
    T.81 level-shifted value: DC=q steps of table[0] -> pixel
    128 + round(DC*q0/8) for the orthonormal basis (checked by hand)."""
    import numpy as np

    from iceberg_rust_spark.functions import media_codecs as mc
    # decode a hand-assembled gray 8x8 with a known DC difference
    px = np.full((8, 8), 144, dtype=np.uint8)
    enc = mc.encode_jpeg(px, quality=50)   # Annex-K tables unscaled
    dec = mc.decode_jpeg(enc)[:, :, 0]
    # q0 = 16 at quality 50: DC quantizes to round((144-128)*8/16) = 8,
    # reconstructing exactly 128 + 8*16/8 = 144
    assert (dec == 144).all()


def test_jpeg_gradient_and_noise_error_bounds():
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import (decode_jpeg,
                                                           encode_jpeg)
    h, w = 40, 56
    gx, gy = np.linspace(0, 255, w), np.linspace(0, 255, h)
    grad = np.stack([np.tile(gx, (h, 1)), np.tile(gy[:, None], (1, w)),
                     np.full((h, w), 100.0)], axis=2).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(grad, quality=95))
    assert np.abs(d.astype(int) - grad.astype(int)).max() <= 6
    noise = np.random.RandomState(0).randint(
        0, 256, size=(24, 24, 3)).astype(np.uint8)
    dn = decode_jpeg(encode_jpeg(noise, quality=95))
    err = np.abs(dn.astype(int) - noise.astype(int))
    assert err.mean() < 6.0      # entropy-coding desync would blow this up


def test_jpeg_subsampling_and_restart_markers():
    """4:2:0 MCU interleave and DRI restart segments decode correctly
    (the dominant real-world JPEG shape)."""
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import (decode_jpeg,
                                                           encode_jpeg)
    rng = np.random.RandomState(1)
    smooth = np.clip(np.cumsum(np.cumsum(rng.randn(23, 29, 3), 0), 1) * 3
                     + 128, 0, 255).astype(np.uint8)
    for sub in ("444", "420"):
        for ri in (0, 2):
            d = decode_jpeg(encode_jpeg(smooth, quality=95, subsampling=sub,
                                        restart_interval=ri))
            assert d.shape == smooth.shape
            err = np.abs(d.astype(int) - smooth.astype(int))
            assert err.mean() < 8.0, (sub, ri, err.mean())


def test_jpeg_grayscale_and_rejections():
    import numpy as np
    import pytest

    from iceberg_rust_spark.functions.media_codecs import (decode_jpeg,
                                                           encode_jpeg)
    g = (np.outer(np.arange(17), np.arange(31)) % 256).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(g, quality=95))
    assert d.shape == (17, 31, 1)
    assert np.abs(d[:, :, 0].astype(int) - g.astype(int)).mean() < 8.0
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n" + bytes(16))
    # a baseline stream relabeled SOF2 is MALFORMED progressive (a DC scan
    # must be the 0..0 band) — rejected, not mis-decoded
    prog = encode_jpeg(g).replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive scan band"):
        decode_jpeg(prog)
    # arithmetic coding (SOF9) is refused
    arith = encode_jpeg(g).replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(arith)


def test_jpeg_roundtrip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iceberg_rust_spark.functions.media_codecs import (decode_jpeg,
                                                           encode_jpeg)

    @settings(max_examples=15, deadline=None)
    @given(st.integers(1, 20), st.integers(1, 20),
           st.sampled_from(["444", "420"]), st.integers(0, 3),
           st.integers(0, 2**32 - 1))
    def roundtrip(h, w, sub, ri, seed):
        rng = np.random.RandomState(seed)
        # smooth field: JPEG loss stays small and shape/structure is the
        # property under test
        px = np.clip(np.cumsum(np.cumsum(rng.randn(h, w, 3), 0), 1) * 2
                     + rng.randint(60, 200), 0, 255).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=95, subsampling=sub,
                                      restart_interval=ri))
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(int) - px.astype(int)).mean() < 12.0

    roundtrip()


def test_extract_features_real_jpeg_histogram(spark):
    """The features for a flat baseline JPEG come from REAL decoded pixels
    (single-bin histogram), not the sha1 stub."""
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import encode_jpeg
    from iceberg_rust_spark.operators.multimodal import (FEATURE_DIM,
                                                         extract_features)
    px = np.full((12, 12, 3), 130, dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_jpeg(px, quality=90)))],
                               "media_id long, payload binary")
    feats = extract_features(df).collect()[0]["features"]
    assert len(feats) == FEATURE_DIM
    assert abs(sum(feats) - 1.0) < 1e-6
    assert feats[130 * FEATURE_DIM // 256] == 1.0


# ---- ISO-BMFF (MP4) demux (r5) --------------------------------------------

def test_mp4_mux_demux_roundtrip():
    from iceberg_rust_spark.functions.isobmff import (encode_mp4,
                                                      extract_mp4_frames,
                                                      parse_mp4_samples)
    frames = [bytes([i]) * (10 + 7 * i) for i in range(11)]
    mp4 = encode_mp4(frames, fps=10, width=32, height=24, sync_every=5)
    info = parse_mp4_samples(mp4)
    assert (info["width"], info["height"]) == (32, 24)
    assert info["timescale"] == 1000 and len(info["samples"]) == 11
    assert sorted(info["sync"]) == [0, 5, 10]
    # every sample's byte range points at the exact payload we stored
    assert [f for _, f in extract_mp4_frames(mp4)] == frames
    assert [i for i, _ in extract_mp4_frames(mp4, every_n=3)] == [0, 3, 6, 9]
    assert [i for i, _ in
            extract_mp4_frames(mp4, every_n=1, sync_only=True)] == [0, 5, 10]
    # single frame + short-last-chunk stsc runs
    one = encode_mp4([b"only"], fps=1)
    assert extract_mp4_frames(one) == [(0, b"only")]


def test_mp4_demux_structural_layout():
    """Non-circular check of the writer: assert the raw box layout by hand
    (ftyp/mdat/moov walk, stsz sizes, stco offsets into mdat)."""
    import struct

    from iceberg_rust_spark.functions.isobmff import encode_mp4
    frames = [b"AAAA", b"BBBBBB", b"CC"]
    b = encode_mp4(frames, fps=5)
    # top-level walk by hand
    tops = []
    pos = 0
    while pos < len(b):
        (size,) = struct.unpack(">I", b[pos:pos + 4])
        tops.append(b[pos + 4:pos + 8])
        pos += size
    assert tops == [b"ftyp", b"mdat", b"moov"]
    # mdat payload is the concatenated frames
    (ftyp_size,) = struct.unpack(">I", b[0:4])
    mdat_start = ftyp_size + 8
    assert b[mdat_start:mdat_start + 12] == b"AAAABBBBBBCC"
    # stsz carries the three sizes verbatim
    i = b.find(b"stsz")
    cnt_off = i + 4 + 4 + 4          # fullbox version/flags + sample_size
    (cnt,) = struct.unpack(">I", b[cnt_off:cnt_off + 4])
    sizes = struct.unpack(">3I", b[cnt_off + 4:cnt_off + 16])
    assert cnt == 3 and sizes == (4, 6, 2)


def test_mp4_demux_rejections():
    import pytest

    from iceberg_rust_spark.functions.isobmff import parse_mp4_samples
    with pytest.raises(ValueError):
        parse_mp4_samples(b"not a container at all")
    with pytest.raises(ValueError):
        parse_mp4_samples(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00")


def test_resample_frames_real_mp4(spark):
    """The distributed operator emits the true encoded sample payloads for
    MP4 and keeps the marked stub for opaque blobs."""
    from iceberg_rust_spark.functions.isobmff import encode_mp4
    from iceberg_rust_spark.operators.multimodal import resample_frames
    frames = [bytes([k]) * (6 + k) for k in range(9)]
    df = spark.createDataFrame(
        [(1, bytearray(encode_mp4(frames, fps=10))),
         (2, bytearray(b"opaque" * 20))],
        "media_id long, payload binary")
    rows = resample_frames(df, every_n=4).collect()
    mp4_rows = sorted([r for r in rows if r["media_id"] == 1],
                      key=lambda r: r["frame_no"])
    assert [(r["frame_no"], bytes(r["frame"])) for r in mp4_rows] == \
        [(0, frames[0]), (4, frames[4]), (8, frames[8])]
    assert any(r["media_id"] == 2 for r in rows)  # stub path still emits


def test_avi_mux_demux_roundtrip():
    """RIFF/AVI: frames written as 00dc chunks come back byte-identical
    through the chunk walk, including odd-length frames (word padding)."""
    from iceberg_rust_spark.functions.media_codecs import (encode_avi,
                                                           extract_avi_frames)
    frames = [bytes([k % 256]) * (5 + 3 * k) for k in range(11)]
    avi = encode_avi(frames, fps=12, width=48, height=32)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    got = extract_avi_frames(avi)
    assert [f for _, f in got] == frames
    assert extract_avi_frames(avi, every_n=4) == [
        (0, frames[0]), (4, frames[4]), (8, frames[8])]
    with pytest.raises(ValueError):
        extract_avi_frames(b"not an avi at all")
    # a WAV is RIFF but not AVI
    from iceberg_rust_spark.functions.media_codecs import encode_wav
    import numpy as np
    with pytest.raises(ValueError):
        extract_avi_frames(encode_wav(8000, np.zeros(16, dtype=np.int16)))


def test_avi_demux_structural_layout():
    """Non-circular: hand-parse the muxer output against the public AVI
    layout — hdrl stream header says vids, movi chunk count matches, idx1
    offsets point at the 00dc chunks."""
    import struct
    from iceberg_rust_spark.functions.media_codecs import encode_avi
    frames = [b"A" * 10, b"BB" * 10, b"C" * 7]
    b = encode_avi(frames, fps=10, width=64, height=48)
    # walk top-level chunks
    found = {}
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
        key = b[pos + 8:pos + 12] if cid == b"LIST" else cid
        found[key] = (pos + 8, pos + 8 + clen)
        pos += 8 + clen + clen % 2
    assert set(found) >= {b"hdrl", b"movi", b"idx1"}
    s, e = found[b"movi"]
    n_chunks = 0
    pos = s + 4
    offs = []
    while pos + 8 <= e:
        assert b[pos:pos + 4] == b"00dc"
        (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
        offs.append(pos - s)       # relative to 'movi' fourcc
        n_chunks += 1
        pos += 8 + clen + clen % 2
    assert n_chunks == len(frames)
    s, e = found[b"idx1"]
    idx = [struct.unpack_from("<4sIII", b, s + 16 * i) for i in range(3)]
    assert [o for _, _, o, _ in idx] == offs
    assert [sz for *_, sz in idx] == [len(f) for f in frames]


def test_resample_frames_mixed_containers(spark):
    """One distributed pass demuxes MP4 and AVI payloads side by side."""
    from iceberg_rust_spark.functions.isobmff import encode_mp4
    from iceberg_rust_spark.functions.media_codecs import encode_avi
    from iceberg_rust_spark.operators.multimodal import resample_frames
    frames = [bytes([k]) * (6 + k) for k in range(9)]
    df = spark.createDataFrame(
        [(1, bytearray(encode_mp4(frames, fps=10))),
         (2, bytearray(encode_avi(frames, fps=10)))],
        "media_id long, payload binary")
    rows = resample_frames(df, every_n=4).collect()
    for mid in (1, 2):
        got = sorted(((r["frame_no"], bytes(r["frame"]))
                      for r in rows if r["media_id"] == mid))
        assert got == [(0, frames[0]), (4, frames[4]), (8, frames[8])]


def test_progressive_jpeg_roundtrip_identical_to_baseline():
    """Progressive (SOF2, T.81 Annex G) decodes to BIT-IDENTICAL pixels vs
    the baseline encoder at the same quality: both quantize identically, so
    any coefficient mismatch anywhere in the scan script shows up here."""
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)
    rng = np.random.default_rng(3)
    img = np.zeros((41, 59, 3), dtype=np.uint8)
    img[:, :, 0] = np.linspace(0, 255, 59, dtype=np.uint8)[None, :]
    img[:, :, 1] = np.linspace(0, 255, 41, dtype=np.uint8)[:, None]
    img[:, :, 2] = 128
    img[5:15, 5:25] = rng.integers(0, 256, (10, 20, 3))  # noisy patch
    for q in (50, 85, 95):
        base = decode_jpeg(encode_jpeg(img, q))
        prog = decode_jpeg(encode_jpeg_progressive(img, q))
        assert np.array_equal(base, prog), f"quality {q}"


def test_progressive_jpeg_eob_runs_and_gray():
    """Flat images produce multi-block EOB runs (EOBn with extension bits)
    in every AC scan — the run-skip path plus the refinement correction
    bits owed across a run; grayscale exercises the 1-component script."""
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)
    flat = np.full((64, 64, 3), 77, dtype=np.uint8)
    flat[33, 17] = (250, 3, 99)                 # one busy block mid-run
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 85)),
                          decode_jpeg(encode_jpeg_progressive(flat, 85)))
    g = (np.outer(np.arange(24), np.arange(40)) % 256).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(g, 90)),
                          decode_jpeg(encode_jpeg_progressive(g, 90)))


def test_progressive_jpeg_property():
    """Random images, random shapes: progressive == baseline, exactly."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iceberg_rust_spark.functions.media_codecs import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)

    @settings(max_examples=8, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1),
           st.sampled_from([40, 75, 92]))
    def check(h, w, seed, q):
        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, q)),
                              decode_jpeg(encode_jpeg_progressive(img, q)))

    check()


def test_progressive_jpeg_feeds_features(spark):
    """extract_features histograms REAL pixels for progressive JPEG (no
    stub fallback): identical to the same image's baseline encoding."""
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import (
        encode_jpeg, encode_jpeg_progressive)
    from iceberg_rust_spark.operators.multimodal import extract_features
    img = ((np.outer(np.arange(32), np.arange(48))[..., None]
            % 256).astype(np.uint8).repeat(3, axis=2))
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(img, 90)), "image/jpeg"),
         (2, bytearray(encode_jpeg_progressive(img, 90)), "image/jpeg")],
        "media_id long, payload binary, mime string")
    rows = {r["media_id"]: list(r["features"])
            for r in extract_features(df).collect()}
    assert rows[1] == rows[2]


def test_gif_roundtrip_and_variants():
    """GIF LZW decode (public spec): exact roundtrip through the
    clear-code encoder, interlaced row order undone, grayscale palettes,
    header dims via the real parser."""
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import (decode_gif,
                                                           encode_gif)
    from iceberg_rust_spark.operators.multimodal import decode_image_meta
    img = (np.indices((13, 17)).sum(0) % 7 * 36).astype("uint8")
    px = np.stack([img, img // 2, 255 - img], axis=2)
    assert np.array_equal(decode_gif(encode_gif(px)), px)
    assert np.array_equal(decode_gif(encode_gif(px, interlace=True)), px)
    g = (np.arange(64, dtype=np.uint8) * 4).reshape(8, 8)
    out = decode_gif(encode_gif(g))
    assert np.array_equal(out[:, :, 0], g) and (out[:, :, 0] == out[:, :, 1]).all()
    meta = decode_image_meta(encode_gif(px), "image/gif")
    assert (meta["width"], meta["height"]) == (17, 13)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")


def test_gif_feeds_features_and_resize(spark):
    """GIF payloads flow through the REAL pixel path in features/resize —
    same histogram as the identical pixels encoded as PNG."""
    import numpy as np

    from iceberg_rust_spark.functions.media_codecs import (decode_png,
                                                           encode_gif,
                                                           encode_png)
    from iceberg_rust_spark.operators.multimodal import (extract_features,
                                                         resize_images)
    px = (np.indices((12, 12)).sum(0) % 4 * 60).astype("uint8")
    px = np.stack([px] * 3, axis=2)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(px))), (2, bytearray(encode_gif(px)))],
        "media_id long, payload binary")
    feats = {r["media_id"]: list(r["features"])
             for r in extract_features(df).collect()}
    assert feats[1] == feats[2]
    resized = {r["media_id"]: decode_png(bytes(r["resized"]))
               for r in resize_images(df, 6, 6).collect()}
    assert np.array_equal(resized[1], resized[2])


def test_mkv_demux_real_payloads(spark):
    """Matroska/WebM EBML demux: emitted frames are the exact SimpleBlock
    payloads of the video track; BlockGroups and track filtering work;
    sampled through the distributed resample_frames path."""
    from iceberg_rust_spark.functions.media_codecs import (encode_mkv,
                                                           extract_mkv_frames)
    from iceberg_rust_spark.operators.multimodal import resample_frames
    frames = [bytes([i]) * (10 + i) for i in range(12)]
    mkv = encode_mkv(frames)
    got = extract_mkv_frames(mkv, every_n=3)
    assert got == [(i, frames[i]) for i in range(0, 12, 3)]
    # without a Tracks element every block flows (no video-track filter)
    got2 = extract_mkv_frames(encode_mkv(frames, with_tracks=False))
    assert [f for _, f in got2] == frames
    df = spark.createDataFrame([(5, bytearray(mkv))],
                               "media_id long, payload binary")
    rows = resample_frames(df, every_n=4).collect()
    assert [(r["frame_no"], bytes(r["frame"])) for r in rows] == \
        [(0, frames[0]), (4, frames[4]), (8, frames[8])]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        extract_mkv_frames(b"RIFF1234AVI ")


def test_mkv_track_127_not_dropped():
    """Track number 127 encodes as the vint byte 0xFF — a plain vint, NOT
    the EBML unknown-size sentinel. Regression: the block parser used
    _ebml_size, mapped 0xFF to None, and silently dropped every frame."""
    from iceberg_rust_spark.functions.media_codecs import (encode_mkv,
                                                           extract_mkv_frames)
    frames = [bytes([i]) * 8 for i in range(4)]
    mkv = encode_mkv(frames, track=127)
    got = extract_mkv_frames(mkv)
    assert [f for _n, f in got] == frames
