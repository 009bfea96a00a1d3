"""Multimodal codec kernels (pure-Python header parsers + stubs)."""


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
