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
