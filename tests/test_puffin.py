"""Puffin files + deletion-vector-v1 roaring blobs + DV merge-on-read."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from iceberg_rust_spark import Table, expr as E
from iceberg_rust_spark.sources.puffin import (DELETION_VECTOR_V1,
                                               BlobMetadata, deserialize_dv,
                                               read_deletion_vectors,
                                               read_puffin_footer,
                                               serialize_dv, write_puffin)
from iceberg_rust_spark.sources.types import schema_from_spark


@pytest.mark.parametrize("positions", [
    [],
    [0],
    [0, 1, 2, 5, 100, 65535, 65536, 70000],
    list(range(5000)),                                 # bitmap container
    [2**32 - 1, 2**32, 2**33 + 7],                     # multiple high keys
    list(range(0, 200000, 3)),
])
def test_dv_roundtrip(positions):
    blob = serialize_dv(positions)
    back = deserialize_dv(blob)
    assert back.tolist() == sorted(set(positions))


def test_dv_crc_detects_corruption():
    blob = bytearray(serialize_dv([1, 2, 3]))
    blob[7] ^= 0xFF
    with pytest.raises(ValueError):
        deserialize_dv(bytes(blob))


def test_puffin_file_roundtrip(tmp_path):
    path = str(tmp_path / "t.puffin")
    b1 = serialize_dv([1, 5, 9])
    b2 = serialize_dv([100, 200])
    write_puffin(path, [
        (BlobMetadata(DELETION_VECTOR_V1, [], 1, 1, 0, 0,
                      {"referenced-data-file": "/data/a.parquet"}), b1),
        (BlobMetadata(DELETION_VECTOR_V1, [], 1, 1, 0, 0,
                      {"referenced-data-file": "/data/b.parquet"}), b2),
    ], properties={"created-by": "iceberg_rust_spark"})
    blobs, props = read_puffin_footer(path)
    assert props["created-by"] == "iceberg_rust_spark"
    assert [b.type for b in blobs] == [DELETION_VECTOR_V1] * 2
    dvs = read_deletion_vectors(path)
    assert dvs["/data/a.parquet"].tolist() == [1, 5, 9]
    assert dvs["/data/b.parquet"].tolist() == [100, 200]


def test_delete_where_dv_mode(spark, warehouse):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("grp"))
    t = Table.create(warehouse, "db.dvtest", schema_from_spark(df.schema))
    t = t.append(spark, df)
    t = t.delete_where(spark, E.col("grp") == 3, mode="dv")
    # survivors match the direct-read complement
    got = sorted(r["id"] for r in t.to_df(spark).collect())
    want = sorted(r["id"] for r in df.where(F.col("grp") != 3).collect())
    assert got == want
    # delete entries carry referenced_data_file + blob coordinates
    snap = t.metadata.current_snapshot()
    from iceberg_rust_spark.sources.manifest import read_manifest_list
    from iceberg_rust_spark.sources.scan import load_manifest
    dels = [e.data_file
            for mf in read_manifest_list(snap.manifest_list)
            for e in load_manifest(mf.manifest_path)
            if e.data_file.content != 0]
    assert dels and all(d.file_format == "puffin" for d in dels)
    assert all(d.referenced_data_file for d in dels)
    assert all(d.content_size_in_bytes > 0 for d in dels)
    # a second DV delete on another predicate stacks correctly
    t = t.delete_where(spark, E.col("grp") == 5, mode="dv")
    got = sorted(r["id"] for r in t.to_df(spark).collect())
    want = sorted(r["id"] for r in
                  df.where((F.col("grp") != 3) & (F.col("grp") != 5)).collect())
    assert got == want
    # entries metadata table surfaces the DV entries with their referenced file
    entries = t.entries_df(spark).collect()
    dv_entries = [e for e in entries if e["file_format"] == "puffin"]
    assert dv_entries and all(e["referenced_data_file"] for e in dv_entries)
    assert any(e["content"] == 0 for e in entries)  # data entries present too


def test_puffin_blob_compression_roundtrip(tmp_path):
    """Per-blob compression-codec (lz4 frame / zstd, puffin/mod.rs:31-43)
    and the FooterPayloadCompressed flag (metadata.rs:266): stored lengths
    are the COMPRESSED lengths; read_blob decompresses transparently."""
    import numpy as np

    from iceberg_rust_spark.sources.puffin import (
        BlobMetadata, deserialize_dv, read_blob, read_puffin_footer,
        serialize_dv, write_puffin)

    pos = np.arange(0, 50_000, 3, dtype=np.uint64)
    dv = serialize_dv(pos)
    big = b"the quick brown fox " * 500
    path = str(tmp_path / "compressed.puffin")
    metas = write_puffin(path, [
        (BlobMetadata("deletion-vector-v1", [], 1, 1, 0, 0,
                      {"referenced-data-file": "f1"},
                      compression_codec="zstd"), dv),
        (BlobMetadata("apache-datasketches-theta-v1", [1], 1, 1, 0, 0,
                      compression_codec="lz4"), big),
        (BlobMetadata("apache-datasketches-theta-v1", [2], 1, 1, 0, 0), big),
    ], compress_footer=True)
    # compressed blobs stored shorter than their payloads; plain one exact
    assert metas[0].length < len(dv)
    assert metas[1].length < len(big)
    assert metas[2].length == len(big)

    blobs, _ = read_puffin_footer(path)  # exercises the compressed footer
    assert [b.compression_codec for b in blobs] == ["zstd", "lz4", None]
    got = deserialize_dv(read_blob(path, blobs[0]))
    assert np.array_equal(got, pos)
    assert read_blob(path, blobs[1]) == big
    assert read_blob(path, blobs[2]) == big


def test_puffin_unknown_codec_rejected(tmp_path):
    import pytest

    from iceberg_rust_spark.sources.puffin import BlobMetadata, write_puffin
    with pytest.raises(ValueError, match="unsupported puffin compression"):
        write_puffin(str(tmp_path / "x.puffin"), [
            (BlobMetadata("t", [], 1, 1, 0, 0, compression_codec="brotli-9"),
             b"x")])
