"""AES-GCM / AGS1 / key-metadata truth tables, behavior-ported from the
reference's encryption tests (crypto.rs, stream.rs, key_metadata.rs,
kms/memory.rs — behavior parity, no code)."""

import os

import pytest

from iceberg_rust_spark.sources.encryption import (GCM_STREAM_MAGIC,
                                                   AesGcmCipher,
                                                   EncryptionManager,
                                                   MemoryKms,
                                                   StandardKeyMetadata,
                                                   ags1_decrypt, ags1_encrypt)

KEY128 = bytes(range(16))
KEY256 = bytes(range(32))


def test_cipher_roundtrip_all_key_sizes():
    for key in (os.urandom(16), os.urandom(24), os.urandom(32)):
        c = AesGcmCipher(key)
        pt = b"the quick brown fox"
        blob = c.encrypt(pt, aad=b"ctx")
        assert c.decrypt(blob, aad=b"ctx") == pt
        # layout: 12-byte nonce + ct + 16-byte tag (crypto.rs:220)
        assert len(blob) == 12 + len(pt) + 16


def test_cipher_rejects_bad_key_wrong_aad_and_tamper():
    with pytest.raises(ValueError):
        AesGcmCipher(b"short")
    c = AesGcmCipher(KEY128)
    blob = c.encrypt(b"data", aad=b"right")
    with pytest.raises(Exception):
        c.decrypt(blob, aad=b"wrong")  # test_wrong_aad_fails
    with pytest.raises(Exception):
        AesGcmCipher(KEY256).decrypt(blob, aad=b"right")  # wrong key
    bad = bytearray(blob)
    bad[-1] ^= 0x01
    with pytest.raises(Exception):
        c.decrypt(bytes(bad), aad=b"right")  # tag tamper


@pytest.mark.parametrize("size", [
    0,            # test_empty_file_roundtrip (one empty block, not zero)
    5,            # test_small_file_roundtrip
    100,          # test_stream_block_aad
    1000 - 1,     # test_block_size_minus_one (scaled block below)
    1000,         # test_exact_block_size / no spurious empty trailing block
    1000 + 1,     # test_block_size_plus_one
    3 * 1000 + 7,  # test_multi_block_roundtrip
])
def test_ags1_roundtrip_block_boundaries(size):
    c = AesGcmCipher(KEY128)
    data = os.urandom(size)
    blob = ags1_encrypt(data, c, aad_prefix=b"pfx", block_size=1000)
    assert blob[:4] == GCM_STREAM_MAGIC
    assert ags1_decrypt(blob, c, aad_prefix=b"pfx") == data
    # block count: max(1, ceil(size/1000)) — aligned sizes add no empty block
    n_blocks = max(1, (size + 999) // 1000)
    assert len(blob) == 8 + n_blocks * (12 + 16) + size


def test_ags1_block_order_is_authenticated():
    """Per-block AAD carries the block INDEX: swapping two ciphertext blocks
    must fail authentication (stream.rs test_stream_block_aad intent)."""
    c = AesGcmCipher(KEY128)
    data = os.urandom(2000)
    blob = bytearray(ags1_encrypt(data, c, block_size=1000))
    cb = 1000 + 28
    b0, b1 = blob[8:8 + cb], blob[8 + cb:8 + 2 * cb]
    swapped = bytes(blob[:8]) + bytes(b1) + bytes(b0)
    with pytest.raises(Exception):
        ags1_decrypt(swapped, c)


def test_ags1_wrong_prefix_and_truncation_fail():
    c = AesGcmCipher(KEY128)
    blob = ags1_encrypt(b"payload", c, aad_prefix=b"a")
    with pytest.raises(Exception):
        ags1_decrypt(blob, c, aad_prefix=b"b")
    with pytest.raises(ValueError):
        ags1_decrypt(b"NOPE" + blob[4:], c, aad_prefix=b"a")
    with pytest.raises(ValueError):
        ags1_decrypt(blob[:8], c, aad_prefix=b"a")  # header, no final block


def test_key_metadata_wire_roundtrip():
    """[0x01][avro datum {bytes, null|bytes, null|long}] (key_metadata.rs:32)."""
    km = StandardKeyMetadata(KEY128, aad_prefix=b"prefix", file_length=12345)
    enc = km.encode()
    assert enc[0] == 1
    back = StandardKeyMetadata.decode(enc)
    assert back.encryption_key == KEY128
    assert back.aad_prefix == b"prefix"
    assert back.file_length == 12345
    # optional fields absent -> null branches
    km2 = StandardKeyMetadata(KEY256)
    back2 = StandardKeyMetadata.decode(km2.encode())
    assert back2.aad_prefix is None and back2.file_length is None
    with pytest.raises(ValueError):
        StandardKeyMetadata.decode(b"\x02junk")
    with pytest.raises(ValueError):
        StandardKeyMetadata(b"tiny")


def test_kms_wrap_unwrap_and_unknown_key():
    kms = MemoryKms()
    kms.add_master_key("master-1")
    dek = os.urandom(16)
    wrapped = kms.wrap_key(dek, "master-1")
    assert kms.unwrap_key(wrapped, "master-1") == dek
    assert wrapped != dek
    with pytest.raises(KeyError):
        kms.wrap_key(dek, "nonexistent")  # test_wrap_unknown_key_fails


def test_encryption_manager_end_to_end():
    """manager.rs shape: mint DEK -> wrap -> store wrapped -> unwrap ->
    decrypt an AGS1 manifest payload."""
    kms = MemoryKms()
    kms.add_master_key("table-key")
    mgr = EncryptionManager(kms, "table-key")
    km, wrapped = mgr.new_key()
    payload = b"pretend this is an avro manifest" * 100
    blob = mgr.encrypt_payload(payload, km)
    # a reader holding only the wrapped blob recovers everything
    km2 = mgr.unwrap(wrapped)
    assert km2.encryption_key == km.encryption_key
    assert mgr.decrypt_payload(blob, km2) == payload
    # and a different table key cannot
    kms.add_master_key("other-key")
    with pytest.raises(Exception):
        EncryptionManager(kms, "other-key").unwrap(wrapped)


def test_encrypted_table_rejects_commits(spark, warehouse):
    """Parity with transaction/mod.rs:183-189: encryption.key-id on a table
    blocks every write commit."""
    import pyspark.sql.functions as F

    from iceberg_rust_spark import Table
    from iceberg_rust_spark.sources.types import schema_from_spark
    df = spark.range(0, 5).select(F.col("id"))
    t = Table.create(warehouse, "db.enc", schema_from_spark(df.schema),
                     properties={"encryption.key-id": "kms-key-1"})
    with pytest.raises(NotImplementedError, match="encrypted"):
        t.append(spark, df)


def test_encrypted_metadata_export_roundtrip(spark, warehouse, tmp_path):
    """Beyond the reference: export avro metadata, encrypt every manifest +
    the manifest list as per-file-DEK AGS1 streams, then unwrap + decrypt
    and verify the manifests decode identically."""
    import pyspark.sql.functions as F

    from iceberg_rust_spark import Table
    from iceberg_rust_spark.sources.avro_manifest import read_avro_manifest
    from iceberg_rust_spark.sources.encryption import (
        decrypt_metadata_export, encrypt_metadata_export)
    from iceberg_rust_spark.sources.types import schema_from_spark

    df = spark.range(0, 50).select(F.col("id"), (F.col("id") % 3).alias("g"))
    t = Table.create(warehouse, "db.encexp", schema_from_spark(df.schema))
    t = t.append(spark, df)
    paths = t.export_avro_metadata(str(tmp_path / "plain"))

    kms = MemoryKms()
    kms.add_master_key("tk")
    mgr = EncryptionManager(kms, "tk")
    enc = encrypt_metadata_export(paths, mgr, str(tmp_path / "enc"))
    # ciphertexts are AGS1, not avro
    for p in enc["files"]:
        assert open(p, "rb").read(4) == GCM_STREAM_MAGIC
    dec = decrypt_metadata_export(enc, mgr, str(tmp_path / "dec"))
    for enc_path, plain_path in dec.items():
        orig = enc["files"][enc_path]
        assert open(plain_path, "rb").read() == open(orig, "rb").read()
    # decrypted manifests still decode as spec-layout avro
    m_plain = [p for p in dec.values() if "manifest-" in p][0]
    assert read_avro_manifest(m_plain)
    # wrong table key cannot decrypt
    kms.add_master_key("other")
    with pytest.raises(Exception):
        decrypt_metadata_export(enc, EncryptionManager(kms, "other"),
                                str(tmp_path / "dec2"))
