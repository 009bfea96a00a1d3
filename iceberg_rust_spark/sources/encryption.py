"""Table encryption: AES-GCM primitives, the AGS1 block-stream format,
Java-compatible StandardKeyMetadata, and envelope key management.

Counterpart of the reference's encryption module
(crates/iceberg/src/encryption/{crypto,stream,key_metadata,kms,manager}.rs):

- AesGcmCipher          — crypto.rs:222/244: 128/192/256-bit AES-GCM;
  ciphertext layout [12-byte nonce][ct][16-byte tag], optional AAD.
- ags1_encrypt/decrypt  — stream.rs:20-68: the "AGS1" block stream used for
  encrypting manifest lists / manifests. Header = b"AGS1" + u32 LE plain
  block size (default 1 MiB); each block is nonce||ct||tag with per-block
  AAD = aad_prefix || block_index (u32 LE). Byte-compatible with Java's
  AesGcmInputStream/AesGcmOutputStream.
- StandardKeyMetadata   — key_metadata.rs:32: wire format
  [0x01][Avro binary datum of record {encryption_key: bytes,
  aad_prefix: null|bytes, file_length: null|long}] (null branch first, as
  Iceberg optional fields map to Avro unions).
- MemoryKms             — kms/memory.rs: envelope wrap/unwrap of a DEK under
  a named master key (wrapped = AES-GCM blob, no AAD).
- EncryptionManager     — manager.rs:153: mint a per-file DEK + AAD prefix,
  wrap it for the table's key id, and encrypt/decrypt whole metadata
  payloads through AGS1.

The `cryptography` package provides AESGCM; everything degrades to a clear
ImportError message if it is absent (no other module imports this one at
import time).
"""

from __future__ import annotations

import io
import os
import struct
from typing import Dict, Optional, Tuple

try:
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM
except ImportError:  # pragma: no cover - present in this environment
    AESGCM = None

from .avro import decode_value, encode_value

NONCE_LENGTH = 12
GCM_TAG_LENGTH = 16
PLAIN_BLOCK_SIZE = 1024 * 1024
GCM_STREAM_MAGIC = b"AGS1"
KEY_SIZES = (16, 24, 32)


def _require_crypto() -> None:
    if AESGCM is None:
        raise ImportError(
            "table encryption needs the 'cryptography' package (AES-GCM)")


class AesGcmCipher:
    """AES-GCM with the reference's blob layout: nonce || ciphertext || tag
    (crypto.rs:220). Nonces are fresh 96-bit randoms per encryption."""

    def __init__(self, key: bytes):
        _require_crypto()
        if len(key) not in KEY_SIZES:
            raise ValueError(
                f"AES key must be 16/24/32 bytes, got {len(key)}")
        self._aesgcm = AESGCM(bytes(key))

    def encrypt(self, plaintext: bytes, aad: Optional[bytes] = None) -> bytes:
        nonce = os.urandom(NONCE_LENGTH)
        ct = self._aesgcm.encrypt(nonce, bytes(plaintext), aad)
        return nonce + ct  # AESGCM appends the 16-byte tag to ct

    def decrypt(self, blob: bytes, aad: Optional[bytes] = None) -> bytes:
        if len(blob) < NONCE_LENGTH + GCM_TAG_LENGTH:
            raise ValueError("ciphertext shorter than nonce+tag")
        nonce, ct = blob[:NONCE_LENGTH], blob[NONCE_LENGTH:]
        return self._aesgcm.decrypt(nonce, ct, aad)


# ---------------------------------------------------------------------------
# AGS1 block stream (stream.rs)
# ---------------------------------------------------------------------------

def _block_aad(aad_prefix: bytes, index: int) -> bytes:
    return aad_prefix + struct.pack("<I", index)


def ags1_encrypt(data: bytes, cipher: AesGcmCipher, aad_prefix: bytes = b"",
                 block_size: int = PLAIN_BLOCK_SIZE) -> bytes:
    """Whole-payload AGS1 encryption. A zero-length payload still writes one
    empty block (MIN_STREAM_LENGTH in stream.rs)."""
    out = io.BytesIO()
    out.write(GCM_STREAM_MAGIC)
    out.write(struct.pack("<I", block_size))
    blocks = max(1, (len(data) + block_size - 1) // block_size)
    for i in range(blocks):
        chunk = data[i * block_size:(i + 1) * block_size]
        out.write(cipher.encrypt(chunk, _block_aad(aad_prefix, i)))
    return out.getvalue()


def ags1_decrypt(blob: bytes, cipher: AesGcmCipher,
                 aad_prefix: bytes = b"") -> bytes:
    if blob[:4] != GCM_STREAM_MAGIC:
        raise ValueError("not an AGS1 stream (bad magic)")
    (block_size,) = struct.unpack("<I", blob[4:8])
    cipher_block = block_size + NONCE_LENGTH + GCM_TAG_LENGTH
    out = io.BytesIO()
    pos, index = 8, 0
    if len(blob) == 8:
        raise ValueError("AGS1 stream missing final block")
    while pos < len(blob):
        chunk = blob[pos:pos + cipher_block]
        out.write(cipher.decrypt(chunk, _block_aad(aad_prefix, index)))
        pos += cipher_block
        index += 1
    return out.getvalue()


# ---------------------------------------------------------------------------
# StandardKeyMetadata (key_metadata.rs)
# ---------------------------------------------------------------------------

_V1 = 1
_KEY_METADATA_SCHEMA = {
    "type": "record", "name": "StandardKeyMetadata",
    "fields": [
        {"name": "encryption_key", "type": "bytes"},
        {"name": "aad_prefix", "type": ["null", "bytes"]},
        {"name": "file_length", "type": ["null", "long"]},
    ],
}


class StandardKeyMetadata:
    def __init__(self, encryption_key: bytes,
                 aad_prefix: Optional[bytes] = None,
                 file_length: Optional[int] = None):
        if len(encryption_key) not in KEY_SIZES:
            raise ValueError("invalid DEK length")
        self.encryption_key = bytes(encryption_key)
        self.aad_prefix = None if aad_prefix is None else bytes(aad_prefix)
        self.file_length = file_length

    def encode(self) -> bytes:
        out = io.BytesIO()
        out.write(bytes([_V1]))
        encode_value(_KEY_METADATA_SCHEMA, {
            "encryption_key": self.encryption_key,
            "aad_prefix": self.aad_prefix,
            "file_length": self.file_length,
        }, out)
        return out.getvalue()

    @classmethod
    def decode(cls, data: bytes) -> "StandardKeyMetadata":
        if not data or data[0] != _V1:
            raise ValueError(
                f"unsupported key metadata version: {data[:1]!r}")
        rec = decode_value(_KEY_METADATA_SCHEMA, io.BytesIO(data[1:]))
        return cls(rec["encryption_key"], rec["aad_prefix"],
                   rec["file_length"])


# ---------------------------------------------------------------------------
# KMS + manager (kms/memory.rs, manager.rs)
# ---------------------------------------------------------------------------

class MemoryKms:
    """In-memory envelope KMS for tests/dev (kms/memory.rs:53): master keys
    by id; wrapping = AES-GCM of the DEK under the master key, no AAD."""

    def __init__(self):
        self._masters: Dict[str, bytes] = {}

    def add_master_key(self, key_id: str, key: Optional[bytes] = None) -> None:
        key = key if key is not None else os.urandom(32)
        if len(key) not in KEY_SIZES:
            raise ValueError("invalid master key length")
        self._masters[key_id] = bytes(key)

    def _master(self, key_id: str) -> bytes:
        if key_id not in self._masters:
            raise KeyError(f"unknown master key: {key_id}")
        return self._masters[key_id]

    def wrap_key(self, dek: bytes, wrapping_key_id: str) -> bytes:
        return AesGcmCipher(self._master(wrapping_key_id)).encrypt(dek)

    def unwrap_key(self, wrapped: bytes, wrapping_key_id: str) -> bytes:
        return AesGcmCipher(self._master(wrapping_key_id)).decrypt(wrapped)


class EncryptionManager:
    """Mint/unwrap per-file encryption material (manager.rs:153): a fresh
    DEK + AAD prefix per file, wrapped under the table's master key id. The
    ENCODED StandardKeyMetadata (with the plaintext DEK) travels inside the
    wrapped blob — only the wrapped bytes are stored in table metadata."""

    def __init__(self, kms: MemoryKms, table_key_id: str,
                 dek_bytes: int = 16):
        self.kms = kms
        self.table_key_id = table_key_id
        self.dek_bytes = dek_bytes

    def new_key(self) -> Tuple[StandardKeyMetadata, bytes]:
        """(plaintext key metadata, wrapped blob for metadata storage)."""
        km = StandardKeyMetadata(os.urandom(self.dek_bytes),
                                 aad_prefix=os.urandom(8))
        wrapped = self.kms.wrap_key(km.encode(), self.table_key_id)
        return km, wrapped

    def unwrap(self, wrapped: bytes) -> StandardKeyMetadata:
        return StandardKeyMetadata.decode(
            self.kms.unwrap_key(wrapped, self.table_key_id))

    def encrypt_payload(self, data: bytes, km: StandardKeyMetadata) -> bytes:
        return ags1_encrypt(data, AesGcmCipher(km.encryption_key),
                            km.aad_prefix or b"")

    def decrypt_payload(self, blob: bytes, km: StandardKeyMetadata) -> bytes:
        return ags1_decrypt(blob, AesGcmCipher(km.encryption_key),
                            km.aad_prefix or b"")


# ---------------------------------------------------------------------------
# encrypted metadata export / import (beyond the reference: it rejects
# encrypted writes outright; we can round-trip our own exported metadata)
# ---------------------------------------------------------------------------

def encrypt_metadata_export(export_paths: Dict, mgr: EncryptionManager,
                            out_dir: str) -> Dict:
    """Encrypt an `export_avro_metadata` result: every manifest and the
    manifest list become AGS1 streams under ``out_dir``, each with its own
    DEK; the wrapped keys land in a JSON keybag next to them. Returns
    {"files": {enc_path: orig_path}, "keybag": path}."""
    import base64
    import json

    from .io import file_io_for

    os.makedirs(out_dir, exist_ok=True)
    files = list(export_paths["manifests"]) + [export_paths["manifest_list"]]
    mapping: Dict[str, str] = {}
    keybag: Dict[str, str] = {}
    for p in files:
        data = file_io_for(p).read_bytes_all(p) if hasattr(
            file_io_for(p), "read_bytes_all") else open(p, "rb").read()
        km, wrapped = mgr.new_key()
        km.file_length = len(data)
        # re-wrap with the file length stamped into the key metadata
        wrapped = mgr.kms.wrap_key(km.encode(), mgr.table_key_id)
        enc_path = os.path.join(out_dir, os.path.basename(p) + ".enc")
        with open(enc_path, "wb") as f:
            f.write(mgr.encrypt_payload(data, km))
        mapping[enc_path] = p
        keybag[enc_path] = base64.b64encode(wrapped).decode()
    bag_path = os.path.join(out_dir, "keybag.json")
    with open(bag_path, "w") as f:
        json.dump(keybag, f)
    return {"files": mapping, "keybag": bag_path}


def decrypt_metadata_export(enc_result: Dict, mgr: EncryptionManager,
                            out_dir: str) -> Dict[str, str]:
    """Inverse of encrypt_metadata_export: unwrap each file's DEK from the
    keybag, authenticate + decrypt the AGS1 stream, verify the recorded
    plaintext length, and write the plaintext under ``out_dir``. Returns
    {enc_path: plaintext_path}."""
    import base64
    import json

    with open(enc_result["keybag"]) as f:
        keybag = json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    out: Dict[str, str] = {}
    for enc_path, wrapped_b64 in keybag.items():
        km = mgr.unwrap(base64.b64decode(wrapped_b64))
        with open(enc_path, "rb") as f:
            data = mgr.decrypt_payload(f.read(), km)
        if km.file_length is not None and km.file_length != len(data):
            raise ValueError(
                f"decrypted length {len(data)} != recorded {km.file_length}")
        plain = os.path.join(out_dir,
                             os.path.basename(enc_path)[:-len(".enc")])
        with open(plain, "wb") as f:
            f.write(data)
        out[enc_path] = plain
    return out
