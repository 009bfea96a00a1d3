"""Generate constructed VALUES-literal oracles for queries whose semantics
aren't ANSI-SQL-expressible in DuckDB, from an INDEPENDENT pure-Python
computation (no Spark involved):

- dedup_simhash: 64-bit SimHash per document (doc_id < 100 of the sf0.01
  fixture), token-hash bit votes. Tokenization replicates Java regex \\W+
  via re.ASCII; hashing is the public XXH64 spec (tools/xxh64.py, verified
  byte-for-byte against Spark's xxhash64 seed 42).
- multimodal_features: expected (media_id, width, height, feat_dim) of the
  deterministic synthetic media fixture — id-formula dimensions for the
  PNG/JPEG/GIF/WebP classes, the documented sha1 stub for the blob ids,
  FEATURE_DIM for every row.

Output: tools/generated_oracles.json (checked in; __spark_entry__.oracle_sql
loads it). Regenerate after changing fixtures: python tools/make_constructed_oracles.py
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xxh64 import xxh64_signed  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
_TAG = os.path.basename(SF_DIR.rstrip("/"))
# the default (driver-graded) scale writes the canonical file; other scales
# get a suffixed file that __spark_entry__._constructed_oracle selects when
# the correctness checker runs at that sf (only data-derived oracles —
# dedup_simhash — actually vary; the synthetic-media ones are sf-free)
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "generated_oracles.json" if _TAG == "sf0.01"
    else f"generated_oracles_{_TAG}.json")

N_BITS = 64


def simhash(text: str) -> int | None:
    toks = [t for t in re.split(r"\W+", text.strip().lower(), flags=re.ASCII)
            if t != ""]
    if not toks:
        return None
    votes = [0] * N_BITS
    for t in toks:
        h = xxh64_signed(t.encode("utf-8")) & ((1 << 64) - 1)
        for b in range(N_BITS):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(N_BITS):
        if votes[b] > 0:
            sig |= (1 << b)
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def simhash_oracle() -> str:
    import duckdb
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        f"WHERE doc_id < 100 ORDER BY doc_id").fetchall()
    vals = []
    for doc_id, text in rows:
        sig = simhash(text)
        if sig is None:
            continue  # empty-token docs are dropped by the operator too
        vals.append(f"({doc_id}, {sig})")
    return ("SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(simhash AS BIGINT) AS simhash FROM (VALUES "
            + ", ".join(vals) + ") v(doc_id, simhash)")


def multimodal_oracle(n: int = 64) -> str:
    vals = []
    for i in range(n):
        if i % 2 == 0:
            # PNG: dimensions live in the IHDR chunk at bytes 16..24
            w, h = 1 + i % 7, 1 + i % 5
            payload = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
                       + struct.pack(">II", w, h) + bytes(8)
                       + hashlib.sha1(str(i).encode()).digest())
            pw, ph = struct.unpack(">II", payload[16:24])
        elif i % 4 == 1:
            # JPEG: fixture stores (8+i%9) x (8+i%11) in the SOF0 marker
            pw, ph = 8 + i % 9, 8 + i % 11
        elif i % 32 == 15:
            # lossy-VP8 WebP: fixture stores (16+i%13) x (9+i%11) in the
            # key-frame header — the parser must recover them from the
            # real RFC 6386 bitstream
            pw, ph = 16 + i % 13, 9 + i % 11
        elif i % 32 == 31:
            payload = hashlib.sha1(f"blob{i}".encode()).digest() * (1 + i % 5)
            digest = int.from_bytes(hashlib.sha1(payload).digest()[:4], "big")
            pw, ph = 16 + digest % 64, 16 + (digest >> 8) % 64
        elif i % 8 == 3:
            # GIF: fixture stores (2+i%5) x (1+i%3) in the screen descriptor
            pw, ph = 2 + i % 5, 1 + i % 3
        else:
            # lossless WebP: (3+i%6) x (2+i%4) in the VP8L header
            pw, ph = 3 + i % 6, 2 + i % 4
        vals.append(f"({i}, {pw}, {ph}, 16)")
    return ("SELECT CAST(media_id AS BIGINT) AS media_id, "
            "CAST(width AS INTEGER) AS width, "
            "CAST(height AS INTEGER) AS height, "
            "CAST(feat_dim AS INTEGER) AS feat_dim FROM (VALUES "
            + ", ".join(vals) + ") v(media_id, width, height, feat_dim)")


def video_oracle(n: int = 12, every_n: int = 4) -> str:
    """Expected (media_id, frame_no, n_bytes, head_hex) of resample_frames
    over synthetic_video_df: the fixture's frame formulas (count
    8+(i%5)*4, payload byte (i+k)%256 repeated 20+((i*7+k*3)%40) times)
    through every_n sampling — computed here WITHOUT the isobmff module,
    so the demuxer's extracted ranges are verified against the content the
    mux was told to store."""
    vals = []
    for i in range(n):
        n_frames = 8 + (i % 5) * 4
        for k in range(0, n_frames, every_n):
            length = 20 + ((i * 7 + k * 3) % 40)
            byte = (i + k) % 256
            head = f"{byte:02X}" * 4
            vals.append(f"({i}, {k}, {length}, '{head}')")
    return ("SELECT CAST(media_id AS BIGINT) AS media_id, "
            "CAST(frame_no AS INTEGER) AS frame_no, "
            "CAST(n_bytes AS INTEGER) AS n_bytes, "
            "head_hex FROM (VALUES " + ", ".join(vals)
            + ") v(media_id, frame_no, n_bytes, head_hex)")


def audio_oracle(n: int = 16, rate_in: int = 8000,
                 rate_out: int = 4000) -> str:
    """Expected (media_id, sample_rate, n_frames, n_bytes) of
    resample_audio over synthetic_audio_df: frame counts follow the
    fixture's 64+16*(i%4) formula through n_out = round(n_in*out/in)
    (the resampler's public contract); a 16-bit mono WAV is 44 header
    bytes + 2 per frame."""
    vals = []
    for i in range(n):
        n_in = 64 + 16 * (i % 4)
        n_out = max(1, round(n_in * rate_out / rate_in))
        vals.append(f"({i}, {rate_out}, {n_out}, {44 + 2 * n_out})")
    return ("SELECT CAST(media_id AS BIGINT) AS media_id, "
            "CAST(sample_rate AS INTEGER) AS sample_rate, "
            "CAST(n_frames AS BIGINT) AS n_frames, "
            "CAST(n_bytes AS BIGINT) AS n_bytes FROM (VALUES "
            + ", ".join(vals) + ") v(media_id, sample_rate, n_frames, n_bytes)")


def main() -> None:
    out = {"dedup_simhash": simhash_oracle(),
           "multimodal_features": multimodal_oracle(),
           "multimodal_audio": audio_oracle(),
           "multimodal_frames": video_oracle()}
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}: "
          + ", ".join(f"{k} ({len(v)} chars)" for k, v in out.items()))


if __name__ == "__main__":
    main()
