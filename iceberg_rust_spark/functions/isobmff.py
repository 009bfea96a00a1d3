"""Minimal ISO-BMFF (MP4) container demux + mux — pure stdlib.

The public ISO/IEC 14496-12 box layout: length-prefixed boxes, a `moov`
movie box holding per-track sample tables (stts timing, stsz sizes,
stsc sample-to-chunk, stco/co64 chunk offsets, stss sync samples), and
an `mdat` box holding the raw sample payloads. Walking the sample
tables yields every frame's exact byte range WITHOUT any codec work —
which is all the `resample_frames` operator needs: frame sampling
emits encoded sample payloads; pixel decode stays behind codec libs.

The writer builds a valid single-video-track MP4 from a list of frame
payloads, giving the demuxer non-circular structural coverage (box
layout asserted independently in tests) and the operators a real
fixture format.

Counterpart surface in the reference: none (the reference has no video
path); this backs the training-data-pipeline operators the build brief
adds on top of reference parity.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Tuple


def _iter_boxes(b: bytes, start: int, end: int) -> Iterator[Tuple[str, int, int]]:
    """Yield (type, payload_start, payload_end) for each box in [start,end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos:pos + 4])
        btype = b[pos + 4:pos + 8].decode("latin-1")
        header = 8
        if size == 1:                       # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", b[pos + 8:pos + 16])
            header = 16
        elif size == 0:                     # box extends to end
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, pos + header, pos + size
        pos += size


def _find(b: bytes, start: int, end: int, btype: str) -> Optional[Tuple[int, int]]:
    for t, s, e in _iter_boxes(b, start, end):
        if t == btype:
            return s, e
    return None


def _full_box(b: bytes, s: int) -> int:
    """Skip the version/flags word of a FullBox; returns payload offset."""
    return s + 4


def parse_mp4_samples(data: bytes) -> Dict:
    """MP4 bytes -> sample map of the first video track:

    {"timescale": int, "duration": int, "codec": str,
     "width": int, "height": int,
     "samples": [(offset, size)], "sync": set[int] | None}

    Raises ValueError when the payload is not ISO-BMFF or carries no
    video track with a complete sample table.
    """
    b = bytes(data)
    n = len(b)
    # sanity: an MP4 starts with a well-formed box, typically ftyp
    try:
        first = next(_iter_boxes(b, 0, n))
    except (StopIteration, ValueError, struct.error):
        raise ValueError("not an ISO-BMFF container")
    if first[0] not in ("ftyp", "moov", "mdat", "free", "styp", "wide"):
        raise ValueError("not an ISO-BMFF container")
    moov = _find(b, 0, n, "moov")
    if moov is None:
        raise ValueError("no moov box")
    for t, ts_, te_ in _iter_boxes(b, *moov):
        if t != "trak":
            continue
        mdia = _find(b, ts_, te_, "mdia")
        if mdia is None:
            continue
        hdlr = _find(b, *mdia, btype="hdlr")
        if hdlr is None or b[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(b, *mdia, btype="mdhd")
        timescale = duration = 0
        if mdhd is not None:
            ver = b[mdhd[0]]
            if ver == 1:
                timescale, duration = struct.unpack(
                    ">IQ", b[mdhd[0] + 20:mdhd[0] + 32])
            else:
                timescale, duration = struct.unpack(
                    ">II", b[mdhd[0] + 12:mdhd[0] + 20])
        minf = _find(b, *mdia, btype="minf")
        stbl = minf and _find(b, *minf, btype="stbl")
        if not stbl:
            continue
        boxes = {t2: (s2, e2) for t2, s2, e2 in _iter_boxes(b, *stbl)}
        if "stsz" not in boxes or "stsc" not in boxes or (
                "stco" not in boxes and "co64" not in boxes):
            raise ValueError("video track missing sample tables")

        codec, width, height = "unknown", 0, 0
        if "stsd" in boxes:
            s2 = _full_box(b, boxes["stsd"][0]) + 4   # skip entry_count
            for t3, s3, e3 in _iter_boxes(b, s2, boxes["stsd"][1]):
                codec = t3
                if e3 - s3 >= 28:                     # VisualSampleEntry
                    width, height = struct.unpack(">HH", b[s3 + 24:s3 + 28])
                break

        s2 = _full_box(b, boxes["stsz"][0])
        const_size, count = struct.unpack(">II", b[s2:s2 + 8])
        if const_size:
            sizes = [const_size] * count
        else:
            sizes = list(struct.unpack(f">{count}I",
                                       b[s2 + 8:s2 + 8 + 4 * count]))

        if "stco" in boxes:
            s2 = _full_box(b, boxes["stco"][0])
            (n_chunks,) = struct.unpack(">I", b[s2:s2 + 4])
            chunk_offs = list(struct.unpack(
                f">{n_chunks}I", b[s2 + 4:s2 + 4 + 4 * n_chunks]))
        else:
            s2 = _full_box(b, boxes["co64"][0])
            (n_chunks,) = struct.unpack(">I", b[s2:s2 + 4])
            chunk_offs = list(struct.unpack(
                f">{n_chunks}Q", b[s2 + 4:s2 + 4 + 8 * n_chunks]))

        s2 = _full_box(b, boxes["stsc"][0])
        (n_stsc,) = struct.unpack(">I", b[s2:s2 + 4])
        stsc = [struct.unpack(">III", b[s2 + 4 + 12 * i:s2 + 16 + 12 * i])
                for i in range(n_stsc)]          # (first_chunk, per_chunk, desc)

        # expand sample-to-chunk runs into per-sample file offsets
        samples: List[Tuple[int, int]] = []
        si = 0
        for ri, (first_chunk, per_chunk, _desc) in enumerate(stsc):
            last_chunk = (stsc[ri + 1][0] - 1 if ri + 1 < len(stsc)
                          else n_chunks)
            for ci in range(first_chunk - 1, last_chunk):
                off = chunk_offs[ci]
                for _ in range(per_chunk):
                    if si >= count:
                        break
                    samples.append((off, sizes[si]))
                    off += sizes[si]
                    si += 1
        if si != count:
            raise ValueError(
                f"sample table mismatch: stsc walk covered {si} of {count}")

        sync = None
        if "stss" in boxes:
            s2 = _full_box(b, boxes["stss"][0])
            (n_sync,) = struct.unpack(">I", b[s2:s2 + 4])
            sync = {x - 1 for x in struct.unpack(
                f">{n_sync}I", b[s2 + 4:s2 + 4 + 4 * n_sync])}
        return {"timescale": timescale, "duration": duration,
                "codec": codec, "width": width, "height": height,
                "samples": samples, "sync": sync}
    raise ValueError("no video track")


def extract_mp4_frames(data: bytes, every_n: int = 1,
                       sync_only: bool = False) -> List[Tuple[int, bytes]]:
    """[(frame_no, encoded_sample_bytes)] for every Nth video sample (or
    every Nth sync sample when sync_only and the track has an stss)."""
    b = bytes(data)
    info = parse_mp4_samples(b)
    idxs = range(len(info["samples"]))
    if sync_only and info["sync"]:
        idxs = sorted(info["sync"])
    picked = list(idxs)[::max(1, every_n)]
    out = []
    for i in picked:
        off, size = info["samples"][i]
        if off + size > len(b):
            raise ValueError("sample range outside file")
        out.append((i, b[off:off + size]))
    return out


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version,
                                   flags.to_bytes(3, "big")) + payload)


def encode_mp4(frames: List[bytes], fps: int = 10, width: int = 64,
               height: int = 64, sync_every: int = 0) -> bytes:
    """Build a minimal valid single-video-track MP4 holding ``frames`` as
    raw samples (one chunk per 4 samples to exercise stsc walking).
    sync_every > 0 adds an stss marking every Nth sample as a keyframe."""
    if not frames:
        raise ValueError("need at least one frame")
    timescale = fps * 100
    sample_delta = 100
    n = len(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")

    # mdat follows ftyp directly; chunk offsets point into it
    mdat_payload = b"".join(frames)
    mdat_start = len(ftyp) + 8

    chunk_size = 4
    chunk_offs = []
    off = mdat_start
    for ci in range(0, n, chunk_size):
        chunk_offs.append(off)
        off += sum(len(f) for f in frames[ci:ci + chunk_size])

    stsd_entry = _box(
        b"rawv",                                  # generic VisualSampleEntry
        bytes(6) + struct.pack(">H", 1)           # reserved + data_ref_index
        + bytes(16)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + bytes(4) + struct.pack(">H", 1)         # frame_count
        + bytes(32)                               # compressorname
        + struct.pack(">Hh", 24, -1))             # depth, color table
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0,
                 struct.pack(">III", 1, n, sample_delta))
    stsz = _full(b"stsz", 0, 0,
                 struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(f)) for f in frames))
    # stsc runs: all chunks carry chunk_size samples except a short last one
    runs = [(1, min(chunk_size, n), 1)]
    if n % chunk_size and n > chunk_size:
        runs.append((len(chunk_offs), n % chunk_size, 1))
    stsc = _full(b"stsc", 0, 0,
                 struct.pack(">I", len(runs))
                 + b"".join(struct.pack(">III", *r) for r in runs))
    stco = _full(b"stco", 0, 0,
                 struct.pack(">I", len(chunk_offs))
                 + b"".join(struct.pack(">I", o) for o in chunk_offs))
    stbl_children = stsd + stts + stsc + stsz + stco
    if sync_every > 0:
        syncs = list(range(1, n + 1, sync_every))
        stbl_children += _full(b"stss", 0, 0,
                               struct.pack(">I", len(syncs))
                               + b"".join(struct.pack(">I", s)
                                          for s in syncs))
    stbl = _box(b"stbl", stbl_children)

    url = _full(b"url ", 0, 1, b"")
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, bytes(8))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0,
                 bytes(4) + b"vide" + bytes(12) + b"video\x00")
    duration = n * sample_delta
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIIIHH", 0, 0, timescale, duration,
                             0x55C4, 0))          # und language
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIII", 0, 0, 1, 0)   # times, track id 1
                 + struct.pack(">I", duration) + bytes(8)
                 + struct.pack(">HHHH", 0, 0, 0, 0)
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">IH", 0x00010000, 0x0100) + bytes(10)
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + bytes(24) + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov
