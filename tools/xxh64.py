"""Pure-Python XXH64 (public xxHash algorithm, Yann Collet, BSD-2 spec at
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md).

Used ONLY by tools/make_constructed_oracles.py to compute expected simhash
signatures independently of Spark: Spark's `xxhash64(string)` is standard
XXH64 over the UTF-8 bytes with seed 42, returned as a signed 64-bit long.
"""

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * P2) & _M
    return (_rotl(acc, 31) * P1) & _M


def _merge(acc: int, v: int) -> int:
    acc ^= _round(0, v)
    return ((acc * P1) + P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 digest as an UNSIGNED 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little")); i += 8
            v2 = _round(v2, int.from_bytes(data[i:i + 8], "little")); i += 8
            v3 = _round(v3, int.from_bytes(data[i:i + 8], "little")); i += 8
            v4 = _round(v4, int.from_bytes(data[i:i + 8], "little")); i += 8
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        acc = _merge(acc, v1)
        acc = _merge(acc, v2)
        acc = _merge(acc, v3)
        acc = _merge(acc, v4)
    else:
        acc = (seed + P5) & _M
    acc = (acc + n) & _M
    while i + 8 <= n:
        acc ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        acc = (_rotl(acc, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= n:
        acc ^= (int.from_bytes(data[i:i + 4], "little") * P1) & _M
        acc = (_rotl(acc, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        acc ^= (data[i] * P5) & _M
        acc = (_rotl(acc, 11) * P1) & _M
        i += 1
    acc ^= acc >> 33
    acc = (acc * P2) & _M
    acc ^= acc >> 29
    acc = (acc * P3) & _M
    acc ^= acc >> 32
    return acc


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Spark-compatible signed long."""
    u = xxh64(data, seed)
    return u - (1 << 64) if u >= (1 << 63) else u
