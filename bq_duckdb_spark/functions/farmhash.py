"""FarmHash Fingerprint64 (``farmhashna::Hash64``) in pure Python.

BigQuery's FARM_FINGERPRINT is FarmHash Fingerprint64 — a stable,
platform-independent 64-bit hash. This is a line-for-line port of the
public reference algorithm (github.com/google/farmhash, farmhash.cc,
MIT license; the ``na`` Hash64 path that Fingerprint64 dispatches to),
so values are stable across machines and match other Fingerprint64
implementations. Round 1 aliased FARM_FINGERPRINT to xxhash64 — fast
but silently different values for anyone migrating hashed keys.

Speed: per-row Python bit math via an Arrow-batched pandas UDF —
adequate for a compatibility function; the ext/ dedup hot paths use
JVM xxhash64 explicitly and never call this.
"""

from __future__ import annotations

M64 = (1 << 64) - 1

K0 = 0xC3A5C85C97CB3127
K1 = 0xB492B66FBE98F273
K2 = 0x9AE16A3B2F90404F


def _rot(v: int, s: int) -> int:
    return ((v >> s) | (v << (64 - s))) & M64


def _shift_mix(v: int) -> int:
    return (v ^ (v >> 47)) & M64


def _fetch64(s: bytes, i: int) -> int:
    return int.from_bytes(s[i : i + 8], "little")


def _fetch32(s: bytes, i: int) -> int:
    return int.from_bytes(s[i : i + 4], "little")


def _hash_len_16(u: int, v: int, mul: int) -> int:
    a = ((u ^ v) * mul) & M64
    a ^= a >> 47
    b = ((v ^ a) * mul) & M64
    b ^= b >> 47
    return (b * mul) & M64


def _hash_len_0_to_16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (K2 + n * 2) & M64
        a = (_fetch64(s, 0) + K2) & M64
        b = _fetch64(s, n - 8)
        c = (_rot(b, 37) * mul + a) & M64
        d = ((_rot(a, 25) + b) * mul) & M64
        return _hash_len_16(c, d, mul)
    if n >= 4:
        mul = (K2 + n * 2) & M64
        a = _fetch32(s, 0)
        return _hash_len_16((n + (a << 3)) & M64, _fetch32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & 0xFFFFFFFF
        z = (n + (c << 2)) & 0xFFFFFFFF
        return (_shift_mix((y * K2 ^ z * K0) & M64) * K2) & M64
    return K2


def _hash_len_17_to_32(s: bytes) -> int:
    n = len(s)
    mul = (K2 + n * 2) & M64
    a = (_fetch64(s, 0) * K1) & M64
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & M64
    d = (_fetch64(s, n - 16) * K2) & M64
    return _hash_len_16(
        (_rot((a + b) & M64, 43) + _rot(c, 30) + d) & M64,
        (a + _rot((b + K2) & M64, 18) + c) & M64,
        mul,
    )


def _hash_len_33_to_64(s: bytes) -> int:
    n = len(s)
    mul = (K2 + n * 2) & M64
    a = (_fetch64(s, 0) * K2) & M64
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & M64
    d = (_fetch64(s, n - 16) * K2) & M64
    y = (_rot((a + b) & M64, 43) + _rot(c, 30) + d) & M64
    z = _hash_len_16(y, (a + _rot((b + K2) & M64, 18) + c) & M64, mul)
    e = (_fetch64(s, 16) * mul) & M64
    f = _fetch64(s, 24)
    g = ((y + _fetch64(s, n - 32)) * mul) & M64
    h = ((z + _fetch64(s, n - 24)) * mul) & M64
    return _hash_len_16(
        (_rot((e + f) & M64, 43) + _rot(g, 30) + h) & M64,
        (e + _rot((f + a) & M64, 18) + g) & M64,
        mul,
    )


def _weak_hash_len_32_with_seeds(s: bytes, i: int, a: int, b: int) -> tuple[int, int]:
    w, x, y, z = (
        _fetch64(s, i),
        _fetch64(s, i + 8),
        _fetch64(s, i + 16),
        _fetch64(s, i + 24),
    )
    a = (a + w) & M64
    b = _rot((b + a + z) & M64, 21)
    c = a
    a = (a + x + y) & M64
    b = (b + _rot(a, 44)) & M64
    return (a + z) & M64, (b + c) & M64


def fingerprint64(s: bytes) -> int:
    """Unsigned 64-bit FarmHash Fingerprint64 of ``s``."""
    n = len(s)
    if n <= 16:
        return _hash_len_0_to_16(s)
    if n <= 32:
        return _hash_len_17_to_32(s)
    if n <= 64:
        return _hash_len_33_to_64(s)

    seed = 81
    x = seed
    y = (seed * K1 + 113) & M64
    z = (_shift_mix((y * K2 + 113) & M64) * K2) & M64
    v = (0, 0)
    w = (0, 0)
    x = (x * K2 + _fetch64(s, 0)) & M64

    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    i = 0
    while True:
        x = (_rot((x + y + v[0] + _fetch64(s, i + 8)) & M64, 37) * K1) & M64
        y = (_rot((y + v[1] + _fetch64(s, i + 48)) & M64, 42) * K1) & M64
        x ^= w[1]
        y = (y + v[0] + _fetch64(s, i + 40)) & M64
        z = (_rot((z + w[0]) & M64, 33) * K1) & M64
        v = _weak_hash_len_32_with_seeds(s, i, (v[1] * K1) & M64, (x + w[0]) & M64)
        w = _weak_hash_len_32_with_seeds(
            s, i + 32, (z + w[1]) & M64, (y + _fetch64(s, i + 16)) & M64
        )
        z, x = x, z
        i += 64
        if i == end:
            break
    mul = (K1 + ((z & 0xFF) << 1)) & M64
    i = last64
    w = ((w[0] + ((n - 1) & 63)) & M64, w[1])
    v = ((v[0] + w[0]) & M64, v[1])
    w = ((w[0] + v[0]) & M64, w[1])
    x = (_rot((x + y + v[0] + _fetch64(s, i + 8)) & M64, 37) * mul) & M64
    y = (_rot((y + v[1] + _fetch64(s, i + 48)) & M64, 42) * mul) & M64
    x ^= (w[1] * 9) & M64
    y = (y + v[0] * 9 + _fetch64(s, i + 40)) & M64
    z = (_rot((z + w[0]) & M64, 33) * mul) & M64
    v = _weak_hash_len_32_with_seeds(s, i, (v[1] * mul) & M64, (x + w[0]) & M64)
    w = _weak_hash_len_32_with_seeds(
        s, i + 32, (z + w[1]) & M64, (y + _fetch64(s, i + 16)) & M64
    )
    z, x = x, z
    return _hash_len_16(
        (_hash_len_16(v[0], w[0], mul) + _shift_mix(y) * K0 + z) & M64,
        (_hash_len_16(v[1], w[1], mul) + x) & M64,
        mul,
    )


def farm_fingerprint(value) -> int:
    """BigQuery FARM_FINGERPRINT: signed INT64 of Fingerprint64(bytes).
    STRING inputs hash their UTF-8 encoding (BigQuery semantics)."""
    if isinstance(value, str):
        value = value.encode("utf-8")
    h = fingerprint64(bytes(value))
    return h - (1 << 64) if h >= (1 << 63) else h
