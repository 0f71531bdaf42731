"""Pure-Python FarmHash Fingerprint64.

Implements the public FarmHash ``Fingerprint64`` algorithm (Google
FarmHash, https://github.com/google/farmhash — ``farmhashna::Hash64``),
which is what Guava's ``Hashing.farmHashFingerprint64()`` computes and
what the reference engine uses for content-hash dcids
(reference: util/src/main/java/org/datacommons/util/DcidGenerator.java:370-375).

Bit-compatibility is verified in tests against golden dcids from the
reference's genmcf test fixtures (FIXTURES.md §F7).

This is a scalar Python implementation. It is only used for id
generation of *grouped/derived* nodes (StatVarObservation / StatVar /
legacy obs dcids), which is O(rows) short-string hashing; at ~1-3 us
per hash it sustains ~0.5M ids/sec/core and is applied inside
``map_batches`` so it parallelizes across the cluster. If it ever shows
up in ``ds.stats()`` as a bottleneck, swap in a C binding with the same
test vectors.
"""

from __future__ import annotations

import struct

_M = 0xFFFFFFFFFFFFFFFF  # 64-bit mask

K0 = 0xC3A5C85C97CB3127
K1 = 0xB492B66FBE98F273
K2 = 0x9AE16A3B2F90404F


def _rotr(v: int, s: int) -> int:
    return ((v >> s) | (v << (64 - s))) & _M


def _shift_mix(v: int) -> int:
    return v ^ (v >> 47)


def _hash_len_16(u: int, v: int, mul: int) -> int:
    a = ((u ^ v) * mul) & _M
    a ^= a >> 47
    b = ((v ^ a) * mul) & _M
    b ^= b >> 47
    return (b * mul) & _M


def _fetch64(s: bytes, i: int) -> int:
    return struct.unpack_from("<Q", s, i)[0]


def _fetch32(s: bytes, i: int) -> int:
    return struct.unpack_from("<I", s, i)[0]


def _hash_len_0_to_16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (K2 + n * 2) & _M
        a = (_fetch64(s, 0) + K2) & _M
        b = _fetch64(s, n - 8)
        c = (_rotr(b, 37) * mul + a) & _M
        d = ((_rotr(a, 25) + b) * mul) & _M
        return _hash_len_16(c, d, mul)
    if n >= 4:
        mul = (K2 + n * 2) & _M
        a = _fetch32(s, 0)
        return _hash_len_16((n + (a << 3)) & _M, _fetch32(s, n - 4), mul)
    if n > 0:
        a = s[0]
        b = s[n >> 1]
        c = s[n - 1]
        y = (a + (b << 8)) & _M
        z = (n + (c << 2)) & _M
        return (_shift_mix((y * K2 ^ z * K0) & _M) * K2) & _M
    return K2


def _hash_len_17_to_32(s: bytes) -> int:
    n = len(s)
    mul = (K2 + n * 2) & _M
    a = (_fetch64(s, 0) * K1) & _M
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & _M
    d = (_fetch64(s, n - 16) * K2) & _M
    return _hash_len_16(
        (_rotr((a + b) & _M, 43) + _rotr(c, 30) + d) & _M,
        (a + _rotr((b + K2) & _M, 18) + c) & _M,
        mul,
    )


def _hash_len_33_to_64(s: bytes) -> int:
    n = len(s)
    mul = (K2 + n * 2) & _M
    a = (_fetch64(s, 0) * K2) & _M
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & _M
    d = (_fetch64(s, n - 16) * K2) & _M
    y = (_rotr((a + b) & _M, 43) + _rotr(c, 30) + d) & _M
    z = _hash_len_16(y, (a + _rotr((b + K2) & _M, 18) + c) & _M, mul)
    e = (_fetch64(s, 16) * mul) & _M
    f = _fetch64(s, 24)
    g = ((y + _fetch64(s, n - 32)) * mul) & _M
    h = ((z + _fetch64(s, n - 24)) * mul) & _M
    return _hash_len_16(
        (_rotr((e + f) & _M, 43) + _rotr(g, 30) + h) & _M,
        (e + _rotr((f + a) & _M, 18) + g) & _M,
        mul,
    )


def _weak_hash_len_32_with_seeds(
    w: int, x: int, y: int, z: int, a: int, b: int
) -> tuple[int, int]:
    a = (a + w) & _M
    b = _rotr((b + a + z) & _M, 21)
    c = a
    a = (a + x) & _M
    a = (a + y) & _M
    b = (b + _rotr(a, 44)) & _M
    return (a + z) & _M, (b + c) & _M


def fingerprint64(data: bytes | str) -> int:
    """FarmHash Fingerprint64 of ``data`` (UTF-8 encoded if str)."""
    s = data.encode("utf-8") if isinstance(data, str) else data
    n = len(s)
    if n <= 32:
        if n <= 16:
            return _hash_len_0_to_16(s)
        return _hash_len_17_to_32(s)
    if n <= 64:
        return _hash_len_33_to_64(s)

    seed = 81
    x = seed
    y = (seed * K1 + 113) & _M
    z = (_shift_mix((y * K2 + 113) & _M) * K2) & _M
    v0 = v1 = w0 = w1 = 0
    x = (x * K2 + _fetch64(s, 0)) & _M

    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    p = 0
    while True:
        x = (_rotr((x + y + v0 + _fetch64(s, p + 8)) & _M, 37) * K1) & _M
        y = (_rotr((y + v1 + _fetch64(s, p + 48)) & _M, 42) * K1) & _M
        x ^= w1
        y = (y + v0 + _fetch64(s, p + 40)) & _M
        z = (_rotr((z + w0) & _M, 33) * K1) & _M
        v0, v1 = _weak_hash_len_32_with_seeds(
            _fetch64(s, p),
            _fetch64(s, p + 8),
            _fetch64(s, p + 16),
            _fetch64(s, p + 24),
            (v1 * K1) & _M,
            (x + w0) & _M,
        )
        w0, w1 = _weak_hash_len_32_with_seeds(
            _fetch64(s, p + 32),
            _fetch64(s, p + 40),
            _fetch64(s, p + 48),
            _fetch64(s, p + 56),
            (z + w1) & _M,
            (y + _fetch64(s, p + 16)) & _M,
        )
        z, x = x, z
        p += 64
        if p == end:
            break

    mul = (K1 + ((z & 0xFF) << 1)) & _M
    p = last64
    w0 = (w0 + ((n - 1) & 63)) & _M
    v0 = (v0 + w0) & _M
    w0 = (w0 + v0) & _M
    x = (_rotr((x + y + v0 + _fetch64(s, p + 8)) & _M, 37) * mul) & _M
    y = (_rotr((y + v1 + _fetch64(s, p + 48)) & _M, 42) * mul) & _M
    x ^= (w1 * 9) & _M
    y = (y + v0 * 9 + _fetch64(s, p + 40)) & _M
    z = (_rotr((z + w0) & _M, 33) * mul) & _M
    v0, v1 = _weak_hash_len_32_with_seeds(
        _fetch64(s, p),
        _fetch64(s, p + 8),
        _fetch64(s, p + 16),
        _fetch64(s, p + 24),
        (v1 * mul) & _M,
        (x + w0) & _M,
    )
    w0, w1 = _weak_hash_len_32_with_seeds(
        _fetch64(s, p + 32),
        _fetch64(s, p + 40),
        _fetch64(s, p + 48),
        _fetch64(s, p + 56),
        (z + w1) & _M,
        (y + _fetch64(s, p + 16)) & _M,
    )
    z, x = x, z
    return _hash_len_16(
        (_hash_len_16(v0, w0, mul) + _shift_mix(y) * K0 + z) & _M,
        (_hash_len_16(v1, w1, mul) + x) & _M,
        mul,
    )
