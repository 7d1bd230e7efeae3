"""Gorilla-style compression kernels: XOR float encoding + delta-of-delta
timestamp encoding (public algorithm: Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015, §4.1).

No reference counterpart (SignalSharp has no storage layer) — this is the
north-star cold-tier addition. Encoding is bit-exact roundtrip for arbitrary
float64 (including NaN/inf payloads) and int64 microsecond timestamps.

Columnar plane layout (v2). The paper's stream interleaves control bits
with variable-length payloads, which forces a sequential bit-at-a-time
decoder — per-point Python in this engine's Arrow batches, the exact
"no per-row Python on the hot path" violation. v2 keeps the paper's
*codes* (XOR leading/trailing-zero windows; DoD bucket widths) but splits
each chunk into byte-aligned planes so both directions are pure numpy
array ops (measured 30-80x over the v1 bit-loop):

floats:  u32 n | u64 first |
         nonzero bitmap over the n-1 XORs (1 bit each, packbits order) |
         11-bit headers per nonzero (5b leading-zero count, 6b length-1) |
         significant-bit payloads (variable length, MSB-first)
  value stream decodes with one cumulative XOR scan
  (np.bitwise_xor.accumulate).

timestamps (int64 µs, all arithmetic mod 2^64 so adversarial inputs whose
delta-of-delta exceeds 64 signed bits still roundtrip):
         u32 n | u64 t0 | u64 first_delta |
         nonzero bitmap over the n-2 DoDs |
         2-bit bucket per nonzero (15 / 27 / 39 / 64-bit signed payload —
         the paper's buckets widened for µs resolution) |
         DoD payloads (variable length, two's complement)
  decodes with two cumulative sums (dod → delta → ts).

Variable-length field packing uses the repeat/reduceat trick: every output
bit's (field, position-within-field) pair is materialized once, so packing
and unpacking are O(total_bits) numpy with no Python per field.
"""

from __future__ import annotations

import struct

import numpy as np

# Format version byte prepended to every blob. v1 (interleaved bitstream) was
# replaced by the v2 plane layout before any v1 blob was ever persisted, so
# only v2 decodes; unknown versions raise instead of silently misparsing —
# the first 12 bytes of v1 and v2 parsed identically, which is exactly the
# failure mode a cold-tier codec must fail loudly on.
_FMT_VERSION = 2


def _check_version(data) -> memoryview:
    buf = memoryview(data)
    if len(buf) == 0 or buf[0] != _FMT_VERSION:
        got = buf[0] if len(buf) else None
        raise ValueError(f"unknown gorilla blob format version {got!r} (expected {_FMT_VERSION})")
    return buf[1:]

_U64_1 = np.uint64(1)
_U64_6 = np.uint64(6)
_U64_63 = np.uint64(63)
_U64_64 = np.uint64(64)
_U64_FULL = ~np.uint64(0)


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Exact bit length of positive uint64 values (vectorized).

    frexp's exponent equals the bit length for integers exact in float64;
    both 32-bit halves are < 2^32 < 2^53, so the conversion is exact."""
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = x.astype(np.uint32)
    hexp = np.frexp(hi.astype(np.float64))[1].astype(np.int64)
    lexp = np.frexp(lo.astype(np.float64))[1].astype(np.int64)
    return np.where(hi > 0, 32 + hexp, lexp)


def _pack_fields(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """Concatenate variable-length bit fields (MSB-first), zero-pad to byte."""
    vals = vals.astype(np.uint64)
    lens = lens.astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return b""
    offs = np.cumsum(lens) - lens
    fidx = np.repeat(np.arange(len(vals)), lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(offs, lens)
    shifts = (lens[fidx] - 1 - within).astype(np.uint64)
    bits = ((vals[fidx] >> shifts) & _U64_1).astype(np.uint8)
    return np.packbits(bits).tobytes()


def _unpack_fields(buf: bytes, lens: np.ndarray) -> np.ndarray:
    """Inverse of _pack_fields: extract len(lens) uint64 fields."""
    lens = lens.astype(np.int64)
    m = len(lens)
    if m == 0:
        return np.empty(0, dtype=np.uint64)
    total = int(lens.sum())
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=total).astype(np.uint64)
    offs = (np.cumsum(lens) - lens).astype(np.int64)
    fidx = np.repeat(np.arange(m), lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(offs, lens)
    shifts = (lens[fidx] - 1 - within).astype(np.uint64)
    # fields' bits are distinct powers of two → segment add == bitwise OR
    return np.add.reduceat(bits << shifts, offs)


def encode_floats(values) -> bytes:
    """XOR-encode a float64 array (plane layout above)."""
    v = np.ascontiguousarray(np.asarray(values, dtype=np.float64))
    bits = v.view(np.uint64)
    n = len(v)
    out = [bytes([_FMT_VERSION]), struct.pack(">I", n)]
    if n == 0:
        return b"".join(out)
    out.append(struct.pack(">Q", int(bits[0])))
    if n == 1:
        return b"".join(out)
    x = bits[1:] ^ bits[:-1]
    nz = x != np.uint64(0)
    out.append(np.packbits(nz).tobytes())
    xs = np.ascontiguousarray(x[nz])
    if xs.size:
        bl = _bitlen_u64(xs)
        lead = np.minimum(64 - bl, 31)  # 5-bit field
        lowest = xs & (~xs + _U64_1)
        trail = _bitlen_u64(lowest) - 1
        length = 64 - lead - trail
        sig = xs >> trail.astype(np.uint64)
        hdr = (lead.astype(np.uint64) << _U64_6) | (length - 1).astype(np.uint64)
        out.append(_pack_fields(hdr, np.full(xs.size, 11, dtype=np.int64)))
        out.append(_pack_fields(sig, length))
    return b"".join(out)


def decode_floats(data: bytes) -> np.ndarray:
    data = _check_version(data)
    n = struct.unpack(">I", data[:4])[0]
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    first = np.uint64(struct.unpack(">Q", data[4:12])[0])
    out[0] = first
    if n == 1:
        return out.view(np.float64)
    nb = (n - 1 + 7) // 8
    nz = np.unpackbits(np.frombuffer(data[12 : 12 + nb], dtype=np.uint8), count=n - 1).astype(bool)
    pos = 12 + nb
    m = int(nz.sum())
    x = np.zeros(n - 1, dtype=np.uint64)
    if m:
        hb = (11 * m + 7) // 8
        hdr = _unpack_fields(data[pos : pos + hb], np.full(m, 11, dtype=np.int64))
        pos += hb
        lead = (hdr >> _U64_6).astype(np.int64)
        length = (hdr & _U64_63).astype(np.int64) + 1
        trail = (64 - lead - length).astype(np.uint64)
        pb = (int(length.sum()) + 7) // 8
        sig = _unpack_fields(data[pos : pos + pb], length)
        x[nz] = sig << trail
    out[1:] = np.bitwise_xor.accumulate(x) ^ first
    return out.view(np.float64)


# DoD payload widths (paper §4.1.1 buckets, widened for µs): bucket index →
# signed bit width; bucket 3 is the raw 64-bit escape.
_DOD_BITS = np.array([15, 27, 39, 64], dtype=np.int64)


def encode_timestamps(ts_us) -> bytes:
    """Delta-of-delta encode int64 microsecond timestamps (plane layout)."""
    t = np.ascontiguousarray(np.asarray(ts_us, dtype=np.int64))
    u = t.view(np.uint64)
    n = len(t)
    out = [bytes([_FMT_VERSION]), struct.pack(">I", n)]
    if n == 0:
        return b"".join(out)
    out.append(struct.pack(">Q", int(u[0])))
    if n == 1:
        return b"".join(out)
    d = u[1:] - u[:-1]  # mod 2^64
    out.append(struct.pack(">Q", int(d[0])))
    if n == 2:
        return b"".join(out)
    dod = d[1:] - d[:-1]  # mod 2^64
    nz = dod != np.uint64(0)
    out.append(np.packbits(nz).tobytes())
    dz = np.ascontiguousarray(dod[nz])
    if dz.size:
        sv = dz.view(np.int64)
        bucket = (
            3
            - (sv >= -(1 << 38)) * (sv < (1 << 38))
            - (sv >= -(1 << 26)) * (sv < (1 << 26))
            - (sv >= -(1 << 14)) * (sv < (1 << 14))
        ).astype(np.int64)
        lens = _DOD_BITS[bucket]
        mask = _U64_FULL >> (_U64_64 - lens.astype(np.uint64))
        payload = dz & mask
        out.append(_pack_fields(bucket.astype(np.uint64), np.full(dz.size, 2, dtype=np.int64)))
        out.append(_pack_fields(payload, lens))
    return b"".join(out)


def decode_timestamps(data: bytes) -> np.ndarray:
    data = _check_version(data)
    n = struct.unpack(">I", data[:4])[0]
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.int64)
    t0 = np.uint64(struct.unpack(">Q", data[4:12])[0])
    out[0] = t0
    if n == 1:
        return out.view(np.int64)
    d0 = np.uint64(struct.unpack(">Q", data[12:20])[0])
    deltas = np.empty(n - 1, dtype=np.uint64)
    deltas[0] = d0
    if n >= 3:
        nb = (n - 2 + 7) // 8
        nz = np.unpackbits(np.frombuffer(data[20 : 20 + nb], dtype=np.uint8), count=n - 2).astype(bool)
        pos = 20 + nb
        m = int(nz.sum())
        dod = np.zeros(n - 2, dtype=np.uint64)
        if m:
            bb = (2 * m + 7) // 8
            bucket = _unpack_fields(data[pos : pos + bb], np.full(m, 2, dtype=np.int64)).astype(np.int64)
            pos += bb
            lens = _DOD_BITS[bucket]
            pb = (int(lens.sum()) + 7) // 8
            payload = _unpack_fields(data[pos : pos + pb], lens)
            sh = _U64_64 - lens.astype(np.uint64)
            # sign-extend: shift the field to the top, arithmetic-shift back
            sv = (payload << sh).view(np.int64) >> sh.astype(np.int64)
            dod[nz] = sv.view(np.uint64)
        deltas[1:] = d0 + np.cumsum(dod, dtype=np.uint64)
    out[1:] = t0 + np.cumsum(deltas, dtype=np.uint64)
    return out.view(np.int64)
