"""Gorilla-style compression kernels: XOR float encoding + delta-of-delta
timestamp encoding (public algorithm: Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015, §4.1).

No reference counterpart (SignalSharp has no storage layer) — this is the
north-star cold-tier addition. Encoding is bit-exact roundtrip for arbitrary
float64 (including NaN/inf payloads) and int64 microsecond timestamps.

Float XOR scheme (paper §4.1.2):
  first value: 64 raw bits; then per value x = xor(prev):
    x == 0      → '0'
    else        → '1' + ('0' reuse previous leading/length window
                         | '1' + 5b leading-zero count + 6b length) + bits
  (length is stored as len-1 in 6 bits so 64 fits — a standard variant.)

Timestamp delta-of-delta (paper §4.1.1, ranges widened for microsecond
resolution — the paper's second-resolution buckets are too narrow for µs):
    dod == 0                  → '0'
    |dod| fits 15 signed bits → '10'  + 15b
    |dod| fits 27 signed bits → '110' + 27b
    |dod| fits 39 signed bits → '1110'+ 39b
    else                      → '1111'+ 64b
  header: 64b first ts + 64b first delta.
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        remaining = bits
        while remaining > 0:
            byte_i, bit_i = divmod(self.pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (self.data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


def encode_floats(values) -> bytes:
    """XOR-encode a float64 array. Layout: 32b count + stream."""
    v = np.ascontiguousarray(np.asarray(values, dtype=np.float64))
    bits = v.view(np.uint64)
    w = _BitWriter()
    n = len(v)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_lead, prev_len = -1, -1  # no previous window
    for i in range(1, n):
        cur = int(bits[i])
        x = cur ^ prev
        prev = cur
        if x == 0:
            w.write(0, 1)
            continue
        lead = 64 - x.bit_length()
        trail = (x & -x).bit_length() - 1
        length = 64 - lead - trail
        if prev_lead >= 0 and lead >= prev_lead and (64 - prev_lead - prev_len) <= trail:
            # fits the previous window → '10' + meaningful bits in that window
            w.write(0b10, 2)
            w.write(x >> (64 - prev_lead - prev_len), prev_len)
        else:
            lead = min(lead, 31)  # 5-bit field
            length = 64 - lead - trail
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(length - 1, 6)
            w.write(x >> trail, length)
            prev_lead, prev_len = lead, length
    return w.getvalue()


def decode_floats(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, length = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10' reuse window
            x = r.read(length) << (64 - lead - length)
        else:  # '11' new window
            lead = r.read(5)
            length = r.read(6) + 1
            x = r.read(length) << (64 - lead - length)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


_DOD_BUCKETS = ((15, 0b10, 2), (27, 0b110, 3), (39, 0b1110, 4))


def encode_timestamps(ts_us) -> bytes:
    """Delta-of-delta encode int64 microsecond timestamps."""
    t = np.asarray(ts_us, dtype=np.int64)
    w = _BitWriter()
    n = len(t)
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    mask = (1 << 64) - 1
    w.write(int(t[0]), 64)
    if n == 1:
        return w.getvalue()
    # all arithmetic is mod 2^64 (matching int64 wraparound) so adversarial
    # inputs whose delta-of-delta exceeds 64 signed bits still roundtrip
    first_delta = (int(t[1]) - int(t[0])) & mask
    w.write(first_delta, 64)
    prev_delta = first_delta
    for i in range(2, n):
        delta = (int(t[i]) - int(t[i - 1])) & mask
        dod = _sign_extend((delta - prev_delta) & mask, 64)
        prev_delta = delta
        if dod == 0:
            w.write(0, 1)
            continue
        for bits, prefix, plen in _DOD_BUCKETS:
            lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
            if lo <= dod <= hi:
                w.write(prefix, plen)
                w.write(dod, bits)
                break
        else:
            w.write(0b1111, 4)
            w.write(dod, 64)
    return w.getvalue()


def _sign_extend(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


def decode_timestamps(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    mask = (1 << 64) - 1
    ts = r.read(64)
    out[0] = _sign_extend(ts, 64)
    if n == 1:
        return out
    delta = r.read(64)
    ts = (ts + delta) & mask
    out[1] = _sign_extend(ts, 64)
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = _sign_extend(r.read(15), 15)
            elif r.read(1) == 0:
                dod = _sign_extend(r.read(27), 27)
            elif r.read(1) == 0:
                dod = _sign_extend(r.read(39), 39)
            else:
                dod = _sign_extend(r.read(64), 64)
        delta = (delta + dod) & mask
        ts = (ts + delta) & mask
        out[i] = _sign_extend(ts, 64)
    return out
