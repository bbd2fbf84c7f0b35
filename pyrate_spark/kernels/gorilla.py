"""Gorilla time-series block codec: delta-of-delta timestamps + XOR
floats (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time
Series Database", VLDB 2015 §4.1). Public-paper semantics; no reference
analog (the reference stores GeoTIFF/npy) — this is the graft's tier
payload encoding mandated by BASELINE.json.

Encodes one key's tier series (int64 epoch seconds + float64 values,
NaN allowed) into a bytes block; decode is the exact inverse. Pure
python/numpy bit-twiddling — runs inside Arrow-batched pandas UDFs at
the tier sink, never per-row in the hot relational path.
"""

from __future__ import annotations

import struct

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "cur", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.cur = (self.cur << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.cur >> self.nbits) & 0xFF)
        self.cur &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.cur << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


# delta-of-delta buckets after the Gorilla paper §4.1.1, with clean
# two's-complement payloads (the paper's asymmetric ranges assume offset
# encoding; symmetric ranges keep encode/decode trivially inverse)
_DOD_RANGES = (
    (0b10, 7, -64, 63),
    (0b110, 9, -256, 255),
    (0b1110, 12, -2048, 2047),
)


def encode_block(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel (int64 seconds, float64) arrays into one block.

    Header: n (uint32) | t0 (int64) | first delta (int64) | v0 raw bits.
    """
    ts = np.asarray(timestamps, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    if n == 0:
        return struct.pack(">I", 0)
    head = struct.pack(">Iq", n, int(ts[0]))
    w = _BitWriter()
    prev_delta = 0
    if n > 1:
        prev_delta = int(ts[1] - ts[0])
    head += struct.pack(">q", prev_delta)
    bits = vals.view(np.uint64)
    head += struct.pack(">Q", int(bits[0]))

    prev_bits = int(bits[0])
    prev_leading, prev_trailing = 65, 0   # invalid marker per paper
    prev_ts = int(ts[0]) + prev_delta if n > 1 else int(ts[0])

    for i in range(1, n):
        # --- timestamp: delta-of-delta ---
        if i >= 2:
            delta = int(ts[i] - ts[i - 1])
            dod = delta - prev_delta
            prev_delta = delta
            if dod == 0:
                w.write(0, 1)
            else:
                for prefix, nbits, lo, hi in _DOD_RANGES:
                    if lo <= dod <= hi:
                        w.write(prefix, prefix.bit_length())
                        w.write(dod & ((1 << nbits) - 1), nbits)
                        break
                else:
                    w.write(0b1111, 4)
                    w.write(dod & ((1 << 64) - 1), 64)
        # --- value: XOR ---
        cur = int(bits[i])
        xor = cur ^ prev_bits
        prev_bits = cur
        if xor == 0:
            w.write(0, 1)
            continue
        leading = 64 - xor.bit_length()
        trailing = (xor & -xor).bit_length() - 1
        leading = min(leading, 31)
        if prev_leading <= leading and trailing >= prev_trailing and prev_leading != 65:
            # control '10': reuse previous window
            w.write(0b10, 2)
            mbits = 64 - prev_leading - prev_trailing
            w.write(xor >> prev_trailing, mbits)
        else:
            # control '11': new window
            w.write(0b11, 2)
            mbits = 64 - leading - trailing
            w.write(leading, 5)
            w.write(mbits - 1, 6)   # store meaningful-1 so 64 fits in 6 bits
            w.write(xor >> trailing, mbits)
            prev_leading, prev_trailing = leading, trailing
    return head + w.getvalue()


def decode_block(block: bytes):
    """Exact inverse of encode_block -> (int64 ts, float64 values)."""
    (n,) = struct.unpack_from(">I", block, 0)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    t0, first_delta, v0bits = struct.unpack_from(">qqQ", block, 4)
    ts = np.empty(n, dtype=np.int64)
    vals_bits = np.empty(n, dtype=np.uint64)
    ts[0] = t0
    vals_bits[0] = v0bits
    if n == 1:
        return ts, vals_bits.view(np.float64)
    ts[1] = t0 + first_delta
    r = _BitReader(block[28:])
    prev_delta = first_delta
    prev_bits = v0bits
    prev_leading, prev_trailing = 0, 0

    for i in range(1, n):
        if i >= 2:
            if r.read(1) == 0:
                dod = 0
            else:
                if r.read(1) == 0:
                    nbits = 7
                elif r.read(1) == 0:
                    nbits = 9
                elif r.read(1) == 0:
                    nbits = 12
                else:
                    nbits = 64
                raw = r.read(nbits)
                if raw >= (1 << (nbits - 1)):
                    raw -= 1 << nbits
                dod = raw
            prev_delta += dod
            ts[i] = ts[i - 1] + prev_delta
        if r.read(1) == 0:
            vals_bits[i] = prev_bits
            continue
        if r.read(1) == 0:      # '10' reuse window
            mbits = 64 - prev_leading - prev_trailing
            xor = r.read(mbits) << prev_trailing
        else:                    # '11' new window
            prev_leading = r.read(5)
            mbits = r.read(6) + 1
            prev_trailing = 64 - prev_leading - mbits
            xor = r.read(mbits) << prev_trailing
        prev_bits = int(prev_bits) ^ xor
        vals_bits[i] = prev_bits
    return ts, vals_bits.view(np.float64)
