"""Gorilla time-series block codec: delta-of-delta timestamps + XOR
floats (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time
Series Database", VLDB 2015 §4.1). Public-paper semantics; no reference
analog (the reference stores GeoTIFF/npy) — this is the graft's tier
payload encoding mandated by BASELINE.json.

Encodes one key's tier series (int64 epoch seconds + float64 values,
NaN allowed) into a bytes block; decode is the exact inverse. Pure
python/numpy bit-twiddling — runs inside Arrow-batched pandas UDFs at
the tier sink, never per-row in the hot relational path. Both codec
halves have lane-parallel batch entries (``encode_blocks`` /
``decode_blocks``) that amortise numpy call overhead across every
block in an Arrow batch — the per-block functions remain as the
reference implementations the batch paths are bit-equal to.
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
        """Windowed field read: one ≤9-byte slice + int.from_bytes per
        field instead of a Python loop per BIT (~15x decode). Raises
        on underrun — a silently-short slice would otherwise decode a
        truncated/corrupt block into plausible-looking garbage."""
        pos = self.pos
        end = (pos + bits + 7) >> 3
        if end > len(self.data):
            raise ValueError(
                f"gorilla block truncated: need {end} bytes, "
                f"have {len(self.data)}")
        chunk = int.from_bytes(self.data[pos >> 3:end], "big")
        self.pos = pos + bits
        return (chunk >> (end * 8 - pos - bits)) & ((1 << bits) - 1)

    def read1(self) -> int:
        """Single control bit — no slicing."""
        pos = self.pos
        self.pos = pos + 1
        return (self.data[pos >> 3] >> (7 - (pos & 7))) & 1


# delta-of-delta buckets after the Gorilla paper §4.1.1, with clean
# two's-complement payloads (the paper's asymmetric ranges assume offset
# encoding; symmetric ranges keep encode/decode trivially inverse)
_DOD_RANGES = (
    (0b10, 7, -64, 63),
    (0b110, 9, -256, 255),
    (0b1110, 12, -2048, 2047),
)


def _clz_ctz64(x: np.ndarray):
    """(leading, trailing) zero counts of a uint64 vector, EXACTLY.

    bit_length comes from float64 exponents without ever rounding: the
    two 32-bit halves are each exactly representable in float64, so
    ``frexp`` returns the true bit length of whichever half leads (a
    direct float64 conversion of the full 64-bit value would round
    near 2^k boundaries and overstate bit_length by one). The trailing
    count isolates the lowest set bit with ``x & -x`` — a power of two
    up to 2^63, again exact in float64. Zero inputs yield (64, 64)."""
    xu = np.ascontiguousarray(x, dtype=np.uint64)
    hi = (xu >> np.uint64(32)).astype(np.float64)
    lo = (xu & np.uint64(0xFFFFFFFF)).astype(np.float64)
    e_hi = np.frexp(hi)[1]
    e_lo = np.frexp(lo)[1]
    bitlen = np.where(hi > 0, e_hi + 32, e_lo)
    lsb = (xu & (~xu + np.uint64(1))).astype(np.float64)
    e_lsb = np.frexp(lsb)[1]
    lead = (64 - bitlen).astype(np.int64)
    trail = np.where(xu == 0, 64, e_lsb - 1).astype(np.int64)
    return lead, trail


_WIDTH_MASK = np.array([(1 << i) - 1 for i in range(65)], dtype=object
                       ).astype(np.uint64)


def _pack_tokens(tok_vals, tok_widths) -> bytes:
    """Vectorized MSB-first bit packing of (value, width ≤ 64) tokens —
    the _BitWriter's output, computed by word-aligned OR-scatter.
    Width-0 tokens emit nothing.

    Each token lands in at most two aligned 64-bit words (its start
    offset is < 64 within a word, width ≤ 64): the in-word part is
    OR-reduced per word with ``bitwise_or.reduceat`` (token starts are
    monotonic, so same-word tokens are contiguous) and the spill into
    the next word ORs in with ``bitwise_or.at``. Total memory traffic
    is ~16 bytes per token — the naive expand-every-bit-to-a-byte
    approach moves ~60x more and was fault-bound on this microVM."""
    v_all = np.ascontiguousarray(tok_vals, dtype=np.uint64)
    w_all = np.ascontiguousarray(tok_widths, dtype=np.int64)
    keep = w_all > 0
    if not keep.all():
        v_all, w_all = v_all[keep], w_all[keep]
    if len(w_all) == 0:
        return b""
    cum = np.cumsum(w_all)
    total = int(cum[-1])
    starts = cum - w_all                      # global bit start per token
    out = _scatter_pack(v_all, w_all, starts, (total + 63) // 64)
    nbytes = (total + 7) // 8
    return out[:nbytes]


def _scatter_pack(v_all, w_all, starts, nwords) -> bytes:
    """Word-aligned OR-scatter core shared by ``_pack_tokens`` (one
    contiguous bitstream) and ``encode_blocks`` (many word-aligned
    block bitstreams): tokens (value, width ≤ 64) land at
    caller-provided monotonic bit ``starts``; returns nwords * 8 bytes
    of explicitly big-endian output (see _clz_ctz64 endianness note).
    Total memory traffic ~16 bytes/token — the expand-every-bit
    approach moves ~60x more and was fault-bound on this microVM."""
    if nwords == 0:
        return b""
    keep = w_all > 0
    if not keep.all():
        v_all, w_all, starts = v_all[keep], w_all[keep], starts[keep]
    if len(w_all) == 0:
        return bytes(nwords * 8)
    # mask values to their width (write() semantics) via one LUT gather
    wu = w_all.astype(np.uint64)
    v = v_all & _WIDTH_MASK[w_all]
    word = starts >> 6
    off = (starts & 63).astype(np.uint64)
    end = off + wu
    fits = end <= np.uint64(64)
    sh_hi = np.where(fits, np.uint64(64) - end, np.uint64(0))
    sh_hi2 = np.where(fits, np.uint64(0), end - np.uint64(64))
    hi = np.where(fits, v << sh_hi, v >> sh_hi2)
    out = np.zeros(nwords, dtype=np.uint64)
    seg = np.concatenate(([0], np.flatnonzero(np.diff(word)) + 1))
    out[word[seg]] = np.bitwise_or.reduceat(hi, seg)
    spill = np.flatnonzero(~fits)
    if len(spill):
        sh_lo = np.uint64(128) - end[spill]   # in [1, 63]
        np.bitwise_or.at(out, word[spill] + 1, v[spill] << sh_lo)
    # big-endian output in ONE copy (tobytes) instead of two
    # (astype('>u8') + tobytes): swap in place on a little-endian
    # host, no-op on a big-endian one where native already IS '>u8'
    if np.little_endian:
        out.byteswap(inplace=True)
    return out.tobytes()


def encode_block(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel (int64 seconds, float64) arrays into one block.

    Header: n (uint32) | t0 (int64) | first delta (int64) | v0 raw bits.

    Fully vectorized encoder. The one policy difference from the
    per-point reference encoder (``_encode_block_scalar``): instead of
    the paper's greedy per-value window adaptation, the XOR window is
    BLOCK-STATIC — one '11' control opens the window
    (min leading, min trailing over the block's nonzero XORs) and every
    later nonzero XOR reuses it via '10', which is always valid because
    the block minima cover each value by construction. The bitstream
    stays fully Gorilla-decodable (``decode_block`` inverts both
    encoders); compression is within a few percent on tier-shaped data
    (asserted in tests) and encode throughput is ~10x the per-point
    loop. Every token is emitted arraywise (interleaved 4-slot layout,
    width-0 slots drop out in packing); no per-point Python runs."""
    ts = np.asarray(timestamps, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    if n == 0:
        return struct.pack(">I", 0)
    head = struct.pack(">Iq", n, int(ts[0]))
    prev_delta = 0
    if n > 1:
        prev_delta = int(ts[1] - ts[0])
    head += struct.pack(">q", prev_delta)
    bits = vals.view(np.uint64)
    head += struct.pack(">Q", int(bits[0]))
    if n == 1:
        return head

    m = n - 1                                     # encoded points
    u1 = np.uint64(1)

    # ---- timestamp slots (A: control+small payload, B: 64-bit payload)
    slot_a_v = np.zeros(m, dtype=np.uint64)
    slot_a_w = np.zeros(m, dtype=np.int64)
    slot_b_v = np.zeros(m, dtype=np.uint64)
    slot_b_w = np.zeros(m, dtype=np.int64)
    if n > 2:
        d = np.diff(ts)
        dod = d[1:] - d[:-1]
        du = dod.astype(np.uint64)
        c0 = dod == 0
        c1 = (dod >= -64) & (dod <= 63) & ~c0
        c2 = (dod >= -256) & (dod <= 255) & ~c0 & ~c1
        c3 = (dod >= -2048) & (dod <= 2047) & ~(c0 | c1 | c2)
        c4 = ~(c0 | c1 | c2 | c3)
        av = np.select(
            [c0, c1, c2, c3],
            [np.uint64(0),
             (np.uint64(0b10) << np.uint64(7)) | (du & np.uint64(0x7F)),
             (np.uint64(0b110) << np.uint64(9)) | (du & np.uint64(0x1FF)),
             (np.uint64(0b1110) << np.uint64(12)) | (du & np.uint64(0xFFF))],
            default=np.uint64(0b1111))
        aw = np.select([c0, c1, c2, c3], [1, 9, 12, 16], default=4)
        slot_a_v[1:] = av
        slot_a_w[1:] = aw
        slot_b_v[1:] = np.where(c4, du, np.uint64(0))
        slot_b_w[1:] = np.where(c4, 64, 0)

    # ---- value slots (C: control [+ window header], D: payload)
    xors = bits[1:] ^ bits[:-1]
    nz = xors != np.uint64(0)
    slot_c_v = np.zeros(m, dtype=np.uint64)       # '0' for xor == 0
    slot_c_w = np.ones(m, dtype=np.int64)
    slot_d_v = np.zeros(m, dtype=np.uint64)
    slot_d_w = np.zeros(m, dtype=np.int64)
    if nz.any():
        lead, trail = _clz_ctz64(xors)
        lz = int(min(np.min(lead[nz]), 31))
        tz = int(np.min(trail[nz]))
        mbits = 64 - lz - tz
        slot_c_v[nz] = np.uint64(0b10)
        slot_c_w[nz] = 2
        first = int(np.flatnonzero(nz)[0])
        slot_c_v[first] = np.uint64(
            (0b11 << 11) | (lz << 6) | (mbits - 1))
        slot_c_w[first] = 13
        slot_d_v[nz] = xors[nz] >> np.uint64(tz)
        slot_d_w[nz] = mbits

    tv = np.stack([slot_a_v, slot_b_v, slot_c_v, slot_d_v], 1).ravel()
    tw = np.stack([slot_a_w, slot_b_w, slot_c_w, slot_d_w], 1).ravel()
    return head + _pack_tokens(tv, tw)


def encode_blocks(series) -> list:
    """Lane-parallel batch encoder — the encode twin of
    ``decode_blocks``: encode MANY (int64-seconds, float64-values)
    series with a numpy op count independent of the number of blocks.
    Per-series output is byte-identical to ``encode_block``
    (asserted in tests/test_gorilla.py).

    ``encode_block`` is fully vectorized WITHIN a block, but tier
    blocks are small (tens of points per url), so per-block numpy call
    overhead dominates when a grouped batch holds tens of thousands of
    urls (~30 array ops x 25k blocks). Here all series are
    concatenated flat; per-block state (header fields, the
    block-static XOR window, the first-nonzero-XOR position) is
    computed segment-wise with ``reduceat``, and every block's tokens
    are packed into ONE bitstream in which each block starts at a
    64-bit word boundary, then sliced back out per block. Unlike the
    padded-lane decoder there is NO padding anywhere (flat layout), so
    hot-url skew costs nothing beyond its own points."""
    B = len(series)
    if B == 0:
        return []
    counts = np.fromiter((len(t) for t, _ in series), dtype=np.int64,
                         count=B)
    if int(counts.sum()) == 0:
        return [struct.pack(">I", 0)] * B
    ts = np.concatenate([np.asarray(t, dtype=np.int64) for t, _ in series])
    vals = np.concatenate([np.asarray(v, dtype=np.float64)
                           for _, v in series])
    return encode_blocks_flat(ts, vals, counts)


CHUNK_POINTS = 1 << 17


def encode_blocks_flat(ts: np.ndarray, vals: np.ndarray,
                       counts: np.ndarray) -> list:
    """``encode_blocks`` over already-concatenated arrays: ``counts``
    gives consecutive block lengths (each block's points must be
    time-sorted). This is the zero-copy entry the tier sink uses — one
    lexsort of the whole Arrow batch replaces 25k per-url slices.

    Work is chunked to ~CHUNK_POINTS points so every temporary stays a
    few MB: this microVM's first-touch page faults make fresh
    multi-10MB allocations pathologically slow (collapses to ~2k
    pages/s under memory pressure), while few-MB temporaries recycle
    heap pages across chunks. Chunk boundaries fall between blocks, so
    output bytes are unaffected."""
    counts = np.asarray(counts, dtype=np.int64)
    if int(counts.sum()) > CHUNK_POINTS and len(counts) > 1:
        bounds = np.searchsorted(np.cumsum(counts),
                                 np.arange(CHUNK_POINTS,
                                           int(counts.sum()),
                                           CHUNK_POINTS), side="left") + 1
        out = []
        prev_b = prev_p = 0
        pt_offs = np.concatenate(([0], np.cumsum(counts)))
        for b in list(bounds) + [len(counts)]:
            if b <= prev_b:
                continue
            p = int(pt_offs[b])
            out.extend(_encode_blocks_core(ts[prev_p:p], vals[prev_p:p],
                                           counts[prev_b:b]))
            prev_b, prev_p = b, p
        return out
    return _encode_blocks_core(ts, vals, counts)


def _encode_blocks_core(ts: np.ndarray, vals: np.ndarray,
                        counts: np.ndarray) -> list:
    B = len(counts)
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return [struct.pack(">I", 0)] * B
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    bits = vals.view(np.uint64)
    offs = np.concatenate(([0], np.cumsum(counts)))

    # ---- headers (n, t0, first delta, v0 bits): emitted as ordinary
    #      MSB-first tokens (32 + 3x64 bits, or just the 32-bit n for
    #      empty blocks) at the FRONT of each block's token run, so the
    #      whole block — header and payload — comes out of ONE
    #      _scatter_pack and the per-block result is a single slice of
    #      one buffer; byte-identical to the struct.pack layout because
    #      both are big-endian and the header is byte-aligned
    start_idx = np.minimum(offs[:-1], total - 1)   # safe for n==0 blocks
    t0 = np.where(counts > 0, ts[start_idx], 0)
    second = np.minimum(offs[:-1] + 1, total - 1)
    pdelta = np.where(counts > 1, ts[second] - t0, 0)
    v0 = np.where(counts > 0, bits[start_idx], np.uint64(0))

    # ---- encoded points: within-block position k >= 1, flat order
    k_pos = np.arange(total) - np.repeat(offs[:-1], counts)
    enc = np.flatnonzero(k_pos >= 1)
    m_total = len(enc)
    enc_counts = np.maximum(counts - 1, 0)
    enc_offs = np.concatenate(([0], np.cumsum(enc_counts)))

    d_full = np.empty(total, np.int64)
    d_full[0] = 0
    d_full[1:] = ts[1:] - ts[:-1]          # only k>=1 entries are used
    xor_full = np.empty(total, np.uint64)
    xor_full[0] = 0
    xor_full[1:] = bits[1:] ^ bits[:-1]

    # ---- timestamp slots (A: control+small payload, B: 64-bit payload)
    k_enc = k_pos[enc]
    has_dod = k_enc >= 2                   # k==1's delta is in the header
    slot_a_v = np.zeros(m_total, np.uint64)
    slot_a_w = np.zeros(m_total, np.int64)
    slot_b_v = np.zeros(m_total, np.uint64)
    slot_b_w = np.zeros(m_total, np.int64)
    if has_dod.any():
        p = enc[has_dod]
        dod = d_full[p] - d_full[p - 1]
        du = dod.astype(np.uint64)
        c0 = dod == 0
        c1 = (dod >= -64) & (dod <= 63) & ~c0
        c2 = (dod >= -256) & (dod <= 255) & ~c0 & ~c1
        c3 = (dod >= -2048) & (dod <= 2047) & ~(c0 | c1 | c2)
        c4 = ~(c0 | c1 | c2 | c3)
        slot_a_v[has_dod] = np.select(
            [c0, c1, c2, c3],
            [np.uint64(0),
             (np.uint64(0b10) << np.uint64(7)) | (du & np.uint64(0x7F)),
             (np.uint64(0b110) << np.uint64(9)) | (du & np.uint64(0x1FF)),
             (np.uint64(0b1110) << np.uint64(12)) | (du & np.uint64(0xFFF))],
            default=np.uint64(0b1111))
        slot_a_w[has_dod] = np.select([c0, c1, c2, c3], [1, 9, 12, 16],
                                      default=4)
        slot_b_v[has_dod] = np.where(c4, du, np.uint64(0))
        slot_b_w[has_dod] = np.where(c4, 64, 0)

    # ---- value slots: per-BLOCK static XOR window via segment minima
    xors = xor_full[enc]
    nz = xors != np.uint64(0)
    lead, trail = _clz_ctz64(xors)         # zero xor -> lead = trail = 64
    has_enc = enc_counts > 0
    starts_enc = enc_offs[:-1][has_enc]    # distinct: each block adds >= 1
    lzf = np.full(B, 64, np.int64)
    tzf = np.full(B, 64, np.int64)
    firstf = np.full(B, m_total, np.int64)
    lzf[has_enc] = np.minimum.reduceat(np.where(nz, lead, 64), starts_enc)
    tzf[has_enc] = np.minimum.reduceat(np.where(nz, trail, 64), starts_enc)
    firstf[has_enc] = np.minimum.reduceat(
        np.where(nz, np.arange(m_total), m_total), starts_enc)
    nz_any_b = lzf < 64                    # all-zero-xor blocks: no window
    lz_b = np.minimum(lzf, 31)             # 5-bit header field
    mbits_b = np.where(nz_any_b, 64 - lz_b - tzf, 0)
    blk_enc = np.repeat(np.arange(B), enc_counts)

    slot_c_v = np.zeros(m_total, np.uint64)
    slot_c_w = np.ones(m_total, np.int64)  # '0' for xor == 0
    slot_d_v = np.zeros(m_total, np.uint64)
    slot_d_w = np.zeros(m_total, np.int64)
    slot_c_v[nz] = np.uint64(0b10)
    slot_c_w[nz] = 2
    first_pts = firstf[nz_any_b]           # one window header per block
    slot_c_v[first_pts] = ((np.uint64(0b11) << np.uint64(11))
                           | (lz_b[nz_any_b].astype(np.uint64)
                              << np.uint64(6))
                           | (mbits_b[nz_any_b] - 1).astype(np.uint64))
    slot_c_w[first_pts] = 13
    slot_d_v[nz] = xors[nz] >> tzf[blk_enc].astype(np.uint64)[nz]
    slot_d_w[nz] = mbits_b[blk_enc][nz]

    # ---- token fusion: a point's A|B|C|D tokens are consecutive bits,
    #      so whenever their total width fits 64 (the typical point:
    #      small dod control + value control + mantissa) they collapse
    #      into ONE token with identical bits — ~3x fewer live tokens
    #      through _scatter_pack. B is 0 or 64 wide, so a fitting
    #      point never has a B payload and the fused value is just
    #      A || C || D. Non-fitting points keep the 4-slot layout.
    wsum = slot_a_w + slot_b_w + slot_c_w + slot_d_w
    fit = wsum <= 64
    dw_sh = np.minimum(slot_d_w, 63).astype(np.uint64)
    cd = (slot_c_v << dw_sh) | slot_d_v
    acd_sh = np.minimum(slot_c_w + slot_d_w, 63).astype(np.uint64)
    acd = (slot_a_v << acd_sh) | cd      # a_v == 0 whenever shift clips
    slot_a_v = np.where(fit, acd, slot_a_v)
    slot_a_w = np.where(fit, wsum, slot_a_w)
    slot_c_w = np.where(fit, 0, slot_c_w)
    slot_d_w = np.where(fit, 0, slot_d_w)

    # ---- one pack for ALL blocks, headers included: each block's
    #      token region starts at a fresh 64-bit word, so the per-block
    #      result is a single slice of one buffer — exactly the bytes
    #      encode_block would have emitted
    n_tok = 4 * B + 4 * m_total
    tv = np.zeros(n_tok, np.uint64)
    tw = np.zeros(n_tok, np.int64)
    hdr_base = 4 * np.arange(B) + 4 * enc_offs[:-1]
    w64 = np.where(counts > 0, 64, 0)
    tv[hdr_base] = counts.astype(np.uint64)
    tw[hdr_base] = 32
    tv[hdr_base + 1] = t0.view(np.uint64)
    tw[hdr_base + 1] = w64
    tv[hdr_base + 2] = pdelta.view(np.uint64)
    tw[hdr_base + 2] = w64
    tv[hdr_base + 3] = v0
    tw[hdr_base + 3] = w64
    if m_total:
        pt = 4 * np.arange(m_total) + 4 * (blk_enc + 1)
        tv[pt] = slot_a_v
        tw[pt] = slot_a_w
        tv[pt + 1] = slot_b_v
        tw[pt + 1] = slot_b_w
        tv[pt + 2] = slot_c_v
        tw[pt + 2] = slot_c_w
        tv[pt + 3] = slot_d_v
        tw[pt + 3] = slot_d_w
    tok_counts = 4 + 4 * enc_counts
    L_b = np.add.reduceat(tw, hdr_base)        # bits/block incl header
    word_start = np.concatenate(([0], np.cumsum((L_b + 63) // 64)))
    contig = np.concatenate(([0], np.cumsum(L_b)))[:-1]
    within = (np.cumsum(tw) - tw) - np.repeat(contig, tok_counts)
    gstart = np.repeat(word_start[:-1] * 64, tok_counts) + within
    packed = _scatter_pack(tv, tw, gstart, int(word_start[-1]))
    ws8 = (word_start[:-1] * 8).tolist()
    tb = ((L_b + 7) // 8).tolist()
    return [packed[a:a + l] for a, l in zip(ws8, tb)]


def _encode_block_scalar(timestamps: np.ndarray,
                         values: np.ndarray) -> bytes:
    """The original per-point bit-twiddling encoder, kept as the
    byte-exactness reference for the vectorized path (and the
    microbench baseline in scripts/bench_gorilla.py)."""
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


def decode_blocks(blocks):
    """Lane-parallel batch decode: [(int64 ts, float64 vals)] per block.

    ``decode_block``'s per-point Python loop caps at ~0.4M pts/s; the
    batch path transposes the loop — one numpy "step" advances EVERY
    block (lane) by one point, so the Python/numpy call overhead per
    step is amortised over all lanes. All control-bit resolution is
    branchless (masked selects over gathered bytes); per-lane XOR
    window state lives in arrays. Identical bitstream semantics to
    ``decode_block`` (asserted in tests across both encoders); final
    per-lane cursor bounds are validated so truncated blocks still
    fail loudly. Worth it from a handful of lanes up (the tier decode
    path feeds hundreds of url blocks per Arrow batch).

    The outputs are padded (lanes x longest-block) arrays, so one hot
    url among thousands of small blocks would explode both memory and
    wasted step-work; lanes are therefore chunked into size-homogeneous
    groups (size ratio <= 4x once a group has 64 lanes — below that the
    per-step amortization is worth more than the padding, which the
    MAX_CELLS budget still bounds) and decoded group-by-group, so skew
    costs little beyond its own points.
    """
    nlanes = len(blocks)
    if nlanes == 0:
        return []
    heads = [struct.unpack_from(">I", b, 0)[0] for b in blocks]
    n_all = np.array(heads, dtype=np.int64)
    order = np.argsort(-n_all, kind="stable")
    out_all = [None] * nlanes
    MAX_CELLS = 32 * 1024 * 1024        # 512 MB of padded output per chunk
    i = 0
    while i < nlanes:
        m0 = max(int(n_all[order[i]]), 1)
        j = i + 1
        while j < nlanes and (n_all[order[j]] * 4 >= m0 or j - i < 64) \
                and (j - i + 1) * m0 <= MAX_CELLS:
            j += 1
        idx = order[i:j]
        sub = _decode_lane_group([blocks[k] for k in idx])
        for k, r in zip(idx, sub):
            out_all[k] = r
        i = j
    return out_all


def _decode_lane_group(blocks):
    """One size-homogeneous lane group (see decode_blocks)."""
    nlanes = len(blocks)
    heads = [struct.unpack_from(">I", b, 0)[0] for b in blocks]
    n = np.array(heads, dtype=np.int64)
    max_n = int(n.max(initial=0))
    out = [None] * nlanes
    t0 = np.zeros(nlanes, dtype=np.int64)
    fdelta = np.zeros(nlanes, dtype=np.int64)
    v0bits = np.zeros(nlanes, dtype=np.uint64)
    plen = np.zeros(nlanes, dtype=np.int64)       # payload bytes per lane
    base = np.zeros(nlanes, dtype=np.int64)       # payload start bit
    chunks, off = [], 0
    for l, b in enumerate(blocks):
        if n[l] == 0:
            continue
        a, c, d = struct.unpack_from(">qqQ", b, 4)
        t0[l], fdelta[l], v0bits[l] = a, c, np.uint64(d)
        payload = b[28:]
        plen[l] = len(payload)
        base[l] = off * 8
        chunks.append(payload)
        off += len(payload)
    data = np.frombuffer(b"".join(chunks) + b"\x00" * 16, dtype=np.uint8)
    total_bits = np.int64((len(data) - 16) * 8)

    ts_out = np.zeros((nlanes, max(max_n, 1)), dtype=np.int64)
    vb_out = np.zeros((nlanes, max(max_n, 1)), dtype=np.uint64)
    ts_out[:, 0] = t0
    vb_out[:, 0] = v0bits
    if max_n > 1:
        ts_out[:, 1] = t0 + fdelta

    pos = base.copy()                              # absolute bit cursor
    prev_delta = fdelta.copy()
    prev_bits = v0bits.copy()
    lead = np.zeros(nlanes, dtype=np.int64)
    trail = np.zeros(nlanes, dtype=np.int64)
    u64 = np.uint64
    # dod-bucket LUTs on the token's top 4 bits: payload width + ctrl width
    _NB16 = np.array([0] * 8 + [7] * 4 + [9] * 2 + [12, 64], dtype=np.int64)
    _CW16 = np.array([1] * 8 + [2] * 4 + [3] * 2 + [4, 4], dtype=np.int64)
    # one-time per batch: big-endian uint64 at EVERY byte offset (8x the
    # payload in memory, bounded by the Arrow batch size) — turns each
    # 64-bit peek into one word gather + one byte gather
    _sw = np.lib.stride_tricks.sliding_window_view(data, 8)
    _W64 = np.ascontiguousarray(_sw).view(">u8").ravel().astype(np.uint64)

    def peek64(q):
        """The 64 bits starting at bit q, per lane (the hot primitive:
        one precomputed-word gather, one spill-byte gather)."""
        q = np.minimum(q, total_bits + 63)
        byte = q >> 3
        sh = (q & 7).astype(np.uint64)
        hi = _W64[byte]
        b8 = data[byte + 8].astype(np.uint64)
        return np.where(sh > 0, (hi << sh) | (b8 >> (u64(8) - sh)), hi)

    # Retired lanes (i >= n) keep "decoding": their reads are clamped
    # in-bounds, their outputs land in padding columns that get sliced
    # away, and their true end-of-stream cursor is snapshotted into
    # final_pos the step they retire — cheaper than masking every
    # update with an activity test. (Each lane with n points runs
    # steps 1..n-1, so it retires after the step where i == n-1.)
    final_pos = base.copy()
    for i in range(1, max_n):
        if i >= 2:
            # --- timestamp delta-of-delta token ---
            pk = peek64(pos)
            top4 = (pk >> u64(60)).astype(np.int64)
            nb = _NB16[top4]
            cw = _CW16[top4]
            # payload bits [cw, cw+nb) — in-window for nb <= 12
            sh_small = (u64(64) - (cw + np.minimum(nb, 12))
                        .astype(np.uint64))
            raw = (pk >> sh_small) & _WIDTH_MASK[np.minimum(nb, 12)]
            full = nb == 64
            if full.any():             # '1111' + 64-bit payload (rare)
                raw = raw.copy()
                raw[full] = peek64(pos[full] + 4)
            small = raw.astype(np.int64)
            nbs = np.minimum(np.maximum(nb, 1), 63)  # no 64-bit-shift UB
            small_dod = small - (((small >> (nbs - 1)) & 1) << nbs)
            dod = np.select([nb == 0, full],
                            [np.int64(0), raw.view(np.int64)],
                            default=small_dod)
            prev_delta = prev_delta + dod
            ts_out[:, i] = ts_out[:, i - 1] + prev_delta
            pos = pos + cw + nb
        # --- value XOR token ---
        pk = peek64(pos)
        c0 = (pk >> u64(63)).astype(np.int64)
        c1 = ((pk >> u64(62)) & u64(1)).astype(np.int64)
        nz = c0 == 1
        neww = nz & (c1 == 1)
        if neww.any():                 # '11' window header (rare)
            hdr = ((pk[neww] >> u64(51)) & u64(0x7FF)).astype(np.int64)
            nl = hdr >> 6
            nm = (hdr & 0x3F) + 1
            lead[neww] = nl
            # clip guards corrupt lead+mbits > 64 from shift UB; wrong
            # values then surface via the final cursor bounds check
            trail[neww] = np.clip(64 - nl - nm, 0, 63)
        m = np.where(nz, 64 - lead - trail, 0)
        payload_off = np.where(neww, 13, 2)
        # payload bits [off, off+m) — in-window while off+m <= 64
        inwin = np.minimum(m, 64 - payload_off)
        shp = (u64(64) - (payload_off + inwin).astype(np.uint64))
        val = (pk >> np.minimum(shp, u64(63))) & _WIDTH_MASK[inwin]
        over = nz & (payload_off + m > 64)
        if over.any():                 # payload spills past this peek:
            val = val.copy()           # one more peek AT the payload
            w = m[over].astype(np.uint64)   # start covers any w <= 64
            val[over] = peek64(pos[over] + payload_off[over]) \
                >> (u64(64) - w)
        xor = np.where(nz, val << trail.astype(np.uint64), u64(0))
        prev_bits = prev_bits ^ xor
        vb_out[:, i] = prev_bits
        pos = pos + np.where(c0 == 0, 1,
                             np.where(c1 == 0, 2 + m, 13 + m))
        retired = n == i + 1
        final_pos = np.where(retired, pos, final_pos)

    used = final_pos - base
    bad = np.flatnonzero((n > 1) & ((used + 7) // 8 > plen))
    if len(bad):
        l = int(bad[0])
        raise ValueError(
            f"gorilla block truncated: lane {l} needs "
            f"{int((used[l] + 7) // 8)} bytes, have {int(plen[l])}")
    for l in range(nlanes):
        k = int(n[l])
        if k == 0:
            out[l] = (np.empty(0, dtype=np.int64),
                      np.empty(0, dtype=np.float64))
        else:
            out[l] = (ts_out[l, :k].copy(),
                      vb_out[l, :k].copy().view(np.float64))
    return out


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

    read1, read = r.read1, r.read
    for i in range(1, n):
        if i >= 2:
            if read1() == 0:
                dod = 0
            else:
                if read1() == 0:
                    nbits = 7
                elif read1() == 0:
                    nbits = 9
                elif read1() == 0:
                    nbits = 12
                else:
                    nbits = 64
                raw = read(nbits)
                if raw >= (1 << (nbits - 1)):
                    raw -= 1 << nbits
                dod = raw
            prev_delta += dod
            ts[i] = ts[i - 1] + prev_delta
        if read1() == 0:
            vals_bits[i] = prev_bits
            continue
        if read1() == 0:        # '10' reuse window
            mbits = 64 - prev_leading - prev_trailing
            xor = read(mbits) << prev_trailing
        else:                    # '11' new window
            prev_leading = read(5)
            mbits = read(6) + 1
            prev_trailing = 64 - prev_leading - mbits
            xor = read(mbits) << prev_trailing
        prev_bits = int(prev_bits) ^ xor
        vals_bits[i] = prev_bits
    return ts, vals_bits.view(np.float64)
