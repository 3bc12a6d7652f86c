"""Gorilla-style codecs (Pelkonen et al., VLDB 2015 §4.1/§4.2), numpy.

- Timestamps: delta-of-delta with the paper's bucket ladder
  ('0' | '10'+7b | '110'+9b | '1110'+12b | '11110'+64b). The final
  bucket is widened from the paper's 32 bits to 64 so arbitrary
  microsecond jumps (conversation restarts) round-trip exactly.
- Values: XOR with the previous float; '0' for identical bits, else
  '1' + 5-bit leading-zero count + 6-bit meaningful-bit length +
  meaningful bits. This is the paper's scheme with the
  previous-window-reuse branch ('10') intentionally dropped: the
  window-reuse decision is a sequential dependency that defeats
  vectorization, and correctness (bitwise roundtrip — the per-row
  invariant, BASELINE.json input_hint) is unaffected; compression
  ratio gives up a few percent on slowly-varying series. Documented
  divergence from the paper, not from the reference (which has no
  codec at all).

ENCODE is fully vectorized (token arrays → one bit-expansion →
np.packbits). DECODE walks the bitstream sequentially (variable-length
codes), which is off the hot path: the engine decodes only for
verification and point reads; scans at scale read the rollup tiers.

Bitwise roundtrip is asserted for every IEEE-754 payload including
±0.0, subnormals and NaN payloads (tests/test_codecs.py, hypothesis).
"""

from __future__ import annotations

import numpy as np

_TS_MAGIC_EMPTY = b""


def _pack_tokens(values: np.ndarray, widths: np.ndarray) -> bytes:
    """Concatenate big-endian bit tokens (values[i] in widths[i] bits)
    into bytes. Fully vectorized."""
    mask = widths > 0
    values = values[mask].astype(np.uint64)
    widths = widths[mask].astype(np.int64)
    total = int(widths.sum())
    if total == 0:
        return b""
    starts = np.cumsum(widths) - widths
    idx = np.repeat(np.arange(values.size), widths)
    j = np.arange(total) - np.repeat(starts, widths)
    shift = (widths[idx] - 1 - j).astype(np.uint64)
    bits = ((values[idx] >> shift) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


_M64 = (1 << 64) - 1


class _BitReader:
    """Word-level bitstream reader: the buffer is viewed as big-endian
    uint64 words (matching np.packbits MSB-first order) and every token
    is cut out of a 64-bit peek window with Python int shifts — ~20×
    faster than per-bit reads, which made decode the codec hot spot."""

    __slots__ = ("words", "pos")

    def __init__(self, buf: bytes):
        pad = (-len(buf)) % 8 + 16  # +2 spare words so peek64 never overruns
        self.words = np.frombuffer(buf + b"\x00" * pad, dtype=">u8").tolist()
        self.pos = 0

    def peek64(self) -> int:
        p = self.pos
        i = p >> 6
        off = p & 63
        w = self.words
        if off:
            return ((w[i] << off) | (w[i + 1] >> (64 - off))) & _M64
        return w[i]

    def skip(self, n: int) -> None:
        self.pos += n

    def read(self, n: int) -> int:
        v = self.peek64() >> (64 - n)
        self.pos += n
        return v

    def read1(self) -> int:
        v = (self.words[self.pos >> 6] >> (63 - (self.pos & 63))) & 1
        self.pos += 1
        return v


# ---------------------------------------------------------------------------
# delta-of-delta timestamps (µs int64)
# ---------------------------------------------------------------------------

_DOD_BUCKETS = (  # (low, high, control, control_bits, payload_bits, bias)
    (-63, 64, 0b10, 2, 7, 63),
    (-255, 256, 0b110, 3, 9, 255),
    (-2047, 2048, 0b1110, 4, 12, 2047),
)


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    """int64 µs array (non-decreasing not required) → bytes.
    Layout: [n:uint32][t0:int64][d0:int64][dod bitstream for points 2..n-1].
    """
    ts = np.ascontiguousarray(ts_us, dtype=np.int64)
    n = ts.size
    header = np.empty(0, dtype=np.int64)
    out = [np.uint32(n).tobytes()]
    if n == 0:
        return out[0]
    out.append(ts[:1].tobytes())
    if n == 1:
        return b"".join(out)
    d = np.diff(ts)
    out.append(d[:1].tobytes())
    if n == 2:
        return b"".join(out)
    dod = np.diff(d)

    vals = np.zeros(dod.size, dtype=np.uint64)
    widths = np.zeros(dod.size, dtype=np.int64)
    # extra token slot for the 64-bit payload of the largest bucket
    vals2 = np.zeros(dod.size, dtype=np.uint64)
    widths2 = np.zeros(dod.size, dtype=np.int64)

    done = dod == 0
    vals[done] = 0b0
    widths[done] = 1
    for low, high, ctrl, cbits, pbits, bias in _DOD_BUCKETS:
        sel = (~done) & (dod >= low) & (dod <= high)
        vals[sel] = (np.uint64(ctrl) << np.uint64(pbits)) | (
            (dod[sel] + bias).astype(np.uint64))
        widths[sel] = cbits + pbits
        done |= sel
    big = ~done
    vals[big] = 0b11110
    widths[big] = 5
    vals2[big] = dod[big].astype(np.uint64)  # two's complement
    widths2[big] = 64

    inter_v = np.empty(dod.size * 2, dtype=np.uint64)
    inter_w = np.empty(dod.size * 2, dtype=np.int64)
    inter_v[0::2], inter_v[1::2] = vals, vals2
    inter_w[0::2], inter_w[1::2] = widths, widths2
    out.append(_pack_tokens(inter_v, inter_w))
    return b"".join(out)


def decode_timestamps(buf: bytes) -> np.ndarray:
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    t0 = int(np.frombuffer(buf[4:12], dtype=np.int64)[0])
    if n == 1:
        return np.array([t0], dtype=np.int64)
    d0 = int(np.frombuffer(buf[12:20], dtype=np.int64)[0])
    ts = np.empty(n, dtype=np.int64)
    ts[0] = t0
    # all arithmetic in Python ints with explicit two's-complement wrap:
    # np.int64 + 2**63 silently promotes to float64 under legacy numpy
    # promotion and corrupts the wraparound
    t = (t0 + d0 + 2**63) % 2**64 - 2**63
    ts[1] = t
    if n == 2:
        return ts
    r = _BitReader(buf[20:])
    d = int(d0)
    for i in range(2, n):
        # one 64-bit peek decodes control + payload of every bucket
        w = r.peek64()
        if w >> 63 == 0:
            dod = 0
            r.skip(1)
        elif (w >> 62) & 1 == 0:                    # '10' + 7 bits
            dod = ((w >> 55) & 0x7F) - 63
            r.skip(9)
        elif (w >> 61) & 1 == 0:                    # '110' + 9 bits
            dod = ((w >> 52) & 0x1FF) - 255
            r.skip(12)
        elif (w >> 60) & 1 == 0:                    # '1110' + 12 bits
            dod = ((w >> 48) & 0xFFF) - 2047
            r.skip(16)
        else:                                       # '11110' + 64 bits
            r.skip(5)
            raw = r.read(64)
            dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        # two's-complement wraparound, matching numpy int64 arithmetic
        # on the encode side (real µs timestamps never overflow; the
        # wrap only matters for adversarial property-test inputs)
        d = (d + dod + 2**63) % 2**64 - 2**63
        t = (t + d + 2**63) % 2**64 - 2**63
        ts[i] = t
    return ts


# ---------------------------------------------------------------------------
# XOR float values
# ---------------------------------------------------------------------------

def _clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 (vectorized); 64 for x == 0."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    # float64 mantissa can't represent all uint64 exactly → split hi/lo
    hi = (x[nz] >> np.uint64(32)).astype(np.uint32)
    lo = x[nz].astype(np.uint32)  # truncates to low 32
    hibits = np.zeros(hi.shape, dtype=np.int64)
    hi_nz = hi != 0
    hibits[hi_nz] = 31 - np.floor(np.log2(hi[hi_nz].astype(np.float64))).astype(np.int64)
    lobits = np.zeros(lo.shape, dtype=np.int64)
    lo_nz = lo != 0
    lobits[lo_nz] = 63 - np.floor(np.log2(lo[lo_nz].astype(np.float64))).astype(np.int64)
    out_nz = np.where(hi_nz, hibits, np.where(lo_nz, lobits, 64))
    out[nz] = out_nz
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of uint64 (vectorized); 64 for x == 0."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    low = x[nz] & (~x[nz] + np.uint64(1))  # isolate lowest set bit
    out[nz] = _clz64(low)[...]
    out[nz] = 63 - out[nz]
    return out


def encode_values(y: np.ndarray) -> bytes:
    """float64 array → bytes. Layout: [n:uint32][v0:64b][xor stream]."""
    v = np.ascontiguousarray(y, dtype=np.float64).view(np.uint64)
    n = v.size
    out = [np.uint32(n).tobytes()]
    if n == 0:
        return out[0]
    out.append(v[:1].tobytes())
    if n == 1:
        return b"".join(out)
    x = v[1:] ^ v[:-1]

    zero = x == 0
    lz = np.minimum(_clz64(x), 31)          # 5-bit field
    sig = 64 - lz - _ctz64(x)               # meaningful length
    sig = np.clip(sig, 1, 64)
    tz = 64 - lz - sig

    vals = np.empty(x.size * 2, dtype=np.uint64)
    widths = np.empty(x.size * 2, dtype=np.int64)
    # token A: control '0'  OR  '1' + 5b lz + 6b (sig mod 64)
    a = np.where(
        zero,
        np.uint64(0),
        (np.uint64(1) << np.uint64(11))
        | (lz.astype(np.uint64) << np.uint64(6))
        | (sig % 64).astype(np.uint64),
    )
    wa = np.where(zero, 1, 12)
    # token B: the meaningful bits
    b = np.where(zero, np.uint64(0), x >> tz.astype(np.uint64))
    wb = np.where(zero, 0, sig)
    vals[0::2], vals[1::2] = a, b
    widths[0::2], widths[1::2] = wa, wb
    out.append(_pack_tokens(vals, widths))
    return b"".join(out)


def decode_values(buf: bytes) -> np.ndarray:
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.float64)
    v = np.empty(n, dtype=np.uint64)
    v[0] = np.frombuffer(buf[4:12], dtype=np.uint64)[0]
    r = _BitReader(buf[12:])
    prev = int(v[0])
    vals = v  # local alias
    for i in range(1, n):
        w = r.peek64()
        if w >> 63 == 0:
            r.skip(1)
            vals[i] = prev
            continue
        lz = (w >> 58) & 0x1F
        sig = (w >> 52) & 0x3F
        if sig == 0:
            sig = 64
        r.skip(12)
        x = r.read(sig) << (64 - lz - sig)
        prev = (prev ^ x) & _M64
        vals[i] = prev
    return vals.view(np.float64)
