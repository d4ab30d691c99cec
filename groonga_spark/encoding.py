"""Posting-list compression kernels (numpy, vectorized).

Re-implements, from published behavior only, the two encodings Groonga's
inverted index uses (reference: ``lib/grn_io.h:360-420`` GRN_B_ENC/GRN_B_DEC
varbyte scheme; ``lib/ii.c:451,1410-1474`` PForDelta-style bit packing with
UNIT_SIZE=128 and a 7/8 fit heuristic).  Wire format here is our own (we do
not need binary compatibility with Groonga index files) but the *scheme* is
the same:

* ``vb_encode`` / ``vb_decode`` — Groonga varbyte: 1 byte for v < 0x8f,
  2 bytes < 0x408f, 3 bytes < 0x20408f, 4 bytes < 0x1020408f, else marker
  0x8f + 4 raw little-endian bytes.
* ``pfor_encode`` / ``pfor_decode`` — fixed-width bit packing in units of
  128 values; width chosen so >= 7/8 of the unit fits; the exceptions'
  high bits are varbyte-encoded in a patch list (``lib/ii.c:1410-1449``
  ``pack`` chooses w the same way).

Everything operates on ``np.uint32``-representable values (Groonga postings
are 32-bit too) and is vectorized — no per-value Python in the encode path,
and decode has a vectorized fast path for the all-1-byte case that dominates
delta-encoded posting lists.
"""

from __future__ import annotations

import numpy as np

_B1 = 0x8F
_B2 = 0x408F
_B3 = 0x20408F
_B4 = 0x1020408F

UNIT_SIZE = 128  # ii.c:451


def vb_encode(values: np.ndarray) -> bytes:
    """Groonga-scheme varbyte encode of a uint32 array (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    sizes = np.full(n, 5, dtype=np.int64)
    sizes[v < _B4] = 4
    sizes[v < _B3] = 3
    sizes[v < _B2] = 2
    sizes[v < _B1] = 1
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    total = int(offs[-1] + sizes[-1])
    out = np.zeros(total, dtype=np.uint8)

    m1 = sizes == 1
    if m1.any():
        out[offs[m1]] = v[m1]
    m2 = sizes == 2
    if m2.any():
        x = v[m2] - _B1
        o = offs[m2]
        out[o] = 0xC0 + (x >> 8)
        out[o + 1] = x & 0xFF
    m3 = sizes == 3
    if m3.any():
        x = v[m3] - _B2
        o = offs[m3]
        out[o] = 0xA0 + (x >> 16)
        out[o + 1] = (x >> 8) & 0xFF
        out[o + 2] = x & 0xFF
    m4 = sizes == 4
    if m4.any():
        x = v[m4] - _B3
        o = offs[m4]
        out[o] = 0x90 + (x >> 24)
        out[o + 1] = (x >> 16) & 0xFF
        out[o + 2] = (x >> 8) & 0xFF
        out[o + 3] = x & 0xFF
    m5 = sizes == 5
    if m5.any():
        x = v[m5].astype(np.uint32)
        o = offs[m5]
        out[o] = 0x8F
        le = x.view(np.uint8).reshape(-1, 4)  # little-endian platforms
        for j in range(4):
            out[o + 1 + j] = le[:, j]
    return out.tobytes()


def vb_sizes(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte size under the varbyte scheme."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    sizes = np.full(v.size, 5, dtype=np.int64)
    sizes[v < _B4] = 4
    sizes[v < _B3] = 3
    sizes[v < _B2] = 2
    sizes[v < _B1] = 1
    return sizes


def vb_encode_rows(flat: np.ndarray, row_lens: np.ndarray) -> list[bytes]:
    """Encode a flat value array once, then split the buffer into one bytes
    object per logical row (row i holds ``row_lens[i]`` values).  One
    vectorized encode for the whole batch instead of one per row."""
    buf = vb_encode(flat)
    sizes = vb_sizes(flat)
    cum_bytes = np.concatenate(([0], np.cumsum(sizes)))
    val_cum = np.cumsum(row_lens)
    starts_b = cum_bytes[val_cum - row_lens]
    ends_b = cum_bytes[val_cum]
    return [buf[s:e] for s, e in zip(starts_b.tolist(), ends_b.tolist())]


def _vb_lengths(first: np.ndarray) -> np.ndarray:
    """Token byte-length from its first byte (grn_io.h GRN_B_SKIP logic)."""
    hi = first >> 4
    ln = np.ones(first.shape, dtype=np.int64)
    ln[hi >= 0x0C] = 2
    ln[(hi == 0x0A) | (hi == 0x0B)] = 3
    ln[hi == 0x09] = 4
    ln[first == 0x8F] = 5
    return ln


def vb_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode ``n`` values. Vectorized fast path when every value is 1 byte
    (the common case for small delta gaps); general path resolves token
    starts with at most a few passes of pointer chasing in numpy."""
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == n:  # every token is 1 byte
        return b.astype(np.uint32)
    lens = _vb_lengths(b)
    # resolve token start offsets: starts[0]=0, starts[i+1]=starts[i]+lens[starts[i]]
    starts = np.zeros(n, dtype=np.int64)
    pos = 0
    # chunked python loop — bounded by n (<=128 per block normally)
    for i in range(n):
        starts[i] = pos
        pos += lens[pos]
    first = b[starts]
    out = np.zeros(n, dtype=np.uint64)
    l = lens[starts]
    m1 = l == 1
    out[m1] = first[m1]
    m2 = l == 2
    if m2.any():
        s = starts[m2]
        out[m2] = (first[m2].astype(np.uint64) - 0xC0) * 0x100 + b[s + 1] + _B1
    m3 = l == 3
    if m3.any():
        s = starts[m3]
        out[m3] = (
            (first[m3].astype(np.uint64) - 0xA0) * 0x10000
            + b[s + 1].astype(np.uint64) * 0x100
            + b[s + 2]
            + _B2
        )
    m4 = l == 4
    if m4.any():
        s = starts[m4]
        out[m4] = (
            (first[m4].astype(np.uint64) - 0x90) * 0x1000000
            + b[s + 1].astype(np.uint64) * 0x10000
            + b[s + 2].astype(np.uint64) * 0x100
            + b[s + 3]
            + _B3
        )
    m5 = l == 5
    if m5.any():
        s = starts[m5]
        out[m5] = (
            b[s + 1].astype(np.uint64)
            + b[s + 2].astype(np.uint64) * 0x100
            + b[s + 3].astype(np.uint64) * 0x10000
            + b[s + 4].astype(np.uint64) * 0x1000000
        )
    return out.astype(np.uint32)


# ---------------------------------------------------------------------------
# PFoR-style bit packing (ii.c:1410-1474 'pack': per-unit width chosen so
# >= 7/8 of values fit; exceptions patched separately).
# ---------------------------------------------------------------------------


def _choose_width(v: np.ndarray) -> int:
    """Smallest w such that >= 7/8 of values fit in w bits (ii.c:1410)."""
    if v.size == 0:
        return 0
    bits = np.zeros(v.shape, dtype=np.int64)
    nz = v > 0
    bits[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
    thresh = v.size - (v.size // 8)  # at least 7/8 must fit
    sorted_bits = np.sort(bits)
    w = int(sorted_bits[thresh - 1]) if thresh >= 1 else 0
    return max(w, 1) if v.size else 0


def _bitpack(v: np.ndarray, w: int) -> bytes:
    """Pack low w bits of each uint32 value, MSB-first (vectorized)."""
    big = np.ascontiguousarray(v.astype(">u4"))
    bits = np.unpackbits(big.view(np.uint8).reshape(-1, 4), axis=1)[:, 32 - w:]
    return np.packbits(bits.reshape(-1)).tobytes()


def _bitunpack(buf: bytes, n: int, w: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))[: n * w].reshape(n, w)
    full = np.zeros((n, 32), dtype=np.uint8)
    full[:, 32 - w:] = bits
    packed = np.packbits(full, axis=1)
    return packed.view(">u4").reshape(-1).astype(np.uint32)


def pfor_encode(values: np.ndarray) -> bytes:
    """Encode uint32 array in UNIT_SIZE units: header per unit
    ``(w:1B, n_exc:1B)`` + packed low bits + exception positions (1B each)
    + varbyte high bits of exceptions."""
    v = np.ascontiguousarray(values, dtype=np.uint32)
    parts: list[bytes] = []
    for i in range(0, v.size, UNIT_SIZE):
        u = v[i : i + UNIT_SIZE]
        w = _choose_width(u)
        if w >= 32:
            w = 32
        mask = np.uint32((1 << w) - 1) if w < 32 else np.uint32(0xFFFFFFFF)
        exc_idx = np.nonzero(u > mask)[0]
        low = u & mask
        parts.append(bytes([w, len(exc_idx)]))
        parts.append(_bitpack(low, w) if w > 0 else b"")
        parts.append(exc_idx.astype(np.uint8).tobytes())
        if exc_idx.size:
            parts.append(vb_encode((u[exc_idx] >> w).astype(np.uint32)))
    return b"".join(parts)


def pfor_decode(buf: bytes, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.uint32)
    b = memoryview(buf)
    pos = 0
    done = 0
    while done < n:
        cnt = min(UNIT_SIZE, n - done)
        w = b[pos]
        n_exc = b[pos + 1]
        pos += 2
        nbytes = (cnt * w + 7) // 8
        vals = (
            _bitunpack(bytes(b[pos : pos + nbytes]), cnt, w)
            if w > 0
            else np.zeros(cnt, dtype=np.uint32)
        )
        pos += nbytes
        if n_exc:
            idx = np.frombuffer(b[pos : pos + n_exc], dtype=np.uint8)
            pos += n_exc
            # varbyte token lengths to find how many bytes the patch list used
            rest = np.frombuffer(b[pos:], dtype=np.uint8)
            lens = _vb_lengths(rest)
            used = 0
            for _ in range(n_exc):
                used += int(lens[used])
            his = vb_decode(bytes(b[pos : pos + used]), n_exc)
            pos += used
            vals = vals.copy()
            vals[idx] |= his.astype(np.uint32) << w
        out[done : done + cnt] = vals
        done += cnt
    return out


def choose_encoding(n: int, max_gap: int) -> str:
    """Groonga picks PFoR when lists are dense (``merge_hit_blocks``,
    ii.c:7652-7673: nrecs >= 16 and nrecs > max_gap >> 8)."""
    return "pfor" if (n >= 16 and n > (max_gap >> 8)) else "varbyte"
