"""Minimal MessagePack codec (the subset Groonga's GRN_CONTENT_MSGPACK
responses need: nil, bool, int, float64, str, array, map) implemented from
the public format spec (msgpack.org) — the sandbox ships no msgpack
library, and the reference serializes through msgpack-c (lib/output.c,
``msgpack_pack_*``).  Big-endian throughout, per spec.

Encoder picks the smallest representation (fixint/uint8..64, int8..64,
fixstr/str8..32, fixarray/array16/32, fixmap/map16/32); floats always
encode as float64 (0xcb) — what msgpack-c does for double."""

from __future__ import annotations

import struct


def packb(obj) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _pack_int(obj, out)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 0x100:
            out += struct.pack(">BB", 0xD9, n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(obj, bytes):
        n = len(obj)
        if n < 0x100:
            out += struct.pack(">BB", 0xC4, n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += obj
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            out.append(0x90 | n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for x in obj:
            _pack(x, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            out.append(0x80 | n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, v in obj.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"cannot msgpack {type(obj).__name__}")


def _pack_int(v: int, out: bytearray) -> None:
    if 0 <= v < 0x80:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 <= v < 0x100:
        out += struct.pack(">BB", 0xCC, v)
    elif 0 <= v < 0x10000:
        out += struct.pack(">BH", 0xCD, v)
    elif 0 <= v < 0x100000000:
        out += struct.pack(">BI", 0xCE, v)
    elif 0 <= v < 0x10000000000000000:
        out += struct.pack(">BQ", 0xCF, v)
    elif -0x80 <= v < 0:
        out += struct.pack(">Bb", 0xD0, v)
    elif -0x8000 <= v < 0:
        out += struct.pack(">Bh", 0xD1, v)
    elif -0x80000000 <= v < 0:
        out += struct.pack(">Bi", 0xD2, v)
    elif -0x8000000000000000 <= v < 0:
        out += struct.pack(">Bq", 0xD3, v)
    else:
        raise OverflowError(f"int out of msgpack range: {v}")


def unpackb(data: bytes):
    obj, pos = _unpack(data, 0)
    if pos != len(data):
        raise ValueError(f"trailing bytes at {pos}")
    return obj


def _unpack(b: bytes, i: int):
    t = b[i]
    i += 1
    if t < 0x80:
        return t, i
    if t >= 0xE0:
        return t - 0x100, i
    if 0xA0 <= t < 0xC0:
        n = t & 0x1F
        return b[i : i + n].decode("utf-8"), i + n
    if 0x90 <= t < 0xA0:
        return _unpack_seq(b, i, t & 0x0F)
    if 0x80 <= t < 0x90:
        return _unpack_map(b, i, t & 0x0F)
    if t == 0xC0:
        return None, i
    if t == 0xC2:
        return False, i
    if t == 0xC3:
        return True, i
    if t in (0xC4, 0xC5, 0xC6):
        w = {0xC4: "B", 0xC5: "H", 0xC6: "I"}[t]
        (n,) = struct.unpack_from(">" + w, b, i)
        i += struct.calcsize(w)
        return b[i : i + n], i + n
    if t in (0xCC, 0xCD, 0xCE, 0xCF, 0xD0, 0xD1, 0xD2, 0xD3):
        w = {0xCC: "B", 0xCD: "H", 0xCE: "I", 0xCF: "Q",
             0xD0: "b", 0xD1: "h", 0xD2: "i", 0xD3: "q"}[t]
        (v,) = struct.unpack_from(">" + w, b, i)
        return v, i + struct.calcsize(w)
    if t == 0xCA:
        (v,) = struct.unpack_from(">f", b, i)
        return v, i + 4
    if t == 0xCB:
        (v,) = struct.unpack_from(">d", b, i)
        return v, i + 8
    if t in (0xD9, 0xDA, 0xDB):
        w = {0xD9: "B", 0xDA: "H", 0xDB: "I"}[t]
        (n,) = struct.unpack_from(">" + w, b, i)
        i += struct.calcsize(w)
        return b[i : i + n].decode("utf-8"), i + n
    if t in (0xDC, 0xDD):
        w = "H" if t == 0xDC else "I"
        (n,) = struct.unpack_from(">" + w, b, i)
        return _unpack_seq(b, i + struct.calcsize(w), n)
    if t in (0xDE, 0xDF):
        w = "H" if t == 0xDE else "I"
        (n,) = struct.unpack_from(">" + w, b, i)
        return _unpack_map(b, i + struct.calcsize(w), n)
    raise ValueError(f"unknown msgpack type byte 0x{t:02x}")


def _unpack_seq(b: bytes, i: int, n: int):
    out = []
    for _ in range(n):
        v, i = _unpack(b, i)
        out.append(v)
    return out, i


def _unpack_map(b: bytes, i: int, n: int):
    out = {}
    for _ in range(n):
        k, i = _unpack(b, i)
        v, i = _unpack(b, i)
        out[k] = v
    return out, i
