"""PackStream v1 codec — Bolt's serialization format.

Implements the published PackStream marker set (the format every Bolt
driver speaks): Null/Boolean/Integer/Float/String/List/Map/Structure.
Structures carry a one-byte tag (message signatures like RUN=0x10 live a
layer up, in ``server.py``). Temporal/spatial struct types are out of the
served subset — the server surfaces those values as ISO strings, which
the reference's own HTTP API does too.

Pure functions over ``bytes`` — no I/O here, so the codec is directly
property-testable (``tests/test_bolt_server.py`` round-trips values).
"""

from __future__ import annotations

import struct as _s
from typing import Any


class Structure:
    """A PackStream structure: one-byte ``tag`` + field list."""

    __slots__ = ("tag", "fields")

    def __init__(self, tag: int, *fields: Any):
        self.tag = tag
        self.fields = list(fields)

    def __eq__(self, other):
        return (
            isinstance(other, Structure)
            and self.tag == other.tag
            and self.fields == other.fields
        )

    def __repr__(self):
        return f"Structure(0x{self.tag:02X}, {self.fields!r})"


def pack(value: Any) -> bytes:
    """Encode one value to PackStream bytes."""
    out = bytearray()
    _pack_into(out, value)
    return bytes(out)


def _pack_into(out: bytearray, v: Any) -> None:
    if v is None:
        out.append(0xC0)
    elif v is True:
        out.append(0xC3)
    elif v is False:
        out.append(0xC2)
    elif isinstance(v, int):
        _pack_int(out, v)
    elif isinstance(v, float):
        out.append(0xC1)
        out += _s.pack(">d", v)
    elif isinstance(v, str):
        b = v.encode("utf-8")
        _pack_len(out, len(b), 0x80, 0xD0)
        out += b
    elif isinstance(v, bytes):
        n = len(v)
        if n < 0x100:
            out += bytes((0xCC, n))
        elif n < 0x10000:
            out.append(0xCD)
            out += _s.pack(">H", n)
        else:
            out.append(0xCE)
            out += _s.pack(">I", n)
        out += v
    elif isinstance(v, (list, tuple)):
        _pack_len(out, len(v), 0x90, 0xD4)
        for item in v:
            _pack_into(out, item)
    elif isinstance(v, dict):
        _pack_len(out, len(v), 0xA0, 0xD8)
        for k, item in v.items():
            _pack_into(out, str(k))
            _pack_into(out, item)
    elif isinstance(v, Structure):
        n = len(v.fields)
        if n > 15:
            raise ValueError(f"structure with {n} fields (max 15)")
        out.append(0xB0 + n)
        out.append(v.tag)
        for f in v.fields:
            _pack_into(out, f)
    else:
        raise TypeError(f"cannot pack {type(v).__name__}: {v!r}")


def _pack_int(out: bytearray, v: int) -> None:
    if -16 <= v < 128:
        out += v.to_bytes(1, "big", signed=True)
    elif -0x80 <= v < 0x80:
        out.append(0xC8)
        out += v.to_bytes(1, "big", signed=True)
    elif -0x8000 <= v < 0x8000:
        out.append(0xC9)
        out += v.to_bytes(2, "big", signed=True)
    elif -0x8000_0000 <= v < 0x8000_0000:
        out.append(0xCA)
        out += v.to_bytes(4, "big", signed=True)
    elif -0x8000_0000_0000_0000 <= v < 0x8000_0000_0000_0000:
        out.append(0xCB)
        out += v.to_bytes(8, "big", signed=True)
    else:
        raise OverflowError(f"integer out of PackStream range: {v}")


def _pack_len(out: bytearray, n: int, tiny_base: int, d_marker: int) -> None:
    """Tiny marker for n<16, else D-series 8/16/32-bit length markers."""
    if n < 16:
        out.append(tiny_base + n)
    elif n < 0x100:
        out += bytes((d_marker, n))
    elif n < 0x10000:
        out.append(d_marker + 1)
        out += _s.pack(">H", n)
    else:
        out.append(d_marker + 2)
        out += _s.pack(">I", n)


def unpack(data: bytes, offset: int = 0) -> tuple[Any, int]:
    """Decode one value; returns (value, next_offset)."""
    m = data[offset]
    offset += 1
    if m == 0xC0:
        return None, offset
    if m == 0xC2:
        return False, offset
    if m == 0xC3:
        return True, offset
    if m <= 0x7F or m >= 0xF0:  # tiny int (positive / negative)
        return int.from_bytes(data[offset - 1 : offset], "big", signed=True), offset
    if m == 0xC1:
        return _s.unpack_from(">d", data, offset)[0], offset + 8
    if m == 0xC8:
        return int.from_bytes(data[offset : offset + 1], "big", signed=True), offset + 1
    if m == 0xC9:
        return int.from_bytes(data[offset : offset + 2], "big", signed=True), offset + 2
    if m == 0xCA:
        return int.from_bytes(data[offset : offset + 4], "big", signed=True), offset + 4
    if m == 0xCB:
        return int.from_bytes(data[offset : offset + 8], "big", signed=True), offset + 8
    if m in (0xCC, 0xCD, 0xCE):  # bytes
        w = {0xCC: 1, 0xCD: 2, 0xCE: 4}[m]
        n = int.from_bytes(data[offset : offset + w], "big")
        offset += w
        return bytes(data[offset : offset + n]), offset + n
    if 0x80 <= m <= 0x8F or m in (0xD0, 0xD1, 0xD2):
        n, offset = _unpack_len(data, offset, m, 0x80, 0xD0)
        return data[offset : offset + n].decode("utf-8"), offset + n
    if 0x90 <= m <= 0x9F or m in (0xD4, 0xD5, 0xD6):
        n, offset = _unpack_len(data, offset, m, 0x90, 0xD4)
        items = []
        for _ in range(n):
            item, offset = unpack(data, offset)
            items.append(item)
        return items, offset
    if 0xA0 <= m <= 0xAF or m in (0xD8, 0xD9, 0xDA):
        n, offset = _unpack_len(data, offset, m, 0xA0, 0xD8)
        d = {}
        for _ in range(n):
            k, offset = unpack(data, offset)
            v, offset = unpack(data, offset)
            d[k] = v
        return d, offset
    if 0xB0 <= m <= 0xBF:
        n = m - 0xB0
        tag = data[offset]
        offset += 1
        fields = []
        for _ in range(n):
            f, offset = unpack(data, offset)
            fields.append(f)
        return Structure(tag, *fields), offset
    raise ValueError(f"unknown PackStream marker 0x{m:02X}")


def _unpack_len(data: bytes, offset: int, m: int, tiny_base: int, d_marker: int):
    if m < 0xD0:  # tiny
        return m - tiny_base, offset
    w = {d_marker: 1, d_marker + 1: 2, d_marker + 2: 4}[m]
    return int.from_bytes(data[offset : offset + w], "big"), offset + w
