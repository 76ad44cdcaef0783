"""TSZ1 — vectorized Gorilla-style time-series codec (NumPy, no loops).

Two streams, one container:

* int32 path (token payloads): **delta-of-delta** with zigzag and
  Gorilla-style size classes, as in Pelkonen et al., PVLDB 8(12) 2015
  §4.1 — adapted to *byte-aligned* classes {0, 1, 2, 4 bytes} with a
  separate 2-bit class stream. Rationale: the classic Gorilla bitstream
  is sequential to decode (each code's position depends on all previous
  lengths); splitting the class stream from a byte-aligned payload keeps
  the exact DoD + class-selection idea but makes BOTH encode and decode
  pure vectorized NumPy (cumsum of widths → gather/scatter), which is
  the "vectorized ... encoder in Arrow pandas UDFs (no per-row Python)"
  requirement of the north rule (BASELINE.json:6).
* float64 path: Gorilla **XOR** with the leading-zero idea byte-aligned:
  per value a 4-bit significant-byte count (after stripping high-order
  zero bytes of the XOR), nibble-packed, then that many payload bytes.

All arithmetic is mod 2^32 (int path), so arbitrary int32 inputs —
including deltas/DoDs that overflow int32 — round-trip exactly.

Container (little-endian):
  magic 'TSZ1' | version u8 | vtype u8 (1=int32 DoD, 2=f64 XOR) |
  n u64 | head (v0: i32 | f64-bits u64) | head2 (first delta i64, int
  path, n>=2) | class-stream | payload | crc32 u32 over all prior bytes.

decode(encode(x)) == x exactly is THE invariant (BASELINE.json:2,15);
CRC corruption raises CodecError.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"TSZ1"
VERSION = 1
VT_INT = 1
VT_FLOAT = 2

_U32 = np.uint64(0xFFFFFFFF)
_WIDTHS = np.array([0, 1, 2, 4], dtype=np.int64)


class CodecError(ValueError):
    pass


# ------------------------------------------------------------- int32 --


def _zigzag32(x: np.ndarray) -> np.ndarray:
    """int32 -> uint32 zigzag."""
    xi = x.astype(np.int32)
    return ((xi.astype(np.uint32) << np.uint32(1)) ^ (xi >> np.int32(31)).astype(np.uint32))


def _unzigzag32(z: np.ndarray) -> np.ndarray:
    """uint32 zigzag -> int32."""
    z = z.astype(np.uint32)
    return ((z >> np.uint32(1)) ^ (np.uint32(0) - (z & np.uint32(1)))).astype(np.int32)


def _pack_classes(cls: np.ndarray) -> bytes:
    """2-bit classes, 4 per byte, LSB-first."""
    n = len(cls)
    pad = (-n) % 4
    c = np.concatenate([cls.astype(np.uint8), np.zeros(pad, np.uint8)]).reshape(-1, 4)
    return (c[:, 0] | (c[:, 1] << 2) | (c[:, 2] << 4) | (c[:, 3] << 6)).tobytes()


def _unpack_classes(buf: np.ndarray, n: int) -> np.ndarray:
    b = buf.astype(np.uint8)
    out = np.empty((len(b), 4), np.uint8)
    out[:, 0] = b & 3
    out[:, 1] = (b >> 2) & 3
    out[:, 2] = (b >> 4) & 3
    out[:, 3] = (b >> 6) & 3
    return out.reshape(-1)[:n]


def _scatter_payload(zz: np.ndarray, widths: np.ndarray) -> bytes:
    """Write `widths[i]` little-endian bytes of zz[i] at packed offsets."""
    offs = np.concatenate([[0], np.cumsum(widths)[:-1]]) if len(widths) else np.array([], np.int64)
    total = int(widths.sum())
    buf = np.zeros(total, np.uint8)
    z = zz.astype(np.uint64)
    for k in range(4):
        m = widths > k
        if not m.any():
            break
        buf[offs[m] + k] = ((z[m] >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8)
    return buf.tobytes()


def _gather_payload(buf: np.ndarray, widths: np.ndarray, max_w: int = 4) -> np.ndarray:
    offs = np.concatenate([[0], np.cumsum(widths)[:-1]]) if len(widths) else np.array([], np.int64)
    z = np.zeros(len(widths), np.uint64)
    for k in range(max_w):
        m = widths > k
        if not m.any():
            break
        z[m] |= buf[offs[m] + k].astype(np.uint64) << np.uint64(8 * k)
    return z


def encode_tokens(values) -> bytes:
    """array-like of int32 -> TSZ1 bytes (vtype=1)."""
    v = np.asarray(values, dtype=np.int32)
    n = len(v)
    body = bytearray()
    body += struct.pack("<BBQ", VERSION, VT_INT, n)
    if n >= 1:
        body += struct.pack("<i", int(v[0]))
    if n >= 2:
        d = np.diff(v.astype(np.int64))
        body += struct.pack("<q", int(d[0]))
        if n >= 3:
            dod = np.diff(d)
            # wrap mod 2^32 → int32: exact under mod-2^32 reconstruction
            dodw = dod.astype(np.uint64) & _U32
            dod32 = dodw.astype(np.uint32).view(np.int32)
            zz = _zigzag32(dod32)
            cls = np.zeros(len(zz), np.uint8)
            cls[zz > 0] = 1
            cls[zz >= (1 << 8)] = 2
            cls[zz >= (1 << 16)] = 3
            widths = _WIDTHS[cls]
            body += _pack_classes(cls)
            body += _scatter_payload(zz, widths)
    out = MAGIC + bytes(body)
    return out + struct.pack("<I", zlib.crc32(out))


def decode_tokens(blob: bytes | bytearray | memoryview) -> np.ndarray:
    """TSZ1 bytes -> np.int32 array; raises CodecError on corruption."""
    b = bytes(blob)
    if len(b) < 18 or b[:4] != MAGIC:
        raise CodecError("bad magic/short container")
    (crc,) = struct.unpack("<I", b[-4:])
    if zlib.crc32(b[:-4]) != crc:
        raise CodecError("crc32 mismatch")
    ver, vt, n = struct.unpack("<BBQ", b[4:14])
    if ver != VERSION or vt != VT_INT:
        raise CodecError(f"unsupported version/vtype {ver}/{vt}")
    if n == 0:
        return np.array([], np.int32)
    (v0,) = struct.unpack("<i", b[14:18])
    if n == 1:
        return np.array([v0], np.int32)
    (d0,) = struct.unpack("<q", b[18:26])
    off = 26
    if n == 2:
        dods = np.array([], np.int32)
    else:
        m = int(n - 2)
        nclsb = (m + 3) // 4
        cls = _unpack_classes(np.frombuffer(b, np.uint8, nclsb, off), m)
        off += nclsb
        widths = _WIDTHS[cls]
        total = int(widths.sum())
        zz = _gather_payload(np.frombuffer(b, np.uint8, total, off), widths)
        dods = _unzigzag32(zz.astype(np.uint32))
    # reconstruct mod 2^32 (uint64 cumsum wraps mod 2^64 ⊇ mod 2^32)
    d = np.empty(int(n) - 1, np.uint64)
    d[0] = np.uint64(d0 & 0xFFFFFFFF)
    if len(dods):
        d[1:] = dods.astype(np.int64).astype(np.uint64) & _U32
        d = np.cumsum(d, dtype=np.uint64)
    v = np.empty(int(n), np.uint64)
    v[0] = np.uint64(v0 & 0xFFFFFFFF)
    v[1:] = d
    v = np.cumsum(v, dtype=np.uint64) & _U32
    return v.astype(np.uint32).view(np.int32)


# ----------------------------------------------------------- float64 --


def encode_floats(values) -> bytes:
    """array-like of float64 -> TSZ1 bytes (vtype=2, Gorilla XOR)."""
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    body = bytearray()
    body += struct.pack("<BBQ", VERSION, VT_FLOAT, n)
    if n >= 1:
        body += struct.pack("<Q", int(v[:1].view(np.uint64)[0]))
    if n >= 2:
        bits = v.view(np.uint64)
        x = bits[1:] ^ bits[:-1]
        # significant bytes after stripping high-order zero bytes
        sig = np.zeros(len(x), np.uint8)
        nz = x != 0
        if nz.any():
            # highest nonzero byte index + 1 == 8 - (clz(x)//8)
            hi = np.zeros(len(x), np.int64)
            xv = x.copy()
            for k in (32, 16, 8):
                m = nz & (xv >= (np.uint64(1) << np.uint64(k)))
                hi[m] += k
                xv[m] >>= np.uint64(k)
            sig[nz] = (hi[nz] // 8 + 1).astype(np.uint8)
        pad = (-len(sig)) % 2
        s2 = np.concatenate([sig, np.zeros(pad, np.uint8)]).reshape(-1, 2)
        body += (s2[:, 0] | (s2[:, 1] << 4)).tobytes()
        offs = np.concatenate([[0], np.cumsum(sig.astype(np.int64))[:-1]])
        buf = np.zeros(int(sig.sum()), np.uint8)
        for k in range(8):
            m = sig > k
            if not m.any():
                break
            buf[offs[m] + k] = ((x[m] >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8)
        body += buf.tobytes()
    out = MAGIC + bytes(body)
    return out + struct.pack("<I", zlib.crc32(out))


def decode_floats(blob) -> np.ndarray:
    b = bytes(blob)
    if len(b) < 18 or b[:4] != MAGIC:
        raise CodecError("bad magic/short container")
    (crc,) = struct.unpack("<I", b[-4:])
    if zlib.crc32(b[:-4]) != crc:
        raise CodecError("crc32 mismatch")
    ver, vt, n = struct.unpack("<BBQ", b[4:14])
    if ver != VERSION or vt != VT_FLOAT:
        raise CodecError(f"unsupported version/vtype {ver}/{vt}")
    if n == 0:
        return np.array([], np.float64)
    (b0,) = struct.unpack("<Q", b[14:22])
    out = np.empty(int(n), np.uint64)
    out[0] = b0
    if n >= 2:
        m = int(n) - 1
        nnib = (m + 1) // 2
        off = 22
        nb = np.frombuffer(b, np.uint8, nnib, off)
        sig = np.empty((nnib, 2), np.uint8)
        sig[:, 0] = nb & 0x0F
        sig[:, 1] = nb >> 4
        sig = sig.reshape(-1)[:m].astype(np.int64)
        off += nnib
        total = int(sig.sum())
        x = _gather_payload(np.frombuffer(b, np.uint8, total, off), sig, max_w=8)
        # XOR-prefix scan: bits[i] = b0 ^ x[1] ^ ... ^ x[i]
        acc = np.bitwise_xor.accumulate(np.concatenate([[np.uint64(b0)], x]))
        out = acc
    return out.view(np.float64)
