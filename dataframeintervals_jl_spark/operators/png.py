"""Minimal pure-Python PNG codec — the REAL-codec plug for the
multimodal hooks (round 11, VERDICT r10 #8).

The container ships no image libraries, so the engine's pluggable
decode hooks (:func:`~.multimodal.decode_media_meta` ``decode_fn=``)
were previously exercised only with synthetic decoders.  PNG, however,
needs nothing beyond ``zlib`` + the published spec (RFC 2083 / the W3C
PNG recommendation — chunk layout, IHDR fields, scanline filter types
0–4), so a real end-to-end decode is possible in-container:

- :func:`png_encode` — test-fixture encoder: 8-bit RGB/RGBA/grayscale,
  filter 0 scanlines, one IDAT, correct CRCs.  Deterministic bytes.
- :func:`png_meta` — header-only parse: (n_bytes, width, height, 1).
  Shaped exactly like a ``decode_fn`` for :func:`decode_media_meta`.
- :func:`png_decode_raw` — full decode to a raw HWC uint8 buffer
  (IDAT concat → zlib inflate → per-scanline unfilter, all 5 filter
  types), the layout :func:`~.multimodal.resize_raw` consumes.

Scale note: these run INSIDE the Arrow-batched mapInPandas hooks — the
Spark-side plumbing (schema, batching, partitioning) is the engine's;
this module is only the per-item pure function, exactly what a PIL/
ffmpeg wrapper would be in a full deployment.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per pixel by PNG color type (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(
    width: int, height: int, pixels: bytes, channels: int = 3
) -> bytes:
    """Encode a raw HWC uint8 buffer as a PNG (bit depth 8; channels
    1 = grayscale, 2 = gray+alpha, 3 = RGB, 4 = RGBA; filter 0 on every
    scanline; single IDAT).  Deterministic: fixed zlib level 6, no
    ancillary chunks."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if ctype is None:
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width}x{height}x{channels}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride]
        for y in range(height)
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _parse_chunks(buf: bytes):
    if buf[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + ln]
        if len(payload) != ln:
            raise ValueError(f"truncated {tag!r} chunk")
        yield tag, payload
        pos += 12 + ln  # len + tag + payload + crc
        if tag == b"IEND":
            return
    raise ValueError("no IEND chunk")


def png_header(buf: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR."""
    for tag, payload in _parse_chunks(buf):
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if comp != 0 or filt != 0:
                raise ValueError("unsupported compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            return w, h, depth, ctype
        break  # IHDR must be first
    raise ValueError("missing IHDR")


def png_meta(buf: bytes, kind: str = "image") -> tuple[int, int, int, int]:
    """``decode_fn``-shaped header probe: (n_bytes, width, height,
    n_frames=1).  Raises on non-PNG input — fail-fast, never a guess."""
    w, h, _, _ = png_header(bytes(buf))
    return (len(buf), w, h, 1)


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse the per-scanline filters (types 0–4 per the spec)."""
    stride = width * bpp
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        prev_off = (y - 1) * stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if y:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_off + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if y else 0
                line[i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if y else 0
                c = out[prev_off + i - bpp] if (y and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype} on row {y}")
        out[y * stride : (y + 1) * stride] = line
    return out


def png_decode_raw(buf: bytes) -> tuple[int, int, int, bytes]:
    """Full decode: (width, height, channels, raw HWC uint8 bytes) —
    the buffer layout :func:`~.multimodal.resize_raw` consumes.  8-bit
    depth only (the fixture encoder's range); all five filter types."""
    buf = bytes(buf)
    w, h, depth, ctype = png_header(buf)
    if depth != 8:
        raise ValueError(f"bit depth {depth} not supported (8 only)")
    ch = _CHANNELS.get(ctype)
    if ch is None:
        raise ValueError(f"color type {ctype} not supported")
    idat = b"".join(p for t, p in _parse_chunks(buf) if t == b"IDAT")
    if not idat:
        raise ValueError("no IDAT data")
    raw = zlib.decompress(idat)
    expected = h * (1 + w * ch)
    if len(raw) != expected:
        raise ValueError(
            f"inflated stream is {len(raw)} bytes, expected {expected}"
        )
    return w, h, ch, bytes(_unfilter(raw, w, h, ch))
