"""Vendored minimal PNG codec (pure stdlib: zlib + struct + numpy).

Closes the capability gap the multimodal operators carried since r4:
this runtime has no PIL, so the REAL pixel-decode path could only be
proven through a shim. This module is a from-scratch implementation of
the PNG spec's baseline subset — 8-bit depth, color types 0 (gray),
2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), no interlace, all five
scanline filters on decode, filter 0 on encode — enough to decode and
re-encode every PNG the engine's image pipeline produces, with PIL
taking over transparently when a runtime has it (the driver-resolved
capability decision in operators/multimodal.py picks the tier).

``MiniImage`` is the PIL-compatible facade the multimodal UDFs drive:
``open() -> convert("L") -> resize() -> np.asarray`` and
``resize().save(buf, format="PNG")``. Grayscale conversion uses the
ITU-R 601 luma weights (R*299 + G*587 + B*114) / 1000 — the same
formula PIL documents for mode "L". Resize is NEAREST-NEIGHBOR (index
mapping floor((i + 0.5) * src / dst)): deterministic, exactly
reproducible in any engine, and documented as the vendored tier's
resampling contract (PIL's default bicubic differs by design; one job
never mixes tiers, so outputs stay self-consistent).

This is a correctness-tier codec: per-row filter reconstruction is
vectorized where the filter allows (None/Up) and sequential where the
spec makes it so (Sub/Average/Paeth have a per-pixel data dependency).
Throughput-critical pipelines should ship PIL; the engine's contract
is that the REAL path exists and is exercised everywhere.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or unsupported PNG input (a corrupt-input error: the
    multimodal UDFs flag the row and continue, per their contract)."""


def _chunks(data: bytes):
    if data[:8] != _SIG:
        raise PngError("not a PNG: bad signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,), typ = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        yield typ, body
        pos += 12 + length          # length + type + body + crc
        if typ == b"IEND":
            return
    raise PngError("missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, nch: int) -> np.ndarray:
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise PngError("bad IDAT length")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.uint16)
        pos += stride + 1
        if ftype == 0:                              # None
            cur = row
        elif ftype == 2:                            # Up
            cur = (row + prev) & 0xFF
        elif ftype == 1:                            # Sub
            cur = row.copy()
            for i in range(nch, stride):
                cur[i] = (cur[i] + cur[i - nch]) & 0xFF
        elif ftype == 3:                            # Average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - nch] if i >= nch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:                            # Paeth
            cur = row.copy()
            for i in range(stride):
                left = int(cur[i - nch]) if i >= nch else 0
                ul = int(prev[i - nch]) if i >= nch else 0
                cur[i] = (cur[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise PngError(f"unknown filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, nch)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) for grayscale, (h, w, c) else."""
    width = height = None
    color_type = None
    palette = None
    idat = bytearray()
    for typ, body in _chunks(bytes(data)):
        if typ == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise PngError("interlaced PNG unsupported")
            if comp != 0 or filt != 0:
                raise PngError("nonstandard compression/filter method")
        elif typ == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.extend(body)
    if width is None or not idat:
        raise PngError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise PngError(f"bad IDAT stream: {exc}") from None
    nch = _CHANNELS[color_type]
    arr = _unfilter(raw, width, height, nch)
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        arr = palette[arr[:, :, 0]]
    if arr.shape[2] == 1:
        return arr[:, :, 0]
    return arr


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) | (h, w, 2|3|4) -> PNG bytes (filter 0)."""
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(nch)
    if ctype is None:
        raise PngError(f"cannot encode {nch}-channel image")
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9))
            + chunk(b"IEND", b""))


class MiniImage:
    """PIL-compatible facade over the vendored codec (the subset the
    multimodal UDFs use: open/convert/resize/save/size/asarray)."""

    def __init__(self, arr: np.ndarray):
        self._arr = np.asarray(arr, dtype=np.uint8)

    # -- PIL.Image module surface -----------------------------------
    @staticmethod
    def open(fp) -> "MiniImage":
        data = fp.read() if hasattr(fp, "read") else bytes(fp)
        return MiniImage(decode_png(data))

    @staticmethod
    def new(mode: str, size: tuple[int, int], color: int = 0) -> "MiniImage":
        w, h = size
        if mode == "L":
            return MiniImage(np.full((h, w), color, dtype=np.uint8))
        if mode == "RGB":
            return MiniImage(np.full((h, w, 3), color, dtype=np.uint8))
        raise PngError(f"unsupported mode {mode}")

    # -- PIL.Image.Image instance surface ---------------------------
    @property
    def size(self) -> tuple[int, int]:
        return self._arr.shape[1], self._arr.shape[0]

    def convert(self, mode: str) -> "MiniImage":
        if mode != "L":
            raise PngError(f"unsupported convert target {mode}")
        a = self._arr
        if a.ndim == 2:
            return MiniImage(a)
        if a.shape[2] == 2:                 # gray + alpha: drop alpha
            return MiniImage(a[:, :, 0])
        rgb = a[:, :, :3].astype(np.uint32)
        luma = (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587
                + rgb[:, :, 2] * 114) // 1000
        return MiniImage(luma.astype(np.uint8))

    def resize(self, wh: tuple[int, int]) -> "MiniImage":
        w, h = int(wh[0]), int(wh[1])
        if w < 1 or h < 1:
            raise PngError(f"bad resize target {wh}")
        sh, sw = self._arr.shape[:2]
        ys = np.minimum(((np.arange(h) + 0.5) * sh / h).astype(np.int64),
                        sh - 1)
        xs = np.minimum(((np.arange(w) + 0.5) * sw / w).astype(np.int64),
                        sw - 1)
        return MiniImage(self._arr[np.ix_(ys, xs)])

    def save(self, fp, format: str = "PNG") -> None:
        if format.upper() != "PNG":
            raise PngError(f"unsupported save format {format}")
        data = encode_png(self._arr)
        if hasattr(fp, "write"):
            fp.write(data)
        else:
            with io.open(fp, "wb") as f:
                f.write(data)

    def __array__(self, dtype=None, copy=None):
        a = self._arr
        return a.astype(dtype) if dtype is not None else a
