"""Vendored PNG codec (kernels/pngcodec.py): spec-subset roundtrips,
all five scanline filters on decode, the PIL-facade surface the
multimodal UDFs drive, and loud PngError on malformed input."""

import io
import struct
import zlib

import numpy as np
import pytest

from pyrate_spark.kernels.pngcodec import (MiniImage, PngError,
                                           decode_png, encode_png)


def _rng(shape, seed=7):
    return np.random.default_rng(seed).integers(
        0, 256, size=shape).astype(np.uint8)


@pytest.mark.parametrize("shape", [(5, 9), (5, 9, 2), (5, 9, 3),
                                   (7, 3, 4), (1, 1), (2, 1, 3)])
def test_roundtrip(shape):
    a = _rng(shape)
    out = decode_png(encode_png(a))
    np.testing.assert_array_equal(out, a.reshape(out.shape))


def _manual_png(arr, filters):
    """Encode with a CHOSEN filter per row (the encoder itself always
    writes filter 0, so decode coverage of 1-4 needs a hand-rolled
    writer applying the spec's filter transforms)."""
    h, w, nch = arr.shape
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        row = arr[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        if f == 0:
            enc = row
        elif f == 1:                     # Sub
            left = np.concatenate([np.zeros(nch, np.int32), row[:-nch]])
            enc = (row - left) % 256
        elif f == 2:                     # Up
            enc = (row - prev) % 256
        elif f == 3:                     # Average
            left = np.concatenate([np.zeros(nch, np.int32), row[:-nch]])
            enc = (row - ((left + prev) >> 1)) % 256
        elif f == 4:                     # Paeth
            left = np.concatenate([np.zeros(nch, np.int32), row[:-nch]])
            ul = np.concatenate([np.zeros(nch, np.int32), prev[:-nch]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = (row - pred) % 256
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_all_filters(filters):
    a = _rng((6, 5, 3), seed=11)
    out = decode_png(_manual_png(a, filters))
    np.testing.assert_array_equal(out, a)


def test_palette_decode():
    idx = _rng((4, 6), seed=3) % 5
    pal = _rng((5, 3), seed=4)
    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(4))
    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 4, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(data), pal[idx])


@pytest.mark.parametrize("bad", [
    b"not a png at all",
    b"\x89PNG\r\n\x1a\n" + b"\x00" * 8,          # signature, garbage chunks
    b"",
])
def test_malformed_raises_pngerror(bad):
    with pytest.raises(PngError):
        decode_png(bad)
    assert issubclass(PngError, ValueError)      # flagged-row contract


def test_miniimage_facade_roundtrip():
    rgb = _rng((10, 20, 3), seed=9)
    img = MiniImage.open(io.BytesIO(encode_png(rgb)))
    assert img.size == (20, 10)
    gray = img.convert("L")
    lum = ((rgb[:, :, 0].astype(np.uint32) * 299
            + rgb[:, :, 1].astype(np.uint32) * 587
            + rgb[:, :, 2].astype(np.uint32) * 114) // 1000).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(gray), lum)
    small = gray.resize((5, 4))
    assert small.size == (5, 4)
    # nearest-neighbor: every output pixel is SOME input pixel
    assert set(np.asarray(small).ravel()) <= set(lum.ravel())
    buf = io.BytesIO()
    small.save(buf, format="PNG")
    np.testing.assert_array_equal(decode_png(buf.getvalue()),
                                  np.asarray(small))


def test_miniimage_new_matches_pil_semantics():
    img = MiniImage.new("L", (16, 12), color=128)
    assert img.size == (16, 12)
    assert np.asarray(img).shape == (12, 16)
    assert (np.asarray(img) == 128).all()


def test_resize_identity_and_upscale():
    a = _rng((8, 8), seed=5)
    same = MiniImage(a).resize((8, 8))
    np.testing.assert_array_equal(np.asarray(same), a)
    up = MiniImage(a).resize((16, 16))
    # 2x nearest upscale == kron with ones(2,2)
    np.testing.assert_array_equal(np.asarray(up),
                                  np.kron(a, np.ones((2, 2), np.uint8)))
