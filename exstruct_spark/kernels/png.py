"""Pure-stdlib PNG codec (zlib inflate + numpy scanline unfilter).

The reference engine reads REAL drawing bytes, never synthetic ones
(exstruct core/ooxml_drawing.py:186-257 parses the actual OOXML part
stream) — this module gives the multimodal kernels the same honesty for
the one codec that needs no third-party library: PNG is zlib (stdlib) +
per-scanline filters 0-4 (numpy).  JPEG/video remain declared stubs in
kernels/media.py (no codecs in this environment).

Supported: bit depths 8 and 16 (16-bit samples keep their HIGH byte,
the PNG-recommended 8-bit reduction), color types 0 (gray), 2 (RGB),
3 (palette, 8-bit), 4 (gray+alpha), 6 (RGBA), non-interlaced AND Adam7
interlaced (each of the 7 passes is its own filtered sub-image
scattered back onto the canvas).  Anything else raises ``ValueError``
and the caller degrades (fallback-not-fail).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass geometry: (x_start, y_start, x_step, y_step) — the PNG
# spec's pass table; every pixel is covered exactly once (pinned by
# pytest over the 8x8 tile)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter(plain: bytes, height: int, width: int, bpp: int) -> np.ndarray:
    """One filtered sub-image (filter byte + scanline) x height ->
    (height, width*bpp) uint8 reconstructed samples.  Filters 0-4 per
    the PNG spec; ``bpp`` is BYTES per pixel (so 16-bit samples just
    widen the lanes — the filters are bytewise by design)."""
    stride = width * bpp
    if len(plain) < (stride + 1) * height:
        raise ValueError("IDAT too short for dimensions")
    buf = np.frombuffer(plain, dtype=np.uint8,
                        count=(stride + 1) * height)
    lines = buf.reshape(height, stride + 1)
    filters = lines[:, 0]
    data = lines[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f = filters[y]
        line = data[y]
        if f == 0:  # None
            recon = line.copy()
        elif f == 1:  # Sub: lane-wise cumulative sum mod 256
            lanes = line.reshape(width, bpp)
            recon = (np.cumsum(lanes, axis=0) % 256).reshape(stride)
        elif f == 2:  # Up
            recon = (line + prev) % 256
        elif f == 3:  # Average (sequential in x; vector across lanes)
            recon = np.empty(stride, dtype=np.int32)
            recon[:bpp] = (line[:bpp] + prev[:bpp] // 2) % 256
            for x in range(bpp, stride, bpp):
                recon[x : x + bpp] = (
                    line[x : x + bpp]
                    + (recon[x - bpp : x] + prev[x : x + bpp]) // 2
                ) % 256
        elif f == 4:  # Paeth (sequential in x; vector across lanes)
            recon = np.empty(stride, dtype=np.int32)
            recon[:bpp] = (line[:bpp] + prev[:bpp]) % 256
            for x in range(bpp, stride, bpp):
                a = recon[x - bpp : x]
                b = prev[x : x + bpp]
                c = prev[x - bpp : x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                recon[x : x + bpp] = (line[x : x + bpp] + pred) % 256
        else:
            raise ValueError(f"unknown scanline filter {f}")
        out[y] = recon
        prev = out[y]
    return out.astype(np.uint8)


def decode_png(raw: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 pixel array (C in {1, 2, 3, 4};
    palette images are expanded to RGB).  Raises ``ValueError`` on
    malformed or unsupported input — never returns fabricated pixels."""
    if raw[:8] != PNG_MAGIC:
        raise ValueError("not a PNG signature")
    pos = 8
    ihdr = None
    plte = None
    idat_parts = []
    n = len(raw)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # len + type + data + crc (crc not verified)
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat_parts.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13 or not idat_parts:
        raise ValueError("missing IHDR/IDAT")
    width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if bit_depth not in (8, 16):
        raise ValueError(f"unsupported bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if bit_depth == 16 and color_type == 3:
        raise ValueError("palette images cannot be 16-bit")
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError("unsupported compression/filter method")
    if width == 0 or height == 0 or width * height > 64_000_000:
        raise ValueError("degenerate or oversized dimensions")
    channels = _CHANNELS[color_type]
    sample_bytes = bit_depth // 8
    bpp = channels * sample_bytes
    try:
        plain = zlib.decompress(b"".join(idat_parts))
    except zlib.error as exc:
        raise ValueError(f"IDAT inflate failed: {exc}") from exc

    if interlace == 0:
        raw16 = _unfilter(plain, height, width, bpp).reshape(
            height, width, bpp)
    else:
        # Adam7: seven sub-images, each independently filtered, each
        # scattered onto the canvas at its pass offsets/strides
        raw16 = np.zeros((height, width, bpp), dtype=np.uint8)
        pos2 = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = max(0, -(-(width - x0) // dx))
            ph = max(0, -(-(height - y0) // dy))
            if pw == 0 or ph == 0:
                continue
            need = (pw * bpp + 1) * ph
            sub = _unfilter(plain[pos2:pos2 + need], ph, pw, bpp)
            pos2 += need
            raw16[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
    if sample_bytes == 2:
        # high byte of each big-endian 16-bit sample (the spec's
        # recommended 8-bit reduction)
        px = raw16.reshape(height, width, channels, 2)[:, :, :, 0].copy()
    else:
        px = raw16.reshape(height, width, channels)
    if color_type == 3:
        if plte is None or len(plte) % 3 != 0 or len(plte) == 0:
            raise ValueError("palette image without valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        px = pal[idx]
    return px


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 array -> PNG bytes (filter 0, one IDAT).
    Test/fixture writer — the synthetic-corpus twin of decode_png."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    lines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * c)], axis=1
    )
    idat = zlib.compress(lines.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _luma(px: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 -> (H, W) float64 luminance (Rec.601 for color)."""
    c = px.shape[2]
    f = px.astype(np.float64)
    if c >= 3:
        return f[:, :, 0] * 0.299 + f[:, :, 1] * 0.587 + f[:, :, 2] * 0.114
    return f[:, :, 0]


def resize_box(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box-average resize to (out_h, out_w): rows/cols are split into
    near-equal contiguous bands and each cell is the band mean — exact,
    deterministic, no interpolation kernel to disagree about."""
    h, w = px.shape[:2]
    row_edges = np.linspace(0, h, out_h + 1).round().astype(int)
    col_edges = np.linspace(0, w, out_w + 1).round().astype(int)
    # cumulative-sum integral image -> O(out_h*out_w) cell means
    f = px.astype(np.float64)
    integ = np.zeros((h + 1, w + 1) + f.shape[2:], dtype=np.float64)
    integ[1:, 1:] = f.cumsum(axis=0).cumsum(axis=1)
    r0, r1 = row_edges[:-1], row_edges[1:]
    c0, c1 = col_edges[:-1], col_edges[1:]
    area = (r1 - r0)[:, None] * (c1 - c0)[None, :]
    area = np.maximum(area, 1)
    cell = (
        integ[r1][:, c1]
        - integ[r0][:, c1]
        - integ[r1][:, c0]
        + integ[r0][:, c0]
    )
    out = cell / (area[..., None] if f.ndim == 3 else area)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def luma_grid_features(px: np.ndarray, dim: int = 64) -> list:
    """Real-pixel feature vector: box-average the luminance onto a g x g
    grid (g = ceil(sqrt(dim))), flatten, take the first ``dim`` cells,
    mean-center and L2-normalize.  Identical pixels -> identical features
    (cosine 1.0); independent images -> near-orthogonal (|cos| ~ 1/sqrt(dim)).
    The classic blockhash/pHash-family shape, computable without any model.
    """
    g = int(np.ceil(np.sqrt(dim)))
    luma = _luma(px)
    grid = resize_box(luma[:, :, None], g, g)[:, :, 0].astype(np.float64)
    v = grid.reshape(-1)[:dim]
    v = v - v.mean()
    n = float(np.sqrt((v * v).sum()))
    if n < 1e-9:
        # flat image: deterministic unit basis vector (still unit-norm)
        v = np.zeros(dim)
        v[0] = 1.0
        return [float(x) for x in v]
    return [float(round(x / n, 6)) for x in v]
