"""Real PNG decode (kernels/png.py): byte-exact roundtrips, every
scanline filter type, palette expansion, strict-mode honesty in the media
kernel.  Reference analogy: exstruct parses real drawing bytes
(core/ooxml_drawing.py:186-257) — these tests pin that no fabricated
pixel ever flows on the PNG path."""

import struct
import zlib

import numpy as np
import pytest

from exstruct_spark.kernels.media import decode_image, media_meta_pdf
from exstruct_spark.kernels.png import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    luma_grid_features,
    resize_box,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


@pytest.mark.parametrize(
    "shape", [(5, 3), (8, 8, 1), (8, 8, 2), (16, 9, 3), (7, 11, 4), (1, 1, 3)]
)
def test_roundtrip_byte_exact(shape):
    a = _rng(sum(shape)).integers(0, 256, size=shape, dtype=np.uint8)
    dec = decode_png(encode_png(a))
    want = a if a.ndim == 3 else a[:, :, None]
    assert dec.shape == want.shape
    assert (dec == want).all()


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_with_filters(px: np.ndarray, filters: list) -> bytes:
    """Hand-build a PNG whose scanlines use the GIVEN filter types —
    forward-filtering here (independent arithmetic), decode must invert."""
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = px.astype(np.int32).reshape(h, w * c)
    bpp = c
    lines = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = raw[y]
        f = filters[y % len(filters)]
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
        up = prev
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = (cur - left) % 256
        elif f == 2:
            filt = (cur - up) % 256
        elif f == 3:
            filt = (cur - (left + up) // 2) % 256
        else:  # paeth
            p = left + up - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
            )
            filt = (cur - pred) % 256
        lines.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prev = cur
    idat = zlib.compress(b"".join(lines))
    return PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_decode_inverts_every_filter_type(filters, channels):
    px = _rng(channels * 10 + filters[0]).integers(
        0, 256, (9, 6, channels), dtype=np.uint8
    )
    got = decode_png(_png_with_filters(px, filters))
    assert (got == px).all()


def test_palette_expansion():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    lines = b"\x00" + bytes(idx[0]) + b"\x00" + bytes(idx[1])
    raw = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(lines))
        + _chunk(b"IEND", b"")
    )
    got = decode_png(raw)
    assert got.shape == (2, 2, 3)
    assert (got == np.frombuffer(pal, np.uint8).reshape(2, 2, 3)).all()


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:20],  # truncated
        lambda b: b.replace(b"IDAT", b"XDAT", 1),  # no pixel data
        lambda b: PNG_MAGIC + b"\x00\x00\x00\x0d",  # header only
    ],
)
def test_malformed_png_raises_valueerror(mutate):
    good = encode_png(_rng().integers(0, 256, (4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(mutate(good))


def test_interlaced_rejected():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # interlace=1
    raw = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(raw)


def test_resize_box_constant_and_mean():
    const = np.full((10, 14, 3), 77, dtype=np.uint8)
    assert (resize_box(const, 4, 4) == 77).all()
    # 2x2 -> 1x1 is the exact mean
    quad = np.array([[[0], [100]], [[50], [150]]], dtype=np.uint8)
    assert resize_box(quad, 1, 1)[0, 0, 0] == 75


def test_luma_features_identity_and_norm():
    img = _rng(5).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    f1 = luma_grid_features(img, 64)
    f2 = luma_grid_features(img.copy(), 64)
    assert f1 == f2
    assert np.dot(f1, f1) == pytest.approx(1.0, abs=1e-4)
    other = _rng(6).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert abs(np.dot(f1, luma_grid_features(other, 64))) < 0.6


def test_media_strict_mode_real_png_no_fabrication():
    """strict = no fabricated pixels: real PNG decodes (and batches fine),
    corrupt PNG raises instead of inventing dimensions."""
    import pandas as pd

    img = _rng(9).integers(0, 256, (12, 20, 3), dtype=np.uint8)
    good = encode_png(img)
    meta = decode_image(good, mode="strict")
    assert meta["decoded"] and (meta["width"], meta["height"]) == (20, 12)
    assert (meta["pixels"] == img).all()

    with pytest.raises(ValueError):
        decode_image(PNG_MAGIC + b"garbage", mode="strict")

    out = media_meta_pdf(
        pd.DataFrame({"url": ["u1"], "blob": [good]}), mode="strict",
        feature_dim=64,
    )
    row = out.iloc[0]
    assert bool(row["decoded"]) and row["width"] == 20 and row["height"] == 12
    assert row["px_mean"] == pytest.approx(float(img.mean()), abs=1e-3)
    assert len(row["feature"]) == 64


def test_media_fake_mode_degrades_undecodable_png():
    """fake mode keeps fallback-not-fail: a blob that sniffs PNG but does
    not inflate gets stub metadata with decoded=False."""
    import pandas as pd

    out = media_meta_pdf(
        pd.DataFrame({"url": ["u"], "blob": [PNG_MAGIC + b"nope"]}),
        mode="fake",
    )
    row = out.iloc[0]
    assert row["media_type"] == "image/png"
    assert not row["decoded"] and row["px_mean"] is None
    assert row["width"] is not None  # stub dims still flow the plumbing


def _chunk(ct, data):
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + ct + data
            + struct.pack(">I", zlib.crc32(ct + data) & 0xFFFFFFFF))


def test_png_16bit_high_byte_reduction():
    """16-bit PNGs decode with the spec's recommended 8-bit reduction
    (high byte of each big-endian sample): crafted values come back
    exactly, and the REAL third-party 16-bit RGBA vector (CPython's
    idlelib icon) decodes with genuine dimensions and a real alpha
    channel."""
    import glob
    import struct
    import zlib

    import numpy as np

    from exstruct_spark.kernels.png import PNG_MAGIC, decode_png

    h, w = 5, 7
    vals16 = np.random.default_rng(2).integers(
        0, 65536, (h, w, 3), np.uint32).astype(">u2")
    rows = b"".join(b"\x00" + vals16[y].tobytes() for y in range(h))
    raw = (PNG_MAGIC
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
           + _chunk(b"IDAT", zlib.compress(rows)) + _chunk(b"IEND", b""))
    got = decode_png(raw)
    assert np.array_equal(got, (vals16.astype(np.uint32) >> 8
                                ).astype(np.uint8))

    hits = sorted(glob.glob(
        "/root/.pyenv/versions/*/lib/python*/idlelib/Icons/idle_48.png"))
    if hits:
        px = decode_png(open(hits[-1], "rb").read())
        assert px.shape == (48, 48, 4)
        assert len(np.unique(px[:, :, 3])) > 8   # real soft alpha


def test_png_adam7_interlace_roundtrip():
    """Adam7 interlaced PNGs decode: the pass table covers every pixel
    exactly once (pinned), and crafted interlaced files — including
    passes using Sub/Up filters — reconstruct the original image
    byte-exactly across shapes that exercise empty and partial
    passes."""
    import struct
    import zlib

    import numpy as np

    from exstruct_spark.kernels.png import _ADAM7, PNG_MAGIC, decode_png

    cov = np.zeros((8, 8), int)
    for (x0, y0, dx, dy) in _ADAM7:
        cov[y0::dy, x0::dx] += 1
    assert (cov == 1).all()

    def encode_adam7(img, filt_cycle):
        h, w, c = img.shape
        parts = []
        for (x0, y0, dx, dy) in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ph, pw = sub.shape[:2]
            if not filt_cycle:
                parts.append(b"".join(
                    b"\x00" + sub[y].tobytes() for y in range(ph)))
                continue
            buf = bytearray()
            prev = np.zeros(pw * c, np.int32)
            for y in range(ph):
                line = sub[y].reshape(-1).astype(np.int32)
                if y % 2 == 0:  # Sub
                    lanes = line.reshape(pw, c)
                    d = np.diff(np.vstack(
                        [np.zeros((1, c), np.int32), lanes]), axis=0) % 256
                    buf += b"\x01" + d.astype(np.uint8).tobytes()
                else:           # Up
                    buf += b"\x02" + ((line - prev) % 256
                                      ).astype(np.uint8).tobytes()
                prev = line
            parts.append(bytes(buf))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[c],
                           0, 0, 1)
        return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(b"".join(parts)))
                + _chunk(b"IEND", b""))

    import numpy as np
    for shape in [(8, 8, 3), (5, 3, 3), (13, 7, 4), (1, 1, 3), (2, 9, 1),
                  (31, 17, 3)]:
        img = np.random.default_rng(sum(shape)).integers(
            0, 256, shape, np.uint8)
        for fc in (False, True):
            assert np.array_equal(decode_png(encode_adam7(img, fc)), img), \
                (shape, fc)
