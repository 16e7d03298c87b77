"""Real baseline JPEG decode (kernels/jpeg.py).  Spec compliance is
pinned against a REAL third-party baseline JPEG (the CPython test-suite
vector, read from the interpreter installation — never copied here), so
the decoder is not merely self-consistent with this repo's encoder.
Round-trips assert reconstruction quality (JPEG is lossy) across 4:4:4
and 4:2:0 and the quality dial; the media kernel path asserts real
pixels flow in strict mode."""

import glob

import numpy as np
import pytest

from exstruct_spark.kernels.jpeg import decode_jpeg, encode_jpeg
from exstruct_spark.kernels.media import decode_image, sniff_media_type


def _psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255 ** 2 / mse) if mse else np.inf


def _stdlib_jpeg():
    hits = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/**/python.jpg",
        recursive=True,
    )
    return sorted(hits)[-1] if hits else None


def test_decode_real_third_party_vector():
    """The CPython test JPEG (16x16 Python logo, baseline, 4:2:0-class
    sampling, Annex-K-style tables from a real encoder) decodes to the
    logo: blue and yellow regions in the right halves, dark corners."""
    path = _stdlib_jpeg()
    if path is None:
        pytest.skip("no CPython test JPEG on this host")
    img = decode_jpeg(open(path, "rb").read()).astype(int)
    assert img.shape == (16, 16, 3)
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    blue = (b > r + 30) & (b > 60)
    yellow = (r > b + 30) & (g > b + 10)
    assert blue.sum() > 40 and yellow.sum() > 40
    # the logo's blue mass sits in the top half, yellow in the bottom
    assert blue[:8].sum() > blue[8:].sum()
    assert yellow[8:].sum() > yellow[:8].sum()
    assert img[0, 0].sum() < 60  # dark corner


def _smooth_rgb(h, w, seed=5):
    """Luma-dominant smooth gradient: chroma varies gently (10-20% of
    luma swing) so 4:2:0 subsampling is a fair test rather than a
    chroma-destruction measurement."""
    xx, yy = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
    base = 128 + 80 * np.sin(4 * xx + seed) * np.cos(3 * yy)
    tint = 12 * np.sin(2 * xx) * np.cos(yy + seed)
    return np.stack(
        [base + tint, base, base - tint], axis=2
    ).clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [(40, 48), (17, 23), (8, 8), (9, 33)])
@pytest.mark.parametrize("subsample", [False, True])
def test_roundtrip_psnr(shape, subsample):
    """Encode->decode reconstructs a smooth image faithfully at every
    block-alignment edge case (non-multiple-of-8/16 dims exercise the
    padding + crop paths)."""
    img = _smooth_rgb(*shape)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
    assert dec.shape == img.shape
    assert _psnr(dec, img) > (28 if subsample else 35)


def test_quality_dial_orders_error_and_size():
    img = _smooth_rgb(40, 40)
    encs = {q: encode_jpeg(img, quality=q) for q in (30, 70, 95)}
    psnrs = {q: _psnr(decode_jpeg(e), img) for q, e in encs.items()}
    assert psnrs[95] > psnrs[70] > psnrs[30]
    assert len(encs[95]) > len(encs[30])


def test_jpeg_malformed_and_unsupported_raise():
    img = _smooth_rgb(16, 16)
    good = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00" + good[2:])          # bad SOI
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])                        # truncated pre-SOS
    # a baseline stream whose SOF marker is flipped to SOF2 is a
    # MALFORMED progressive file (its single scan says Ss=0,Se=63 — a
    # DC scan may not carry a spectral band): still ValueError, the
    # fallback net holds
    sof0 = good.index(b"\xff\xc0")
    prog = bytearray(good)
    prog[sof0 + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))
    # genuinely unsupported modes still refuse honestly (SOF3 lossless)
    lossless = bytearray(good)
    lossless[sof0 + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF3"):
        decode_jpeg(bytes(lossless))


def test_media_kernel_jpeg_real_pixels():
    img = _smooth_rgb(24, 32)
    raw = encode_jpeg(img, quality=92)
    assert sniff_media_type(raw) == "image/jpeg"
    meta = decode_image(raw, mode="strict")
    assert meta["decoded"] is True
    assert (meta["width"], meta["height"]) == (32, 24)
    assert _psnr(meta["pixels"], img) > 30
    # corrupt jpeg: strict raises, fake degrades to the stub
    with pytest.raises(ValueError):
        decode_image(raw[:60], mode="strict")
    assert decode_image(raw[:60], mode="fake")["decoded"] is False


def test_zero_dimension_sof_rejected_and_degrades():
    """ADVICE r4 (medium), JPEG side: SOF width/height 0 must raise
    ValueError inside the decoder so fake mode degrades instead of
    dividing by zero in the resize math."""
    import struct

    from exstruct_spark.kernels.media import decode_image

    jp0 = (
        b"\xff\xd8\xff\xc0" + struct.pack(">H", 11) + bytes([8])
        + struct.pack(">HH", 0, 0) + bytes([1, 1, 0x11, 0]) + b"\xff\xd9"
    )
    with pytest.raises(ValueError):
        decode_jpeg(jp0)
    meta = decode_image(jp0, "fake")
    assert meta["decoded"] is False
    with pytest.raises(ValueError):
        decode_image(jp0, "strict")


# --------------------------------------------------------------------------
# progressive (SOF2, T.81 Annex G)
# --------------------------------------------------------------------------

_PROG_VECTORS = [
    # (path, height, width, facts) — REAL third-party progressive JPEGs
    # found on the host (nodejs docs, Spark's mllib sample data); never
    # copied into the repo.
    ("/usr/share/doc/nodejs/thin-white-stripe.jpg", 58, 493, "stripe"),
    ("/usr/share/doc/nodejs/full-white-stripe.jpg", 312, 493, "stripe"),
    ("/opt/spark/data/mllib/images/origin/multi-channel/grayscale.jpg",
     215, 300, "gray"),
]


@pytest.mark.parametrize("path,h,w,fact", _PROG_VECTORS)
def test_progressive_third_party_vectors(path, h, w, fact):
    """The progressive decoder on REAL third-party SOF2 streams (written
    by real encoders, with EOB runs / successive approximation in the
    wild): dimensions must be exact and the content structurally right
    (the nodejs images are white-stripe banners; the Spark mllib vector
    is a 1-component grayscale photo)."""
    import os

    if not os.path.exists(path):
        pytest.skip(f"vector not present: {path}")
    px = decode_jpeg(open(path, "rb").read())
    assert px.shape == (h, w, 3)
    if fact == "stripe":
        # mostly-white banner: a majority of rows are near-white
        rowmean = px.mean(axis=(1, 2))
        assert (rowmean >= 245).sum() > len(rowmean) * 0.5
    else:
        # grayscale replicated across channels, real photo statistics
        assert np.array_equal(px[:, :, 0], px[:, :, 1])
        assert np.array_equal(px[:, :, 1], px[:, :, 2])
        assert 30 < px.std() < 120


@pytest.mark.parametrize("quality", [60, 90])
@pytest.mark.parametrize("subsample", [False, True])
def test_progressive_cross_path_byte_identity(quality, subsample):
    """decode(progressive) must be BYTE-identical to decode(baseline)
    for the same source: both encoders quantize the same coefficients
    (shared _fdct_quant), so the two entropy paths — sequential Huffman
    vs Annex-G spectral selection + successive approximation with EOB
    runs, ZRL and correction bits — must reconstruct the exact same
    pixels.  The baseline path is spec-pinned on a third-party vector,
    which transfers that pin to the progressive path."""
    from exstruct_spark.kernels.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(23 + quality)
    gy, gx = np.mgrid[0:40, 0:56]
    images = [
        rng.integers(0, 256, (17, 23, 3)).astype(np.uint8),   # dense AC
        np.stack([(gy * 3) % 256, (gx * 2) % 256,
                  ((gy + gx) * 2) % 256], axis=2).astype(np.uint8),
        np.full((24, 24, 3), 130, np.uint8),                  # all-EOB
    ]
    for img in images:
        base = decode_jpeg(encode_jpeg(img, quality, subsample=subsample))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality, subsample=subsample))
        assert np.array_equal(base, prog)


def test_progressive_media_strict_and_truncation():
    """media decode_image: a progressive blob decodes for REAL in strict
    mode (no fabricated pixels) with genuine dimensions; a truncated
    progressive stream degrades in fake mode and raises in strict."""
    from exstruct_spark.kernels.jpeg import encode_jpeg_progressive

    gy, gx = np.mgrid[0:33, 0:47]
    img = np.stack([(gy * 5) % 256, (gx * 3) % 256,
                    (gy + gx) % 256], axis=2).astype(np.uint8)
    raw = encode_jpeg_progressive(img, 85)
    meta = decode_image(raw, "strict")
    assert meta["decoded"] is True
    assert (meta["height"], meta["width"]) == (33, 47)
    assert sniff_media_type(bytes(raw)) == "image/jpeg"
    # truncation mid-scan: fallback-not-fail contract holds
    cut = raw[: len(raw) // 2]
    with pytest.raises(ValueError):
        decode_jpeg(cut)
    assert decode_image(cut, "fake")["decoded"] is False
