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
    # progressive (SOF2) refused honestly
    sof0 = good.index(b"\xff\xc0")
    prog = bytearray(good)
    prog[sof0 + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(prog))


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
