"""Baseline JPEG codec (stages/jpeg.py): round-trip quality bounds,
exactness on flat blocks, profile guards, padding shapes, determinism,
and the actor-pool decode query end-to-end."""

import numpy as np
import pytest

from engine.stages.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = (a.astype(np.float64) - b.astype(np.float64))
    mse = (err ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def _gradient(h: int, w: int, seed: int = 0) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 4 + seed) % 256, (xx * 3) % 256,
                     ((yy + xx) * 2) % 256], axis=-1).astype(np.uint8)


def test_jpeg_roundtrip_gradient_quality():
    img = _gradient(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert _psnr(img, out) > 40.0


def test_jpeg_flat_blocks_exact():
    """Constant blocks survive quantization exactly (DC-only)."""
    for v in (0, 128, 180, 255):
        flat = np.full((16, 24, 3), v, np.uint8)
        out = decode_jpeg(encode_jpeg(flat, quality=90))
        assert np.array_equal(out, flat), v


def test_jpeg_non_multiple_of_8_shapes():
    """SOF carries the original dimensions; the decoder crops the
    edge-replication padding — every shape round-trips to itself."""
    for h, w in ((9, 13), (17, 8), (31, 33)):
        img = _gradient(h, w, seed=h * w)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == (h, w, 3)
        assert _psnr(img, out) > 35.0


def test_jpeg_noise_psnr_scales_with_quality():
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    p50 = _psnr(noise, decode_jpeg(encode_jpeg(noise, quality=50))[:24, :24])
    p95 = _psnr(noise, decode_jpeg(encode_jpeg(noise, quality=95))[:24, :24])
    assert p95 > p50 > 10.0


def test_jpeg_deterministic():
    img = _gradient(32, 32, seed=5)
    a, b = encode_jpeg(img, 85), encode_jpeg(img, 85)
    assert a == b
    assert np.array_equal(decode_jpeg(a), decode_jpeg(b))


def test_jpeg_profile_guards():
    img = _gradient(16, 16)
    payload = bytearray(encode_jpeg(img, 85))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00" + bytes(payload[2:]))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8), np.uint8))  # not (h, w, 3)
    # flip SOF0 -> SOF2 (progressive): loud rejection
    i = bytes(payload).find(b"\xFF\xC0")
    payload[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(payload))


def test_jpeg_dispatch_and_query(ray_session):
    """ImageDecoder dispatches on the FFD8 magic; the registered query
    is deterministic and feature-sane vs the lossless original."""
    from engine.queries import QUERIES
    from engine.stages.multimodal import decode_image, synth_jpeg_table

    t = synth_jpeg_table(4)
    img = decode_image(t["payload"][0].as_py())
    assert img.shape == (32, 32, 3)

    import engine.queries_ext  # noqa: F401

    a = QUERIES["multimodal_jpeg_decode_features"]("unused")
    b = QUERIES["multimodal_jpeg_decode_features"]("unused")
    assert a.equals(b)
    assert a.num_rows == 256
    # features come from real decoded pixels: the gradient's mean
    # luminance is mid-range, never 0/255 (a stub would give garbage)
    means = np.array(a["feat_mean_x10k"].to_pylist()) / 10000.0
    assert ((means > 50) & (means < 220)).all()
