"""Native runtime components: delta coder, PNG codec, crop DP.

The native library (native/*.c) must agree exactly with the Python/numpy
fallbacks and with PIL (for the PNG codec).
"""

import io
import os

import numpy as np
import pytest

from openpano_tpu import native


def _rand_img(h=37, w=53, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


def test_native_lib_builds():
    assert native.get_lib() is not None


def test_delta_roundtrip_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (13, 257), np.uint8)
    d = native.delta_encode_rows(x)
    xi = x.astype(np.int16)
    ref = np.concatenate(
        [xi[:, :1], (xi[:, 1:] - xi[:, :-1]) & 0xFF], axis=1
    ).astype(np.uint8)
    np.testing.assert_array_equal(d, ref)
    np.testing.assert_array_equal(native.delta_decode_rows(d), x)


def test_png_roundtrip():
    img = _rand_img()
    data = native.png_encode_rgb8(img)
    assert data is not None and data[:4] == b"\x89PNG"
    out = native.png_decode_rgb8(data)
    np.testing.assert_array_equal(out, img)


def test_png_decode_matches_pil():
    from PIL import Image

    img = _rand_img(29, 31, seed=2)
    data = native.png_encode_rgb8(img)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(pil, img)


def test_png_decode_pil_encoded_variants():
    """Decode PNGs written by PIL in the color types the codec supports."""
    from PIL import Image

    img = _rand_img(17, 23, seed=3)
    for mode, expect in [
        ("RGB", img),
        ("RGBA", None),  # alpha dropped
        ("L", None),     # grey replicated
    ]:
        pil_img = Image.fromarray(img, "RGB").convert(mode)
        buf = io.BytesIO()
        pil_img.save(buf, format="PNG")
        out = native.png_decode_rgb8(buf.getvalue())
        assert out is not None, mode
        ref = np.asarray(pil_img.convert("RGB"))
        np.testing.assert_array_equal(out, ref)


def test_png_decode_rejects_garbage():
    assert native.png_decode_rgb8(b"not a png at all") is None


def test_read_write_rgb_png(tmp_path):
    from openpano_tpu.io import read_img, write_rgb

    img = _rand_img(11, 13, seed=4).astype(np.float32) / 255.0
    img[0, 0] = -1.0  # invalid sentinel -> white
    p = os.path.join(tmp_path, "t.png")
    write_rgb(p, img)
    back = read_img(p)
    assert back.shape == img.shape
    np.testing.assert_allclose(back[0, 0], [1.0, 1.0, 1.0])
    np.testing.assert_allclose(back[1:], img[1:], atol=1 / 255.0 + 1e-6)
