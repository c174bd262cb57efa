import numpy as np
import jax.numpy as jnp
import pytest

from openpano_tpu.ops import blur, gauss_kernel, resize, rgb2grey, sample_bilinear, crop_to_largest_rect
from openpano_tpu.native import largest_valid_rect, _largest_valid_rect_py

import ref_sift


def test_gauss_kernel_matches_reference(rng):
    for sigma in [1.4142135623, 2.0, 2.828, 5.0]:
        k = gauss_kernel(sigma, 6)
        kr = ref_sift.gauss_kernel(sigma, 6)
        assert k.shape == kr.shape
        np.testing.assert_allclose(k, kr, rtol=1e-6)


def test_blur_matches_reference(rng):
    img = rng.random((20, 17), dtype=np.float32)
    out = np.asarray(blur(jnp.asarray(img), 1.4142135623))
    ref = ref_sift.blur(img, 1.4142135623)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_resize_matches_reference(rng):
    img = rng.random((20, 30, 3), dtype=np.float32)
    out = np.asarray(resize(jnp.asarray(img), 13, 22))
    ref = ref_sift.resize_bilinear(img, 13, 22)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # upsample too
    out = np.asarray(resize(jnp.asarray(img), 33, 41))
    ref = ref_sift.resize_bilinear(img, 33, 41)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_rgb2grey(rng):
    img = rng.random((5, 6, 3), dtype=np.float32)
    np.testing.assert_allclose(np.asarray(rgb2grey(jnp.asarray(img))), img.mean(-1), atol=1e-6)


def test_sample_bilinear_valid_and_sentinel():
    img = np.zeros((4, 4, 3), np.float32)
    img[:, :] = np.arange(4)[None, :, None]  # color = column index
    img[2, 2] = -1.0  # invalid pixel
    imgj = jnp.asarray(img)
    color, valid = sample_bilinear(imgj, jnp.asarray([0.5, 1.5]), jnp.asarray([0.5, 1.5]))
    assert bool(valid[0])
    np.testing.assert_allclose(np.asarray(color[0]), [0.5, 0.5, 0.5], atol=1e-6)
    assert not bool(valid[1])  # touches the invalid (2,2) neighbor
    np.testing.assert_allclose(np.asarray(color[1]), [-1, -1, -1])
    # out of bounds
    color, valid = sample_bilinear(imgj, jnp.asarray([-0.5, 3.5]), jnp.asarray([1.0, 1.0]))
    assert not bool(valid[0]) and not bool(valid[1])


def test_largest_valid_rect_native_vs_python(rng):
    for _ in range(5):
        mask = rng.random((13, 17)) > 0.3
        a = largest_valid_rect(mask)
        b = _largest_valid_rect_py(mask)
        y0, x0, h, w = a
        assert h * w == b[2] * b[3]  # equal areas (ties may differ in position)
        assert mask[y0 : y0 + h, x0 : x0 + w].all()


def test_crop_to_largest_rect():
    img = np.full((6, 8, 3), -1.0, np.float32)
    img[2:5, 1:7] = 0.5
    out = crop_to_largest_rect(img)
    assert out.shape == (3, 6, 3)
    assert (out >= 0).all()


def test_hconcat_vconcat(rng):
    from openpano_tpu.ops import hconcat, vconcat

    a = rng.uniform(size=(2, 3, 3)).astype(np.float32)
    b = rng.uniform(size=(4, 2, 3)).astype(np.float32)
    h = hconcat([a, b])
    assert h.shape == (4, 5, 3)
    np.testing.assert_array_equal(h[:2, :3], a)
    np.testing.assert_array_equal(h[:4, 3:], b)
    assert (h[2:, :3] == 0).all()
    v = vconcat([a, b])
    assert v.shape == (6, 3, 3)
    np.testing.assert_array_equal(v[:2], a)
    np.testing.assert_array_equal(v[2:, :2], b)
    assert (v[2:, 2:] == 0).all()


def test_paired_sampler_matches_plain(rng):
    """The x-paired 6-channel bilinear sampler must agree with the plain
    sampler everywhere — including out-of-bounds coords and INVALID
    sentinel neighborhoods (Color::NO propagation)."""
    import jax.numpy as jnp

    from openpano_tpu.ops.imgproc import INVALID, sample_bilinear
    from openpano_tpu.stitch.render import _sample_bilinear_paired, pair_imgs_x

    H, W = 37, 53
    img = rng.uniform(size=(H, W, 3)).astype(np.float32)
    # scatter some INVALID sentinel pixels
    holes = rng.integers(0, H * W, 40)
    img.reshape(-1, 3)[holes] = INVALID
    img6 = np.asarray(pair_imgs_x(jnp.asarray(img)[None]))[0]

    y = rng.uniform(-3, H + 3, size=(64, 64)).astype(np.float32)
    x = rng.uniform(-3, W + 3, size=(64, 64)).astype(np.float32)
    c0, v0 = sample_bilinear(jnp.asarray(img), jnp.asarray(y), jnp.asarray(x))
    c1, v1 = _sample_bilinear_paired(jnp.asarray(img6), jnp.asarray(y),
                                     jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(
        np.asarray(c0)[np.asarray(v0)], np.asarray(c1)[np.asarray(v1)],
        atol=1e-6,
    )
