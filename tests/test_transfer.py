"""Device<->host transfer helpers: exact roundtrips for every dtype/shape."""

import numpy as np
import jax

from openpano_tpu.io.transfer import (
    fetch,
    fetch_u8_delta,
    device_put_u8_delta,
)


def test_fetch_u8_roundtrip(rng):
    a = rng.integers(0, 256, (123, 457, 4)).astype(np.uint8)
    out = fetch(jax.device_put(a))
    assert out.dtype == np.uint8 and out.shape == a.shape
    np.testing.assert_array_equal(out, a)


def test_fetch_u8_odd_size(rng):
    # size not divisible by 4: exercises the bitcast pad path
    a = rng.integers(0, 256, (7, 13, 3)).astype(np.uint8)
    np.testing.assert_array_equal(fetch(jax.device_put(a)), a)


def test_fetch_f32(rng):
    a = rng.normal(size=(65, 130)).astype(np.float32)
    out = fetch(jax.device_put(a))
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, a)


def test_fetch_passthrough_numpy(rng):
    a = rng.normal(size=(4, 4))
    assert fetch(a) is a


def test_delta_roundtrips(rng):
    for shape in [(50, 77, 4), (7, 13, 3), (5, 8)]:
        a = rng.integers(0, 256, shape).astype(np.uint8)
        np.testing.assert_array_equal(fetch_u8_delta(jax.device_put(a)), a)
        np.testing.assert_array_equal(np.asarray(device_put_u8_delta(a)), a)
