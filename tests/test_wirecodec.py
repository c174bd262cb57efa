"""Wire codec: lossless roundtrip through host pack4 + device decode."""

import jax
import numpy as np
import pytest

from openpano_tpu import native
from openpano_tpu.io import wirecodec


def _photo_plane(rng, rows, cols, noise=0.02):
    base = np.cumsum(rng.integers(-3, 4, (rows, cols)), axis=1)
    base = (base % 256).astype(np.uint8)
    mask = rng.random((rows, cols)) < noise
    base[mask] = rng.integers(0, 256, int(mask.sum()))
    return base


class TestGapCode:
    def test_empty(self):
        g, v = wirecodec._gap_code(np.zeros(0, np.int64), np.zeros(0, np.uint8))
        assert g.size == 0 and v.size == 0

    def test_small_gaps_roundtrip(self):
        idx = np.array([0, 1, 5, 70000, 70001, 200000], np.int64)
        val = np.arange(6, dtype=np.uint8) + 10
        g, v = wirecodec._gap_code(idx, val)
        # decode on host: escapes advance 65535, real entries advance gap+1
        pos, out_i, out_v = -1, [], []
        for gi, vi in zip(g, v):
            if gi == wirecodec._ESC:
                pos += 65535
            else:
                pos += int(gi) + 1
                out_i.append(pos)
                out_v.append(vi)
        assert np.array_equal(out_i, idx)
        assert np.array_equal(out_v, val)

    def test_huge_gap_uses_escapes(self):
        idx = np.array([0, 500_000], np.int64)
        val = np.array([1, 2], np.uint8)
        g, v = wirecodec._gap_code(idx, val)
        assert (g == wirecodec._ESC).sum() >= 7  # 499999 // 65535


class TestPack4:
    def test_native_matches_python(self):
        rng = np.random.default_rng(3)
        plane = _photo_plane(rng, 101, 257)
        ref = native._wire_pack4_py(plane)
        out = native.wire_pack4(plane)
        assert out is not None
        assert np.array_equal(out[0], ref[0])
        assert np.array_equal(out[1], ref[1])
        assert np.array_equal(out[2], ref[2])

    def test_noise_overflows_to_none(self):
        rng = np.random.default_rng(0)
        noise = rng.integers(0, 256, (64, 128)).astype(np.uint8)
        assert native.wire_pack4(noise, exc_frac=0.05) is None


class TestDeviceRoundtrip:
    @pytest.mark.parametrize("rows,cols", [(64, 96), (63, 97), (1, 8)])
    def test_lossless(self, rows, cols):
        rng = np.random.default_rng(rows * 1000 + cols)
        plane = _photo_plane(rng, rows, cols)
        stream = wirecodec.encode_plane(plane)
        assert stream is not None
        dec = np.asarray(wirecodec.upload_plane(stream))
        assert np.array_equal(dec, plane)

    def test_lossless_exception_heavy(self):
        rng = np.random.default_rng(9)
        plane = _photo_plane(rng, 40, 120, noise=0.08)
        stream = wirecodec.encode_plane(plane)
        assert stream is not None
        dec = np.asarray(wirecodec.upload_plane(stream))
        assert np.array_equal(dec, plane)

    def test_upload_u8_rows_raw_fallback(self):
        rng = np.random.default_rng(1)
        noise = rng.integers(0, 256, (32, 64)).astype(np.uint8)
        dec = np.asarray(wirecodec.upload_u8_rows(noise))
        assert np.array_equal(dec, noise)

    def test_background_upload(self):
        rng = np.random.default_rng(2)
        plane = _photo_plane(rng, 300, 400)
        up = wirecodec.BackgroundUpload(plane)
        dec = np.asarray(up.result())
        assert np.array_equal(dec, plane)

    def test_background_upload_raw(self):
        rng = np.random.default_rng(4)
        noise = rng.integers(0, 256, (300, 400)).astype(np.uint8)
        up = wirecodec.BackgroundUpload(noise)
        dec = np.asarray(up.result())
        assert np.array_equal(dec, noise)


class TestGrey:
    def test_rounded_mean(self):
        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
        g = native.wire_grey_u8(rgb)
        expect = np.round(rgb.astype(np.float64).mean(axis=-1)).astype(np.uint8)
        assert np.array_equal(g, expect)


class TestGreySum:
    def test_exact_channel_sum(self):
        rng = np.random.default_rng(6)
        rgb = rng.integers(0, 256, (21, 35, 3)).astype(np.uint8)
        g, r = native.wire_grey_res_u8(rgb)
        s = rgb.astype(np.int32).sum(axis=-1)
        assert np.array_equal(3 * g.astype(np.int32) + r.astype(np.int32) - 1, s)
        assert set(np.unique(r)) <= {0, 1, 2}

    def test_native_matches_python(self):
        rng = np.random.default_rng(7)
        rgb = rng.integers(0, 256, (16, 9, 3)).astype(np.uint8)
        gn, rn = native.wire_grey_res_u8(rgb)
        s = rgb.reshape(-1, 3).astype(np.int32).sum(axis=1)
        gp = ((2 * s + 3) // 6).astype(np.int32)
        rp = (s - 3 * gp + 1).astype(np.uint8)
        assert np.array_equal(gn.reshape(-1), gp.astype(np.uint8))
        assert np.array_equal(rn.reshape(-1), rp)


class TestPack2:
    @pytest.mark.parametrize("rows", [64, 63, 62, 61, 1])
    def test_roundtrip(self, rows):
        rng = np.random.default_rng(rows)
        plane = rng.integers(0, 3, (rows, 37)).astype(np.uint8)
        dec = np.asarray(wirecodec.upload_2bit_rows(plane))
        assert np.array_equal(dec, plane)


class TestPack2Codec:
    @pytest.mark.parametrize("rows", [64, 63, 62, 61])
    def test_lossless(self, rows):
        rng = np.random.default_rng(rows + 500)
        base = (np.cumsum(rng.integers(-1, 2, (rows, 97)), axis=1)
                % 256).astype(np.uint8)
        base[rng.random((rows, 97)) < 0.02] = rng.integers(0, 256)
        stream = wirecodec.encode_plane(base, bits=2)
        assert stream is not None and stream.bits == 2
        dec = np.asarray(wirecodec.upload_plane(stream))
        assert np.array_equal(dec, base)

    def test_background_upload_2bit(self):
        rng = np.random.default_rng(77)
        base = (np.cumsum(rng.integers(-1, 2, (300, 200)), axis=1)
                % 256).astype(np.uint8)
        up = wirecodec.BackgroundUpload(base, bits=2)
        assert np.array_equal(np.asarray(up.result()), base)


class TestCodedFetch:
    """Download direction: device-side encode (encode_plane_device) +
    threaded C decode (native.wire_unpack)."""

    @pytest.mark.parametrize("shape", [(64, 32), (63, 33), (1, 64), (5, 8),
                                       (2, 4), (7, 3)])
    def test_roundtrip_shapes(self, shape):
        rng = np.random.default_rng(shape[0] * 100 + shape[1])
        plane = rng.integers(0, 256, shape).astype(np.uint8)
        got = wirecodec.CodedFetch(
            jax.device_put(plane), cap=plane.size + 16).wait()
        assert np.array_equal(got, plane)

    def test_photo_content_exact(self):
        rng = np.random.default_rng(0)
        plane = _photo_plane(rng, 400, 512)
        got = wirecodec.CodedFetch(jax.device_put(plane)).wait()
        assert np.array_equal(got, plane)

    def test_overflow_falls_back_raw(self):
        rng = np.random.default_rng(1)
        plane = rng.integers(0, 256, (256, 256)).astype(np.uint8)
        got = wirecodec.CodedFetch(jax.device_put(plane), cap=64).wait()
        assert np.array_equal(got, plane)

    def test_row_chunked_large_plane(self):
        # R*C just over the i32 idx<<8 packing bound forces two chunks
        rng = np.random.default_rng(2)
        rows = (wirecodec._MAX_PLANE // 2048) + 7
        plane = _photo_plane(rng, rows, 2048)
        cf = wirecodec.CodedFetch(jax.device_put(plane))
        assert len(cf._parts) == 2
        assert np.array_equal(cf.wait(), plane)

    def test_exc_beyond_inline_prefix(self):
        # noisy enough to exceed the inline budget but stay under cap:
        # exercises the second (sliced) exception fetch
        rng = np.random.default_rng(3)
        plane = _photo_plane(rng, 256, 256, noise=0.10)
        cf = wirecodec.CodedFetch(jax.device_put(plane),
                                  cap=plane.size // 2)
        p = cf._parts[0]
        got = cf.wait()
        assert np.array_equal(got, plane)

    def test_wire_unpack_c_vs_numpy(self):
        rng = np.random.default_rng(4)
        plane = _photo_plane(rng, 333, 177, noise=0.05)
        packed, idx, val = native._wire_pack4_py(plane)
        outC = native.wire_unpack(packed, 333, 177,
                                  idx.astype(np.int64), val)
        assert np.array_equal(outC, plane)
