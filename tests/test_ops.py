"""Image-op tests: INTER_AREA resize parity vs a numpy oracle / OpenCV."""

import numpy as np
import pytest

from envpool_tpu.ops.image import (
    grayscale,
    maxpool2,
    resize_area,
    resize_matrices,
)


def _np_area_resize(img: np.ndarray, out_hw) -> np.ndarray:
    """Float64 oracle of exact area-overlap averaging."""
    h, w = img.shape
    oh, ow = out_hw

    def weights(n_in, n_out):
        m = np.zeros((n_out, n_in))
        scale = n_in / n_out
        for o in range(n_out):
            lo, hi = o * scale, (o + 1) * scale
            for i in range(int(np.floor(lo)), min(int(np.ceil(hi)), n_in)):
                m[o, i] = max(0.0, min(hi, i + 1) - max(lo, i))
            m[o] /= m[o].sum()
        return m

    return weights(h, oh) @ img.astype(np.float64) @ weights(w, ow).T


def test_resize_matches_numpy_oracle() -> None:
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (210, 160)).astype(np.float32)
    got = resize_area(img, (84, 84), np.float32)
    expect = _np_area_resize(img, (84, 84))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-4, atol=1e-2)


def test_resize_uint8_matches_opencv_if_available() -> None:
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (210, 160)).astype(np.uint8)
    got = np.asarray(resize_area(img.astype(np.float32), (84, 84), np.uint8))
    expect = cv2.resize(img, (84, 84), interpolation=cv2.INTER_AREA)
    # OpenCV uses fixed-point accumulation; allow off-by-one.
    assert np.abs(got.astype(int) - expect.astype(int)).max() <= 1


def test_resize_weight_rows_sum_to_one() -> None:
    wh, ww = resize_matrices((210, 160), (84, 84))
    np.testing.assert_allclose(np.asarray(wh).sum(1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ww).sum(0), 1.0, rtol=1e-5)


def test_resize_constant_image_invariant() -> None:
    img = np.full((210, 160), 87.0, np.float32)
    out = np.asarray(resize_area(img, (84, 84), np.uint8))
    assert (out == 87).all()


def test_grayscale_luma() -> None:
    rgb = np.zeros((3, 4, 4), np.float32)
    rgb[0] = 255  # pure red
    y = np.asarray(grayscale(rgb))
    assert (y == round(0.299 * 255)).all()


def test_maxpool2() -> None:
    a = np.array([[1, 5]], np.uint8)
    b = np.array([[3, 2]], np.uint8)
    np.testing.assert_array_equal(np.asarray(maxpool2(a, b)), [[3, 5]])


def test_batched_resize() -> None:
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (8, 210, 160)).astype(np.float32)
    out = np.asarray(resize_area(imgs, (84, 84), np.uint8))
    assert out.shape == (8, 84, 84)
    single = np.asarray(resize_area(imgs[3], (84, 84), np.uint8))
    np.testing.assert_array_equal(out[3], single)


def test_pallas_fused_pool_resize_interpret() -> None:
    """Pallas kernel (interpret mode on CPU) == XLA path, bit exact."""
    import jax.numpy as jnp

    from envpool_tpu.ops.pallas_image import fused_pool_resize

    rng = np.random.default_rng(3)
    frames = jnp.asarray(
        rng.uniform(0, 255, (4, 2, 210, 160)).astype(np.float32)
    )
    out = np.asarray(fused_pool_resize(frames, (84, 84), interpret=True))
    ref = np.asarray(
        resize_area(maxpool2(frames[:, 0], frames[:, 1]), (84, 84), np.uint8)
    )
    np.testing.assert_array_equal(out, ref)
