import numpy as np
import jax.numpy as jnp

from macaque_tpu.nn.preprocess import (
    _bilinear_sample, _matmul_resample, resize_bilinear, udp_crop,
    id_crops, bbox_to_center_scale, crop_coords_to_image,
)


def test_matmul_resample_matches_gather():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(60, 45, 3)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-2, 61, 32).astype(np.float32))
    xs = jnp.asarray(rng.uniform(-2, 46, 24).astype(np.float32))
    want = np.asarray(_bilinear_sample(
        img, jnp.broadcast_to(ys[:, None], (32, 24)),
        jnp.broadcast_to(xs[None, :], (32, 24))))
    got = np.asarray(_matmul_resample(img, ys, xs))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_resize_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (48, 36, 3)).astype(np.float32)
    want = cv2.resize(img, (18, 24), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear(jnp.asarray(img), (24, 18)))
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_udp_crop_roundtrip():
    """Keypoints decoded in crop space must map back exactly."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(size=(100, 80, 3)).astype(np.float32))
    boxes = jnp.asarray([[20.0, 30.0, 60.0, 80.0]])
    centers, scales = bbox_to_center_scale(boxes)
    crops = udp_crop(img, centers, scales, out_hw=(64, 48))
    assert crops.shape == (1, 64, 48, 3)
    # a crop-space point maps back into the expanded box
    kp_crop = jnp.asarray([[[24.0, 32.0]]])
    kp_img = np.asarray(crop_coords_to_image(kp_crop, centers, scales,
                                             out_hw=(64, 48)))
    assert 20 - 15 < kp_img[0, 0, 0] < 60 + 15


def test_id_crops_shape_and_content():
    rng = np.random.default_rng(3)
    img = np.zeros((100, 100, 3), np.float32)
    img[40:60, 40:60] = 7.0
    crops = np.asarray(id_crops(jnp.asarray(img),
                                jnp.asarray([[40.0, 40, 60, 60]])))
    assert crops.shape == (1, 224, 224, 3)
    # centre of the crop samples inside the bright square
    assert abs(crops[0, 112, 112, 0] - 7.0) < 0.2
