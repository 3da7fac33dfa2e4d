"""TPU-native training loops (nn/train.py): UDP encode/decode
round-trip, layer-decay optimizer structure, loss descent for the pose
and ID networks (reference training configs: model/pose/td-hm_...py
optim_wrapper/param_scheduler/codec, model/id/..._finetuned.py loss)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_udp_encode_decode_roundtrip():
    from macaque_tpu.nn.train import udp_encode
    from macaque_tpu.nn.heatmap import udp_decode

    rng = np.random.default_rng(0)
    kps = jnp.asarray(rng.uniform(30, 160, (2, 5, 2)))
    vis = jnp.ones((2, 5))
    hm, w = udp_encode(kps, vis)
    assert hm.shape == (2, 64, 48, 5)
    np.testing.assert_array_equal(np.asarray(w), 1.0)

    dec, scores = udp_decode(hm)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(kps), atol=0.25)
    assert (np.asarray(scores) > 0.9).all()


def test_udp_encode_masks_invisible_and_outside():
    from macaque_tpu.nn.train import udp_encode

    kps = jnp.asarray([[[50.0, 50.0], [500.0, 50.0], [60.0, 70.0]]])
    vis = jnp.asarray([[1.0, 1.0, 0.0]])
    hm, w = udp_encode(kps, vis)
    np.testing.assert_array_equal(np.asarray(w)[0], [1.0, 0.0, 0.0])
    assert np.asarray(hm)[0, :, :, 1].max() == 0.0   # outside input
    assert np.asarray(hm)[0, :, :, 2].max() == 0.0   # invisible


def test_layer_decay_scales():
    from macaque_tpu.nn.train import _pose_layer_id, _no_decay
    import jax.tree_util as jtu

    from macaque_tpu.nn import ViTPose, VitPoseConfig

    cfg = VitPoseConfig(img_size=(64, 48), embed_dim=32, depth=3,
                        num_heads=2, deconv_channels=(8,))
    model = ViTPose(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)))
    ids = jtu.tree_map_with_path(
        lambda p, _: _pose_layer_id(p, 3), variables["params"])
    flat = jtu.tree_flatten_with_path(ids)[0]
    byname = {"/".join(getattr(k, "key", str(k)) for k in path): v
              for path, v in flat}
    assert byname["backbone/patch_embed/kernel"] == 0
    assert byname["backbone/pos_embed"] == 0
    assert byname["backbone/block0/attn/qkv/kernel"] == 1
    assert byname["backbone/block2/fc1/kernel"] == 3
    assert byname["backbone/ln_final/scale"] == 4
    assert byname["head/deconv0/kernel"] == 4

    nd = jtu.tree_map_with_path(lambda p, _: _no_decay(p),
                                variables["params"])
    flatnd = jtu.tree_flatten_with_path(nd)[0]
    bynd = {"/".join(getattr(k, "key", str(k)) for k in path): v
            for path, v in flatnd}
    assert bynd["backbone/pos_embed"] is True
    assert bynd["backbone/block0/ln1/scale"] is True
    assert bynd["backbone/block0/attn/qkv/bias"] is True
    assert bynd["backbone/block0/attn/qkv/kernel"] is False


@pytest.mark.slow
def test_pose_training_reduces_loss():
    from macaque_tpu.nn import ViTPose, VitPoseConfig
    from macaque_tpu.nn.train import (
        make_pose_optimizer, make_pose_train_step, pose_lr_schedule,
        udp_encode, keypoint_mse_loss,
    )

    cfg = VitPoseConfig(img_size=(64, 48), embed_dim=32, depth=2,
                        num_heads=2, deconv_channels=(8, 8))
    model = ViTPose(cfg)
    rng = np.random.default_rng(1)
    crops = jnp.asarray(rng.normal(0, 1, (4, 64, 48, 3)).astype(np.float32))
    kps = jnp.asarray(rng.uniform(8, 40, (4, 17, 2)).astype(np.float32))
    vis = jnp.ones((4, 17))

    variables = model.init(jax.random.PRNGKey(0), crops)
    params = variables["params"]
    batch_stats = {"batch_stats": variables["batch_stats"]}
    sched = pose_lr_schedule(base_lr=2e-3, warmup_steps=5)
    opt = make_pose_optimizer(params, schedule=sched, num_layers=2)
    opt_state = opt.init(params)
    step = make_pose_train_step(model, opt)

    losses = []
    for _ in range(30):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, crops, kps, vis)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


@pytest.mark.slow
def test_id_training_reduces_loss_and_loss_matches_manual():
    from macaque_tpu.nn.resnet import ResNetClassifier, ResNetConfig
    from macaque_tpu.nn.train import (
        make_id_train_step, label_smooth_loss, ID_CLASS_WEIGHTS,
    )
    import optax
    from dataclasses import dataclass

    # manual oracle for the loss
    rng = np.random.default_rng(2)
    logits = rng.normal(0, 2, (5, 6)).astype(np.float32)
    labels = rng.integers(0, 6, 5)
    got = float(label_smooth_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  ID_CLASS_WEIGHTS))
    w = np.asarray(ID_CLASS_WEIGHTS)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    onehot = np.eye(6)[labels]
    y = onehot * 0.9 + 0.1 / 6
    want = -np.mean((y * w * logp).sum(-1))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    @dataclass(frozen=True)
    class TinyCfg(ResNetConfig):
        @property
        def stage_blocks(self):
            return (1, 1)

    model = ResNetClassifier(TinyCfg())
    imgs = jnp.asarray(rng.normal(0, 1, (6, 64, 64, 3)).astype(np.float32))
    lbls = jnp.asarray(np.arange(6) % 6)
    variables = model.init(jax.random.PRNGKey(0), imgs)
    params = variables["params"]
    batch_stats = {"batch_stats": variables["batch_stats"]}
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = make_id_train_step(model, opt)

    losses = []
    for _ in range(25):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, imgs, lbls)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::8]
