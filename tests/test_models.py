"""Network module tests: shapes, torch-parity of conv conventions, weight
conversion structure, gradient clipping, unrolled training forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from droid_slam_reserch_tpu import lie
from droid_slam_reserch_tpu.geom import neighbourhood_graph
from droid_slam_reserch_tpu.models import (
    BasicEncoder,
    ConvGRU,
    DroidNet,
    UpdateModule,
    convert_torch_checkpoint,
    cvx_upsample,
    gradient_clip,
)
from droid_slam_reserch_tpu.models.layers import tconv


def test_tconv_matches_torch():
    """Explicit symmetric padding must reproduce torch conv outputs exactly."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    w = rng.randn(8, 3, 7, 7).astype(np.float32)  # torch OIHW
    b = rng.randn(8).astype(np.float32)

    conv = tconv(8, 7, 2, padding=3)
    params = {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "bias": jnp.asarray(b)}}
    y_flax = conv.apply(params, jnp.asarray(x))

    y_torch = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=3,
    ).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(y_flax), y_torch, atol=1e-4)


def test_encoder_shapes():
    enc = BasicEncoder(output_dim=128, norm_fn="instance")
    x = jnp.zeros((2, 64, 96, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (2, 8, 12, 128)


def test_update_module_shapes():
    up = UpdateModule()
    B, N, H, W = 1, 4, 6, 8
    net = jnp.zeros((B, N, H, W, 128))
    inp = jnp.zeros((B, N, H, W, 128))
    corr = jnp.zeros((B, N, H, W, 196))
    flow = jnp.zeros((B, N, H, W, 4))
    kk = jnp.array([0, 0, 1, 2])
    params = up.init(jax.random.PRNGKey(0), net, inp, corr, flow, kk, 3)
    net2, delta, weight, eta, upmask = up.apply(params, net, inp, corr, flow, kk, 3)
    assert net2.shape == net.shape
    assert delta.shape == (B, N, H, W, 2)
    assert weight.shape == (B, N, H, W, 2)
    assert eta.shape == (B, 3, H, W)
    assert upmask.shape == (B, 3, H, W, 576)
    assert float(jnp.min(weight)) >= 0.0 and float(jnp.max(weight)) <= 1.0
    assert float(jnp.min(eta)) >= 0.0

    # without aggregation
    net3, d3, w3 = up.apply(params, net, inp, corr)
    assert d3.shape == (B, N, H, W, 2)


def test_cvx_upsample_convexity():
    """Convex combination of a constant field is that constant."""
    data = jnp.full((2, 4, 6, 1), 3.5)
    mask = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 576))
    up = cvx_upsample(data, mask)
    assert up.shape == (2, 32, 48, 1)
    # borders mix zero padding (same as the reference's F.unfold(padding=1));
    # the interior must be exactly the constant
    np.testing.assert_allclose(np.asarray(up[:, 8:-8, 8:-8]), 3.5, atol=1e-5)


def test_gradient_clip():
    def f(x):
        return jnp.sum(gradient_clip(x * 100.0))

    g = jax.grad(f)(jnp.ones(4))
    # dL/dx through clip: upstream grad to clip is 1 per element (<= 0.01? no:
    # grad wrt clip input is 1.0 > 0.01 -> zeroed -> then *100
    np.testing.assert_allclose(np.asarray(g), 0.0)

    def f2(x):
        return jnp.sum(gradient_clip(x) * 0.005)

    g2 = jax.grad(f2)(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g2), 0.005)


def test_checkpoint_conversion_structure():
    """A synthetic torch state_dict with reference key names/shapes must map
    exactly onto the flax parameter tree (including the 3->2 head slice)."""
    net = DroidNet()
    B, N, H, W = 1, 2, 64, 64
    variables = net.init(
        jax.random.PRNGKey(0),
        lie.se3_identity((B, N)),
        jnp.zeros((B, N, H, W, 3)),
        jnp.ones((B, N, H // 8, W // 8)),
        jnp.broadcast_to(jnp.array([24.0, 24.0, 4.0, 4.0]), (B, N, 4)),
        np.array([0, 1]),
        np.array([1, 0]),
        2,
    )
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]

    # build the synthetic torch dict by inverting the converter's mapping
    from droid_slam_reserch_tpu.models.convert import _encoder_map, _UPDATE_MAP

    inv = {}
    for prefix in ("fnet", "cnet"):
        for tk, path in _encoder_map(prefix).items():
            inv[(prefix,) + path] = tk
    for tk, path in _UPDATE_MAP.items():
        inv[("update",) + path] = tk

    rng = np.random.RandomState(1)
    sd = {}
    for path, leaf in flat:
        keys = tuple(p.key for p in path)
        base, kind = keys[:-1], keys[-1]
        tkey = inv[base]
        arr = np.asarray(leaf)
        if kind == "kernel":
            w = rng.randn(*np.transpose(arr, (3, 2, 0, 1)).shape).astype(np.float32)
            if tkey in ("update.weight.2", "update.delta.2"):
                w = rng.randn(3, *w.shape[1:]).astype(np.float32)  # extra channel
            sd[tkey + ".weight"] = w
        else:
            b = rng.randn(*arr.shape).astype(np.float32)
            if tkey in ("update.weight.2", "update.delta.2"):
                b = rng.randn(3).astype(np.float32)
            sd[tkey + ".bias"] = b

    converted = convert_torch_checkpoint(sd)

    # structure must match exactly
    ref_struct = jax.tree_util.tree_structure(variables["params"])
    conv_struct = jax.tree_util.tree_structure(converted["params"])
    assert ref_struct == conv_struct

    # shapes must match
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
        jax.tree_util.tree_flatten_with_path(converted["params"])[0],
    ):
        assert a.shape == np.asarray(b).shape, (p1, a.shape, np.asarray(b).shape)

    # spot-check layout: fnet.conv1 kernel round-trips the OIHW->HWIO transpose
    np.testing.assert_allclose(
        np.asarray(converted["params"]["fnet"]["conv1"]["kernel"]),
        np.transpose(sd["fnet.conv1.weight"], (2, 3, 1, 0)),
    )


@pytest.mark.slow
def test_training_forward_runs():
    net = DroidNet()
    B, P, H, W = 1, 3, 64, 64
    key = jax.random.PRNGKey(0)
    images = 255.0 * jax.random.uniform(key, (B, P, H, W, 3))
    Gs = lie.se3_identity((B, P))
    disps = jnp.ones((B, P, H // 8, W // 8))
    intr = jnp.broadcast_to(jnp.array([40.0, 40.0, 4.0, 4.0]), (B, P, 4))
    ii, jj = neighbourhood_graph(P, 2)

    variables = net.init(jax.random.PRNGKey(1), Gs, images, disps, intr, ii, jj, 1)
    Gs_list, disp_list, res_list = net.apply(
        variables, Gs, images, disps, intr, ii, jj, 2, 1
    )
    assert len(Gs_list) == 2
    assert disp_list[0].shape == (B, P, H, W)
    for x in (Gs_list[-1], disp_list[-1], res_list[-1]):
        assert np.all(np.isfinite(np.asarray(x)))


def test_instance_norm_matches_torch():
    """InstanceNorm2d (affine=False) parity — weight-conversion fidelity
    depends on exact norm semantics (SURVEY.md §7 hard part 5)."""
    import torch

    from droid_slam_reserch_tpu.models.layers import instance_norm

    rng = np.random.RandomState(0)
    x = rng.randn(3, 10, 12, 16).astype(np.float32)
    y = instance_norm(jnp.asarray(x))
    yt = torch.nn.functional.instance_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2))
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


def test_volume_pool_matches_torch_avgpool():
    """Volume pyramid pooling must match torch avg_pool2d floor semantics
    (reference modules/corr.py:38), including odd sizes."""
    import torch

    from droid_slam_reserch_tpu.ops import pool2x_fmap, pool2x_volume

    rng = np.random.RandomState(1)
    vol = rng.randn(2, 3, 4, 5, 10).astype(np.float32)  # odd target dims
    got = np.asarray(pool2x_volume(jnp.asarray(vol)))
    expect = torch.nn.functional.avg_pool2d(
        torch.from_numpy(vol.reshape(-1, 1, 5, 10)), 2, stride=2
    ).numpy().reshape(2, 3, 4, 2, 5)
    np.testing.assert_allclose(got, expect, atol=1e-6)

    f = rng.randn(2, 7, 9, 8).astype(np.float32)
    got = np.asarray(pool2x_fmap(jnp.asarray(f)))
    expect = torch.nn.functional.avg_pool2d(
        torch.from_numpy(f.transpose(0, 3, 1, 2)), 2, stride=2
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, expect, atol=1e-6)
