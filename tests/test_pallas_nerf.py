"""Correctness of the fused background-NeRF kernel (ops/pallas_nerf)
against pure-XLA autodiff through fields.nerf_apply — params-only VJP (all
inputs are stop-gradient in this framework).

Interpret mode on CPU with f32 operands for tight comparison."""

import jax
import jax.numpy as jnp
import numpy as np

from rnb_tpu.models import fields
from rnb_tpu.ops import pallas_nerf as pn


def _push_off_relu_boundary(cfg, params, pts, views, tau=2e-5, delta=1e-4):
    """Nudge biases of units whose pre-activation sits within tau of 0 for
    some input row. ReLU's gradient is discontinuous there: with ~1e5
    pre-activations the minimum |z| is ~1e-6 at ANY seed (order
    statistics), and a ~1e-6 summation-order difference between the kernel
    and XLA then flips that unit's mask — an O(|bar·x|) jump in dW that is
    a property of ReLU at 0, not a kernel defect (both sides are valid
    subgradients). Deconditioning the fixture keeps the comparison tight
    instead of hiding real bugs behind a flip-sized tolerance."""
    import numpy as np
    pe = pn._pe(cfg.multires, pts)
    pe_v = pn._pe(cfg.multires_view, views)
    for _ in range(4):
        ws, bs = pn.flatten_params(params)
        moved = False
        h = pe
        for i in range(cfg.D):
            z = h @ ws[i] + bs[i]
            bad = np.unique(np.nonzero(
                np.abs(np.asarray(z)) < tau)[1])
            if bad.size:
                b = np.array(params["pts_layers"][i]["b"])
                b[bad] += delta
                params["pts_layers"][i]["b"] = jnp.asarray(b)
                z = h @ ws[i] + params["pts_layers"][i]["b"]
                moved = True
            h = jnp.maximum(z, 0.0)
            if i in cfg.skips:
                h = jnp.concatenate([pe, h], axis=-1)
        feature = h @ ws[cfg.D + 1] + params["feature_layer"]["b"]
        z_v = (jnp.concatenate([feature, pe_v], axis=-1) @ ws[cfg.D + 2]
               + params["views_layer"]["b"])
        bad = np.unique(np.nonzero(np.abs(np.asarray(z_v)) < tau)[1])
        if bad.size:
            b = np.array(params["views_layer"]["b"])
            b[bad] += delta
            params["views_layer"]["b"] = jnp.asarray(b)
            moved = True
        if not moved:
            break
    return params


def _setup(n=200, D=8, W=64, skips=(4,), d_in=4):
    cfg = fields.NeRFConfig(D=D, W=W, skips=skips, d_in=d_in)
    params = fields.init_nerf(jax.random.PRNGKey(21), cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(22))
    pts = jax.random.uniform(k1, (n, d_in), jnp.float32, -1.0, 1.0)
    views = jax.random.normal(k2, (n, 3))
    views = views / jnp.linalg.norm(views, axis=-1, keepdims=True)
    params = _push_off_relu_boundary(cfg, params, pts, views)
    return cfg, params, pts, views


def test_forward_matches_xla():
    cfg, params, pts, views = _setup()
    a_x, r_x = fields.nerf_apply(cfg, params, pts, views)
    a_p, r_p = pn.nerf_apply_fused(cfg, params, pts, views, interpret=True,
                                   dtype=jnp.float32)
    np.testing.assert_allclose(a_p, a_x, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(r_p, r_x, rtol=2e-5, atol=2e-5)


def test_forward_no_skip():
    cfg, params, pts, views = _setup(D=3, skips=())
    a_x, r_x = fields.nerf_apply(cfg, params, pts, views)
    a_p, r_p = pn.nerf_apply_fused(cfg, params, pts, views, interpret=True,
                                   dtype=jnp.float32)
    np.testing.assert_allclose(a_p, a_x, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(r_p, r_x, rtol=2e-5, atol=2e-5)


def test_backward_matches_xla():
    """d loss / d params against autodiff, through the render-style output
    activations (sigmoid rgb, softplus density live OUTSIDE the op)."""
    cfg, params, pts, views = _setup()

    def loss(fn):
        def f(p):
            a, r = fn(p)
            return (jax.nn.softplus(a).sum() * 1e-2
                    + (jax.nn.sigmoid(r) ** 2).sum())
        return f

    vx, gx = jax.value_and_grad(
        loss(lambda p: fields.nerf_apply(cfg, p, pts, views)))(params)
    vp, gp = jax.value_and_grad(
        loss(lambda p: pn.nerf_apply_fused(cfg, p, pts, views,
                                           interpret=True,
                                           dtype=jnp.float32)))(params)
    np.testing.assert_allclose(vp, vx, rtol=1e-5)
    fx = jax.tree_util.tree_leaves(gx)
    fp = jax.tree_util.tree_leaves(gp)
    assert len(fx) == len(fp)
    for a, b in zip(fp, fx):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)


def test_supported_gates():
    assert pn.supported(fields.NeRFConfig())
    assert not pn.supported(fields.NeRFConfig(multires=0))
    assert not pn.supported(fields.NeRFConfig(skips=(7,)))  # skip at D-1


def test_padding_independent():
    cfg, params, pts, views = _setup(n=pn.FWD_BLOCK + 9, W=32, D=3,
                                     skips=(1,))

    def g(p, x, v):
        a, r = pn.nerf_apply_fused(cfg, p, x, v, interpret=True,
                                   dtype=jnp.float32)
        return a.sum() + (r ** 2).sum()

    B = pn.FWD_BLOCK
    ga = jax.grad(g)(params, pts, views)
    gb = jax.grad(lambda p: g(p, pts[:B], views[:B])
                  + g(p, pts[B:], views[B:]))(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
