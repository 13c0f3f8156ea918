"""Correctness of the fused differentiable SDF core (ops/pallas_sdf_core)
against pure-XLA autodiff — the SURVEY §7 mandate: a hand-derived VJP of the
forward-gradient computation MUST be tested against autodiff.

Runs in interpret mode on CPU with f32 matmul operands so the comparison is
tight; the bf16 production path only changes operand precision, not the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnb_tpu.models import fields
from rnb_tpu.ops import pallas_sdf_core as core


def _setup(scale=1.0, skip=(4,), n_layers=8):
    cfg = fields.SDFConfig(scale=scale, skip_in=skip, n_layers=n_layers)
    params = fields.init_sdf_network(jax.random.PRNGKey(3), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(4), (200, 3), jnp.float32,
                             -0.8, 0.8)
    return cfg, params, pts


def test_forward_matches_xla():
    cfg, params, pts = _setup()
    sdf_x, feat_x, grad_x = fields.sdf_value_feat_grad(cfg, params, pts)
    sdf_p, feat_p, grad_p = core.sdf_value_feat_grad_fused(
        cfg, params, pts, interpret=True, dtype=jnp.float32)
    np.testing.assert_allclose(sdf_p, sdf_x, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(feat_p, feat_x, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(grad_p, grad_x, rtol=2e-4, atol=2e-5)


def test_forward_matches_xla_scale():
    cfg, params, pts = _setup(scale=2.0)
    sdf_x, feat_x, grad_x = fields.sdf_value_feat_grad(cfg, params, pts)
    sdf_p, feat_p, grad_p = core.sdf_value_feat_grad_fused(
        cfg, params, pts, interpret=True, dtype=jnp.float32)
    np.testing.assert_allclose(sdf_p, sdf_x, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(grad_p, grad_x, rtol=2e-4, atol=2e-5)


def test_backward_matches_xla_second_order():
    """The full training contraction: a loss touching sdf, feat AND grad
    (the eikonal second-order case) — d loss/d params must match XLA's
    double backprop through sdf_value_feat_grad."""
    cfg, params, pts = _setup()

    cw = jax.random.normal(jax.random.PRNGKey(5), (200, 256)) * 0.1

    def loss_xla(p):
        sdf, feat, grad = fields.sdf_value_feat_grad(cfg, p, pts)
        eik = ((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2).mean()
        return (sdf.sum() * 1e-2 + (feat * cw).mean() + eik)

    def loss_fused(p):
        sdf, feat, grad = core.sdf_value_feat_grad_fused(
            cfg, p, pts, interpret=True, dtype=jnp.float32)
        eik = ((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2).mean()
        return (sdf.sum() * 1e-2 + (feat * cw).mean() + eik)

    lx, gx = jax.value_and_grad(loss_xla)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(lf, lx, rtol=1e-5)
    flat_x = jax.tree_util.tree_leaves(gx)
    flat_f = jax.tree_util.tree_leaves(gf)
    assert len(flat_x) == len(flat_f)
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


def test_backward_no_skip_arch():
    """Architectures without the default skip layout also differentiate
    correctly (skip handling is the trickiest part of the reverse sweep)."""
    cfg, params, pts = _setup(skip=(), n_layers=3)

    def loss(fn):
        def f(p):
            sdf, feat, grad = fn(p)
            return sdf.mean() + (grad ** 2).sum() * 1e-2
        return f

    lx, gx = jax.value_and_grad(
        loss(lambda p: fields.sdf_value_feat_grad(cfg, p, pts)))(params)
    lf, gf = jax.value_and_grad(
        loss(lambda p: core.sdf_value_feat_grad_fused(
            cfg, p, pts, interpret=True, dtype=jnp.float32)))(params)
    np.testing.assert_allclose(lf, lx, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-6)


def test_padding_independent():
    """Non-multiple-of-BLOCK sizes: results equal the aligned computation on
    the shared prefix, and padded rows contribute nothing to dW."""
    cfg, params, _ = _setup()
    pts = jax.random.uniform(jax.random.PRNGKey(7), (core.BLOCK + 7, 3),
                             jnp.float32, -0.5, 0.5)

    def g(p, q):
        sdf, feat, grad = core.sdf_value_feat_grad_fused(
            cfg, p, q, interpret=True, dtype=jnp.float32)
        return sdf.sum() + (grad ** 2).sum()

    ga = jax.grad(g)(params, pts)
    gb = jax.grad(lambda p: g(p, pts[:core.BLOCK])
                  + g(p, pts[core.BLOCK:]))(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
