"""Correctness of the fused albedo/rendering kernel (ops/pallas_albedo)
against pure-XLA autodiff through fields.rendering_apply — the hand-derived
VJP covers params (incl. weight norm), normals (which are ∇SDF: the
cotangent feeds the eikonal path), and features.

Runs in interpret mode on CPU with f32 matmul operands so the comparison is
tight; the bf16 production path only changes operand precision."""

import jax
import jax.numpy as jnp
import numpy as np

from rnb_tpu.models import fields
from rnb_tpu.ops import pallas_albedo as alb


def _setup(n=200, n_layers=2, multires_view=4):
    cfg = fields.RenderingConfig(n_layers=n_layers,
                                 multires_view=multires_view)
    params = fields.init_rendering_network(jax.random.PRNGKey(11), cfg)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(12), 3)
    pts = jax.random.uniform(k1, (n, 3), jnp.float32, -0.8, 0.8)
    nrm = jax.random.normal(k2, (n, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    feat = jax.random.normal(k3, (n, cfg.d_feature)) * 0.3
    return cfg, params, pts, nrm, feat


def test_forward_matches_xla():
    cfg, params, pts, nrm, feat = _setup()
    out_x = fields.rendering_apply(cfg, params, pts, nrm, nrm, feat)
    out_p = alb.albedo_apply_fused(cfg, params, pts, nrm, feat,
                                   interpret=True, dtype=jnp.float32)
    np.testing.assert_allclose(out_p, out_x, rtol=2e-5, atol=2e-6)


def test_forward_deeper_net():
    cfg, params, pts, nrm, feat = _setup(n_layers=4)
    out_x = fields.rendering_apply(cfg, params, pts, nrm, nrm, feat)
    out_p = alb.albedo_apply_fused(cfg, params, pts, nrm, feat,
                                   interpret=True, dtype=jnp.float32)
    np.testing.assert_allclose(out_p, out_x, rtol=2e-5, atol=2e-6)


def test_backward_matches_xla_all_inputs():
    """d loss / d {params, normals, features} against XLA autodiff — the
    production contraction shape (albedo feeds the L1 color loss; its normal
    cotangent joins the ∇SDF cotangent stream)."""
    cfg, params, pts, nrm, feat = _setup()
    tgt = jax.random.uniform(jax.random.PRNGKey(13), (200, 3))

    def loss(fn):
        def f(p, g, fv):
            out = fn(p, g, fv)
            return jnp.abs(out - tgt).sum() + (out ** 2).mean()
        return f

    lx = loss(lambda p, g, fv: fields.rendering_apply(cfg, p, pts, g, g, fv))
    lp = loss(lambda p, g, fv: alb.albedo_apply_fused(
        cfg, p, pts, g, fv, interpret=True, dtype=jnp.float32))

    vx, gx = jax.value_and_grad(lx, argnums=(0, 1, 2))(params, nrm, feat)
    vp, gp = jax.value_and_grad(lp, argnums=(0, 1, 2))(params, nrm, feat)
    np.testing.assert_allclose(vp, vx, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)


def test_supported_gates():
    """Only the shipped-conf shape is fused; other modes fall back to the
    XLA path in renderer.render_core_mvps."""
    assert alb.supported(fields.RenderingConfig())
    assert not alb.supported(fields.RenderingConfig(mode="idr"))
    assert not alb.supported(fields.RenderingConfig(mode="ps"))
    assert not alb.supported(fields.RenderingConfig(multires_view=0))
    assert not alb.supported(fields.RenderingConfig(squeeze_out=False))


def test_padding_independent():
    """Non-multiple-of-block sizes: padded rows contribute nothing."""
    cfg, params, pts, nrm, feat = _setup(n=alb.FWD_BLOCK + 5)

    def g(p, x, n, fv):
        out = alb.albedo_apply_fused(cfg, p, x, n, fv, interpret=True,
                                     dtype=jnp.float32)
        return out.sum() + (out ** 2).sum()

    B = alb.FWD_BLOCK
    ga = jax.grad(g)(params, pts, nrm, feat)
    gb = jax.grad(lambda p: g(p, pts[:B], nrm[:B], feat[:B])
                  + g(p, pts[B:], nrm[B:], feat[B:]))(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
