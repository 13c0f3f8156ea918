"""Fused up-sampling megakernel vs the XLA reference loop (interpret mode on
CPU). The kernel must produce sorted z-values in [near, far] whose placement
matches the XLA path closely — exact equality is impossible (bf16 matmul
operands, log/exp transmittance, triangular-matmul cumsum), but on CPU
interpret mode both paths use the same arithmetic so agreement is tight."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnb_tpu.models import fields, renderer as rnd
from rnb_tpu.models.renderer import RendererConfig
from rnb_tpu.ops import pallas_upsample


@pytest.fixture(scope="module")
def setup():
    cfg = fields.SDFConfig(d_out=65, d_hidden=64, n_layers=4, skip_in=(2,),
                           multires=4)
    params = fields.init_sdf_network(jax.random.PRNGKey(0), cfg)
    statics = fields.ModelStatics(sdf=cfg, color=fields.RenderingConfig(),
                                  nerf=fields.NeRFConfig())
    rng = np.random.default_rng(3)
    B = 48  # not a multiple of RAY_BLOCK: exercises padding
    rays_o = np.tile([[0.0, 0.0, -2.0]], (B, 1)).astype(np.float32)
    d = rng.normal(size=(B, 3)) * 0.08 + np.array([0, 0, 1.0])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = d.astype(np.float32)
    near = np.full((B, 1), 1.0, np.float32)
    far = np.full((B, 1), 3.0, np.float32)
    n_samples = 16
    z = near + (far - near) * np.linspace(0, 1, n_samples)[None, :]
    return statics, {"sdf": params}, (jnp.asarray(rays_o),
                                      jnp.asarray(rays_d),
                                      jnp.asarray(z, jnp.float32))


def _xla_reference(statics, params, rays_o, rays_d, z_vals, n_importance,
                   steps):
    rcfg = RendererConfig(n_samples=z_vals.shape[1], n_importance=n_importance,
                          up_sample_steps=steps)
    return rnd.upsampled_z_vals(statics, rcfg, params, rays_o, rays_d, z_vals)


@pytest.mark.parametrize("n_importance,steps", [(16, 2), (16, 4), (8, 2)])
def test_fused_matches_xla(setup, monkeypatch, n_importance, steps):
    monkeypatch.setenv("RNB_FUSED_UPSAMPLE", "0")  # force XLA reference
    statics, params, (rays_o, rays_d, z) = setup
    ref = np.asarray(_xla_reference(statics, params, rays_o, rays_d, z,
                                    n_importance, steps))
    got = np.asarray(pallas_upsample.upsample_fused(
        statics.sdf, params["sdf"], rays_o, rays_d, z, n_importance, steps,
        interpret=True))
    assert got.shape == ref.shape == (48, z.shape[1] + n_importance)
    # sortedness and range
    assert np.all(np.diff(got, axis=-1) >= -1e-6)
    assert got.min() >= 1.0 - 1e-5 and got.max() <= 3.0 + 1e-5
    # the original z grid must survive the merge exactly
    for row_ref, row_got in zip(np.asarray(z), got):
        assert np.all(np.isin(np.round(row_ref, 5), np.round(row_got, 5)))
    # new sample placement tracks the XLA path (same bf16 MLP, different
    # cumsum/transmittance arithmetic)
    assert np.abs(got - ref).max() < 5e-3


def test_fused_dispatch_gate(setup):
    statics, *_ = setup
    # CPU backend in tests => gate must be off regardless of env
    assert not pallas_upsample.use_fused(statics.sdf, 16, 4)
    assert pallas_upsample.supported(statics.sdf, 16, 4)
    assert not pallas_upsample.supported(statics.sdf, 15, 4)  # not divisible
    assert not pallas_upsample.supported(statics.sdf, 0, 4)


def test_merge_ranks_match_argsort():
    rng = np.random.default_rng(0)
    z = np.sort(rng.uniform(0, 1, size=(5, 12)), axis=-1).astype(np.float32)
    nz = np.sort(rng.uniform(0, 1, size=(5, 6)), axis=-1).astype(np.float32)
    rank_z, rank_new, width = jax.jit(pallas_upsample._merge_ranks)(
        jnp.asarray(z), jnp.asarray(nz))
    merged = np.asarray(
        pallas_upsample._scatter_by_rank(jnp.asarray(z), rank_z, width)
        + pallas_upsample._scatter_by_rank(jnp.asarray(nz), rank_new, width))
    expected = np.sort(np.concatenate([z, nz], axis=-1), axis=-1)
    np.testing.assert_allclose(merged, expected, rtol=1e-6)
