"""Sanity of bench.py's analytic FLOPs model (the MFU numerator): computed
from the real weight shapes, it must match a hand calculation at the
production conf."""

import sys
import os

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_analytic_flops_match_hand_calc():
    from bench import analytic_step_flops
    from rnb_tpu.models import fields
    from rnb_tpu.models.renderer import RendererConfig

    statics = fields.ModelStatics(sdf=fields.SDFConfig(),
                                  color=fields.RenderingConfig(),
                                  nerf=fields.NeRFConfig())
    params = fields.init_model_bundle(jax.random.PRNGKey(0), statics)
    rcfg = RendererConfig()
    fl = analytic_step_flops(params, statics, rcfg, bsz=512)

    # hand calc: SDF pass = 2*(39*256 + 6*256*256 + 256*217 + 256*257) MACs
    f_sdf = 2 * (39 * 256 + 6 * 256 * 256 + 256 * 217 + 256 * 257)
    f_alb = 2 * (310 * 256 + 256 * 256 + 256 * 3)
    f_sdf_only = f_sdf - 2 * 256 * 256
    n_core = 512 * 128
    n_up = 512 * 64 + 512 * 16 * 3
    expect = n_core * (8 * f_sdf + 4 * f_alb) + n_up * f_sdf_only
    assert abs(fl["executed"] - expect) / expect < 1e-9
    assert fl["model"] < fl["executed"]
