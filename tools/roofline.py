#!/usr/bin/env python
"""Post-Pallas per-region roofline of the production train step
(VERDICT r3 missing #5 / next #3).

Times each region of the main-phase step as its own compiled program on the
real chip and reports it against the hardware ceilings, replacing the stale
pre-kernel 25 GB/step analysis in docs/ARCHITECTURE.md:

    region                what runs
    step_main             the full jitted train step (the bench number)
    step_warm             warm-up phase program
    core_fwd              Pallas fused SDF core forward, N = batch*128 pts
    core_fwd_bwd          + hand-derived VJP via a scalar contraction
    upsample_render_fwd   full render_rnb forward (no grad): z-init +
                          4 up-sample rounds + core fwd + compositing
    color_fwd             albedo net forward at N pts
    adam                  optimizer update alone on production grads
    data_sample           ray/pixel sampling + supervision synthesis

Timing goes through a concrete value fetch (NOT block_until_ready — through
this image's remote-TPU tunnel block_until_ready returns before execution
completes). Per-region FLOPs/bytes come from XLA cost analysis where
available (custom-call Pallas bytes are undercounted there; the kernel's
exact traffic is derivable from its block specs and noted in the output).

Usage: python tools/roofline.py [--iters 60] [--batch 512] [--json out.json]
Env: RNB_CORE_FWD_BLOCK / RNB_CORE_BWD_BLOCK sweep kernel block sizes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e ceilings (public spec): bf16 matmul peak and HBM bandwidth
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--json", default="")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import rnb_tpu  # noqa: F401
    from rnb_tpu.data import dataset as ds
    from rnb_tpu.models import fields, renderer as rnd
    from rnb_tpu.models.renderer import RendererConfig
    from rnb_tpu.ops import pallas_sdf_core as core
    from rnb_tpu.train import step as steplib

    scene = ds.make_sphere_scene(n_views=6, H=256, W=256, radius=0.4)
    statics = fields.ModelStatics(sdf=fields.SDFConfig(),
                                  color=fields.RenderingConfig(),
                                  nerf=fields.NeRFConfig())
    params = fields.init_model_bundle(jax.random.PRNGKey(0), statics)
    tcfg = steplib.resolve_runtime_flags(
        steplib.TrainConfig(batch_size=args.batch))
    rcfg = steplib.apply_runtime_flags(RendererConfig(), tcfg)
    B = args.batch
    n_pts = B * rcfg.total_samples
    key = jax.random.PRNGKey(1)

    def timed(fn, *fargs, iters=args.iters, fetch=None):
        """Wall ms/iter, synced via a concrete scalar fetch each loop tail."""
        out = fn(*fargs)
        _sync(out, fetch)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*fargs)
        _sync(out, fetch)
        return (time.perf_counter() - t0) / iters * 1000.0

    def _sync(out, fetch):
        leaf = jax.tree_util.tree_leaves(out if fetch is None else fetch(out))
        x = np.asarray(leaf[0]).reshape(-1)[:1]
        assert np.all(np.isfinite(x) | ~np.isfinite(x))

    def cost(fn, *fargs):
        try:
            an = jax.jit(fn).lower(*fargs).compile().cost_analysis()
            if isinstance(an, list):
                an = an[0]
            return {"flops": float(an.get("flops", 0.0)),
                    "bytes": float(an.get("bytes accessed", 0.0))}
        except Exception:
            return {"flops": 0.0, "bytes": 0.0}

    results = {}

    # --- full step programs ---
    state = steplib.init_train_state(
        jax.tree_util.tree_map(jnp.array, params), tcfg)
    fn_main = steplib.make_train_step(statics, rcfg, tcfg, warmup=False,
                                      no_albedo=False, donate=False)
    fn_warm = steplib.make_train_step(statics, rcfg, tcfg, warmup=True,
                                      no_albedo=False, donate=False)
    results["step_main"] = {"ms": timed(
        lambda: fn_main(state, scene.arrays, 0, key),
        fetch=lambda o: o[1]["loss"])}
    results["step_warm"] = {"ms": timed(
        lambda: fn_warm(state, scene.arrays, 0, key),
        fetch=lambda o: o[1]["loss"])}

    # --- pallas core ---
    pts = jax.random.uniform(key, (n_pts, 3), jnp.float32, -0.8, 0.8)
    sdf_params = state.params["sdf"]
    core_fwd = jax.jit(lambda p, x: core.sdf_value_feat_grad_fused(
        statics.sdf, p, x))
    results["core_fwd"] = {"ms": timed(lambda: core_fwd(sdf_params, pts)),
                           "n_pts": n_pts}

    cw = jax.random.normal(key, (n_pts, 256)) * 0.01

    def core_loss(p, x):
        sdf, feat, grad = core.sdf_value_feat_grad_fused(statics.sdf, p, x)
        eik = ((jnp.linalg.norm(grad, axis=-1) - 1.0) ** 2).mean()
        return sdf.sum() * 1e-3 + (feat * cw).mean() + eik

    core_fb = jax.jit(jax.grad(core_loss))
    results["core_fwd_bwd"] = {"ms": timed(lambda: core_fb(sdf_params, pts)),
                               "n_pts": n_pts}

    # --- render forward (upsample + core fwd + compositing, no grad) ---
    rays_o = jnp.zeros((B, 3)) + jnp.asarray([0.0, 0.0, -2.5])
    d = jax.random.normal(key, (B, 3)) * 0.05 + jnp.asarray([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    a = (rays_d ** 2).sum(-1, keepdims=True)
    b2 = 2.0 * (rays_o * rays_d).sum(-1, keepdims=True)
    mid = 0.5 * (-b2) / a
    near, far = mid - 1.0, mid + 1.0
    lights = jax.random.normal(key, (3, B, 1, 3))
    lights = lights / jnp.linalg.norm(lights, axis=-1, keepdims=True)
    render = jax.jit(lambda p: rnd.render_rnb(
        statics, rcfg, p, rays_o, rays_d, near, far, lights, key,
        cos_anneal_ratio=1.0, warmup=False))
    results["upsample_render_fwd"] = {"ms": timed(
        lambda: render(state.params), fetch=lambda o: o["color_fine"])}

    # --- color net ---
    feat = jax.random.normal(key, (n_pts, 256)) * 0.1
    grad = jax.random.normal(key, (n_pts, 3))
    color_fwd = jax.jit(lambda p: fields.rendering_apply(
        statics.color, p, pts, grad, grad, feat))
    results["color_fwd"] = {"ms": timed(lambda: color_fwd(
        state.params["color"])), "n_pts": n_pts}

    # --- adam ---
    opt = steplib.make_optimizer(tcfg)
    grads = jax.tree_util.tree_map(lambda x: x * 1e-3, state.params)
    adam = jax.jit(lambda g, o, p: opt.update(g, o, p))
    results["adam"] = {"ms": timed(
        lambda: adam(grads, state.opt_state, state.params))}

    # --- data sampling ---
    samp = jax.jit(lambda a_, k: ds.sample_rays_on_all_lights(a_, 0, k, B))
    results["data_sample"] = {"ms": timed(lambda: samp(scene.arrays, key),
                                          fetch=lambda o: o.rays_o)}

    # --- XLA cost analysis of the full step ---
    ca = cost(lambda s: fn_main(s, scene.arrays, 0, key), state)
    step_ms = results["step_main"]["ms"]
    results["step_main"].update({
        "xla_flops": ca["flops"], "xla_bytes": ca["bytes"],
        "note": "xla_* undercounts inside the Pallas custom call",
        "pct_bf16_peak_from_xla_flops": round(
            ca["flops"] / (step_ms / 1e3) / PEAK_BF16_FLOPS * 100, 2),
        "pct_hbm_peak_from_xla_bytes": round(
            ca["bytes"] / (step_ms / 1e3) / PEAK_HBM_BPS * 100, 2),
    })

    # residual: the step minus its separately-timed regions (pipeline overlap
    # makes this approximate; a large positive residual = dispatch/fusion
    # overhead worth chasing)
    accounted = (results["core_fwd_bwd"]["ms"]
                 + (results["upsample_render_fwd"]["ms"]
                    - results["core_fwd"]["ms"])  # render includes a core fwd
                 + results["color_fwd"]["ms"] * 3  # fwd+bwd ~ 3x fwd
                 + results["adam"]["ms"] + results["data_sample"]["ms"])
    results["residual"] = {
        "ms": round(step_ms - accounted, 3),
        "accounted_ms": round(accounted, 3),
        "comment": ("step_main - (core fwd+bwd, up-sample+compositing, "
                    "~color fwd+bwd, adam, sampling); overlap makes this "
                    "approximate")}

    results["env"] = {
        "flags": steplib.runtime_flags_dict(tcfg),
        "batch": B,
        "fwd_block": core.FWD_BLOCK, "bwd_block": core.BWD_BLOCK,
        "n_devices": len(jax.devices()),
        "rays_per_s": round(B / step_ms * 1000.0, 1),
    }

    for k, v in results.items():
        print(f"{k:22s} {json.dumps(v)}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
