"""Atomic npz checkpointing of {params, opt_state, step}.

Replaces torch.save monolithic .pth dicts (`/root/reference/exp_runner.py:355-386`).
Improvements the reference lacks (SURVEY.md §5 failure detection): writes go to
a temp file + os.replace (atomic on POSIX), so a mid-write crash can never
leave a truncated checkpoint that resume would pick up; an integrity marker
(`leaf count`) is verified on load.

Layout-free: leaves are stored indexed in tree-flatten order; the treedef is
reconstructed from a template pytree built by the same code that created the
original (same configs -> same structure). This avoids pickling arbitrary
objects into checkpoints.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, state: Any) -> None:
    leaves, _ = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i:06d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__n_leaves__"] = np.asarray(len(leaves))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, template: Any) -> Any:
    """Load into the structure of `template` (a pytree with matching
    treedef/shapes, e.g. a freshly-initialized TrainState)."""
    with np.load(path) as data:
        n = int(data["__n_leaves__"])
        leaves = [data[f"leaf_{i:06d}"] for i in range(n)]
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != n:
        raise ValueError(
            f"checkpoint {path} has {n} leaves, template has {len(t_leaves)} "
            "(config mismatch?)")
    out = []
    for saved, tmpl in zip(leaves, t_leaves):
        arr = np.asarray(saved)
        t = np.asarray(tmpl)
        if arr.shape != t.shape:
            raise ValueError(
                f"checkpoint leaf shape {arr.shape} != template {t.shape}")
        out.append(arr.astype(t.dtype, copy=False))
    return jax.tree_util.tree_unflatten(treedef, out)


CKPT_RE = re.compile(r"ckpt_(\d+)\.npz$")


def checkpoint_path(ckpt_dir: str, step: int, prefix: str = "ckpt_") -> str:
    """{prefix}{iter:06d}.npz — mirrors the reference naming
    (`exp_runner.py:386`)."""
    return os.path.join(ckpt_dir, f"{prefix}{step:06d}.npz")


def latest_checkpoint(ckpt_dir: str, end_iter: int | None = None) -> str | None:
    """Latest ckpt with step <= end_iter (`exp_runner.py:130-142`)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(ckpt_dir):
        m = CKPT_RE.search(name)
        if not m:
            continue
        step = int(m.group(1))
        if end_iter is not None and step > end_iter:
            continue
        if step > best_step:
            best, best_step = name, step
    return os.path.join(ckpt_dir, best) if best else None
