"""Scalar logging: JSONL always, TensorBoard when tensorboardX is present.

Mirrors the reference's TensorBoard scalar set (`/root/reference/exp_runner.py:269-274`:
Loss/{loss,color_loss,eikonal_loss}, Statistics/{s_val,cdf,weight_max}) and adds
the throughput counters the reference lacks (SURVEY.md §5 tracing: rays/s)."""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class ScalarLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 enabled: bool = True):
        """enabled=False makes every method a no-op (non-chief processes of
        a multi-host run: state is replicated, one writer is enough and
        concurrent appends to the same scalars.jsonl would interleave)."""
        self._enabled = enabled
        self._jsonl = None
        self._tb = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def meta(self, record: dict) -> None:
        """Write a non-scalar header record (resolved runtime flags etc.) so
        the JSONL stream is self-describing."""
        if not self._enabled:
            return
        self._jsonl.write(json.dumps({"meta": record, "time": time.time()})
                          + "\n")
        self._jsonl.flush()

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        if not self._enabled:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
