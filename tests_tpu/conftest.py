"""TPU-gated test tier (VERDICT r3 #5): runs the COMPILED (Mosaic) Pallas
paths on real TPU hardware — deliberately a separate directory from tests/
(whose conftest pins the CPU backend with 8 virtual devices).

Opt-in via env var (no backend probe at collection time — on this image
merely initializing JAX attaches to the single-client TPU tunnel and would
BLOCK if another process holds it):

    RNB_TPU_TESTS=1 python -m pytest tests_tpu/ -q

Only set the flag on a machine with a TPU that no other process is using.
"""

import os

import pytest


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RNB_TPU_TESTS", "") == "1":
        return
    skip = pytest.mark.skip(
        reason="TPU tier is opt-in: set RNB_TPU_TESTS=1 on a machine whose "
               "TPU is free (tests/ covers the interpret-mode math)")
    for item in items:
        item.add_marker(skip)
