"""Multi-host initialization — import-light on purpose.

`jax.distributed.initialize` must run before ANYTHING initializes the XLA
backend, and importing most of slr_tpu creates device constants (e.g. the
sRGB matrices in spectrum/rgb.py). This module therefore imports only jax
and os, so the canonical multi-host entry sequence is:

    from slr_tpu.parallel.distributed import init_distributed
    init_distributed()          # no-op without JAX_COORDINATOR_ADDRESS
    from slr_tpu... import ...  # everything else afterwards

Exercised for real by tests/test_parallel.py::test_multihost_two_process
(two OS processes, 4 virtual CPU devices each, one 8-device global mesh).
"""
from __future__ import annotations

import os

import jax


def init_distributed() -> None:
    """Multi-host init (call once, before device queries, on every host).
    Uses the standard JAX coordinator env vars; single-host setups no-op."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
