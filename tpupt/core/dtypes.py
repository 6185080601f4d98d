"""Compute-path dtype switch: f32 TPU kernels vs the f64 CPU oracle.

SURVEY.md section 7, decision 1: the reference computes everything in f64
(glam::DVec3, vec3.rs:3-6); TPUs are f32-native, so the device path is f32 and a
CPU *oracle* runs the SAME integrator in f64 for drift quantification. The oracle
is selected by the environment variable ``TPUPT_ORACLE_X64=1`` (it must be decided
at import time because ``jax_enable_x64`` has to be set before arrays exist and
because every ``jnp.float32`` literal in the compute path keys off it).

The counter-based sampler (core/rng.py) emits the identical 24-bit uniform
stream in both modes — the oracle renders the exact same paths, only in wider
arithmetic — so any per-pixel difference IS the f32 round-off, not Monte-Carlo
noise.

Oracle mode is CPU-only by design (f64 on TPU is emulated and slow); the Pallas
hit kernel is skipped automatically because ``use_pallas_hit`` is only set on the
TPU backend (scene/compile.py).
"""

from __future__ import annotations

import os

import numpy as np

ORACLE_X64 = os.environ.get("TPUPT_ORACLE_X64", "0").lower() not in ("", "0", "false")

if ORACLE_X64:
    import jax

    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402  (after the x64 switch)

REAL = jnp.float64 if ORACLE_X64 else jnp.float32
NP_REAL = np.float64 if ORACLE_X64 else np.float32
