"""Global compute-dtype control for the model compute path.

The VN pipelines are HBM-bandwidth bound on TPU in f32; storing activations
in bfloat16 (with f32 accumulation inside every matmul, and f32 norm/softmax
statistics) halves the traffic.  Default is float32 — parity and tests run
exact; benchmarks and production training opt into bfloat16 via config
``dtype`` or :func:`compute_dtype_scope`.

Read at trace time: rebuild/re-jit after changing the dtype.
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype)


def compute_dtype():
    return _COMPUTE_DTYPE


@contextlib.contextmanager
def compute_dtype_scope(dtype):
    global _COMPUTE_DTYPE
    old = _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype)
    try:
        yield
    finally:
        _COMPUTE_DTYPE = old


def from_config_dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def activation_dtype(x):
    """Cast ``x`` down to the compute dtype when a low-precision policy is on.

    No-op under the default f32 policy (parity/f64 harnesses feed wider
    dtypes and must pass through untouched).  Used at decoder entries where
    constants (fold seeds, coarse layouts) are f32 by construction and would
    otherwise silently promote the whole bandwidth-bound fold chain —
    their Pallas layers inherit ``x.dtype`` for every activation buffer.
    """
    if _COMPUTE_DTYPE == jnp.bfloat16 and x.dtype in (
        jnp.float32, jnp.float64
    ):
        return x.astype(jnp.bfloat16)
    return x
