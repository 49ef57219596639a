"""Precision helpers.

TPU f32 matmuls default to reduced (bf16-pass) precision on the MXU — fine
for the big Hamming/descriptor matmuls, catastrophic for 3x3 rotation algebra
and the small dense LM/Schur solves (observed ~1e-3 abs error in a 3x3
product). All geometry/solver matmuls therefore go through `mm`, which pins
HIGHEST precision; the deliberately-bf16 MXU paths (matching) call
jnp.dot/lax.dot_general themselves.
"""

import jax
import jax.numpy as jnp


def mm(a, b):
    """Matmul at HIGHEST precision (full f32 on MXU)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
