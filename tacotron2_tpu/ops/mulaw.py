"""Mu-law companding / quantization, working on numpy arrays and JAX tracers alike.

Parity with reference wavenet_vocoder/util.py:30-163 (mulaw, inv_mulaw,
mulaw_quantize, inv_mulaw_quantize and the input-type predicates). The reference
dispatches between numpy and TF ops per input type; jnp's numpy-compatible API makes a
single implementation serve both hosts and jit-traced code.
"""

from typing import Union

import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jnp.ndarray, float]


def _xp(x):
    # numpy inputs (incl. python scalars) use numpy; traced/JAX arrays use jnp
    return np if isinstance(x, (np.ndarray, float, int)) else jnp


def mulaw(x: Array, mu: int = 256) -> Array:
    """Mu-law companding: [-1, 1] → [-1, 1]."""
    xp = _xp(x)
    return xp.sign(x) * xp.log1p(mu * xp.abs(x)) / xp.log1p(float(mu))


def inv_mulaw(y: Array, mu: int = 256) -> Array:
    xp = _xp(y)
    return xp.sign(y) * (1.0 / mu) * ((1.0 + mu) ** xp.abs(y) - 1.0)


def mulaw_quantize(x: Array, mu: int = 256) -> Array:
    """Mu-law companding + quantize: [-1, 1] → [0, mu]."""
    xp = _xp(x)
    y = mulaw(x, mu)
    return ((y + 1) / 2 * mu).astype(xp.int32)


def inv_mulaw_quantize(y: Array, mu: int = 256) -> Array:
    xp = _xp(y)
    yf = 2.0 * xp.asarray(y, dtype=xp.float32) / mu - 1.0
    return inv_mulaw(yf, mu)


# --- input-type predicates (reference util.py:13-26) ---

def is_mulaw_quantize(input_type: str) -> bool:
    return input_type == 'mulaw-quantize'


def is_mulaw(input_type: str) -> bool:
    return input_type == 'mulaw'


def is_raw(input_type: str) -> bool:
    return input_type == 'raw'


def is_scalar_input(input_type: str) -> bool:
    return is_raw(input_type) or is_mulaw(input_type)


# --- sequence masks (reference util.py:165-171; TPU version is pure jnp) ---

def sequence_mask(lengths: jnp.ndarray, max_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B,) lengths → (B, max_len) 0/1 mask."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(dtype)
