#!/usr/bin/env python
"""Probe: pltpu PRNG + wide argmax inside a kernel (16-bit categorical feasibility)."""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, '.')
from tacotron2_tpu.utils.runtime import setup_runtime
setup_runtime()

B, Q = 8, 65536

def kernel(seed_ref, scores_ref, out_ids, out_gstats):
    pltpu.prng_seed(seed_ref[0])
    bits = pltpu.bitcast(pltpu.prng_random_bits((B, Q)), jnp.uint32)
    # uniform in [0,1): set exponent to [1,2) then subtract 1
    fbits = jax.lax.shift_right_logical(bits, jnp.uint32(9)) | jnp.uint32(0x3F800000)
    u = pltpu.bitcast(fbits, jnp.float32) - 1.0
    eps = jnp.float32(1e-9)
    gumbel = -jnp.log(-jnp.log(u + eps) + eps)
    scores = scores_ref[:] + gumbel
    out_ids[:] = jnp.argmax(scores, axis=1, keepdims=True).astype(jnp.float32)
    row = jnp.stack([jnp.mean(gumbel), jnp.max(gumbel), jnp.min(gumbel),
                     0., 0., 0., 0., 0.])
    out_gstats[:] = row[None]

scores = np.zeros((B, Q), np.float32)
scores[np.arange(B), [7, 130, 1024, 9999, 65535, 0, 32768, 50000]] = 12.0  # clear winners
fn = pl.pallas_call(
    kernel,
    out_shape=(jax.ShapeDtypeStruct((B, 1), jnp.float32),
               jax.ShapeDtypeStruct((1, 8), jnp.float32)),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
               pl.BlockSpec(memory_space=pltpu.VMEM)),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
)
ids, gstats = fn(jnp.asarray([1234], jnp.int32), jnp.asarray(scores))
print('ids:', np.asarray(ids).ravel().astype(int))
print('gumbel mean/max/min:', np.asarray(gstats).ravel()[:3], '(expect mean~0.577)')
