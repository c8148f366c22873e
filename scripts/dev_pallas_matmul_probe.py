#!/usr/bin/env python
"""Probe: cost of the decoder LSTM matmul inside a Pallas fori_loop.

Variants: independent vs dependent chains, f32 vs bf16 accumulate output,
normal vs transposed orientation. Finds whether 66 us/step is throughput or
latency."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, '.')
from tacotron2_tpu.utils.runtime import setup_runtime
setup_runtime()

B, U = 32, 1024
IN1 = 1792
T = 512
f32, bf16 = jnp.float32, jnp.bfloat16


def build(variant):
    def kernel(w_ref, wt_ref, out, x_s):
        x_s[:] = jnp.zeros_like(x_s) + jnp.asarray(0.01, bf16)

        def step(t, _):
            x = x_s[:]                                    # (B, IN1) bf16
            if variant == 'indep':
                z = jnp.dot(x, w_ref[:], preferred_element_type=f32)
                out[:, :U] = out[:, :U] + z[:, :U]
            elif variant == 'ksplit':
                h = IN1 // 2
                z = (jnp.dot(x[:, :h], w_ref[0:h, :],
                             preferred_element_type=f32)
                     + jnp.dot(x[:, h:], w_ref[h:, :],
                               preferred_element_type=f32))
                x_s[:, :U] = jnp.tanh(z[:, :U]).astype(bf16)
            elif variant == 'k4split':
                qs = IN1 // 4
                z = sum(jnp.dot(x[:, i*qs:(i+1)*qs], w_ref[i*qs:(i+1)*qs, :],
                                preferred_element_type=f32) for i in range(4))
                x_s[:, :U] = jnp.tanh(z[:, :U]).astype(bf16)
            elif variant == 'nsplit':
                za = jnp.dot(x, w_ref[:, :2 * U], preferred_element_type=f32)
                zb = jnp.dot(x, w_ref[:, 2 * U:], preferred_element_type=f32)
                x_s[:, :U] = jnp.tanh(za[:, :U] * zb[:, :U]).astype(bf16)
            elif variant == 'dep_f32':
                z = jnp.dot(x, w_ref[:], preferred_element_type=f32)
                x_s[:, :U] = jnp.tanh(z[:, :U]).astype(bf16)
            elif variant == 'dep_bf16':
                z = jnp.dot(x, w_ref[:], preferred_element_type=bf16)
                x_s[:, :U] = jnp.tanh(z[:, :U])
            elif variant == 'dep_T':
                # transposed: (4U, IN1) @ (IN1, B) -> (4U, B)
                zT = jnp.dot(wt_ref[:], x.T, preferred_element_type=f32)
                x_s[:, :U] = jnp.tanh(zT[:U, :]).T.astype(bf16)
            return 0

        jax.lax.fori_loop(0, T, step, 0)
        if variant != 'indep':
            out[:] = jnp.pad(x_s[:, :U], ((0, 0), (0, 3 * U))).astype(f32)

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.01, (IN1, 4 * U)), bf16)
    wt = jnp.asarray(np.asarray(w, np.float32).T, bf16)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 4 * U), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, IN1), bf16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    return jax.jit(lambda: fn(w, wt))


for variant in ('indep', 'dep_f32', 'dep_bf16', 'dep_T', 'ksplit', 'k4split', 'nsplit'):
    try:
        f = build(variant)
        t0 = time.time()
        np.asarray(f())
        comp = time.time() - t0
        ts = []
        for _ in range(4):
            t0 = time.time()
            np.asarray(f())
            ts.append(time.time() - t0)
        print(f'{variant}: {min(ts)/T*1e6:.2f} us/matmul-step '
              f'(compile {comp:.0f}s)')
    except Exception as e:
        print(f'{variant}: FAILED {str(e)[:200]}')
