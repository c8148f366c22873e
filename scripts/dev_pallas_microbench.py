#!/usr/bin/env python
"""Micro-bench: per-step cost of decoder-kernel pieces inside a Pallas fori_loop.

Builds stripped variants of the forward step (LSTMs only / +attention pieces)
to find where the 79 us/step goes. Run on the TPU box."""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, '.')
from tacotron2_tpu.utils.runtime import setup_runtime
setup_runtime()

B, U, T_in, E, D, F, K = 32, 1024, 128, 512, 128, 32, 31
IN1, IN2 = 256 + E + U, 2 * U
T = 512
f32 = jnp.float32
bf16 = jnp.bfloat16


def _sigmoid(x):
    one = jnp.asarray(1.0, x.dtype)
    return one / (one + jnp.exp(-x))


def build(variant):
    def kernel(g1_k, g2_k, q_k, l_k, keys, values, mask, out,
               c1_s, h1_s, c2_s, h2_s, ctx_s, state_s):
        for ref in (c1_s, h1_s, c2_s, h2_s, ctx_s):
            ref[:] = jnp.zeros_like(ref)
        state_s[:] = jnp.zeros_like(state_s)

        def step(t, _):
            h1, c1 = h1_s[:], c1_s[:]
            x0 = jnp.concatenate(
                [jnp.zeros((B, 256), bf16), ctx_s[:], h1], axis=-1)
            z1 = jnp.dot(x0, g1_k[:], preferred_element_type=f32).astype(bf16)
            i, g, fz, o = jnp.split(z1, 4, -1)
            one = jnp.asarray(1.0, bf16)
            c1n = _sigmoid(fz + one) * c1 + _sigmoid(i) * jnp.tanh(g)
            x1 = _sigmoid(o) * jnp.tanh(c1n)
            c1_s[:], h1_s[:] = c1n, x1
            z2 = jnp.dot(jnp.concatenate([x1, h2_s[:]], -1), g2_k[:],
                         preferred_element_type=f32).astype(bf16)
            i2, g2, f2, o2 = jnp.split(z2, 4, -1)
            c2n = _sigmoid(f2 + one) * c2_s[:] + _sigmoid(i2) * jnp.tanh(g2)
            x2 = _sigmoid(o2) * jnp.tanh(c2n)
            c2_s[:], h2_s[:] = c2n, x2

            if variant in ('att', 'full'):
                pq = jnp.dot(x2, q_k[:], preferred_element_type=f32)
                spv = state_s[:, 64:64 + T_in]
                st3 = state_s[:][:, :, None]
                fconv = jnp.zeros((B, T_in, F), f32)
                for j in range(K):
                    off = 64 - 15 + j
                    fconv = fconv + st3[:, off:off + T_in, :] * 0.01
                pl_ = jnp.dot(fconv.astype(bf16).reshape(B * T_in, F), l_k[:],
                              preferred_element_type=f32).reshape(B, T_in, D)
                u = keys[:].astype(f32) + pq[:, None, :] + pl_
                tanh_u = jnp.tanh(u)
                e = jnp.sum(tanh_u, axis=-1)
                e = jnp.where(mask[:] > 0, e, -1e9)
                emax = jnp.max(e, -1, keepdims=True)
                ex = jnp.exp(e - emax)
                align = ex / jnp.sum(ex, -1, keepdims=True)
                state_s[:, 64:64 + T_in] = spv + align
                ctx = jnp.sum(align[:, :, None] * values[:], axis=1)
                ctx_s[:] = ctx.astype(bf16)
            elif variant == 'attlite':
                # attention minus conv/energy: just softmax of a matmul + ctx
                pq = jnp.dot(x2, q_k[:], preferred_element_type=f32)
                e = jnp.dot(pq.astype(bf16), keys[:].reshape(-1, T_in)[:D],
                            preferred_element_type=f32)
                align = jax.nn.softmax(e, -1)
                ctx = jnp.sum(align[:, :, None] * values[:], axis=1)
                ctx_s[:] = ctx.astype(bf16)
            return 0

        jax.lax.fori_loop(0, T, step, 0)
        out[:] = h2_s[:].astype(f32)

    rng = np.random.default_rng(0)
    g1 = jnp.asarray(rng.normal(0, 0.02, (IN1, 4 * U)), bf16)
    g2 = jnp.asarray(rng.normal(0, 0.02, (IN2, 4 * U)), bf16)
    qk = jnp.asarray(rng.normal(0, 0.1, (U, D)), bf16)
    lk = jnp.asarray(rng.normal(0, 0.1, (F, D)), bf16)
    keys = jnp.asarray(rng.normal(0, 0.1, (B, T_in, D)), bf16)
    values = jnp.asarray(rng.normal(0, 0.1, (B, T_in, E)), f32)
    mask = jnp.ones((B, T_in), f32)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, U), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, U), bf16), pltpu.VMEM((B, U), bf16),
            pltpu.VMEM((B, U), bf16), pltpu.VMEM((B, U), bf16),
            pltpu.VMEM((B, E), bf16),
            pltpu.VMEM((B, T_in + 128), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    return jax.jit(lambda: fn(g1, g2, qk, lk, keys, values, mask))


for variant in ('lstm', 'attlite', 'att'):
    f = build(variant)
    t0 = time.time()
    np.asarray(f())
    print(f'{variant}: compile+run {time.time()-t0:.1f}s')
    ts = []
    for _ in range(4):
        t0 = time.time()
        np.asarray(f())
        ts.append(time.time() - t0)
    print(f'{variant}: {min(ts)*1000:.2f} ms total, '
          f'{min(ts)/T*1e6:.2f} us/step')
