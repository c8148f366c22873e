#!/usr/bin/env python
"""Probe: can the WaveNet AR kernel's per-step critical path be shortened?

The production kernel (ops/pallas/wavenet_ar.py) runs, per layer, two DEPENDENT
matmuls: gates = [taps,h]@W_tap -> GLU -> y = z@W_os (out+skip), h += y[:R].
Variant 'fused' restructures the algebra so only ONE matmul per layer stays on
the dependency chain:

    gates_l = A_l + B_l + const_l
      A_l = W_cur_l @ h_{l-1}            (ready 2 matmuls after z_{l-2} — off path)
      B_l = (W_cur_l W_out_{l-1}) @ z_{l-1}   (THE path matmul)
      const_l = past taps + conditioning      (precomputed per step)
    h_l = h_{l-1} + W_out_{l-1} @ z_{l-1}     (off path, feeds A_{l+1} + ring buffer)

Path per layer: 1 matmul + 1 GLU (vs 2 matmuls + 1 GLU). Extra off-path work:
~25% more MXU tiles. This probe measures both step bodies in a bare Pallas
fori_loop with VMEM-resident weights and REAL ring-buffer reads/writes, no DMA.

Run from the repo root on the TPU box: python scripts/dev_pallas_ar_critpath.py
"""

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

# full-size defaults: layers=20 (stacks=2), R=128, G=256, S=128, k=3
L, R, G, S, K = 20, 128, 256, 128, 3
HALF = G // 2
B = 8            # sublane-padded batch
T = 2048         # steps per launch
f32, bf16 = jnp.float32, jnp.bfloat16
DILS = [2 ** (i % (L // 2)) for i in range(L)]
BUFS = [(K - 1) * d for d in DILS]


def _sigmoid(x):
    one = jnp.asarray(1.0, x.dtype)
    return one / (one + jnp.exp(-x))


def _glu(z):
    return jnp.tanh(z[:, :HALF]) * _sigmoid(z[:, HALF:])


def _glu_bf16(z):
    # transcendentals in bf16 (half the VPU lanes-width cost); constants must be
    # dtype-matched or Mosaic rejects the f32-const-into-bf16 broadcast
    zb = z.astype(bf16)
    return jnp.tanh(zb[:, :HALF]) * _sigmoid(zb[:, HALF:])


def _glu_tanhsig(z):
    # sigmoid(y) = 0.5 + 0.5*tanh(y/2): one transcendental-unit op instead of
    # exp + reciprocal — the GLU is ~60% of the serial chain
    half_c = jnp.asarray(0.5, z.dtype)
    return jnp.tanh(z[:, :HALF]) * (half_c + half_c * jnp.tanh(half_c * z[:, HALF:]))


def _glu_tanhfold(z):
    # tanh-form sigmoid with the y/2 pre-scale FOLDED INTO THE WEIGHTS (free at
    # pack time): the GLU becomes one full-width tanh plus an fma — the serial
    # 0.5*z multiply disappears from the chain. NOTE if promoted to the
    # production kernel: gates = b_term + a_term + consts[li], so EVERY
    # pre-activation gate-half contributor needs the 0.5 fold — the gate halves
    # of w_tap, w_cur, w_fused AND the conditioning projection + bias that make
    # up consts. Scaling only the weight matrices silently breaks numerics.
    half_c = jnp.asarray(0.5, z.dtype)
    t = jnp.tanh(z)
    return t[:, :HALF] * (half_c + half_c * t[:, HALF:])


def _glu_tanhfold_bf16out(z):
    # tanhfold, with the combine in bf16: the cast stays on the serial chain
    # (reordered before the fma, not removed) — the saving is the half-lane-width
    # bf16 fma/combine, and the downstream zb cast becomes a no-op
    half_c = jnp.asarray(0.5, bf16)
    t = jnp.tanh(z).astype(bf16)
    return t[:, :HALF] * (half_c + half_c * t[:, HALF:])


def build(variant):

    def kernel(w_tap, w_os, w_fused, w_cur, w_out, w_skip, cond, out,
               prev_ref, *bufs):
        for buf in bufs:
            buf[:] = jnp.zeros_like(buf)
        prev_ref[:] = jnp.zeros_like(prev_ref) + jnp.asarray(0.01, f32)

        def step_base(t, _):
            h = prev_ref[:]
            skips = jnp.zeros((B, S), f32)
            for li in range(L):
                win = BUFS[li]
                d = DILS[li]
                buf = bufs[li]
                taps = []
                for j in range(K - 1):
                    m = (K - 1 - j) * d
                    slot = jax.lax.rem(t + win - m, win)
                    taps.append(buf[pl.ds(slot, 1)][0])
                buf[pl.ds(jax.lax.rem(t, win), 1)] = h[None].astype(buf.dtype)
                tap_cat = jnp.concatenate(
                    [tp.astype(bf16) for tp in taps] + [h.astype(bf16)], axis=1)
                z = jnp.dot(tap_cat, w_tap[li], preferred_element_type=f32)
                z = z + cond[:, li * G:(li + 1) * G]
                gated = _glu(z)
                y = jnp.dot(gated.astype(bf16), w_os[li], preferred_element_type=f32)
                h = h + y[:, :R]
                skips = skips + y[:, R:]
            prev_ref[:] = h * jnp.asarray(1e-4, f32) + skips[:, :R] * jnp.asarray(1e-6, f32)
            return 0

        glu = {'fused_bf16glu': _glu_bf16,
               'fused_tanhsig': _glu_tanhsig,
               'fused_tanhfold': _glu_tanhfold,
               'fused_tf_bf16o': _glu_tanhfold_bf16out}.get(variant, _glu)

        def step_fused(t, _):
            # const_l: past taps for every layer, computable up front (off path)
            h0 = prev_ref[:]
            consts = []
            for li in range(L):
                win = BUFS[li]
                d = DILS[li]
                buf = bufs[li]
                taps = []
                for j in range(K - 1):
                    m = (K - 1 - j) * d
                    slot = jax.lax.rem(t + win - m, win)
                    taps.append(buf[pl.ds(slot, 1)][0])
                tap_cat = jnp.concatenate([tp.astype(bf16) for tp in taps], axis=1)
                consts.append(jnp.dot(tap_cat, w_tap[li][:(K - 1) * R],
                                      preferred_element_type=f32)
                              + cond[:, li * G:(li + 1) * G])

            # layer 0: ordinary (its gate matmul IS the path matmul)
            z = glu(jnp.dot(h0.astype(bf16), w_cur[0], preferred_element_type=f32)
                     + consts[0])
            h_prev = h0          # h_{l-1}
            skips = jnp.zeros((B, S), f32)
            h_regs = [h0]
            for li in range(1, L):
                zb = z.astype(bf16)
                # THE path matmul: z_{l-1} -> gates_l partial
                b_term = jnp.dot(zb, w_fused[li], preferred_element_type=f32)
                # off-path (issued alongside; no data dep on b_term):
                a_term = jnp.dot(h_prev.astype(bf16), w_cur[li],
                                 preferred_element_type=f32)
                dh = jnp.dot(zb, w_out[li - 1], preferred_element_type=f32)
                skips = skips + jnp.dot(zb, w_skip[li - 1], preferred_element_type=f32)
                h_cur = h_prev + dh                     # h_l
                gates = b_term + a_term + consts[li]
                z = glu(gates)
                h_prev = h_cur
                h_regs.append(h_cur)
            zb = z.astype(bf16)
            skips = skips + jnp.dot(zb, w_skip[L - 1], preferred_element_type=f32)
            h_last = h_prev + jnp.dot(zb, w_out[L - 1], preferred_element_type=f32)
            h_regs.append(h_last)
            # ring-buffer writes (same count as base; batched at step end)
            for li in range(L):
                win = BUFS[li]
                bufs[li][pl.ds(jax.lax.rem(t, win), 1)] = \
                    h_regs[li][None].astype(bufs[li].dtype)
            prev_ref[:] = h_last * jnp.asarray(1e-4, f32) + skips[:, :R] * jnp.asarray(1e-6, f32)
            return 0

        body = step_base if variant == 'base' else step_fused
        jax.lax.fori_loop(0, T, body, 0)
        out[:] = prev_ref[:]

    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.normal(0, 0.05, shape), bf16)

    args = (
        mk(L, K * R, G),        # w_tap
        mk(L, HALF, R + S),     # w_os
        mk(L, HALF, G),         # w_fused = W_cur_l W_out_{l-1}
        mk(L, R, G),            # w_cur
        mk(L, HALF, R),         # w_out
        mk(L, HALF, S),         # w_skip
        jnp.asarray(rng.normal(0, 0.05, (B, L * G)), f32),  # cond
    )
    scratch = [pltpu.VMEM((B, R), f32)]
    scratch += [pltpu.VMEM((w, B, R), f32) for w in BUFS]
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, R), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    return jax.jit(lambda: fn(*args))


def bench(name, fn, reps=5):
    r = fn()
    float(jnp.sum(r))  # compile + fence (host fetch; block_until_ready lies on axon)
    best = min(_timed(fn) for _ in range(reps))
    print(f'{name:8s}: {best * 1e6 / T:7.3f} us/step   ({best * 1e3:.2f} ms / {T} steps)')
    return best


def _timed(fn):
    t0 = time.time()
    float(jnp.sum(fn()))
    return time.time() - t0


if __name__ == '__main__':
    base = bench('base', build('base'))
    fused = bench('fused', build('fused'))
    fbf = bench('fused_bf16glu', build('fused_bf16glu'))
    fts = bench('fused_tanhsig', build('fused_tanhsig'))
    ftf = bench('fused_tanhfold', build('fused_tanhfold'))
    ftb = bench('fused_tf_bf16o', build('fused_tf_bf16o'))
    print(f'fused speedup: {base / fused:.2f}x   bf16-glu: {base / fbf:.2f}x   '
          f'tanh-sigmoid: {base / fts:.2f}x   tanhfold: {base / ftf:.2f}x   '
          f'tanhfold-bf16out: {base / ftb:.2f}x')
