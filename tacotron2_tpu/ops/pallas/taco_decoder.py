"""Pallas TPU kernels: fused Tacotron decoder scan (forward + backward).

Why: the custom-VJP decoder scan (ops/fused_decoder.py) is HBM-bound — every
decoder step re-reads ~33 MB of LSTM/projection weights from HBM (g1 14.7 MB +
g2 16.8 MB bf16), so 512 steps move ~17 GB per scan direction; at v5e bandwidth
that is ~20 ms each way before any compute. These kernels keep ALL decoder
weights VMEM-resident for the whole scan (~35 MB of a ~120 MB budget), stream
per-step inputs/residuals in CHUNK-step slabs via async DMA, and run the whole
step chain prenet→LSTM×2→attention→projections (reference
tacotron/models/Architecture_wrappers.py:169-213) in one kernel launch.

Layout rules (Mosaic): lane dims that cross an HBM↔VMEM DMA are multiples of
128, dynamic indexing happens only on leading (untiled) dims of rank-3 refs,
and the attention location conv is computed as K shifted VPU accumulations into
a (B, T_in, F) buffer followed by one flattened MXU matmul against l_k.

The math mirrors ops/fused_decoder.py step-for-step (same dtypes at each op, so
the nn.scan / XLA-custom-VJP / Pallas paths agree to rounding):
  - forward emits the same residual set (z1, z2, x1, x2, c1p, h1p, c2p, h2p,
    r1, r2, ctx, state_prev, align) plus frames/stops, all (T, B, ·) slabs;
    c1p/c2p are written at row t+1 of a (T+1)-row array so the backward kernel
    can DMA the shifted c_prev sequence without special-casing t=0;
  - backward runs the reverse scan: per step it recomputes the attention stage
    (conv → l_k matmul → energies → softmax) and hand-propagates its VJP,
    carries only the data-flow gradients (dh/dc/dctx/dprev/dstate), and emits
    the per-step gate/input gradients (dz1, dz2, dpq, dp1pre, dp2pre, dfs,
    dteacher); the big weight gradients stay outside as dense XLA matmuls
    (fused_decoder._bwd_rule tail).

Scope: teacher-available modes (train/eval/GTA), 2 prenet layers + 2 decoder
LSTMs (the reference's fixed architecture), feature dims that are multiples of
128 (default config: prenet 256/256, units 1024, attention_dim 128, encoder
512). Anything else falls back to the XLA scan in fused_decoder.py.
"""

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import round_up

LANE = 128
CHUNK_FWD = 16
CHUNK_BWD = 8
NEG_INF = -2.0 ** 32 + 1.0  # matches attention.py / fused_decoder.py
VMEM_LIMIT = 110 * 1024 * 1024


def supports(cfg, n_mel_lanes: int = 0) -> bool:
    """Pallas path covers 128-multiple feature dims (the default config)."""
    U, P1, P2, D = cfg.units, cfg.prenet1, cfg.prenet2, cfg.attention_dim
    return (U % LANE == 0 and P1 % LANE == 0 and P2 % LANE == 0
            and D % LANE == 0 and cfg.attention_kernel % 2 == 1
            and cfg.attention_kernel <= 63)


# ----------------------------------------------------------------------
# weight packing
# ----------------------------------------------------------------------

def _pad_lanes(x, lanes):
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, lanes - x.shape[-1]),))


def pack_fwd_weights(W: Dict[str, jnp.ndarray], cfg) -> Dict[str, jnp.ndarray]:
    """Pad/merge the fused_decoder._weights dict for the kernel.

    - p1_k rows padded M→M_pad (decoder input lanes);
    - frame+stop projections merged into one fs_k (U+E, FS_pad) so one matmul
      yields both (frames at lanes [0, M*r), stops at [M*r, M*r+r));
    - loc conv kernel reshaped (K, 1, F) for per-row reads; biases as (1, N).
    """
    M, r = cfg.num_mels, cfg.r
    M_pad = round_up(M, LANE)
    MR = M * r
    FS_pad = round_up(MR + r, LANE)
    dt = cfg.dtype
    out = {
        'p1_k': jnp.pad(W['p1_k'], ((0, M_pad - M), (0, 0))),
        'p1_b': W['p1_b'][None, :],
        'p2_k': W['p2_k'], 'p2_b': W['p2_b'][None, :],
        'g1_k': W['g1_k'], 'g1_b': W['g1_b'][None, :],
        'g2_k': W['g2_k'], 'g2_b': W['g2_b'][None, :],
        'q_k': W['q_k'],
        'loc_k': W['loc_k'].reshape(cfg.attention_kernel, 1, -1),
        'loc_b': W['loc_b'][None, :],
        'l_k': W['l_k'],
        'v_a': W['v_a'].reshape(1, -1).astype(jnp.float32),
        'b_a': W['b_a'].reshape(1, -1).astype(jnp.float32),
        'fs_k': _pad_lanes(jnp.concatenate([W['f_k'], W['s_k']], axis=1), FS_pad),
        'fs_b': _pad_lanes(jnp.concatenate([W['f_b'], W['s_b']])[None, :], FS_pad),
    }
    return {k: v.astype(dt) if k not in ('v_a', 'b_a') else v
            for k, v in out.items()}


def pack_bwd_weights(W: Dict[str, jnp.ndarray], cfg) -> Dict[str, jnp.ndarray]:
    """Transposed weights for the backward kernel (plus the recompute set)."""
    fwd = pack_fwd_weights(W, cfg)
    return {
        'q_k': fwd['q_k'], 'loc_k': fwd['loc_k'], 'loc_b': fwd['loc_b'],
        'l_k': fwd['l_k'], 'v_a': fwd['v_a'], 'b_a': fwd['b_a'],
        'p1_kT': fwd['p1_k'].T, 'p2_kT': fwd['p2_k'].T,
        'g1_kT': fwd['g1_k'].T, 'g2_kT': fwd['g2_k'].T,
        'q_kT': fwd['q_k'].T, 'l_kT': fwd['l_k'].T,
        'fs_kT': fwd['fs_k'].T,
    }


# ----------------------------------------------------------------------
# shared in-kernel pieces
# ----------------------------------------------------------------------

def _attention_fwd(cfg, st_scr, spv, keys, mask, pq, loc_k, loc_b, l_k, v_a,
                   b_a, T_in_pad, HOFF):
    """Recomputable attention stage: state_prev + pq → (alignments, extras).

    st_scr is a (B, T_in_pad + 2*HOFF) f32 scratch whose margins stay zero;
    spv (f32 state) is written into the center before calling. Returns
    (align f32, f dt, tanh_u f32, e f32) — the extras feed the backward."""
    dt = cfg.dtype
    K = cfg.attention_kernel
    HALO = (K - 1) // 2
    B = spv.shape[0]
    F = loc_k.shape[-1]

    # The conv/energy internals run in f32: Mosaic supports minor-dim newaxis
    # insertion (x[:, :, None]) only for 32-bit types, and f32 here only makes
    # the stage more precise than the bf16 scan path (within test tolerance).
    f32 = jnp.float32
    st_scr[:, HOFF:HOFF + T_in_pad] = spv
    st_f = st_scr[:].astype(dt).astype(f32)   # round-trip through dt for parity
    # newaxis on the CLEAN full array once, then slice the sublane dim: a
    # newaxis-after-lane-offset-slice is an unsupported Mosaic reshape, and
    # x[:, a:b, None] in one indexing op lowers to a gather (also rejected)
    st3 = st_f[:, :, None]                    # (B, SP, 1) f32
    f = jnp.zeros((B, T_in_pad, F), f32) + loc_b[0][None, None, :].astype(f32)
    for j in range(K):
        off = HOFF - HALO + j
        f = f + st3[:, off:off + T_in_pad, :] * loc_k[j].astype(f32)[None, :, :]
    f = f.astype(dt)
    pl_ = jnp.dot(f.reshape(B * T_in_pad, F), l_k[:],
                  preferred_element_type=jnp.float32) \
        .reshape(B, T_in_pad, -1)
    u = (keys[:].astype(f32) + pq.astype(f32)[:, None, :] + pl_) + b_a[0]
    tanh_u = jnp.tanh(u)
    e = jnp.sum(v_a[0][None, None, :] * tanh_u, axis=-1)      # (B, T_in_pad) f32
    e = jnp.where(mask[:] > 0, e, NEG_INF)
    if cfg.smoothing:
        sig = _sigmoid(e)
        # padded batch rows are fully masked (all-NEG_INF energies): guard the
        # zero denominator so they yield 0 instead of NaN (they are trimmed,
        # but NaNs would poison the backward accumulators)
        align = sig / jnp.maximum(jnp.sum(sig, axis=-1, keepdims=True), 1e-20)
    else:
        emax = jnp.max(e, axis=-1, keepdims=True)
        ex = jnp.exp(e - emax)
        align = ex / jnp.sum(ex, axis=-1, keepdims=True)
    return align, f, tanh_u, e


def _sigmoid(x):
    """Dtype-preserving sigmoid: Mosaic's `logistic` lowering broadcasts an f32
    constant into bf16 vectors and fails verification, so spell it out with
    dtype-matched constants."""
    one = jnp.asarray(1.0, x.dtype)
    return one / (one + jnp.exp(-x))


def _lstm_gates_fwd(z, c_prev):
    i, g, f, o = jnp.split(z, 4, axis=-1)
    one = jnp.asarray(1.0, z.dtype)  # dtype-matched consts: Mosaic rejects
    c_new = _sigmoid(f + one) * c_prev + _sigmoid(i) * jnp.tanh(g)
    h_new = _sigmoid(o) * jnp.tanh(c_new)
    return c_new, h_new


# ----------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------

def _make_fwd_kernel(cfg, dims, train_zo: bool):
    (T_pad, B_pad, T_in_pad, M_pad, FS_pad, E) = dims
    dt = cfg.dtype
    U = cfg.units
    M, r = cfg.num_mels, cfg.r
    MR = M * r
    HOFF = 64
    n_chunks = T_pad // CHUNK_FWD
    keep = 1.0 - cfg.zoneout

    def kernel(use_ref, teacher, m1, m2, *rest):
        if train_zo:
            zo_hbm = rest[0]
            rest = rest[1:]
        (keys, values, mask,
         p1_k, p1_b, p2_k, p2_b, g1_k, g1_b, g2_k, g2_b, q_k,
         loc_k, loc_b, l_k, v_a, b_a, fs_k, fs_b,
         fs_o, al_o, sp_o, z1_o, z2_o, x1_o, x2_o, c1_o, h1_o, c2_o, h2_o,
         r1_o, r2_o, ctx_o,
         c1_s, h1_s, c2_s, h2_s, ctx_s, state_s, prev_s, zrow,
         zo_sl, fs_sl, al_sl, sp_sl, z1_sl, z2_sl, x1_sl, x2_sl, c1_sl,
         h1_sl, c2_sl, h2_sl, r1_sl, r2_sl, ctx_sl, in_sem, sems) = rest

        for ref in (c1_s, h1_s, c2_s, h2_s, ctx_s):
            ref[:] = jnp.zeros_like(ref)
        state_s[:] = jnp.zeros_like(state_s)
        prev_s[:] = jnp.zeros_like(prev_s)
        zrow[:] = jnp.zeros_like(zrow)
        # c1_o/c2_o carry c1p[t] at row t+1; row 0 = the zero initial cell state
        z0a = pltpu.make_async_copy(zrow, c1_o.at[pl.ds(0, 1)], in_sem)
        z0a.start(); z0a.wait()
        z0b = pltpu.make_async_copy(zrow, c2_o.at[pl.ds(0, 1)], in_sem)
        z0b.start(); z0b.wait()

        slabs_out = [(fs_sl, fs_o, 0), (al_sl, al_o, 0), (sp_sl, sp_o, 0),
                     (z1_sl, z1_o, 0), (z2_sl, z2_o, 0), (x1_sl, x1_o, 0),
                     (x2_sl, x2_o, 0), (c1_sl, c1_o, 1), (h1_sl, h1_o, 0),
                     (c2_sl, c2_o, 1), (h2_sl, h2_o, 0), (r1_sl, r1_o, 0),
                     (r2_sl, r2_o, 0), (ctx_sl, ctx_o, 0)]

        def chunk_body(ci, _):
            base = ci * CHUNK_FWD
            if train_zo:
                zdma = pltpu.make_async_copy(
                    zo_hbm.at[pl.ds(base, CHUNK_FWD)], zo_sl, in_sem)
                zdma.start(); zdma.wait()
            # previous chunk's output DMAs must land before slab reuse
            @pl.when(ci > 0)
            def _():
                for si_, (sl, dst, off) in enumerate(slabs_out):
                    pltpu.make_async_copy(
                        sl, dst.at[pl.ds((ci - 1) * CHUNK_FWD + off, CHUNK_FWD)],
                        sems.at[si_]).wait()

            def step_body(si, _):
                t = base + si
                u_t = use_ref[t]
                teacher_t = teacher[t]                        # (B_pad, M_pad) dt
                prev = prev_s[:].astype(dt)
                dec = jnp.where(u_t > 0, teacher_t, prev)

                zero = jnp.asarray(0.0, dt)
                r1 = jnp.maximum(jnp.dot(dec, p1_k[:],
                                         preferred_element_type=jnp.float32)
                                 .astype(dt) + p1_b[0], zero)
                p1v = r1 * m1[t]
                r2 = jnp.maximum(jnp.dot(p1v, p2_k[:],
                                         preferred_element_type=jnp.float32)
                                 .astype(dt) + p2_b[0], zero)
                p2v = r2 * m2[t]

                c1c, h1c = c1_s[:], h1_s[:]
                x0 = jnp.concatenate([p2v, ctx_s[:], h1c], axis=-1)
                z1 = jnp.dot(x0, g1_k[:],
                             preferred_element_type=jnp.float32).astype(dt) \
                    + g1_b[0]
                c1n, x1 = _lstm_gates_fwd(z1, c1c)
                if train_zo:
                    ac1 = zo_sl[si, :, 0:U]
                    ah1 = zo_sl[si, :, U:2 * U]
                    ac2 = zo_sl[si, :, 2 * U:3 * U]
                    ah2 = zo_sl[si, :, 3 * U:4 * U]
                else:
                    ac1 = ah1 = ac2 = ah2 = jnp.asarray(keep, dt)
                onez = jnp.asarray(1.0, dt)
                c1p = ac1 * c1n + (onez - ac1) * c1c
                h1p = ah1 * x1 + (onez - ah1) * h1c

                c2c, h2c = c2_s[:], h2_s[:]
                z2 = jnp.dot(jnp.concatenate([x1, h2c], axis=-1), g2_k[:],
                             preferred_element_type=jnp.float32).astype(dt) \
                    + g2_b[0]
                c2n, x2 = _lstm_gates_fwd(z2, c2c)
                c2p = ac2 * c2n + (onez - ac2) * c2c
                h2p = ah2 * x2 + (onez - ah2) * h2c
                c1_s[:], h1_s[:], c2_s[:], h2_s[:] = c1p, h1p, c2p, h2p

                pq = jnp.dot(x2, q_k[:],
                             preferred_element_type=jnp.float32).astype(dt)
                spv = state_s[:, HOFF:HOFF + T_in_pad]
                sp_sl[si] = spv
                align, _, _, _ = _attention_fwd(
                    cfg, state_s, spv, keys, mask, pq, loc_k, loc_b, l_k,
                    v_a, b_a, T_in_pad, HOFF)
                al_sl[si] = align
                new_state = spv + align if cfg.cumulate else align
                state_s[:, HOFF:HOFF + T_in_pad] = new_state
                ctx_f32 = jnp.sum(align[:, :, None] * values[:], axis=1)
                ctx_dt = ctx_f32.astype(dt)
                ctx_s[:] = ctx_dt

                proj_in = jnp.concatenate([x2, ctx_dt], axis=-1)
                fs = (jnp.dot(proj_in, fs_k[:],
                              preferred_element_type=jnp.float32).astype(dt)
                      + fs_b[0]).astype(jnp.float32)          # (B_pad, FS_pad)
                fs_sl[si] = fs
                prev_s[:] = jnp.pad(fs[:, MR - M:MR],
                                    ((0, 0), (0, M_pad - M)))

                z1_sl[si], z2_sl[si] = z1, z2
                x1_sl[si], x2_sl[si] = x1, x2
                c1_sl[si], h1_sl[si] = c1p, h1p
                c2_sl[si], h2_sl[si] = c2p, h2p
                r1_sl[si], r2_sl[si] = r1, r2
                ctx_sl[si] = ctx_dt
                return 0

            jax.lax.fori_loop(0, CHUNK_FWD, step_body, 0)
            for si_, (sl, dst, off) in enumerate(slabs_out):
                pltpu.make_async_copy(
                    sl, dst.at[pl.ds(base + off, CHUNK_FWD)], sems.at[si_]).start()
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        for si_, (sl, dst, off) in enumerate(slabs_out):
            pltpu.make_async_copy(
                sl, dst.at[pl.ds((n_chunks - 1) * CHUNK_FWD + off, CHUNK_FWD)],
                sems.at[si_]).wait()

    return kernel


def forward_pallas(cfg, W, keys, values, mask, teacher, use_teacher, m1, m2,
                   zo, interpret: bool = False):
    """Pallas analog of fused_decoder._forward.

    Returns ((frames, stops, aligns) trimmed to (T, B, ·), residuals) where
    residuals keeps the PADDED slab arrays + pad dims for the backward."""
    interpret = interpret or jax.default_backend() != 'tpu'
    dt = cfg.dtype
    T, B = teacher.shape[0], teacher.shape[1]
    T_in = keys.shape[1]
    E = values.shape[-1]
    U, M, r = cfg.units, cfg.num_mels, cfg.r
    MR = M * r
    M_pad = round_up(M, LANE)
    FS_pad = round_up(MR + r, LANE)
    T_pad = round_up(T, CHUNK_FWD)
    B_pad = round_up(B, 16)
    T_in_pad = round_up(T_in, LANE)
    train_zo = zo is not None
    dims = (T_pad, B_pad, T_in_pad, M_pad, FS_pad, E)

    pk = pack_fwd_weights(W, cfg)

    use_in = jnp.zeros((T_pad,), jnp.float32).at[:T].set(use_teacher)
    use_in = use_in.at[T:].set(1.0)  # pad steps read teacher (zeros), not prev
    teach_in = jnp.zeros((T_pad, B_pad, M_pad), dt)
    teach_in = teach_in.at[:T, :B, :M].set(teacher.astype(dt))
    m1_in = jnp.zeros((T_pad, B_pad, cfg.prenet1), dt).at[:T, :B].set(m1)
    m2_in = jnp.zeros((T_pad, B_pad, cfg.prenet2), dt).at[:T, :B].set(m2)
    keys_in = jnp.zeros((B_pad, T_in_pad, keys.shape[-1]), dt)
    keys_in = keys_in.at[:B, :T_in].set(keys.astype(dt))
    vals_in = jnp.zeros((B_pad, T_in_pad, E), jnp.float32)
    vals_in = vals_in.at[:B, :T_in].set(values.astype(jnp.float32))
    if mask is None:
        mask_in = jnp.zeros((B_pad, T_in_pad), jnp.float32)
        mask_in = mask_in.at[:, :T_in].set(1.0)
    else:
        mask_in = jnp.zeros((B_pad, T_in_pad), jnp.float32)
        mask_in = mask_in.at[:B, :T_in].set(mask)
    args = [use_in, teach_in, m1_in, m2_in]
    if train_zo:
        zo_in = jnp.zeros((T_pad, B_pad, 4 * U), dt)
        zo_in = zo_in.at[:T, :B, 0 * U:1 * U].set(zo[0])
        zo_in = zo_in.at[:T, :B, 1 * U:2 * U].set(zo[1])
        zo_in = zo_in.at[:T, :B, 2 * U:3 * U].set(zo[2])
        zo_in = zo_in.at[:T, :B, 3 * U:4 * U].set(zo[3])
        args.append(zo_in)
    args += [keys_in, vals_in, mask_in,
             pk['p1_k'], pk['p1_b'], pk['p2_k'], pk['p2_b'], pk['g1_k'],
             pk['g1_b'], pk['g2_k'], pk['g2_b'], pk['q_k'], pk['loc_k'],
             pk['loc_b'], pk['l_k'], pk['v_a'], pk['b_a'], pk['fs_k'],
             pk['fs_b']]

    P1, P2 = cfg.prenet1, cfg.prenet2
    D = cfg.attention_dim
    out_shapes = [
        jax.ShapeDtypeStruct((T_pad, B_pad, FS_pad), jnp.float32),      # fs
        jax.ShapeDtypeStruct((T_pad, B_pad, T_in_pad), jnp.float32),    # align
        jax.ShapeDtypeStruct((T_pad, B_pad, T_in_pad), jnp.float32),    # stateprev
        jax.ShapeDtypeStruct((T_pad, B_pad, 4 * U), dt),                # z1
        jax.ShapeDtypeStruct((T_pad, B_pad, 4 * U), dt),                # z2
        jax.ShapeDtypeStruct((T_pad, B_pad, U), dt),                    # x1
        jax.ShapeDtypeStruct((T_pad, B_pad, U), dt),                    # x2
        jax.ShapeDtypeStruct((T_pad + 1, B_pad, U), dt),                # c1p @ t+1
        jax.ShapeDtypeStruct((T_pad, B_pad, U), dt),                    # h1p
        jax.ShapeDtypeStruct((T_pad + 1, B_pad, U), dt),                # c2p @ t+1
        jax.ShapeDtypeStruct((T_pad, B_pad, U), dt),                    # h2p
        jax.ShapeDtypeStruct((T_pad, B_pad, P1), dt),                   # r1
        jax.ShapeDtypeStruct((T_pad, B_pad, P2), dt),                   # r2
        jax.ShapeDtypeStruct((T_pad, B_pad, E), dt),                    # ctx
    ]
    C = CHUNK_FWD
    scratch = [
        pltpu.VMEM((B_pad, U), dt), pltpu.VMEM((B_pad, U), dt),         # c1, h1
        pltpu.VMEM((B_pad, U), dt), pltpu.VMEM((B_pad, U), dt),         # c2, h2
        pltpu.VMEM((B_pad, E), dt),                                     # ctx
        pltpu.VMEM((B_pad, T_in_pad + 128), jnp.float32),               # state+halo
        pltpu.VMEM((B_pad, M_pad), jnp.float32),                        # prev
        pltpu.VMEM((1, B_pad, U), dt),                                  # zero row
        (pltpu.VMEM((C, B_pad, 4 * U), dt) if train_zo
         else pltpu.VMEM((1, 1, LANE), dt)),                            # zo slab
        pltpu.VMEM((C, B_pad, FS_pad), jnp.float32),
        pltpu.VMEM((C, B_pad, T_in_pad), jnp.float32),
        pltpu.VMEM((C, B_pad, T_in_pad), jnp.float32),
        pltpu.VMEM((C, B_pad, 4 * U), dt), pltpu.VMEM((C, B_pad, 4 * U), dt),
        pltpu.VMEM((C, B_pad, U), dt), pltpu.VMEM((C, B_pad, U), dt),
        pltpu.VMEM((C, B_pad, U), dt), pltpu.VMEM((C, B_pad, U), dt),
        pltpu.VMEM((C, B_pad, U), dt), pltpu.VMEM((C, B_pad, U), dt),
        pltpu.VMEM((C, B_pad, P1), dt), pltpu.VMEM((C, B_pad, P2), dt),
        pltpu.VMEM((C, B_pad, E), dt),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((14,)),
    ]
    kernel = _make_fwd_kernel(cfg, dims, train_zo)
    n_vmem_in = len(args) - 4 - (1 if train_zo else 0)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]          # use_teacher
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3)   # teacher, m1, m2
    if train_zo:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))    # zo stays in HBM
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem_in

    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=in_specs,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.ANY)] * len(out_shapes)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*args)

    (fs, al, sp, z1, z2, x1, x2, c1p, h1p, c2p, h2p, r1, r2, ctx) = outs
    frames = fs[:T, :B, :MR]
    stops = fs[:T, :B, MR:MR + r]
    aligns = al[:T, :B, :T_in]
    residuals = dict(fs=fs, al=al, sp=sp, z1=z1, z2=z2, x1=x1, x2=x2,
                     c1p=c1p, h1p=h1p, c2p=c2p, h2p=h2p, r1=r1, r2=r2, ctx=ctx,
                     use_in=use_in, teach_in=teach_in, m1_in=m1_in, m2_in=m2_in,
                     keys_in=keys_in, vals_in=vals_in, mask_in=mask_in,
                     zo_in=zo_in if train_zo else None)
    return (frames, stops, aligns), residuals


# ----------------------------------------------------------------------
# backward kernel
# ----------------------------------------------------------------------

def _lstm_bwd_k(z, c_prev, dh_new, dc_post, a_c):
    """Backward through gates + cell-zoneout mixing (fused_decoder._lstm_bwd).

    Returns (dz f32, dc_prev-from-gates f32); the (1-a_c) bypass term is added
    by the caller. Constants are dtype-matched (Mosaic broadcast rule)."""
    i, g, f, o = jnp.split(z, 4, axis=-1)
    one = jnp.asarray(1.0, z.dtype)
    si_ = _sigmoid(i)
    tg = jnp.tanh(g)
    sf = _sigmoid(f + one)
    so = _sigmoid(o)
    c_new = sf * c_prev + si_ * tg
    tc = jnp.tanh(c_new)
    dc_new = dh_new * so * (1.0 - (tc * tc).astype(jnp.float32)) + a_c * dc_post
    do = dh_new * tc.astype(jnp.float32) * (so * (one - so)).astype(jnp.float32)
    df_ = dc_new * (c_prev * sf * (one - sf)).astype(jnp.float32)
    di = dc_new * (tg * si_ * (one - si_)).astype(jnp.float32)
    dg = dc_new * (si_ * (one - tg * tg)).astype(jnp.float32)
    dz = jnp.concatenate([di, dg, df_, do], axis=-1)
    return dz, dc_new * sf


def _make_bwd_kernel(cfg, dims, train_zo: bool):
    (T_pad, B_pad, T_in_pad, M_pad, FS_pad, E) = dims
    dt = cfg.dtype
    U = cfg.units
    P1, P2 = cfg.prenet1, cfg.prenet2
    M, r = cfg.num_mels, cfg.r
    MR = M * r
    K = cfg.attention_kernel
    HALO = (K - 1) // 2
    HOFF = 64
    C = CHUNK_BWD
    n_chunks = T_pad // C
    keep = 1.0 - cfg.zoneout
    f32 = jnp.float32

    def kernel(use_ref, m1, m2, *rest):
        if train_zo:
            zo_hbm = rest[0]
            rest = rest[1:]
        (keys, values, mask,
         q_k, loc_k, loc_b, l_k, v_a, b_a,
         p1_kT, p2_kT, g1_kT, g2_kT, q_kT, l_kT, fs_kT,
         gfs_h, gal_h, z1_h, z2_h, x2_h, c1_h, c2_h, sp_h, al_h, r1_h, r2_h,
         dz1_o, dz2_o, dpq_o, dp1_o, dp2_o, dfs_o, dteach_o,
         dkeys_o, dlock_o, dlocb_o, dlk_o, dva_o, dba_o,
         dc1_s, dh1_s, dc2_s, dh2_s, dctx_s, dprev_s, dstate_s,
         st_scr, dfp_scr,
         zo_sl, gfs_sl, gal_sl, z1_sl, z2_sl, x2_sl, c1_sl, c2_sl, sp_sl,
         al_sl, r1_sl, r2_sl,
         dz1_sl, dz2_sl, dpq_sl, dp1_sl, dp2_sl, dfs_sl, dteach_sl,
         in_sems, out_sems) = rest

        for ref in (dc1_s, dh1_s, dc2_s, dh2_s, dctx_s, dprev_s, dstate_s,
                    st_scr, dfp_scr, dkeys_o, dlock_o, dlocb_o, dlk_o,
                    dva_o, dba_o):
            ref[:] = jnp.zeros_like(ref)

        # c1_h/c2_h hold c1p[t] at row t+1, so rows [base, base+C) ARE the
        # shifted c_prev sequence for steps [base, base+C)
        slabs_in = [(gfs_sl, gfs_h), (gal_sl, gal_h), (z1_sl, z1_h),
                    (z2_sl, z2_h), (x2_sl, x2_h), (c1_sl, c1_h),
                    (c2_sl, c2_h), (sp_sl, sp_h), (al_sl, al_h),
                    (r1_sl, r1_h), (r2_sl, r2_h)]
        slabs_out = [(dz1_sl, dz1_o), (dz2_sl, dz2_o), (dpq_sl, dpq_o),
                     (dp1_sl, dp1_o), (dp2_sl, dp2_o), (dfs_sl, dfs_o),
                     (dteach_sl, dteach_o)]

        def chunk_body(k_ci, _):
            ci = n_chunks - 1 - k_ci
            base = ci * C
            for si_, (sl, src) in enumerate(slabs_in):
                pltpu.make_async_copy(src.at[pl.ds(base, C)], sl,
                                      in_sems.at[si_]).start()
            if train_zo:
                pltpu.make_async_copy(zo_hbm.at[pl.ds(base, C)], zo_sl,
                                      in_sems.at[len(slabs_in)]).start()
            for si_, (sl, src) in enumerate(slabs_in):
                pltpu.make_async_copy(src.at[pl.ds(base, C)], sl,
                                      in_sems.at[si_]).wait()
            if train_zo:
                pltpu.make_async_copy(zo_hbm.at[pl.ds(base, C)], zo_sl,
                                      in_sems.at[len(slabs_in)]).wait()
            # previous (later-t) chunk's output DMAs must land before slab reuse
            @pl.when(k_ci > 0)
            def _():
                for si_, (sl, dst) in enumerate(slabs_out):
                    pltpu.make_async_copy(
                        sl, dst.at[pl.ds((ci + 1) * C, C)], out_sems.at[si_]).wait()

            def step_body(k_si, _):
                si = C - 1 - k_si
                t = base + si
                if train_zo:
                    ac1 = zo_sl[si, :, 0:U].astype(f32)
                    ah1 = zo_sl[si, :, U:2 * U].astype(f32)
                    ac2 = zo_sl[si, :, 2 * U:3 * U].astype(f32)
                    ah2 = zo_sl[si, :, 3 * U:4 * U].astype(f32)
                else:
                    ac1 = ah1 = ac2 = ah2 = jnp.asarray(keep, f32)

                # ---- projections ----
                gfs_t = gfs_sl[si]                              # (B, FS_pad) f32
                dfs = gfs_t.at[:, MR - M:MR].add(dprev_s[:, :M])
                dfs_sl[si] = dfs
                dproj = jnp.dot(dfs.astype(dt), fs_kT[:],
                                preferred_element_type=f32).astype(dt)
                dx2 = dproj[:, :U]
                dctx_tot = dproj[:, U:].astype(f32) + dctx_s[:]

                # ---- attention backward (recompute + hand VJP) ----
                al_t = al_sl[si]                                # (B, T_in_pad) f32
                dalign = jnp.sum(dctx_tot[:, None, :] * values[:], axis=-1) \
                    + gal_sl[si]
                if cfg.cumulate:
                    dalign = dalign + dstate_s[:]
                x2_t = x2_sl[si]
                pq = jnp.dot(x2_t, q_k[:],
                             preferred_element_type=f32).astype(dt)
                spv = sp_sl[si]
                _, f_att, tanh_u, e = _attention_fwd(
                    cfg, st_scr, spv, keys, mask, pq, loc_k, loc_b, l_k,
                    v_a, b_a, T_in_pad, HOFF)
                dsum = jnp.sum(dalign * al_t, axis=-1, keepdims=True)
                if cfg.smoothing:
                    sig = _sigmoid(e)
                    S = jnp.maximum(jnp.sum(sig, axis=-1, keepdims=True), 1e-20)
                    de = sig * (1.0 - sig) * (dalign - dsum) / S
                else:
                    de = al_t * (dalign - dsum)
                de = jnp.where(mask[:] > 0, de, 0.0)
                dth = de[:, :, None] * v_a[0][None, None, :]
                du = dth * (1.0 - tanh_u * tanh_u)              # (B,T,D) f32
                dva_o[:] = dva_o[:] + jnp.sum(de[:, :, None] * tanh_u,
                                              axis=(0, 1))[None, :]
                dba_o[:] = dba_o[:] + jnp.sum(du, axis=(0, 1))[None, :]
                dkeys_o[:] = dkeys_o[:] + du.astype(dt).astype(f32)
                dpq_t = jnp.sum(du, axis=1).astype(dt)
                dpq_sl[si] = dpq_t
                dpl = du.astype(dt)
                BT = B_pad * T_in_pad
                df = jnp.dot(dpl.reshape(BT, -1), l_kT[:],
                             preferred_element_type=f32).astype(dt) \
                    .reshape(B_pad, T_in_pad, -1)
                dlk_o[:] = dlk_o[:] + jax.lax.dot_general(
                    f_att.reshape(BT, -1), dpl.reshape(BT, -1),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
                dlocb_o[:] = dlocb_o[:] + jnp.sum(df.astype(f32),
                                                  axis=(0, 1))[None, :]
                st3 = st_scr[:].astype(dt).astype(f32)[:, :, None]  # (B, SP, 1)
                df32 = df.astype(f32)
                for j in range(K):
                    off = HOFF - HALO + j
                    dlock_o[j] = dlock_o[j] + jnp.sum(
                        st3[:, off:off + T_in_pad, :] * df32,
                        axis=(0, 1))[None, :]
                dfp_scr[:, HOFF:HOFF + T_in_pad, :] = df32
                dstate_c = jnp.zeros((B_pad, T_in_pad), f32)
                for j in range(K):
                    off = HOFF + HALO - j
                    dstate_c = dstate_c + jnp.sum(
                        dfp_scr[:, off:off + T_in_pad, :]
                        * loc_k[j].astype(f32)[None, :, :], axis=-1)
                if cfg.cumulate:
                    dstate_s[:] = dstate_s[:] + dstate_c
                else:
                    dstate_s[:] = dstate_c

                # ---- LSTM 2 ----
                dh2n = (dx2 + jnp.dot(dpq_t, q_kT[:],
                                      preferred_element_type=f32).astype(dt)
                        ).astype(f32) + ah2 * dh2_s[:]
                dc2_old = dc2_s[:]
                dz2, dc2g = _lstm_bwd_k(z2_sl[si], c2_sl[si], dh2n, dc2_old, ac2)
                dc2_s[:] = dc2g + (1.0 - ac2) * dc2_old
                dz2_sl[si] = dz2
                din2 = jnp.dot(dz2.astype(dt), g2_kT[:],
                               preferred_element_type=f32)
                dx1 = din2[:, :U]
                dh2_s[:] = din2[:, U:] + (1.0 - ah2) * dh2_s[:]

                # ---- LSTM 1 ----
                dh1n = dx1 + ah1 * dh1_s[:]
                dc1_old = dc1_s[:]
                dz1, dc1g = _lstm_bwd_k(z1_sl[si], c1_sl[si], dh1n, dc1_old, ac1)
                dc1_s[:] = dc1g + (1.0 - ac1) * dc1_old
                dz1_sl[si] = dz1
                din1 = jnp.dot(dz1.astype(dt), g1_kT[:],
                               preferred_element_type=f32)
                dp2 = din1[:, :P2]
                dctx_s[:] = din1[:, P2:P2 + E]
                dh1_s[:] = din1[:, P2 + E:] + (1.0 - ah1) * dh1_s[:]

                # ---- prenet ----
                dp2pre = (dp2 * m2[t].astype(f32)
                          * (r2_sl[si] > 0)).astype(dt)
                dp2_sl[si] = dp2pre
                dp1 = jnp.dot(dp2pre, p2_kT[:], preferred_element_type=f32)
                dp1pre = (dp1 * m1[t].astype(f32)
                          * (r1_sl[si] > 0)).astype(dt)
                dp1_sl[si] = dp1pre
                ddec = jnp.dot(dp1pre, p1_kT[:], preferred_element_type=f32)
                u_t = use_ref[t]
                dprev_s[:] = jnp.where(u_t > 0, 0.0, ddec)
                dteach_sl[si] = jnp.where(u_t > 0, ddec, 0.0)
                return 0

            jax.lax.fori_loop(0, C, step_body, 0)
            for si_, (sl, dst) in enumerate(slabs_out):
                pltpu.make_async_copy(sl, dst.at[pl.ds(base, C)],
                                      out_sems.at[si_]).start()
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        for si_, (sl, dst) in enumerate(slabs_out):
            pltpu.make_async_copy(sl, dst.at[pl.ds(0, C)], out_sems.at[si_]).wait()

    return kernel


def backward_pallas(cfg, W, res, g_frames, g_stops, g_aligns,
                    interpret: bool = False):
    """Pallas reverse scan. Consumes forward_pallas residuals (padded) and the
    output cotangents (unpadded); returns the padded per-step gradient emits
    plus the small in-kernel weight accumulators:
      (dz1s, dz2s, dpqs, dp1pres, dp2pres, dfs_s, dteacher_pad,
       dkeys_pad, dloc_k, dloc_b, dl_k, dva, dba)."""
    interpret = interpret or jax.default_backend() != 'tpu'
    dt = cfg.dtype
    U, P1, P2 = cfg.units, cfg.prenet1, cfg.prenet2
    M, r = cfg.num_mels, cfg.r
    MR = M * r
    K = cfg.attention_kernel
    F = cfg.attention_filters
    D = cfg.attention_dim
    teach_in = res['teach_in']
    T_pad, B_pad, M_pad = teach_in.shape
    T_in_pad = res['keys_in'].shape[1]
    E = res['vals_in'].shape[-1]
    FS_pad = res['fs'].shape[-1]
    T, B = g_frames.shape[0], g_frames.shape[1]
    train_zo = res['zo_in'] is not None
    dims = (T_pad, B_pad, T_in_pad, M_pad, FS_pad, E)
    C = CHUNK_BWD
    f32 = jnp.float32

    pk = pack_bwd_weights(W, cfg)
    gfs = jnp.zeros((T_pad, B_pad, FS_pad), f32)
    gfs = gfs.at[:T, :B, :MR].set(g_frames.astype(f32))
    gfs = gfs.at[:T, :B, MR:MR + r].set(g_stops.astype(f32))
    gal = jnp.zeros((T_pad, B_pad, T_in_pad), f32)
    gal = gal.at[:T, :B, :g_aligns.shape[-1]].set(g_aligns.astype(f32))

    args = [res['use_in'], res['m1_in'], res['m2_in']]
    if train_zo:
        args.append(res['zo_in'])
    args += [res['keys_in'], res['vals_in'], res['mask_in'],
             pk['q_k'], pk['loc_k'], pk['loc_b'], pk['l_k'], pk['v_a'],
             pk['b_a'], pk['p1_kT'], pk['p2_kT'], pk['g1_kT'], pk['g2_kT'],
             pk['q_kT'], pk['l_kT'], pk['fs_kT'],
             gfs, gal, res['z1'], res['z2'], res['x2'], res['c1p'],
             res['c2p'], res['sp'], res['al'], res['r1'], res['r2']]

    out_shapes = [
        jax.ShapeDtypeStruct((T_pad, B_pad, 4 * U), f32),   # dz1
        jax.ShapeDtypeStruct((T_pad, B_pad, 4 * U), f32),   # dz2
        jax.ShapeDtypeStruct((T_pad, B_pad, D), dt),        # dpq
        jax.ShapeDtypeStruct((T_pad, B_pad, P1), dt),       # dp1pre
        jax.ShapeDtypeStruct((T_pad, B_pad, P2), dt),       # dp2pre
        jax.ShapeDtypeStruct((T_pad, B_pad, FS_pad), f32),  # dfs
        jax.ShapeDtypeStruct((T_pad, B_pad, M_pad), f32),   # dteacher
        jax.ShapeDtypeStruct((B_pad, T_in_pad, D), f32),    # dkeys
        jax.ShapeDtypeStruct((K, 1, F), f32),               # dloc_k
        jax.ShapeDtypeStruct((1, F), f32),                  # dloc_b
        jax.ShapeDtypeStruct((F, D), f32),                  # dl_k
        jax.ShapeDtypeStruct((1, D), f32),                  # dva
        jax.ShapeDtypeStruct((1, D), f32),                  # dba
    ]
    out_specs = ([pl.BlockSpec(memory_space=pltpu.ANY)] * 7
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6)

    scratch = [
        pltpu.VMEM((B_pad, U), f32), pltpu.VMEM((B_pad, U), f32),    # dc1, dh1
        pltpu.VMEM((B_pad, U), f32), pltpu.VMEM((B_pad, U), f32),    # dc2, dh2
        pltpu.VMEM((B_pad, E), f32),                                 # dctx
        pltpu.VMEM((B_pad, M_pad), f32),                             # dprev
        pltpu.VMEM((B_pad, T_in_pad), f32),                          # dstate
        pltpu.VMEM((B_pad, T_in_pad + 128), f32),                    # state+halo
        pltpu.VMEM((B_pad, T_in_pad + 128, F), f32),                 # df padded
        (pltpu.VMEM((C, B_pad, 4 * U), dt) if train_zo
         else pltpu.VMEM((1, 1, LANE), dt)),
        pltpu.VMEM((C, B_pad, FS_pad), f32),                         # gfs
        pltpu.VMEM((C, B_pad, T_in_pad), f32),                       # gal
        pltpu.VMEM((C, B_pad, 4 * U), dt), pltpu.VMEM((C, B_pad, 4 * U), dt),
        pltpu.VMEM((C, B_pad, U), dt),                               # x2
        pltpu.VMEM((C, B_pad, U), dt), pltpu.VMEM((C, B_pad, U), dt),  # c1, c2
        pltpu.VMEM((C, B_pad, T_in_pad), f32),                       # sp
        pltpu.VMEM((C, B_pad, T_in_pad), f32),                       # al
        pltpu.VMEM((C, B_pad, P1), dt), pltpu.VMEM((C, B_pad, P2), dt),
        pltpu.VMEM((C, B_pad, 4 * U), f32), pltpu.VMEM((C, B_pad, 4 * U), f32),
        pltpu.VMEM((C, B_pad, D), dt),
        pltpu.VMEM((C, B_pad, P1), dt), pltpu.VMEM((C, B_pad, P2), dt),
        pltpu.VMEM((C, B_pad, FS_pad), f32),
        pltpu.VMEM((C, B_pad, M_pad), f32),
        pltpu.SemaphoreType.DMA((12,)),
        pltpu.SemaphoreType.DMA((7,)),
    ]
    kernel = _make_bwd_kernel(cfg, dims, train_zo)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2)
    if train_zo:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16  # keys/values/mask + 13 weights
    in_specs += [pl.BlockSpec(memory_space=pltpu.ANY)] * 11   # residual slab arrays

    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*args)
