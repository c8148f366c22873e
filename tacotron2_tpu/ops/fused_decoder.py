"""Fused (custom-VJP) Tacotron decoder scan.

Why this exists: XLA's autodiff of the decoder `lax.scan` accumulates the big LSTM
weight gradients (1792x4096 + 2048x4096 f32 = ~63 MB) in the reverse-scan carry —
~120 MB of HBM read-modify-write per decoder step, x512 steps = ~60 GB of gradient
traffic per train step. That accumulator traffic, not FLOPs, is what made the
backward pass dominate the round-1 train step (CLAUDE.md: "the scanned decoder
fwd+bwd dominates").

This module reimplements the teacher-forced decoder scan (the step chain
prenet→LSTM×2→attention→projections, reference Architecture_wrappers.py:169-213)
with a hand-written VJP:

  - forward: one `lax.scan`, saving small per-step residuals (gate pre-activations,
    cell states, contexts — ~0.5 GB bf16 at full size) to HBM;
  - backward: a reverse `lax.scan` that propagates ONLY the sequential data-flow
    gradients (dh/dc/dcontext/dalignment-state) and EMITS the per-step gate/input
    gradients; the fiddly per-step pieces (location conv, energy, softmax) are
    differentiated with a local `jax.vjp` over a recomputed attention stage;
  - weight gradients: computed AFTER the scan as a handful of large MXU matmuls
    over the stacked sequences (dW = einsum('tbi,tbo->io', inputs, dgates)).

Net effect: gradient accumulator traffic drops from O(T * |W|) to O(|residuals|),
and the weight-grad FLOPs run as dense (T*B, in)x(T*B, out) matmuls instead of 512
rank-B updates.

Stochasticity (always-on prenet dropout, zoneout) enters as pre-sampled mask
arrays, so the function itself is deterministic and the VJP exact. The zoneout
train form `(1-z)*dropout(new-old, z) + old` algebraically reduces to
`where(mask, new, old)` (the (1-z) and 1/keep factors cancel), so train mode passes
bernoulli keep-gates and eval mode passes the (1-z) expectation scalar. Keep-gates
may be passed as bool arrays (half the HBM traffic of bf16, no scale fusion at
generation); they are converted to the compute dtype per scan step, which XLA
fuses into the consuming ops.

HBM discipline (what the round-3 B=64 trace showed matters, docs/round3):
  - dz1/dz2 are emitted in the compute dtype, not f32 — they feed bf16-input
    dW einsums and dbias reductions anyway; f32 emits were 2x2.1 GB round trips;
  - dkeys is accumulated in the reverse-scan carry ((B,T_in,D) f32) instead of
    emitting a (T,B,T_in,D) buffer (1 GB at full size) plus init + reduce;
  - the per-step total context gradient is emitted ((B,M_enc), small) so dvalues
    is one einsum — no post-scan recompute of the projection/gate matmuls.

Scope: teacher-available modes (train / eval / GTA) with 2 prenet layers and
2 decoder LSTM layers (the reference's fixed architecture); the model falls back to
the nn.scan path otherwise and for synthesis (which uses the early-exit while_loop).
"""

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -2.0 ** 32 + 1.0  # matches attention.py


@dataclass(frozen=True)
class DecoderConfig:
    num_mels: int
    r: int
    prenet1: int
    prenet2: int
    units: int               # decoder LSTM units
    attention_dim: int
    attention_filters: int
    attention_kernel: int
    cumulate: bool
    smoothing: bool
    zoneout: float           # used in eval (expectation) mode
    deterministic: bool      # True → zoneout expectation, no zoneout masks
    stop_at_any: bool
    unroll: int = 1          # scan unroll (amortizes per-iteration overhead)
    dtype: Any = jnp.float32


def supports(hp) -> bool:
    """Fused path covers the reference's fixed decoder architecture
    (2 prenet layers + 2 decoder LSTMs; smoothing is handled via the vjp stage)."""
    return len(tuple(hp.prenet_layers)) == 2 and hp.decoder_layers == 2


def config_from_hp(hp, dtype, deterministic: bool) -> DecoderConfig:
    return DecoderConfig(
        num_mels=hp.num_mels, r=hp.outputs_per_step,
        prenet1=hp.prenet_layers[0], prenet2=hp.prenet_layers[1],
        units=hp.decoder_lstm_units, attention_dim=hp.attention_dim,
        attention_filters=hp.attention_filters,
        attention_kernel=hp.attention_kernel[0],
        cumulate=hp.cumulative_weights, smoothing=hp.smoothing,
        zoneout=hp.tacotron_zoneout_rate, deterministic=deterministic,
        stop_at_any=hp.stop_at_any, unroll=hp.decoder_scan_unroll, dtype=dtype)


def _weights(params: Dict, cfg: DecoderConfig) -> Dict[str, jnp.ndarray]:
    """Flatten the flax decoder param tree; matmul weights pre-cast to cfg.dtype."""
    dt = cfg.dtype
    att = params['attention']
    return dict(
        p1_k=params['prenet']['dense_1']['kernel'].astype(dt),
        p1_b=params['prenet']['dense_1']['bias'].astype(dt),
        p2_k=params['prenet']['dense_2']['kernel'].astype(dt),
        p2_b=params['prenet']['dense_2']['bias'].astype(dt),
        g1_k=params['lstm_1']['gates']['kernel'].astype(dt),
        g1_b=params['lstm_1']['gates']['bias'].astype(dt),
        g2_k=params['lstm_2']['gates']['kernel'].astype(dt),
        g2_b=params['lstm_2']['gates']['bias'].astype(dt),
        q_k=att['query_layer']['kernel'].astype(dt),
        loc_k=att['location_convolution']['kernel'].astype(dt),
        loc_b=att['location_convolution']['bias'].astype(dt),
        l_k=att['location_layer']['kernel'].astype(dt),
        v_a=att['attention_variable_projection'].astype(jnp.float32),
        b_a=att['attention_bias'].astype(jnp.float32),
        f_k=params['frame_projection']['kernel'].astype(dt),
        f_b=params['frame_projection']['bias'].astype(dt),
        s_k=params['stop_projection']['kernel'].astype(dt),
        s_b=params['stop_projection']['bias'].astype(dt),
    )


def _lstm_fwd(z, c_prev):
    """Gate nonlinearity (ZoneoutLSTMCell forget_bias=1.0). Returns (c_new, h_new)."""
    i, g, f, o = jnp.split(z, 4, axis=-1)
    c_new = jax.nn.sigmoid(f + 1.0) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return c_new, h_new


def _lstm_bwd(z, c_prev, dh_new, dc_post, a_c):
    """Backward through the gate nonlinearity + cell-zoneout mixing.

    dh_new: total gradient on h_new; dc_post: gradient on the post-zoneout cell.
    Returns (dz, dc_prev_from_gates) — the (1-a_c) bypass is added by the caller.
    """
    i, g, f, o = jnp.split(z, 4, axis=-1)
    si = jax.nn.sigmoid(i)
    tg = jnp.tanh(g)
    sf = jax.nn.sigmoid(f + 1.0)
    so = jax.nn.sigmoid(o)
    c_new = sf * c_prev + si * tg
    tc = jnp.tanh(c_new)
    dc_new = dh_new * so * (1.0 - tc * tc) + a_c * dc_post
    do = dh_new * tc * so * (1.0 - so)
    df = dc_new * c_prev * sf * (1.0 - sf)
    di = dc_new * tg * si * (1.0 - si)
    dg = dc_new * si * (1.0 - tg * tg)
    dz = jnp.concatenate([di, dg, df, do], axis=-1)
    dc_prev = dc_new * sf
    return dz, dc_prev


# VMEM byte budget for the banded location matrices. Above it the per-step conv
# form is used instead (loc_m: (T_in, T_in*F) — covers T_in ≤ 362 bf16 at the
# default F=32; loc_n additionally folds l_k: (T_in, T_in*D) — T_in ≤ 181 at
# D=128).
LOC_MAT_BYTES = 8 * 1024 * 1024


def _loc_matrix(loc_k: jnp.ndarray, T_in: int, dtype) -> jnp.ndarray:
    """Banded dense (T_in, T_in*F) equivalent of the SAME location conv:
    conv1d(state)[b, j, f] == (state @ M).reshape(B, T_in, F)[b, j, f].

    Built once per train step (outside the scans) by convolving an identity
    batch. Turns the per-step C_in=1 conv — which tiles terribly on the MXU and
    drags layout copies through the scan body — into one MXU matmul against a
    VMEM-resident operand."""
    eye = jnp.eye(T_in, dtype=dtype)[:, :, None]
    m = jax.lax.conv_general_dilated(eye, loc_k, (1,), 'SAME',
                                     dimension_numbers=('NWC', 'WIO', 'NWC'))
    return m.reshape(T_in, -1)  # m[s, j*F+f]: weight of state[s] in f[j, f]


def _augment_loc_weights(W: Dict, cfg: DecoderConfig, T_in: int,
                         B: int) -> Dict:
    """Attach the banded location matrices that fit the VMEM budget.

    loc_m replaces the per-step C_in=1 conv with one MXU matmul; loc_n
    additionally folds the (F, D) location layer in, so the scan body computes
    pl = state @ loc_n directly — no (B, T_in, F) intermediate at all (f is
    only rebuilt in the backward for the location-layer weight grad). loc_n is
    skipped at large batch: measured on v5e, the extra VMEM-resident matrix
    wins at B≤64 (full size: −3.5 ms/step) but regresses B=128 (+5 ms —
    activation slabs already fill VMEM there)."""
    isz = jnp.dtype(cfg.dtype).itemsize
    if T_in * T_in * cfg.attention_filters * isz <= LOC_MAT_BYTES:
        W['loc_m'] = _loc_matrix(W['loc_k'], T_in, cfg.dtype)
        if B <= 96 and T_in * T_in * cfg.attention_dim * isz <= LOC_MAT_BYTES:
            W['loc_n'] = (W['loc_m'].reshape(T_in, T_in, -1)
                          @ W['l_k']).reshape(T_in, -1)
            W['pl_b'] = W['loc_b'] @ W['l_k']                  # (D,)
    return W


def _loc_features(cfg: DecoderConfig, W, state_prev):
    """Location features f (B, T_in, F) from the previous alignment state."""
    if 'loc_m' in W:
        B, T_in = state_prev.shape
        return (state_prev.astype(cfg.dtype) @ W['loc_m']).reshape(
            B, T_in, -1) + W['loc_b']
    return jax.lax.conv_general_dilated(
        state_prev[..., None].astype(cfg.dtype), W['loc_k'], (1,), 'SAME',
        dimension_numbers=('NWC', 'WIO', 'NWC')) + W['loc_b']


def _loc_pl(cfg: DecoderConfig, W, state_prev):
    """Location-layer projection pl (B, T_in, D)."""
    if 'loc_n' in W:
        B, T_in = state_prev.shape
        return (state_prev.astype(cfg.dtype) @ W['loc_n']).reshape(
            B, T_in, -1) + W['pl_b']
    return _loc_features(cfg, W, state_prev) @ W['l_k']


def _att_align(cfg: DecoderConfig, W, keys, mask, pq, state_prev):
    """Recomputable attention stage: (pq, prev alignment state) → alignments.

    Mirrors LocationSensitiveAttention.__call__ (attention.py:51-101) minus the
    context matmul (handled separately so dvalues can be batched post-scan)."""
    pl = _loc_pl(cfg, W, state_prev)
    u = keys + pq[:, None, :] + pl + W['b_a']       # promotes to f32 (b_a is f32)
    e = jnp.sum(W['v_a'][0] * jnp.tanh(u), axis=2)
    if mask is not None:
        e = jnp.where(mask > 0, e, NEG_INF)
    if cfg.smoothing:
        sig = jax.nn.sigmoid(e)
        return sig / jnp.sum(sig, axis=-1, keepdims=True)
    return jax.nn.softmax(e, axis=-1)


def _loc_acc_init(cfg: DecoderConfig, W, T_in: int) -> jnp.ndarray:
    """Zero accumulator for the location-kernel gradient (shape is tier-specific:
    the banded-matrix tiers accumulate the full dense dloc_m and extract the
    band diagonals once after the scan; the conv tier accumulates (k,1,F))."""
    if 'loc_m' in W:
        return jnp.zeros((T_in, T_in * cfg.attention_filters), jnp.float32)
    return jnp.zeros_like(W['loc_k'], jnp.float32)


def _loc_acc_finalize(cfg: DecoderConfig, W, loc_acc: jnp.ndarray) -> jnp.ndarray:
    """Reduce the accumulated location gradient to dloc_k (k, 1, F)."""
    if 'loc_m' not in W:
        return loc_acc
    K = W['loc_k'].shape[0]
    F = cfg.attention_filters
    T_in = loc_acc.shape[0]
    pad_lo = (K - 1) // 2
    # dloc_k[k, f] = sum_j dloc_m[j + k - pad_lo, j, f] (band diagonals)
    s_pad = jnp.pad(loc_acc.reshape(T_in, T_in, F),
                    ((pad_lo, K - 1 - pad_lo), (0, 0), (0, 0)))
    flat = s_pad.reshape(-1, F)
    j = jnp.arange(T_in)
    idx = (j[None, :] + jnp.arange(K)[:, None]) * T_in + j[None, :]  # (k, T_in)
    return flat[idx].sum(1)[:, None, :]                              # (k, 1, F)


def _att_bwd(cfg: DecoderConfig, W, keys, mask, pq, state_prev, dalign):
    """Hand-derived backward of `_att_align` (+ the identity keys path).

    The jax.vjp form of this stage dominated the reverse scan: the C_in=1
    location-conv transpose, kernel-grad correlation and (F, D) weight grads all
    lower to MXU-hostile shapes ((B, T_in, 1) / (k, 1, F)) plus layout copies.
    Here every contraction is an explicit 2-D MXU matmul; the location-kernel
    gradient is accumulated as the dense dloc_m (band extracted post-scan), so
    no (k, ...) shaped op appears in the scan body at all.

    Returns (dpq, dstate, dkeys_t, dloc_acc_t, dloc_b, dl_k, dva, dba); weight
    grads are per-step contributions in f32 (accumulated in the scan carry).
    """
    dt = cfg.dtype
    B, T_in = state_prev.shape
    f32 = jnp.float32
    dot = partial(jax.lax.dot_general, preferred_element_type=f32)

    # --- recompute forward (same ops as _att_align) ---
    pl = _loc_pl(cfg, W, state_prev)
    u = keys + pq[:, None, :] + pl + W['b_a']
    tanh_u = jnp.tanh(u)
    e = jnp.sum(W['v_a'][0] * tanh_u, axis=2)
    if mask is not None:
        e = jnp.where(mask > 0, e, NEG_INF)

    # --- normalization backward ---
    if cfg.smoothing:
        sig = jax.nn.sigmoid(e)
        ssum = jnp.sum(sig, axis=-1, keepdims=True)
        align = sig / ssum
        dsig = (dalign - jnp.sum(dalign * align, axis=-1, keepdims=True)) / ssum
        de = dsig * sig * (1.0 - sig)
    else:
        align = jax.nn.softmax(e, axis=-1)
        de = (dalign - jnp.sum(dalign * align, axis=-1, keepdims=True)) * align
    if mask is not None:
        de = jnp.where(mask > 0, de, 0.0)

    # --- energy backward: e = sum(v_a * tanh(u)) ---
    du = (de[:, :, None] * W['v_a'][0]) * (1.0 - tanh_u * tanh_u)  # (B,T_in,D) f32
    dva = jnp.sum(de[:, :, None] * tanh_u, axis=(0, 1))[None, :]   # (1, D)
    dba = jnp.sum(du, axis=(0, 1))                                 # (D,)
    dpq = jnp.sum(du, axis=1).astype(dt)                           # (B, D)
    dkeys_t = du                                                   # identity path

    # --- location path: pl = f @ l_k; f = loc(state_prev) ---
    du2 = du.astype(dt).reshape(B * T_in, -1)                      # (B*T_in, D)
    f2 = _loc_features(cfg, W, state_prev).reshape(B * T_in, -1)   # (B*T_in, F)
    dl_k = dot(f2, du2, (((0,), (0,)), ((), ())))                  # (F, D)
    df2 = du2 @ W['l_k'].T                                         # (B*T_in, F)
    dloc_b = jnp.sum(df2, axis=0, dtype=f32)
    if 'loc_n' in W:
        dstate = dot(du2.reshape(B, -1), W['loc_n'],
                     (((1,), (1,)), ((), ())))                     # (B, T_in)
    elif 'loc_m' in W:
        dstate = dot(df2.reshape(B, -1), W['loc_m'],
                     (((1,), (1,)), ((), ())))
    else:
        # conv-transpose: correlate df with the flipped kernel; explicit padding
        # mirrors the forward's SAME padding exactly (also for even kernels)
        K = W['loc_k'].shape[0]
        pad_lo = (K - 1) // 2
        k_t = jnp.flip(W['loc_k'], 0).transpose(0, 2, 1)           # (k, F, 1)
        dstate = jax.lax.conv_general_dilated(
            df2.reshape(B, T_in, -1), k_t, (1,), [(K - 1 - pad_lo, pad_lo)],
            dimension_numbers=('NWC', 'WIO', 'NWC'))[..., 0].astype(f32)
    if 'loc_m' in W:
        # dense location-matrix grad; band diagonals extracted post-scan
        dloc_acc_t = dot(state_prev.astype(dt), df2.reshape(B, -1),
                         (((0,), (0,)), ((), ())))                 # (T_in, T_in*F)
    else:
        # dloc_k[k, 0, f] = sum_{b,j} state_pad[b, j+k] * df[b, j, f]
        K = W['loc_k'].shape[0]
        pad_lo = (K - 1) // 2
        state_pad = jnp.pad(state_prev.astype(dt),
                            ((0, 0), (pad_lo, K - 1 - pad_lo)))
        taps = jnp.stack([state_pad[:, k:k + T_in]
                          for k in range(K)])                      # (k, B, T_in)
        dloc_acc_t = jnp.einsum('kbs,bsf->kf', taps, df2.reshape(B, T_in, -1),
                                preferred_element_type=f32)[:, None, :]
    return dpq, dstate.astype(f32), dkeys_t, dloc_acc_t, dloc_b, dl_k, dva, dba


def _step_fwd(cfg: DecoderConfig, W, keys, values, mask, carry, xs):
    c1, h1, c2, h2, ctx, state, prev = carry
    teacher_t, use_t, m1_t, m2_t, ac1, ah1, ac2, ah2 = xs
    dt = cfg.dtype
    # keep-gates may arrive as bool (half the HBM read of bf16); the convert
    # fuses into the mixing ops below
    ac1, ah1, ac2, ah2 = (a.astype(dt) for a in (ac1, ah1, ac2, ah2))

    dec_in = jnp.where(use_t > 0, teacher_t, prev)                    # (B, M) f32
    r1 = jax.nn.relu(dec_in.astype(dt) @ W['p1_k'] + W['p1_b'])
    p1 = r1 * m1_t
    r2 = jax.nn.relu(p1 @ W['p2_k'] + W['p2_b'])
    p2 = r2 * m2_t

    x0 = jnp.concatenate([p2, ctx], axis=-1)
    z1 = jnp.concatenate([x0, h1], axis=-1) @ W['g1_k'] + W['g1_b']
    c1n, x1 = _lstm_fwd(z1, c1)
    c1p = ac1 * c1n + (1.0 - ac1) * c1
    h1p = ah1 * x1 + (1.0 - ah1) * h1

    z2 = jnp.concatenate([x1, h2], axis=-1) @ W['g2_k'] + W['g2_b']
    c2n, x2 = _lstm_fwd(z2, c2)
    c2p = ac2 * c2n + (1.0 - ac2) * c2
    h2p = ah2 * x2 + (1.0 - ah2) * h2

    pq = x2 @ W['q_k']
    align = _att_align(cfg, W, keys, mask, pq, state)                 # (B, T_in) f32
    new_state = state + align if cfg.cumulate else align
    # context matmul in compute dtype with f32 accumulation (avoids an f32 copy
    # of values living alongside the dt one); align rounds to dt like any other
    # bf16 matmul operand in production
    ctx_f32 = jnp.einsum('bt,btm->bm', align.astype(dt), values,
                         preferred_element_type=jnp.float32)

    proj_in = jnp.concatenate([x2, ctx_f32.astype(dt)], axis=-1)
    frames = (proj_in @ W['f_k'] + W['f_b']).astype(jnp.float32)      # (B, M*r)
    stops = (proj_in @ W['s_k'] + W['s_b']).astype(jnp.float32)       # (B, r)

    new_carry = (c1p, h1p, c2p, h2p, ctx_f32.astype(dt), new_state,
                 frames[:, -cfg.num_mels:])
    outs = (frames, stops, align,
            # residuals (bf16 where possible)
            r1, r2, z1, z2, x1, x2, c1p, h1p, c2p, h2p,
            ctx_f32.astype(dt), state)                                # state = PREV state
    return new_carry, outs


def _forward(cfg: DecoderConfig, params, keys, values, mask,
             teacher, use_teacher, m1, m2, zo):
    """Runs the forward scan. Returns ((frames, stops, aligns), residuals)."""
    W = _weights(params, cfg)
    T, B = teacher.shape[0], teacher.shape[1]
    dt = cfg.dtype
    U = cfg.units
    T_in = keys.shape[1]
    W = _augment_loc_weights(W, cfg, T_in, B)

    if zo is None:
        keep = jnp.asarray(1.0 - cfg.zoneout, dt)
        ones = jnp.ones((T, 1, 1), dt)
        ac1 = ah1 = ac2 = ah2 = ones * keep   # broadcast (T,1,1) against (B,U)
    else:
        ac1, ah1, ac2, ah2 = zo

    init = (jnp.zeros((B, U), dt), jnp.zeros((B, U), dt),
            jnp.zeros((B, U), dt), jnp.zeros((B, U), dt),
            jnp.zeros((B, values.shape[-1]), dt),
            jnp.zeros((B, T_in), jnp.float32),
            jnp.zeros((B, cfg.num_mels), jnp.float32))

    step = partial(_step_fwd, cfg, W, keys, values, mask)
    _, outs = jax.lax.scan(step, init, (teacher, use_teacher, m1, m2,
                                        ac1, ah1, ac2, ah2), unroll=cfg.unroll)
    frames, stops, aligns = outs[0], outs[1], outs[2]
    residuals = outs[3:]
    return (frames, stops, aligns), residuals


# ----------------------------------------------------------------------
# custom VJP
# ----------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0,))
def decoder_scan(cfg: DecoderConfig, params, keys, values, mask,
                 teacher, use_teacher, m1, m2, zo):
    """Teacher-forced decoder over T steps.

    Args:
        params: the flax 'decoder' param subtree.
        keys: (B, T_in, D) precomputed memory projection (cfg.dtype).
        values: (B, T_in, M_enc) encoder outputs.
        mask: (B, T_in) float memory mask or None.
        teacher: (T, B, num_mels) f32 teacher frames.
        use_teacher: (T,) f32 0/1 coin flips.
        m1, m2: (T, B, prenet*) pre-scaled dropout masks (mask/keep), cfg.dtype.
        zo: None (eval: zoneout expectation) or 4-tuple of (T, B, units) bernoulli
            keep-gates (train zoneout), bool or float.
    Returns: (frames (T,B,M*r) f32, stops (T,B,r) f32, aligns (T,B,T_in) f32).
    """
    out, _ = _forward(cfg, params, keys, values, mask, teacher, use_teacher,
                      m1, m2, zo)
    return out


def _fwd_rule(cfg, params, keys, values, mask, teacher, use_teacher, m1, m2, zo):
    out, residuals = _forward(cfg, params, keys, values, mask, teacher,
                              use_teacher, m1, m2, zo)
    frames, stops, aligns = out
    res = (params, keys, values, mask, teacher, use_teacher, m1, m2, zo,
           frames, aligns, residuals)
    return out, res


def _shift1(x, init_val=0.0):
    """x[t] → x[t-1] along axis 0 (x[-1] := init)."""
    return jnp.concatenate([jnp.full_like(x[:1], init_val), x[:-1]], axis=0)


def _zero_cotangent(a):
    """Zero cotangent matching JAX's expectation: float arrays get float zeros,
    bool/int primals (e.g. bool zoneout keep-gates) get float0."""
    if jnp.issubdtype(a.dtype, jnp.floating):
        return jnp.zeros_like(a)
    import numpy as np
    return np.zeros(a.shape, jax.dtypes.float0)


def _bwd_rule(cfg, res, g):
    (params, keys, values, mask, teacher, use_teacher, m1, m2, zo,
     frames, aligns, residuals) = res
    g_frames, g_stops, g_aligns = g
    (r1s, r2s, z1s, z2s, x1s, x2s, c1ps, h1ps, c2ps, h2ps, ctxs, state_prevs) \
        = residuals
    W = _weights(params, cfg)
    dt = cfg.dtype
    T, B = teacher.shape[0], teacher.shape[1]
    U = cfg.units
    M = cfg.num_mels
    T_in = keys.shape[1]
    D = cfg.attention_dim
    W = _augment_loc_weights(W, cfg, T_in, B)

    if zo is None:
        keep = jnp.asarray(1.0 - cfg.zoneout, dt)
        ones = jnp.ones((T, 1, 1), dt)
        ac1s = ah1s = ac2s = ah2s = ones * keep
    else:
        ac1s, ah1s, ac2s, ah2s = zo

    # previous-step values feeding step t (shifted sequences, zeros at t=0)
    c1_prevs = _shift1(c1ps)
    c2_prevs = _shift1(c2ps)

    def step_bwd(carry, xs):
        (dc1, dh1, dc2, dh2, dctx, dprev, dstate, dkeys_acc,
         dloc_acc, dloc_b, dl_k, dva, dba) = carry
        (gf_t, gs_t, ga_t, r1, r2, z1, z2, x1, x2, c1_prev, c2_prev,
         state_prev, align_t, teacher_t, use_t, m1_t, m2_t,
         ac1, ah1, ac2, ah2) = xs
        # keep-gates may be bool; exact 0/1 values, so f32 math is unchanged
        ac1, ah1, ac2, ah2 = (a.astype(jnp.float32)
                              for a in (ac1, ah1, ac2, ah2))

        # projections
        dframes = gf_t.at[:, -M:].add(dprev)                       # (B, M*r) f32
        dproj = (dframes.astype(dt) @ W['f_k'].T
                 + gs_t.astype(dt) @ W['s_k'].T)                   # (B, U+M_enc)
        dx2 = dproj[:, :U]
        dctx_total = dproj[:, U:].astype(jnp.float32) + dctx       # (B, M_enc)

        # attention: context matmul backward + recomputed stage vjp
        dalign = (jnp.einsum('bm,btm->bt', dctx_total.astype(dt), values,
                             preferred_element_type=jnp.float32)
                  + ga_t + (dstate if cfg.cumulate else 0.0))      # (B, T_in) f32
        pq = x2 @ W['q_k']
        (dpq, dstate_c, dkeys_t, dK_t, dKb_t, dWl_t, dva_t,
         dba_t) = _att_bwd(cfg, W, keys, mask, pq, state_prev, dalign)
        dstate_next = (dstate if cfg.cumulate else jnp.zeros_like(dstate)) + dstate_c

        # lstm 2 (x2 == h2n); dz in compute dtype — it feeds the bf16-input dW
        # einsums / din matmuls and its f32 emit was 2.1 GB of HBM at full size
        dh2n = dx2 + (dpq @ W['q_k'].T) + ah2 * dh2
        dz2, dc2_gates = _lstm_bwd(z2, c2_prev, dh2n, dc2, ac2)
        dz2 = dz2.astype(dt)
        dc2_next = dc2_gates + (1.0 - ac2) * dc2
        din2 = dz2 @ W['g2_k'].T                                   # (B, U+U)
        dx1 = din2[:, :U]
        dh2_next = din2[:, U:] + (1.0 - ah2) * dh2

        # lstm 1 (x1 == h1n)
        dh1n = dx1 + ah1 * dh1
        dz1, dc1_gates = _lstm_bwd(z1, c1_prev, dh1n, dc1, ac1)
        dz1 = dz1.astype(dt)
        dc1_next = dc1_gates + (1.0 - ac1) * dc1
        din1 = dz1 @ W['g1_k'].T                                   # (B, p2+M_enc+U)
        dp2 = din1[:, :cfg.prenet2]
        dctx_next = din1[:, cfg.prenet2:cfg.prenet2 + values.shape[-1]] \
            .astype(jnp.float32)
        dh1_next = din1[:, cfg.prenet2 + values.shape[-1]:] + (1.0 - ah1) * dh1

        # prenet
        dp2pre = dp2 * m2_t * (r2 > 0)
        dp1 = dp2pre @ W['p2_k'].T
        dp1pre = dp1 * m1_t * (r1 > 0)
        ddec = (dp1pre @ W['p1_k'].T).astype(jnp.float32)
        dprev_next = jnp.where(use_t > 0, 0.0, ddec)
        dteacher_t = jnp.where(use_t > 0, ddec, 0.0)

        new_carry = (dc1_next, dh1_next, dc2_next, dh2_next, dctx_next,
                     dprev_next, dstate_next,
                     dkeys_acc + dkeys_t.astype(jnp.float32),
                     dloc_acc + dK_t, dloc_b + dKb_t, dl_k + dWl_t,
                     dva + dva_t, dba + dba_t)
        emits = (dz1, dz2, dpq, dp1pre, dp2pre, dframes,
                 dctx_total.astype(dt), dteacher_t)
        return new_carry, emits

    zero = lambda *s: jnp.zeros(s, jnp.float32)
    init = (zero(B, U), zero(B, U), zero(B, U), zero(B, U),
            zero(B, values.shape[-1]), zero(B, M), zero(B, T_in),
            zero(B, T_in, D),
            _loc_acc_init(cfg, W, T_in),
            jnp.zeros_like(W['loc_b'], jnp.float32),
            jnp.zeros_like(W['l_k'], jnp.float32),
            jnp.zeros_like(W['v_a'], jnp.float32),
            jnp.zeros_like(W['b_a'], jnp.float32))

    xs = (g_frames, g_stops, g_aligns, r1s, r2s, z1s, z2s, x1s, x2s,
          c1_prevs, c2_prevs, state_prevs, aligns, teacher, use_teacher,
          m1, m2, ac1s, ah1s, ac2s, ah2s)
    final, emits = jax.lax.scan(step_bwd, init, xs, reverse=True,
                                unroll=cfg.unroll)
    (dc1_0, dh1_0, dc2_0, dh2_0, dctx_0, dprev_0, dstate_0, dkeys_acc,
     dloc_acc, dloc_b, dl_k, dva, dba) = final
    dloc_k = _loc_acc_finalize(cfg, W, dloc_acc)
    dz1s, dz2s, dpqs, dp1pres, dp2pres, dframes_s, dctx_totals, dteacher = emits

    # ---- deferred weight gradients: big dense matmuls over the whole sequence ----
    f32 = jnp.float32
    ein = partial(jnp.einsum, precision=None,
                  preferred_element_type=f32)

    p2s = r2s * m2
    ctx_prevs = _shift1(ctxs)
    h1_prevs = _shift1(h1ps)
    h2_prevs = _shift1(h2ps)
    in1 = jnp.concatenate([p2s, ctx_prevs, h1_prevs], axis=-1)     # (T,B,·) dt
    in2 = jnp.concatenate([x1s, h2_prevs], axis=-1)
    dW_g1 = ein('tbi,tbo->io', in1, dz1s)
    db_g1 = dz1s.astype(f32).sum((0, 1))
    dW_g2 = ein('tbi,tbo->io', in2, dz2s)
    db_g2 = dz2s.astype(f32).sum((0, 1))

    proj_ins = jnp.concatenate([x2s, ctxs], axis=-1)
    dW_f = ein('tbi,tbo->io', proj_ins, dframes_s.astype(dt))
    db_f = dframes_s.sum((0, 1))
    dW_s = ein('tbi,tbo->io', proj_ins, g_stops.astype(dt))
    db_s = g_stops.astype(f32).sum((0, 1))

    dW_q = ein('tbi,tbo->io', x2s, dpqs)

    prev_frames = _shift1(frames[:, :, -M:])
    dec_ins = jnp.where(use_teacher[:, None, None] > 0, teacher, prev_frames)
    dW_p1 = ein('tbi,tbo->io', dec_ins.astype(dt), dp1pres)
    db_p1 = dp1pres.astype(f32).sum((0, 1))
    p1s = r1s * m1
    dW_p2 = ein('tbi,tbo->io', p1s, dp2pres)
    db_p2 = dp2pres.astype(f32).sum((0, 1))

    dkeys = dkeys_acc                                              # (B, T_in, D)

    # dvalues: ctx_t = align_t @ values; the per-step total context gradient
    # (proj slice + next step's gate-input slice) was emitted by the scan.
    dvalues = ein('tbs,tbm->bsm', aligns.astype(dt), dctx_totals)

    dparams = {
        'prenet': {'dense_1': {'kernel': dW_p1, 'bias': db_p1},
                   'dense_2': {'kernel': dW_p2, 'bias': db_p2}},
        'lstm_1': {'gates': {'kernel': dW_g1, 'bias': db_g1}},
        'lstm_2': {'gates': {'kernel': dW_g2, 'bias': db_g2}},
        'attention': {
            'query_layer': {'kernel': dW_q},
            'location_convolution': {'kernel': dloc_k, 'bias': dloc_b},
            'location_layer': {'kernel': dl_k},
            'attention_variable_projection': dva,
            'attention_bias': dba,
        },
        'frame_projection': {'kernel': dW_f, 'bias': db_f},
        'stop_projection': {'kernel': dW_s, 'bias': db_s},
    }
    # cast param grads to the original param dtypes (optax expects matching trees)
    dparams = jax.tree_util.tree_map(
        lambda gv, pv: gv.astype(pv.dtype), dparams,
        {k: params[k] for k in dparams})

    dmask = None if mask is None else jnp.zeros_like(mask)
    dzo = None if zo is None else tuple(_zero_cotangent(a) for a in zo)
    return (dparams, dkeys.astype(keys.dtype), dvalues.astype(values.dtype),
            dmask, dteacher, jnp.zeros_like(use_teacher),
            jnp.zeros_like(m1), jnp.zeros_like(m2), dzo)


decoder_scan.defvjp(_fwd_rule, _bwd_rule)


def decoder_scan_reference(cfg, params, keys, values, mask, teacher,
                           use_teacher, m1, m2, zo):
    """Same forward WITHOUT the custom VJP (XLA autodiff) — test oracle."""
    out, _ = _forward(cfg, params, keys, values, mask, teacher, use_teacher,
                      m1, m2, zo)
    return out


# ----------------------------------------------------------------------
# free-running (synthesis) scan
# ----------------------------------------------------------------------

def _step_synth(cfg: DecoderConfig, W, keys, values, mask, constraint,
                carry, xs):
    """One free-running decoder step: same packed-weight math as `_step_fwd`
    with the model's own last frame fed back (reference TacoTestHelper,
    helpers.py:6-59), stop-token tracking, and the optional synthesis-time
    monotonic/window attention constraint (attention.py:201-214). Emits no
    residuals (no backward pass at synthesis)."""
    c1, h1, c2, h2, ctx, state, prev, max_att, finished = carry
    m1_t, m2_t = xs
    dt = cfg.dtype
    keep = jnp.asarray(1.0 - cfg.zoneout, dt)

    r1 = jax.nn.relu(prev.astype(dt) @ W['p1_k'] + W['p1_b'])
    p1 = r1 * m1_t
    r2 = jax.nn.relu(p1 @ W['p2_k'] + W['p2_b'])
    p2 = r2 * m2_t

    x0 = jnp.concatenate([p2, ctx], axis=-1)
    z1 = jnp.concatenate([x0, h1], axis=-1) @ W['g1_k'] + W['g1_b']
    c1n, x1 = _lstm_fwd(z1, c1)
    c1p = keep * c1n + (1.0 - keep) * c1
    h1p = keep * x1 + (1.0 - keep) * h1

    z2 = jnp.concatenate([x1, h2], axis=-1) @ W['g2_k'] + W['g2_b']
    c2n, x2 = _lstm_fwd(z2, c2)
    c2p = keep * c2n + (1.0 - keep) * c2
    h2p = keep * x2 + (1.0 - keep) * h2

    pq = x2 @ W['q_k']

    # attention with the optional synthesis constraint folded into the mask
    if constraint is None:
        att_mask = mask
    else:
        ctype, win = constraint
        T_in = keys.shape[1]
        pos = jnp.arange(T_in)[None, :]
        if ctype == 'monotonic':
            before = pos < max_att[:, None]
            after = pos >= max_att[:, None] + win
        else:  # window: backward gets the odd extra slot (attention.py:81-86)
            back = win // 2 + (win % 2 != 0)
            fwd = win // 2
            before = pos < max_att[:, None] - back
            after = pos >= max_att[:, None] + fwd
        win_mask = (~(before | after)).astype(jnp.float32)
        att_mask = win_mask if mask is None else mask * win_mask
    align = _att_align(cfg, W, keys, att_mask, pq, state)             # (B, T_in) f32
    new_state = state + align if cfg.cumulate else align
    new_max = jnp.argmax(align, axis=-1).astype(jnp.int32)
    ctx_f32 = jnp.einsum('bt,btm->bm', align.astype(dt), values,
                         preferred_element_type=jnp.float32)

    proj_in = jnp.concatenate([x2, ctx_f32.astype(dt)], axis=-1)
    frames = (proj_in @ W['f_k'] + W['f_b']).astype(jnp.float32)      # (B, M*r)
    stops = (proj_in @ W['s_k'] + W['s_b']).astype(jnp.float32)       # (B, r)

    stop_prob = jax.nn.sigmoid(stops)
    hit = (jnp.any(stop_prob > 0.5, axis=-1) if cfg.stop_at_any
           else jnp.all(stop_prob > 0.5, axis=-1))
    new_carry = (c1p, h1p, c2p, h2p, ctx_f32.astype(dt), new_state,
                 frames[:, -cfg.num_mels:], new_max, finished | hit)
    return new_carry, (frames, stops, align)


def synthesis_scan(cfg: DecoderConfig, params, keys, values, mask,
                   max_iters: int, chunk: int, dropout_rate: float,
                   dropout_rng, constraint: Optional[Tuple[str, int]] = None):
    """Free-running decoder: chunked early-exit `lax.while_loop`, each iteration
    scanning `chunk` fused steps (reference dynamic_decode + TacoTestHelper).

    The always-on prenet dropout (reference modules.py:249) is sampled per chunk
    inside the loop body (fold_in on the chunk index) so only executed chunks
    pay for mask generation. Unvisited stop logits are filled with 1e3 ("already
    stopped") so host length recovery treats them as finished.

    Args:
        constraint: None, or (constraint_type, win_size) for the synthesis-time
            attention window (hp.synthesis_constraint).
    Returns: (frames (T,B,M*r) f32, stops (T,B,r) f32, aligns (T,B,T_in) f32,
              finished (B,) bool) with T = ceil(max_iters/chunk)*chunk.
    """
    W = _weights(params, cfg)
    B, T_in = keys.shape[0], keys.shape[1]
    dt = cfg.dtype
    U = cfg.units
    W = _augment_loc_weights(W, cfg, T_in, B)
    n_chunks = -(-max_iters // chunk)
    T_steps = n_chunks * chunk
    keep = 1.0 - dropout_rate

    init_carry = (jnp.zeros((B, U), dt), jnp.zeros((B, U), dt),
                  jnp.zeros((B, U), dt), jnp.zeros((B, U), dt),
                  jnp.zeros((B, values.shape[-1]), dt),
                  jnp.zeros((B, T_in), jnp.float32),
                  jnp.zeros((B, cfg.num_mels), jnp.float32),
                  jnp.zeros((B,), jnp.int32),
                  jnp.zeros((B,), bool))
    bufs0 = (jnp.zeros((T_steps, B, cfg.num_mels * cfg.r), jnp.float32),
             jnp.full((T_steps, B, cfg.r), 1e3, jnp.float32),
             jnp.zeros((T_steps, B, T_in), jnp.float32))

    step = partial(_step_synth, cfg, W, keys, values, mask, constraint)

    def body_fn(state):
        carry, (fb, sb, ab), i = state
        if keep < 1.0:
            k1, k2 = jax.random.split(jax.random.fold_in(dropout_rng, i))
            m1 = jax.random.bernoulli(
                k1, keep, (chunk, B, W['p1_b'].shape[0])).astype(dt) / keep
            m2 = jax.random.bernoulli(
                k2, keep, (chunk, B, W['p2_b'].shape[0])).astype(dt) / keep
        else:
            m1 = jnp.ones((chunk, B, W['p1_b'].shape[0]), dt)
            m2 = jnp.ones((chunk, B, W['p2_b'].shape[0]), dt)
        carry, (f, s, a) = jax.lax.scan(step, carry, (m1, m2),
                                        unroll=cfg.unroll)
        off = i * chunk
        fb = jax.lax.dynamic_update_slice(fb, f, (off, 0, 0))
        sb = jax.lax.dynamic_update_slice(sb, s, (off, 0, 0))
        ab = jax.lax.dynamic_update_slice(ab, a, (off, 0, 0))
        return carry, (fb, sb, ab), i + 1

    def cond_fn(state):
        carry, _, i = state
        return (i < n_chunks) & ~jnp.all(carry[-1])

    carry, (frames, stops, aligns), _ = jax.lax.while_loop(
        cond_fn, body_fn, (init_carry, bufs0, jnp.int32(0)))
    return frames, stops, aligns, carry[-1]
