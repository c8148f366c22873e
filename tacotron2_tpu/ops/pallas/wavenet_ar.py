"""Pallas TPU kernel: fully on-chip WaveNet autoregressive generation.

The XLA `lax.scan` path (models/wavenet/model.py `incremental`) is latency-bound: each
audio sample issues ~43 tiny dependent matmuls through the scan machinery
(~400 us/sample-step at full size). This kernel keeps the ENTIRE generation loop on
one TensorCore:

  - all conv weights live in VMEM for the whole call (~6 MB bf16 at default size);
  - the fast-WaveNet ring buffers (reference wavenet.py:815-816) are VMEM scratch,
    one (B, 2*dilation_padded, R) array per layer, updated in place;
  - upsampled conditioning and pre-sampled distribution noise stream in from HBM in
    `CHUNK`-step slabs; generated samples stream back out the same way;
  - each step: one merged conditioning matmul (B, cin)@(cin, L*G), then the layer
    stack, then the two-layer head and Gaussian/MoL sampling from precomputed noise.
  - layer stack, default fused critical path (wavenet_fused_ar=True): layer l-1's
    residual 1x1 is folded into layer l's current-tap conv at pack time
    (w_fused = rho * W_out @ W_cur), so the serial per-sample chain is ONE
    (B, G/2)@(G/2, G) matmul + GLU per layer; the residual update, skip matmul,
    h-carried gate term, and past-tap matmuls execute off the chain. The plain
    chain path (two serial matmuls per layer) is kept behind wavenet_fused_ar=False.

Supported configs: scalar input (raw / mulaw), kernel_size arbitrary (k-1 taps),
Gaussian (out_channels==2) or MoL (out_channels==3*nr) output, local conditioning
required, global conditioning optional (speaker embedding projected to a per-layer
(B, L*G) bias outside the kernel — time-invariant, reference wavenet.py:151-158).
Batches larger than B_MAX are tiled over B_MAX-sized kernel launches by the
wavenet_trainer.generate wrapper.
"""


from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import Hparams

CHUNK = 128     # steps per HBM<->VMEM slab
LANE = 128      # TPU lane width: HBM<->VMEM DMA slices must be lane-aligned
B_MAX = 32      # max batch the kernel supports (VMEM ring-buffer budget ~70 MB)
SUBLANE = 8     # batch rows padded to the f32 sublane tile


def supports(hp: Hparams) -> bool:
    """Whether this kernel covers the configuration."""
    if not (0 < hp.cin_channels <= LANE and hp.gate_channels % 2 == 0):
        return False
    if hp.kernel_size < 2:
        return False  # ring buffers are (k-1)*dilation slots; k=1 has none
    if hp.input_type in ('raw', 'mulaw'):
        return (hp.out_channels == 2 or hp.out_channels % 3 == 0) \
            and hp.out_channels <= LANE
    # mulaw-quantize: categorical over quantize_channels one-hot input. Up to 1024
    # classes the Gumbel noise is pre-sampled and streamed like the other modes;
    # above that (up to the 16-bit default) the (Q, R) embedding and (S, Q) head
    # are held in VMEM as bf16 and the Gumbel noise is generated IN-kernel
    # (pre-sampling (T, B, 65536) floats would be terabytes) — see big_vocab paths.
    return (hp.input_type == 'mulaw-quantize'
            and hp.out_channels == hp.quantize_channels
            and hp.out_channels <= 65536)


def is_big_vocab(hp: Hparams) -> bool:
    """Categorical vocab too wide to stream pre-sampled noise / params."""
    return hp.input_type == 'mulaw-quantize' and hp.out_channels > 1024


def max_batch(hp: Hparams) -> int:
    """Kernel batch tile: the big-vocab weights (2x16 MB bf16) cap it at 8."""
    return SUBLANE if is_big_vocab(hp) else B_MAX


from ...utils import round_up as _round_up  # noqa: E402


def _effective_kernel(conv_params: Dict) -> jnp.ndarray:
    """Apply the weight-norm reparameterization when the conv carries wn_g
    (mirrors modules._maybe_weight_norm so the kernel sees the same weights the
    trained forward pass used)."""
    v = conv_params['kernel']
    if 'wn_g' not in conv_params:
        return v
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True) + 1e-8)
    return conv_params['wn_g'] * v / norm


def _bias(conv_params: Dict, features: int) -> jnp.ndarray:
    """Bias, or zeros when use_bias=False (the kernel adds biases unconditionally)."""
    if 'bias' in conv_params:
        return conv_params['bias']
    return jnp.zeros((features,), jnp.float32)


def pack_params(params: Dict, hp: Hparams) -> Dict[str, jnp.ndarray]:
    """Extract + pre-transform flax WaveNet params for the kernel.

    Weights are linearized/merged exactly like the scan path does lazily:
    conv kernels (k, R, G) -> (k*R, G); out+skip kernels concatenated."""
    L = hp.layers
    weights = {}
    fc = params['first_conv']
    # big-vocab categorical: the (Q, R) embedding and (S, Q) head are the VMEM
    # budget — store them bf16 (16 MB each at Q=65536) instead of f32
    emb_dt = jnp.bfloat16 if is_big_vocab(hp) else jnp.float32
    weights['first_w'] = _effective_kernel(fc).astype(emb_dt)  # (1|Q, R) input proj
    weights['first_b'] = _bias(fc, hp.residual_channels).astype(jnp.float32)

    w_tap, b_tap, w_os, b_os, w_c, b_c = [], [], [], [], [], []
    for i in range(L):
        blk = params[f'residual_block_{i + 1}']
        kk = _effective_kernel(blk['causal_conv'])              # (k, R, G)
        w_tap.append(kk.reshape(-1, kk.shape[-1]))              # (k*R, G)
        b_tap.append(_bias(blk['causal_conv'], hp.gate_channels))
        w_os.append(jnp.concatenate([_effective_kernel(blk['conv1x1_out']),
                                     _effective_kernel(blk['conv1x1_skip'])], axis=1))
        b_os.append(jnp.concatenate([_bias(blk['conv1x1_out'], hp.residual_channels),
                                     _bias(blk['conv1x1_skip'], hp.skip_out_channels)]))
        w_c.append(_effective_kernel(blk['conv1x1c']))          # (cin, G)
        b_c.append(_bias(blk['conv1x1c'], hp.gate_channels))

    weights['w_tap'] = jnp.stack(w_tap).astype(jnp.bfloat16)    # (L, k*R, G)
    weights['b_tap'] = jnp.stack(b_tap).astype(jnp.float32)     # (L, G)
    weights['w_os'] = jnp.stack(w_os).astype(jnp.bfloat16)      # (L, G/2, R+S)
    weights['b_os'] = jnp.stack(b_os).astype(jnp.float32)       # (L, R+S)

    # Fused critical-path weights (wavenet_fused_ar): fold layer l-1's residual
    # 1x1 into layer l's current-tap conv so the serial sample chain runs one
    # matmul per layer instead of two:
    #   h_l = rho*(h_{l-1} + z_{l-1} @ W_out_{l-1} + b_out_{l-1})
    #   h_l @ W_cur_l = rho*(h_{l-1} @ W_cur_l)            (off the chain)
    #                 + z_{l-1} @ [rho * W_out_{l-1} W_cur_l]   <- w_fused[l]
    #                 + rho * b_out_{l-1} @ W_cur_l             <- b_fused[l]
    if hp.wavenet_fused_ar:
        rho = float(np.sqrt(0.5)) if hp.residual_legacy else 1.0
        past = (hp.kernel_size - 1) * hp.residual_channels
        R = hp.residual_channels
        w_fused = [jnp.zeros((hp.gate_channels // 2, hp.gate_channels), jnp.float32)]
        b_fused = [jnp.zeros((hp.gate_channels,), jnp.float32)]
        for i in range(1, L):
            w_cur = w_tap[i][past:].astype(jnp.float32)             # (R, G)
            w_out_prev = w_os[i - 1][:, :R].astype(jnp.float32)     # (G/2, R)
            b_out_prev = b_os[i - 1][:R].astype(jnp.float32)
            w_fused.append(rho * (w_out_prev @ w_cur))
            b_fused.append(rho * (b_out_prev @ w_cur))
        weights['w_fused'] = jnp.stack(w_fused).astype(jnp.bfloat16)  # (L, G/2, G)
        weights['b_fused'] = jnp.stack(b_fused).astype(jnp.float32)   # (L, G)
    else:
        # chain path never reads these; ship lane-aligned stubs, not ~MBs of VMEM
        weights['w_fused'] = jnp.zeros((L, SUBLANE, LANE), jnp.bfloat16)
        weights['b_fused'] = jnp.zeros((L, LANE), jnp.float32)
    # merged conditioning projection, input rows zero-padded to the lane width so
    # the padded c_t can be used without slicing: (128, L*G)
    wc = jnp.stack(w_c, axis=1).reshape(hp.cin_channels, -1)
    weights['w_cond'] = jnp.pad(wc, ((0, 128 - hp.cin_channels), (0, 0))).astype(jnp.bfloat16)
    weights['b_cond'] = jnp.concatenate(b_c).astype(jnp.float32)  # (L*G,)
    weights['w_s1'] = _effective_kernel(params['skip_conv1']).astype(jnp.bfloat16)
    weights['b_s1'] = _bias(params['skip_conv1'], hp.skip_out_channels).astype(jnp.float32)
    weights['w_s2'] = _effective_kernel(params['skip_conv2']).astype(emb_dt)  # (S, out)
    weights['b_s2'] = _bias(params['skip_conv2'], hp.out_channels).astype(jnp.float32)
    return weights


def pack_global(params: Dict, hp: Hparams, g_emb: jnp.ndarray) -> jnp.ndarray:
    """Project the speaker embedding through every layer's conv1x1g into one merged
    (B, L*G) conditioning bias (time-invariant — reference wavenet.py:151-158; the
    scan path's g_projs hoist, models/wavenet/model.py)."""
    w_g, b_g = [], []
    for i in range(hp.layers):
        blk = params[f'residual_block_{i + 1}']
        w_g.append(_effective_kernel(blk['conv1x1g']))          # (gin, G)
        b_g.append(_bias(blk['conv1x1g'], hp.gate_channels))
    wg = jnp.stack(w_g, axis=1).reshape(hp.gin_channels, -1)    # (gin, L*G)
    bg = jnp.concatenate(b_g)
    return g_emb.astype(jnp.float32) @ wg.astype(jnp.float32) + bg


def _dilations(hp: Hparams):
    lps = hp.layers // hp.stacks
    return [2 ** (i % lps) for i in range(hp.layers)]


def _make_kernel(hp: Hparams, T: int, B_PAD: int, want_params: bool, has_g: bool,
                 greedy: bool = False, want_nll: bool = False,
                 has_state: bool = False, ret_state: bool = False):
    L = hp.layers
    R = hp.residual_channels
    G = hp.gate_channels
    S = hp.skip_out_channels
    half = G // 2
    cin = hp.cin_channels
    out_ch = hp.out_channels
    k = hp.kernel_size
    dils = _dilations(hp)
    buf_sizes = [(k - 1) * d for d in dils]  # leading dim is untiled: exact size
    n_chunks = T // CHUNK
    legacy = hp.legacy
    res_legacy = hp.residual_legacy
    sqrt_half = float(np.sqrt(0.5))
    categorical = hp.input_type == 'mulaw-quantize'
    gaussian = out_ch == 2 and not categorical
    nr = 1 if (gaussian or categorical) else out_ch // 3
    log_scale_min = float(hp.log_scale_min_gauss if gaussian else hp.log_scale_min)
    p_lane = _round_up(out_ch, LANE)  # params lane padding (out_ch may exceed LANE)
    init_id = hp.quantize_channels // 2  # mulaw_quantize(0): categorical silence init

    chunk_cond = B_PAD <= 16  # slab (CHUNK, B_PAD, L*G) bf16 must fit in VMEM
    packed_noise = gaussian  # 1 noise value per (step, seq): pack into lanes
    big_vocab = is_big_vocab(hp)

    fused = hp.wavenet_fused_ar
    sqh = sqrt_half  # alias for the step bodies

    def kernel(c_hbm, noise_hbm, y_hbm, first_w, first_b, w_tap, b_tap, w_os, b_os,
               w_fused, b_fused, w_cond, b_cond, g_cond, w_s1, b_s1, w_s2, b_s2,
               seed, *rest):
        # positional unpack: [state inputs] | outputs | scratch (order mirrors the
        # in_specs / out_shape / scratch_shapes lists in generate_ar)
        rest = list(rest)
        bufs_in = prev_in = None
        if has_state:
            bufs_in = [rest.pop(0) for _ in range(L)]
            prev_in = rest.pop(0)
        samples_hbm = rest.pop(0)
        params_hbm = rest.pop(0) if want_params else None
        nll_hbm = rest.pop(0) if want_nll else None
        bufs_out = prev_out = None
        if ret_state:
            bufs_out = [rest.pop(0) for _ in range(L)]
            prev_out = rest.pop(0)
        c_vmem = rest.pop(0)
        noise_vmem = rest.pop(0)
        samples_vmem = rest.pop(0)
        params_vmem = rest.pop(0) if want_params else None
        nll_vmem = y_vmem = None
        if want_nll:
            nll_vmem = rest.pop(0)
            y_vmem = rest.pop(0)
        prev_ref = rest.pop(0)
        cond_vmem = rest.pop(0)
        copy_sem = rest.pop(0)
        out_sem = rest.pop(0)
        bufs = rest

        if has_state:
            # streaming continuation: ring buffers + next-step h from the caller
            for li in range(L):
                s_dma = pltpu.make_async_copy(bufs_in[li], bufs[li], copy_sem)
                s_dma.start()
                s_dma.wait()
            prev_ref[:] = prev_in[:]
        else:
            # zero ring buffers; prev_ref holds the first-conv output h for the
            # NEXT step (computed at sampling time), so all input types share one
            # step body
            for buf in bufs:
                buf[:] = jnp.zeros_like(buf)
            if categorical:
                prev_ref[:] = jnp.broadcast_to(
                    first_w[init_id, :].astype(jnp.float32) + first_b[:],
                    prev_ref.shape)
            else:
                prev_ref[:] = jnp.broadcast_to(first_b[:], prev_ref.shape)
        # absolute step offset: 0 on fresh calls — keep it a COMPILE-TIME zero
        # there, so ring-slot arithmetic stays affine in the loop counters
        # (a runtime SMEM base measured 2.3x slower: 5.1 -> 11.8 us/step)
        t_base = seed[1] if has_state else 0
        if big_vocab and not greedy:
            pltpu.prng_seed(seed[0])  # one stream for the whole call

        def chunk_body(ci, _):
            # synchronous slab DMA (0.2-0.5 MB per 128 steps; negligible vs compute)
            cin_dma = pltpu.make_async_copy(
                c_hbm.at[pl.ds(ci * CHUNK, CHUNK)], c_vmem, copy_sem)
            cin_dma.start()
            cin_dma.wait()
            if not big_vocab:  # big vocab: Gumbel comes from the in-kernel PRNG
                n_dma = pltpu.make_async_copy(
                    noise_hbm.at[pl.ds(ci * CHUNK, CHUNK)], noise_vmem, copy_sem)
                n_dma.start()
                n_dma.wait()
            if want_nll:  # ground-truth ids for the in-kernel eval NLL
                y_dma = pltpu.make_async_copy(
                    y_hbm.at[pl.ds(ci * CHUNK, CHUNK)], y_vmem, copy_sem)
                y_dma.start()
                y_dma.wait()

            if chunk_cond:
                # conditioning projections for the whole slab in one MXU matmul,
                # off the per-step critical path
                flat = c_vmem[:].reshape(CHUNK * B_PAD, LANE).astype(jnp.bfloat16)
                cond_slab = (jnp.dot(flat, w_cond[:],
                                     preferred_element_type=jnp.float32)
                             + b_cond[:]).reshape(CHUNK, B_PAD, L * G)
                if has_g:
                    cond_slab = cond_slab + g_cond[:][None]  # time-invariant bias
                cond_vmem[:] = cond_slab.astype(jnp.bfloat16)

            def step_body(si, _):
                t = t_base + ci * CHUNK + si  # absolute: ring slots stay aligned
                                              # across streamed chunks
                h = prev_ref[:]                                   # (B_PAD, R)

                if chunk_cond:
                    cond_all = cond_vmem[si, :, :].astype(jnp.float32)
                else:
                    c_t = c_vmem[si, :, :]                        # (B_PAD, 128) padded
                    cond_all = jnp.dot(c_t.astype(jnp.bfloat16), w_cond[:],
                                       preferred_element_type=jnp.float32) + b_cond[:]
                    if has_g:
                        cond_all = cond_all + g_cond[:]

                def read_taps(li):
                    d = dils[li]
                    win = (k - 1) * d
                    buf = bufs[li]                                 # (size, B_PAD, R)
                    taps = []
                    for j in range(k - 1):
                        m = (k - 1 - j) * d
                        slot = jax.lax.rem(t + win - m, win)
                        taps.append(buf[pl.ds(slot, 1)][0])
                    return taps

                def write_tap(li, val):
                    # overwrite the oldest slot with the layer's current input
                    win = (k - 1) * dils[li]
                    bufs[li][pl.ds(jax.lax.rem(t, win), 1)] = \
                        val[None].astype(bufs[li].dtype)

                def glu(z):
                    # sigmoid as 0.5+0.5*tanh(y/2): one transcendental-unit op
                    # instead of exp+reciprocal on the serial sample chain
                    # (~0.13 us/step at full size, dev_pallas_ar_critpath.py)
                    c = jnp.asarray(0.5, z.dtype)
                    return jnp.tanh(z[:, :half]) * (c + c * jnp.tanh(c * z[:, half:]))

                skips = jnp.zeros((B_PAD, S), jnp.float32)
                if not fused:
                    for li in range(L):
                        taps = read_taps(li)
                        write_tap(li, h)
                        tap_cat = jnp.concatenate(
                            [tp.astype(jnp.bfloat16) for tp in taps]
                            + [h.astype(jnp.bfloat16)], axis=1)    # (B_PAD, k*R)
                        z = jnp.dot(tap_cat, w_tap[li, :, :],
                                    preferred_element_type=jnp.float32) + b_tap[li, :]
                        z = z + cond_all[:, li * G:(li + 1) * G]
                        gated = glu(z)
                        y = jnp.dot(gated.astype(jnp.bfloat16), w_os[li, :, :],
                                    preferred_element_type=jnp.float32) + b_os[li, :]
                        x_out, s = y[:, :R], y[:, R:]
                        h = (x_out + h) * (sqh if res_legacy else 1.0)
                        skips = skips + s
                        if legacy and li > 0:
                            skips = skips * sqh
                        elif legacy and li == 0:
                            pass  # first skip enters unscaled (reference wavenet.py:833)
                else:
                    # Fused critical path (see pack_params): the serial chain is
                    # ONE matmul + GLU per layer — z_{l-1} @ w_fused[l] — while
                    # the residual update, skip matmul, and h-carried gate term
                    # run off the chain with a layer of slack each.
                    past = (k - 1) * R
                    consts = []
                    for li in range(L):
                        p = (b_tap[li, :] + b_fused[li, :]
                             + cond_all[:, li * G:(li + 1) * G])
                        if k > 1:
                            tap_cat = jnp.concatenate(
                                [tp.astype(jnp.bfloat16) for tp in read_taps(li)],
                                axis=1)
                            p = p + jnp.dot(tap_cat, w_tap[li, :, :][:past],
                                            preferred_element_type=jnp.float32)
                        consts.append(p)
                    z = glu(jnp.dot(h.astype(jnp.bfloat16), w_tap[0, :, :][past:],
                                    preferred_element_type=jnp.float32) + consts[0])
                    h_prev = h
                    hs = [h]
                    for li in range(1, L):
                        zb = z.astype(jnp.bfloat16)
                        b_term = jnp.dot(zb, w_fused[li, :, :],
                                         preferred_element_type=jnp.float32)
                        a_term = jnp.dot(h_prev.astype(jnp.bfloat16),
                                         w_tap[li, :, :][past:],
                                         preferred_element_type=jnp.float32)
                        if res_legacy:
                            a_term = a_term * sqh
                        y = jnp.dot(zb, w_os[li - 1, :, :],
                                    preferred_element_type=jnp.float32) + b_os[li - 1, :]
                        h_cur = (h_prev + y[:, :R]) * (sqh if res_legacy else 1.0)
                        skips = skips + y[:, R:]
                        if legacy and li - 1 > 0:
                            skips = skips * sqh
                        z = glu(b_term + a_term + consts[li])
                        hs.append(h_cur)
                        h_prev = h_cur
                    zb = z.astype(jnp.bfloat16)
                    y = jnp.dot(zb, w_os[L - 1, :, :],
                                preferred_element_type=jnp.float32) + b_os[L - 1, :]
                    skips = skips + y[:, R:]
                    if legacy and L > 1:
                        skips = skips * sqh
                    for li in range(L):
                        write_tap(li, hs[li])

                o = jnp.maximum(skips, 0.0)
                o = jnp.maximum(
                    jnp.dot(o.astype(jnp.bfloat16), w_s1[:],
                            preferred_element_type=jnp.float32) + b_s1[:], 0.0)
                params_t = jnp.dot(o.astype(jnp.bfloat16) if big_vocab else o,
                                   w_s2[:],
                                   preferred_element_type=jnp.float32) + b_s2[:]

                if big_vocab:
                    noise_t = None  # Gumbel generated below when sampling
                elif packed_noise:
                    noise_t = noise_vmem[si, :][:, None]          # (LANE,1)→rows=seqs
                    noise_t = noise_t[:B_PAD, :]
                else:
                    noise_t = noise_vmem[si, :, :]                # (B_PAD, nr+1 | Q)
                if categorical:
                    # Gumbel-max over the quantize classes; next input is the one-hot
                    # pushed through the first conv (one (B,Q)@(Q,R) matmul)
                    if not big_vocab:
                        scores = params_t + noise_t[:, :out_ch]
                    elif greedy:
                        scores = params_t  # deterministic argmax (parity testing)
                    else:
                        # in-kernel Gumbel: uniform via the exponent-patch trick
                        bits = pltpu.bitcast(
                            pltpu.prng_random_bits((B_PAD, out_ch)), jnp.uint32)
                        fb = (jax.lax.shift_right_logical(bits, jnp.uint32(9))
                              | jnp.uint32(0x3F800000))
                        u = pltpu.bitcast(fb, jnp.float32) - 1.0   # [0, 1)
                        eps = jnp.float32(1e-9)
                        scores = params_t - jnp.log(-jnp.log(u + eps) + eps)
                    smax = jnp.max(scores, axis=1, keepdims=True)
                    onehot = (scores >= smax).astype(jnp.float32)
                    onehot = onehot / jnp.sum(onehot, axis=1, keepdims=True)
                    ids = jnp.argmax(scores, axis=1)
                    sample = ids.astype(jnp.float32)
                    prev_ref[:] = jnp.dot(onehot.astype(jnp.bfloat16),
                                          first_w[:].astype(jnp.bfloat16),
                                          preferred_element_type=jnp.float32) + first_b[:]
                elif gaussian:
                    mean = params_t[:, 0]
                    logs = jnp.maximum(params_t[:, 1], log_scale_min)
                    sample = jnp.clip(mean + jnp.exp(logs) * noise_t[:, 0], -1.0, 1.0)
                    prev_ref[:] = sample[:, None] * first_w[0, :] + first_b[:]
                else:
                    logits = params_t[:, :nr] + noise_t[:, 1:1 + nr]  # gumbel added
                    kmax = jnp.max(logits, axis=1, keepdims=True)
                    onehot = (logits >= kmax).astype(jnp.float32)
                    onehot = onehot / jnp.sum(onehot, axis=1, keepdims=True)
                    mean = jnp.sum(params_t[:, nr:2 * nr] * onehot, axis=1)
                    logs = jnp.maximum(
                        jnp.sum(params_t[:, 2 * nr:3 * nr] * onehot, axis=1),
                        log_scale_min)
                    sample = jnp.clip(mean + jnp.exp(logs) * noise_t[:, 0], -1.0, 1.0)
                    prev_ref[:] = sample[:, None] * first_w[0, :] + first_b[:]

                samples_vmem[si, :] = jnp.pad(sample, (0, LANE - B_PAD))  # B_PAD<=32<LANE
                if want_params:
                    params_vmem[si, :, :] = jnp.pad(params_t,
                                                    ((0, 0), (0, p_lane - out_ch)))
                if want_nll:
                    # eval NLL in place: -log softmax(params)[y_t]. Full (B, T, Q)
                    # params cannot leave the chip at Q=65536 (tens of GB); the
                    # scalar the eval actually needs can.
                    y_t = y_vmem[si, :][:, None][:B_PAD, :]        # (B_PAD, 1) int32
                    idx = jax.lax.broadcasted_iota(jnp.int32, (B_PAD, out_ch), 1)
                    p_true = jnp.sum(params_t * (idx == y_t).astype(jnp.float32),
                                     axis=1)
                    pmax = jnp.max(params_t, axis=1)
                    lse = pmax + jnp.log(jnp.sum(
                        jnp.exp(params_t - pmax[:, None]), axis=1))
                    nll_vmem[si, :] = jnp.pad(lse - p_true, (0, LANE - B_PAD))
                return 0

            jax.lax.fori_loop(0, CHUNK, step_body, 0)

            out_dma = pltpu.make_async_copy(
                samples_vmem, samples_hbm.at[pl.ds(ci * CHUNK, CHUNK)], out_sem)
            out_dma.start()
            out_dma.wait()
            if want_params:
                p_dma = pltpu.make_async_copy(
                    params_vmem, params_hbm.at[pl.ds(ci * CHUNK, CHUNK)], out_sem)
                p_dma.start()
                p_dma.wait()
            if want_nll:
                nll_dma = pltpu.make_async_copy(
                    nll_vmem, nll_hbm.at[pl.ds(ci * CHUNK, CHUNK)], out_sem)
                nll_dma.start()
                nll_dma.wait()
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        if ret_state:
            # export the final generation state for the next streamed chunk
            for li in range(L):
                e_dma = pltpu.make_async_copy(bufs[li], bufs_out[li], out_sem)
                e_dma.start()
                e_dma.wait()
            prev_out[:] = prev_ref[:]

    return kernel, buf_sizes, nr


@partial(jax.jit, static_argnames=('hp', 'interpret', 'return_params', 'greedy',
                                   'return_state'))
def generate_ar(weights: Dict[str, jnp.ndarray], c_up: jnp.ndarray,
                noise: jnp.ndarray, hp: Hparams, g_cond: Optional[jnp.ndarray] = None,
                interpret: bool = False, return_params: bool = True,
                seed: Optional[jnp.ndarray] = None, greedy: bool = False,
                y_eval: Optional[jnp.ndarray] = None,
                state_in: Optional[Tuple] = None, return_state: bool = False
                ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Run the AR kernel.

    Args:
        weights: pack_params output.
        c_up: (B, T, cin) upsampled conditioning (already [0,1]-normalized).
        noise: (B, T, nr+1) pre-sampled noise: column 0 is the Gaussian eps /
            logistic noise, columns 1..nr are MoL Gumbel noise (unused for Gaussian).
            Ignored for big-vocab categorical (the kernel generates its own Gumbel).
        g_cond: optional (B, L*G) merged global-conditioning bias (pack_global).
        return_params: also stream the distribution params back (eval/debug). Off by
            default for synthesis: the lane-padded params output costs LANE/out_ch
            (64x for Gaussian) extra HBM and DMA on long audio. Unsupported for
            big-vocab categorical: the (B, T, 65536) f32 params array is tens of GB
            — it cannot even be allocated in HBM, on ANY path. Use y_eval instead.
        seed: (1,) int32 PRNG seed for the in-kernel Gumbel (big vocab only).
        greedy: big-vocab categorical only — argmax without Gumbel noise
            (deterministic; used by the parity tests).
        y_eval: categorical only — (B, T) int32 ground-truth class ids. When given,
            the kernel computes the natural-eval NLL in place each step
            (-log softmax(params)[y_t], what masked_cross_entropy_loss would
            compute from streamed params) and returns it as the second output.
            This keeps big-vocab natural eval on the kernel: the per-step scalar
            leaves the chip instead of the 65536-wide params row.
        state_in / return_state: streaming. state_in is the tuple returned by a
            previous return_state=True call (ring buffers, next-step h, absolute
            step offset); the next call continues generation exactly where the
            previous chunk stopped — chunked/streaming vocoding with constant
            memory and bit-identical results to one long call. return_state=True
            requires T to be a multiple of CHUNK (pad steps would pollute the
            carried ring buffers).
    Returns: (audio (B, T), params | nll | None[, state] when return_state).
    """
    B, T, cin = c_up.shape
    big_vocab = is_big_vocab(hp)
    want_nll = y_eval is not None
    assert B <= max_batch(hp), f'kernel supports batch <= {max_batch(hp)} here'
    if want_nll:
        assert hp.input_type == 'mulaw-quantize', \
            'y_eval (in-kernel NLL) is for categorical output'
        assert not return_params, 'y_eval replaces params streaming'
    if big_vocab:
        assert not return_params, (
            'big-vocab categorical cannot stream params (the (B, T, Q) array '
            'does not fit HBM); pass y_eval for the in-kernel eval NLL')
        assert greedy or seed is not None, (
            'big-vocab categorical sampling ignores `noise` and uses the in-kernel '
            'PRNG: pass an explicit seed (else every call replays the identical '
            'Gumbel stream)')
    else:
        assert not greedy, \
            'greedy=True is only implemented for big-vocab categorical'
    if hp.wavenet_fused_ar:
        want = (hp.layers, hp.gate_channels // 2, hp.gate_channels)
        assert weights['w_fused'].shape == want, (
            f'w_fused shape {weights["w_fused"].shape} != {want}: weights were '
            'packed with a different hp (wavenet_fused_ar off, or different '
            'layers/gate_channels) — re-pack with the hp used for generation')
    B_PAD = max(SUBLANE, _round_up(B, SUBLANE))
    T_pad = _round_up(T, CHUNK)
    R = hp.residual_channels
    has_g = g_cond is not None
    LG = hp.layers * hp.gate_channels
    g_in = jnp.zeros((B_PAD, LG), jnp.float32)
    if has_g:
        g_in = g_in.at[:B].set(g_cond.astype(jnp.float32))
    categorical = hp.input_type == 'mulaw-quantize'
    gaussian = hp.out_channels == 2 and not categorical
    noise_lanes = _round_up(noise.shape[-1], LANE)
    p_lane = _round_up(hp.out_channels, LANE)

    c_in = jnp.zeros((T_pad, B_PAD, LANE), jnp.float32)
    c_in = c_in.at[:T, :B, :cin].set(jnp.transpose(c_up, (1, 0, 2)))
    if gaussian:
        # single noise value per (step, seq): pack sequences into lanes
        n_in = jnp.zeros((T_pad, LANE), jnp.float32)
        n_in = n_in.at[:T, :B].set(noise[:, :, 0].T)
    elif big_vocab:
        n_in = jnp.zeros((T_pad, LANE), jnp.float32)   # unused: in-kernel PRNG
    else:
        n_in = jnp.zeros((T_pad, B_PAD, noise_lanes), jnp.float32)
        n_in = n_in.at[:T, :B, :noise.shape[-1]].set(jnp.transpose(noise, (1, 0, 2)))

    y_in = jnp.zeros((T_pad, LANE), jnp.int32)
    if want_nll:
        y_in = y_in.at[:T, :B].set(y_eval.astype(jnp.int32).T)

    has_state = state_in is not None
    if has_state or return_state:
        assert interpret or hp.residual_channels % LANE == 0, (
            'streaming state DMA needs lane-aligned residual_channels '
            f'({hp.residual_channels} % {LANE} != 0)')
    if return_state:
        assert T % CHUNK == 0, (
            f'return_state requires T % {CHUNK} == 0 (pad steps would pollute '
            'the carried ring buffers); only the final streamed chunk may be '
            'ragged')
    t0 = state_in[2] if has_state else jnp.zeros((), jnp.int32)
    ctrl = jnp.stack([
        (seed[0] if seed is not None else jnp.int32(0)),
        t0.astype(jnp.int32)]).astype(jnp.int32)               # [prng seed, t base]

    kernel, buf_sizes, nr = _make_kernel(hp, T_pad, B_PAD, return_params, has_g,
                                         greedy=greedy, want_nll=want_nll,
                                         has_state=has_state,
                                         ret_state=return_state)

    noise_slab = (pltpu.VMEM((CHUNK, LANE), jnp.float32)
                  if (gaussian or is_big_vocab(hp))
                  else pltpu.VMEM((CHUNK, B_PAD, noise_lanes), jnp.float32))
    scratch = [
        pltpu.VMEM((CHUNK, B_PAD, LANE), jnp.float32),         # c slab
        noise_slab,                                            # noise slab
        pltpu.VMEM((CHUNK, LANE), jnp.float32),                # samples slab
    ]
    if return_params:
        scratch.append(pltpu.VMEM((CHUNK, B_PAD, p_lane), jnp.float32))  # params slab
    if want_nll:
        scratch.append(pltpu.VMEM((CHUNK, LANE), jnp.float32))  # nll slab
        scratch.append(pltpu.VMEM((CHUNK, LANE), jnp.int32))    # y slab
    scratch += [
        pltpu.VMEM((B_PAD, R), jnp.float32),                   # next-step first-conv output h
        pltpu.VMEM((CHUNK, min(B_PAD, 16), hp.layers * hp.gate_channels),
                   jnp.bfloat16),                              # chunk cond slab
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ] + [pltpu.VMEM((s, B_PAD, R), jnp.float32) for s in buf_sizes]

    out_shape = [jax.ShapeDtypeStruct((T_pad, LANE), jnp.float32)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if return_params:
        out_shape.append(jax.ShapeDtypeStruct((T_pad, B_PAD, p_lane), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if want_nll:
        out_shape.append(jax.ShapeDtypeStruct((T_pad, LANE), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    n_data_outs = len(out_shape)
    if return_state:
        for s in buf_sizes:
            out_shape.append(jax.ShapeDtypeStruct((s, B_PAD, R), jnp.float32))
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((B_PAD, R), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    in_specs = ([pl.BlockSpec(memory_space=pl.ANY),        # c stays in HBM
                 pl.BlockSpec(memory_space=pl.ANY),        # noise stays in HBM
                 pl.BlockSpec(memory_space=pl.ANY)]        # y_eval ids, HBM
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 15
                + [pl.BlockSpec(memory_space=pltpu.SMEM)])  # [prng seed, t base]
    args = [c_in, n_in, y_in,
            weights['first_w'], weights['first_b'], weights['w_tap'],
            weights['b_tap'], weights['w_os'], weights['b_os'],
            weights['w_fused'], weights['b_fused'],
            weights['w_cond'], weights['b_cond'],
            g_in, weights['w_s1'], weights['b_s1'], weights['w_s2'],
            weights['b_s2'], ctrl]
    if has_state:
        in_specs += ([pl.BlockSpec(memory_space=pl.ANY)] * len(buf_sizes)
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)])
        args += list(state_in[0]) + [state_in[1]]

    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    samples = outs[0]
    audio = samples[:T, :B].T
    if categorical:
        audio = audio.astype(jnp.int32)  # class ids, matching the scan path
    if want_nll:
        second = outs[1][:T, :B].T                              # per-step NLL (B, T)
    elif return_params:
        second = jnp.transpose(outs[1][:T, :B, :hp.out_channels], (1, 0, 2))
    else:
        second = None
    if not return_state:
        return audio, second
    state_out = (tuple(outs[n_data_outs:n_data_outs + len(buf_sizes)]),
                 outs[n_data_outs + len(buf_sizes)],
                 t0 + T)
    return audio, second, state_out


def make_noise(hp: Hparams, rng: jax.Array, B: int, T: int) -> jnp.ndarray:
    """Pre-sample distribution noise in the layout generate_ar expects."""
    if hp.input_type == 'mulaw-quantize':
        if is_big_vocab(hp):
            # Gumbel is generated in-kernel (pass a seed to generate_ar instead)
            return jnp.zeros((B, T, 1), jnp.float32)
        u = jax.random.uniform(rng, (B, T, hp.out_channels),
                               minval=1e-9, maxval=1.0 - 1e-9)
        return -jnp.log(-jnp.log(u))  # Gumbel per class
    if hp.out_channels == 2:
        eps = jax.random.normal(rng, (B, T, 1))
        return eps
    nr = hp.out_channels // 3
    k1, k2 = jax.random.split(rng)
    u = jax.random.uniform(k1, (B, T, 1), minval=1e-5, maxval=1.0 - 1e-5)
    logistic = jnp.log(u) - jnp.log(1.0 - u)
    gu = jax.random.uniform(k2, (B, T, nr), minval=1e-5, maxval=1.0 - 1e-5)
    gumbel = -jnp.log(-jnp.log(gu))
    return jnp.concatenate([logistic, gumbel], axis=-1)
