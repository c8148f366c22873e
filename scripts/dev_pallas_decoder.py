#!/usr/bin/env python
"""Dev parity harness for the Pallas decoder kernels (interpret mode on CPU).

Compares forward_pallas against fused_decoder._forward and the Pallas custom
VJP against jax.grad of the XLA oracle, on small 128-aligned dims."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')
jax.config.update('jax_platforms', 'cpu')

from tacotron2_tpu.ops import fused_decoder as fd
from tacotron2_tpu.ops.pallas import taco_decoder as tdk


def make_case(seed=0, train=True, cumulate=True, smoothing=False, mask=True,
              M=10, r=2, T=20, B=3, T_in=21, U=128, P1=128, P2=128, D=128,
              E=128, F=8, K=5, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    cfg = fd.DecoderConfig(
        num_mels=M, r=r, prenet1=P1, prenet2=P2, units=U, attention_dim=D,
        attention_filters=F, attention_kernel=K, cumulate=cumulate,
        smoothing=smoothing, zoneout=0.1, deterministic=not train,
        stop_at_any=True, unroll=1, dtype=dtype)

    def arr(*shape, scale=0.1):
        return jnp.asarray(rng.normal(0, scale, shape), jnp.float32)

    params = {
        'prenet': {'dense_1': {'kernel': arr(M, P1), 'bias': arr(P1)},
                   'dense_2': {'kernel': arr(P1, P2), 'bias': arr(P2)}},
        'lstm_1': {'gates': {'kernel': arr(P2 + E + U, 4 * U, scale=0.05),
                             'bias': arr(4 * U)}},
        'lstm_2': {'gates': {'kernel': arr(2 * U, 4 * U, scale=0.05),
                             'bias': arr(4 * U)}},
        'attention': {
            'query_layer': {'kernel': arr(U, D)},
            'location_convolution': {'kernel': arr(K, 1, F), 'bias': arr(F)},
            'location_layer': {'kernel': arr(F, D)},
            'attention_variable_projection': arr(1, D),
            'attention_bias': arr(D),
        },
        'frame_projection': {'kernel': arr(U + E, M * r), 'bias': arr(M * r)},
        'stop_projection': {'kernel': arr(U + E, r), 'bias': arr(r)},
    }
    keys = arr(B, T_in, D)
    values = arr(B, T_in, E)
    msk = None
    if mask:
        lens = rng.integers(T_in // 2, T_in + 1, B)
        msk = jnp.asarray((np.arange(T_in)[None] < lens[:, None]), jnp.float32)
    teacher = arr(T, B, M, scale=1.0)
    use_t = jnp.asarray(rng.integers(0, 2, T), jnp.float32)
    keep = 0.5
    m1 = jnp.asarray(rng.integers(0, 2, (T, B, P1)) / keep, dtype)
    m2 = jnp.asarray(rng.integers(0, 2, (T, B, P2)) / keep, dtype)
    if train:
        zo = tuple(jnp.asarray(rng.integers(0, 2, (T, B, U)), dtype)
                   for _ in range(4))
    else:
        zo = None
    return cfg, params, (keys, values, msk, teacher, use_t, m1, m2, zo)


def check_fwd(name, **kw):
    cfg, params, args = make_case(**kw)
    W = fd._weights(params, cfg)
    ref, _ = fd._forward(cfg, params, *args)
    got, _ = tdk.forward_pallas(cfg, W, *args)
    for nm, a, b in zip(('frames', 'stops', 'aligns'), got, ref):
        err = float(jnp.max(jnp.abs(a - b)))
        status = 'OK ' if err < 2e-5 else 'FAIL'
        print(f'  [{status}] fwd {name} {nm}: maxerr {err:.2e}')


def check_bwd(name, **kw):
    cfg, params, args = make_case(**kw)
    cfg_p = __import__('dataclasses').replace(cfg, backend='pallas')

    def loss_fn(c):
        def f(params, keys, values, teacher):
            fr, st, al = fd.decoder_scan(c, params, keys, values, args[2],
                                         teacher, *args[4:])
            return (jnp.sum(fr * w_fr) + jnp.sum(st * w_st)
                    + jnp.sum(al * w_al))
        return f

    rng = np.random.default_rng(99)
    T, B = args[3].shape[0], args[3].shape[1]
    T_in = args[0].shape[1]
    w_fr = jnp.asarray(rng.normal(0, 1, (T, B, cfg.num_mels * cfg.r)), jnp.float32)
    w_st = jnp.asarray(rng.normal(0, 1, (T, B, cfg.r)), jnp.float32)
    w_al = jnp.asarray(rng.normal(0, 1, (T, B, T_in)), jnp.float32)

    gr = jax.grad(loss_fn(cfg), argnums=(0, 1, 2, 3))(
        params, args[0], args[1], args[3])
    gp = jax.grad(loss_fn(cfg_p), argnums=(0, 1, 2, 3))(
        params, args[0], args[1], args[3])
    flat_r = jax.tree_util.tree_leaves_with_path(gr)
    flat_p = jax.tree_util.tree_leaves(gp)
    worst = 0.0
    for (path, a), b in zip(flat_r, flat_p):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(a - b))) / scale
        worst = max(worst, err)
        if err > 2e-4:
            print(f'  [FAIL] bwd {name} {jax.tree_util.keystr(path)}: '
                  f'rel maxerr {err:.2e} (scale {scale:.2e})')
    print(f'  [{"OK " if worst <= 2e-4 else "FAIL"}] bwd {name}: '
          f'worst rel err {worst:.2e}')


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('fwd', 'all'):
        check_fwd('train-cum-mask')
        check_fwd('eval', train=False)
        check_fwd('nomask-nocum', mask=False, cumulate=False)
        check_fwd('smoothing', smoothing=True)
        check_fwd('r1-bigT', r=1, T=33, B=17)
    if which in ('bwd', 'all'):
        check_bwd('train-cum-mask')
        check_bwd('eval', train=False)
        check_bwd('nomask-nocum', mask=False, cumulate=False)
        check_bwd('smoothing', smoothing=True)
        check_bwd('r1-bigT', r=1, T=33, B=17)
