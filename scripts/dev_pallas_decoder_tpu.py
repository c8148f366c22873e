#!/usr/bin/env python
"""TPU-side check of the Pallas decoder kernels at full size (bf16).

Usage: python scripts/dev_pallas_decoder_tpu.py [fwd|bwd|time]"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '.')
from tacotron2_tpu.utils.runtime import setup_runtime
setup_runtime()
from tacotron2_tpu.ops import fused_decoder as fd


def make_case(seed=0, train=True, B=32, T=512, T_in=128, dtype=jnp.bfloat16):
    M, r, P1, P2, U, D, E, F, K = 80, 1, 256, 256, 1024, 128, 512, 32, 31
    rng = np.random.default_rng(seed)
    cfg = fd.DecoderConfig(
        num_mels=M, r=r, prenet1=P1, prenet2=P2, units=U, attention_dim=D,
        attention_filters=F, attention_kernel=K, cumulate=True,
        smoothing=False, zoneout=0.1, deterministic=not train,
        stop_at_any=True, unroll=4, dtype=dtype)

    def arr(*shape, scale=0.08):
        return jnp.asarray(rng.normal(0, scale, shape), jnp.float32)

    params = {
        'prenet': {'dense_1': {'kernel': arr(M, P1), 'bias': arr(P1)},
                   'dense_2': {'kernel': arr(P1, P2), 'bias': arr(P2)}},
        'lstm_1': {'gates': {'kernel': arr(P2 + E + U, 4 * U, scale=0.02),
                             'bias': arr(4 * U)}},
        'lstm_2': {'gates': {'kernel': arr(2 * U, 4 * U, scale=0.02),
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
    lens = rng.integers(T_in // 2, T_in + 1, B)
    msk = jnp.asarray((np.arange(T_in)[None] < lens[:, None]), jnp.float32)
    teacher = arr(T, B, M, scale=1.0)
    use_t = jnp.asarray(rng.integers(0, 2, T), jnp.float32)
    m1 = jnp.asarray(rng.integers(0, 2, (T, B, P1)) / 0.5, dtype)
    m2 = jnp.asarray(rng.integers(0, 2, (T, B, P2)) / 0.5, dtype)
    zo = (tuple(jnp.asarray(rng.integers(0, 2, (T, B, U)), dtype)
                for _ in range(4)) if train else None)
    return cfg, params, (keys, values, msk, teacher, use_t, m1, m2, zo)


def fetch(x):
    return jax.tree_util.tree_map(np.asarray, x)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    cfg, params, args = make_case()
    cfg_p = dataclasses.replace(cfg, backend='pallas')

    if which in ('fwd', 'all'):
        f_x = jax.jit(lambda p, *a: fd.decoder_scan(cfg, p, *a))
        f_p = jax.jit(lambda p, *a: fd.decoder_scan(cfg_p, p, *a))
        t0 = time.time()
        ref = fetch(f_x(params, *args))
        print(f'xla fwd compile+run {time.time()-t0:.1f}s')
        t0 = time.time()
        got = fetch(f_p(params, *args))
        print(f'pallas fwd compile+run {time.time()-t0:.1f}s')
        for nm, a, b in zip(('frames', 'stops', 'aligns'), got, ref):
            err = np.max(np.abs(a - b))
            sc = np.max(np.abs(b)) + 1e-6
            print(f'  fwd {nm}: maxerr {err:.3e} (rel {err/sc:.3e})')
        for f, nm in ((f_x, 'xla'), (f_p, 'pallas')):
            ts = []
            for _ in range(4):
                t0 = time.time()
                r = f(params, *args)
                float(jnp.sum(r[0].astype(jnp.float32)))
                ts.append(time.time() - t0)
            print(f'  {nm} fwd: {min(ts)*1000:.1f} ms')

    if which in ('bwd', 'all'):
        rng = np.random.default_rng(7)
        T, B = args[3].shape[0], args[3].shape[1]
        T_in = args[0].shape[1]
        w_fr = jnp.asarray(rng.normal(0, 1, (T, B, cfg.num_mels * cfg.r)),
                           jnp.float32)
        w_st = jnp.asarray(rng.normal(0, 1, (T, B, cfg.r)), jnp.float32)
        w_al = jnp.asarray(rng.normal(0, 1, (T, B, T_in)), jnp.float32)

        def loss(c):
            def f(p, keys, values, teacher):
                fr, st, al = fd.decoder_scan(c, p, keys, values, args[2],
                                             teacher, *args[4:])
                return (jnp.sum(fr * w_fr) + jnp.sum(st * w_st)
                        + jnp.sum(al * w_al))
            return f

        g_x = jax.jit(jax.grad(loss(cfg), argnums=(0, 1, 2, 3)))
        g_p = jax.jit(jax.grad(loss(cfg_p), argnums=(0, 1, 2, 3)))
        t0 = time.time()
        gr = fetch(g_x(params, args[0], args[1], args[3]))
        print(f'xla bwd compile+run {time.time()-t0:.1f}s')
        t0 = time.time()
        gp = fetch(g_p(params, args[0], args[1], args[3]))
        print(f'pallas bwd compile+run {time.time()-t0:.1f}s')
        worst = ('', 0.0)
        for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gr),
                                jax.tree_util.tree_leaves(gp)):
            sc = np.max(np.abs(a)) + 1e-6
            err = float(np.max(np.abs(a - b)) / sc)
            if err > worst[1]:
                worst = (jax.tree_util.keystr(path), err)
        print(f'  bwd worst rel err: {worst[1]:.3e} at {worst[0]}')
        for g, nm in ((g_x, 'xla'), (g_p, 'pallas')):
            ts = []
            for _ in range(4):
                t0 = time.time()
                r = g(params, args[0], args[1], args[3])
                float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
                ts.append(time.time() - t0)
            print(f'  {nm} fwd+bwd: {min(ts)*1000:.1f} ms')


if __name__ == '__main__':
    main()
