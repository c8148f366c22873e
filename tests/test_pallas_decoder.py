"""Parity tests for the Pallas fused-decoder kernels (interpret mode on CPU).

Oracle: ops/fused_decoder._forward (the XLA scan the custom VJP is tested
against elsewhere) and jax.grad through it. The kernels must reproduce both to
float32 rounding on every supported mode combination."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.ops import fused_decoder as fd
from tacotron2_tpu.ops.pallas import taco_decoder as tdk


def make_case(seed=0, train=True, cumulate=True, smoothing=False, mask=True,
              M=10, r=2, T=12, B=3, T_in=21, U=128, P1=128, P2=128, D=128,
              E=128, F=8, K=5):
    rng = np.random.default_rng(seed)
    cfg = fd.DecoderConfig(
        num_mels=M, r=r, prenet1=P1, prenet2=P2, units=U, attention_dim=D,
        attention_filters=F, attention_kernel=K, cumulate=cumulate,
        smoothing=smoothing, zoneout=0.1, deterministic=not train,
        stop_at_any=True, unroll=1, dtype=jnp.float32)

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
    msk = None
    if mask:
        lens = rng.integers(T_in // 2, T_in + 1, B)
        msk = jnp.asarray((np.arange(T_in)[None] < lens[:, None]), jnp.float32)
    zo = (tuple(jnp.asarray(rng.integers(0, 2, (T, B, U)), jnp.float32)
                for _ in range(4)) if train else None)
    args = (arr(B, T_in, D), arr(B, T_in, E), msk, arr(T, B, M, scale=1.0),
            jnp.asarray(rng.integers(0, 2, T), jnp.float32),
            jnp.asarray(rng.integers(0, 2, (T, B, P1)) / 0.5, jnp.float32),
            jnp.asarray(rng.integers(0, 2, (T, B, P2)) / 0.5, jnp.float32),
            zo)
    return cfg, params, args


CASES = {
    'train': dict(),
    'eval': dict(train=False),
    'nomask_nocum': dict(mask=False, cumulate=False),
    'smoothing': dict(smoothing=True),
    'r1': dict(r=1, T=17, B=5),
}


@pytest.mark.parametrize('case', CASES)
def test_forward_matches_scan(case):
    cfg, params, args = make_case(**CASES[case])
    ref, _ = fd._forward(cfg, params, *args)
    got, _ = tdk.forward_pallas(cfg, fd._weights(params, cfg), *args)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)


@pytest.mark.parametrize('case', ['train', 'eval', 'smoothing'])
def test_backward_matches_autodiff(case):
    cfg, params, args = make_case(**CASES[case])
    cfg_p = dataclasses.replace(cfg, backend='pallas')
    rng = np.random.default_rng(9)
    T, B, T_in = args[3].shape[0], args[3].shape[1], args[0].shape[1]
    w_fr = jnp.asarray(rng.normal(0, 1, (T, B, cfg.num_mels * cfg.r)), jnp.float32)
    w_st = jnp.asarray(rng.normal(0, 1, (T, B, cfg.r)), jnp.float32)
    w_al = jnp.asarray(rng.normal(0, 1, (T, B, T_in)), jnp.float32)

    def loss(c):
        def f(p, keys, values, teacher):
            fr, st, al = fd.decoder_scan(c, p, keys, values, args[2], teacher,
                                         *args[4:])
            return jnp.sum(fr * w_fr) + jnp.sum(st * w_st) + jnp.sum(al * w_al)
        return f

    gr = jax.grad(loss(cfg), argnums=(0, 1, 2, 3))(params, args[0], args[1],
                                                   args[3])
    gp = jax.grad(loss(cfg_p), argnums=(0, 1, 2, 3))(params, args[0], args[1],
                                                     args[3])
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gr),
                            jax.tree_util.tree_leaves(gp)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-5,
            err_msg=f'grad mismatch at {jax.tree_util.keystr(path)}')
