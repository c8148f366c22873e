"""Fused custom-VJP decoder scan correctness (ops/fused_decoder.py).

Two independent pins:
  1. vs the flax nn.scan path: identical forward and parameter gradients when both
     paths are deterministic (dropout 0) — same math, different autodiff.
  2. vs XLA autodiff OF THE SAME fused forward, with stochastic masks on: the
     hand-written backward must match jax.grad exactly (masks are explicit inputs,
     so both see identical noise).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.models.tacotron.losses import compute_losses
from tacotron2_tpu.models.tacotron.model import Tacotron
from tacotron2_tpu.ops import fused_decoder as fd
from tacotron2_tpu.training import tacotron_trainer as tt

TINY = ("embedding_dim=32,enc_conv_channels=32,enc_conv_num_layers=1,encoder_lstm_units=16,"
        "attention_dim=16,attention_filters=8,attention_kernel=[7],prenet_layers=[16,16],"
        "decoder_lstm_units=32,postnet_channels=32,postnet_num_layers=2,"
        "cbhg_kernels=4,cbhg_conv_channels=16,cbhg_projection=16,cbhg_highway_units=16,"
        "cbhg_rnn_units=16,num_freq=65,outputs_per_step=2,decoder_scan_unroll=1")


def make_batch(hp, B=2, Tin=12, Tout=8):
    rng = jax.random.PRNGKey(0)
    return dict(
        inputs=jax.random.randint(rng, (B, Tin), 2, 60),
        input_lengths=jnp.asarray([Tin] * (B - 1) + [Tin - 3], jnp.int32),
        mel_targets=jax.random.uniform(rng, (B, Tout, hp.num_mels), minval=-4., maxval=4.),
        stop_token_targets=jnp.zeros((B, Tout), jnp.float32),
        targets_lengths=jnp.full((B,), Tout, jnp.int32),
        linear_targets=jax.random.uniform(rng, (B, Tout, hp.num_freq),
                                          minval=-4., maxval=4.))


def _rel_diff(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-8)


@pytest.mark.parametrize('tfr', [1.0, 0.5])
def test_fused_matches_flax_scan(tfr):
    """Deterministic (dropout 0): fused fwd + grads == nn.scan fwd + grads."""
    hp = default_hparams()
    hp.parse(TINY + ',tacotron_dropout_rate=0.0,fused_decoder=True')
    hp_ref = hp.replace(fused_decoder=False)
    batch = make_batch(hp)
    state = tt.create_train_state(hp_ref, jax.random.PRNGKey(0), batch)
    rngs = {'dropout': jax.random.PRNGKey(1), 'teacher': jax.random.PRNGKey(2)}

    def loss_and_out(params, h):
        model = Tacotron(h)
        out, _ = model.apply({'params': params, 'batch_stats': state.batch_stats},
                             batch['inputs'], batch['input_lengths'],
                             mel_targets=batch['mel_targets'], deterministic=True,
                             teacher_forcing_ratio=jnp.float32(tfr), rngs=rngs,
                             mutable=['batch_stats'])
        total, _ = compute_losses(out, batch, params, h)
        return total, out

    (lf, of), gf = jax.value_and_grad(partial(loss_and_out, h=hp), has_aux=True)(
        state.params)
    (lr, orr), gr = jax.value_and_grad(partial(loss_and_out, h=hp_ref), has_aux=True)(
        state.params)
    assert abs(float(lf) - float(lr)) < 1e-5
    for k in ('decoder_output', 'mel_outputs', 'stop_token_prediction', 'alignments'):
        assert np.abs(np.asarray(of[k]) - np.asarray(orr[k])).max() < 1e-5, k
    flat_f = jax.tree_util.tree_flatten_with_path(gf)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(gr)[0]
    for (kp, a), (_, b) in zip(flat_f, flat_r):
        assert _rel_diff(a, b) < 1e-4, f'grad mismatch at {jax.tree_util.keystr(kp)}'


@pytest.mark.parametrize('variant',
                         ['softmax', 'smoothing', 'loc_m_only', 'conv_fallback'])
def test_custom_vjp_matches_autodiff_stochastic(variant):
    """Stochastic masks on (prenet dropout + train zoneout): hand-written VJP vs
    jax.grad of the identical forward — exact to float tolerance. Covers the
    smoothing normalization branch and all three location-layer tiers of the
    hand-written attention backward (loc_n folded matrix / loc_m band matrix /
    large-T_in conv fallback)."""
    hp = default_hparams()
    hp.parse(TINY + (',smoothing=True' if variant == 'smoothing' else ''))
    T, B, Tin = 6, 2, 10
    U, M = hp.decoder_lstm_units, hp.num_mels
    cfg = fd.config_from_hp(hp, jnp.float32, deterministic=False)
    saved_budget = fd.LOC_MAT_BYTES
    if variant == 'conv_fallback':
        fd.LOC_MAT_BYTES = 0       # force the per-step conv form
    elif variant == 'loc_m_only':
        # budget admits loc_m (T*T*F=10*10*8 f32) but not loc_n (T*T*D=10*10*16)
        fd.LOC_MAT_BYTES = 10 * 10 * 8 * 4

    rng = jax.random.PRNGKey(3)
    ks = jax.random.split(rng, 12)
    batch = make_batch(hp, B=B, Tin=Tin, Tout=T * hp.outputs_per_step)
    state = tt.create_train_state(hp.replace(fused_decoder=False),
                                  jax.random.PRNGKey(0), batch)
    dec_params = state.params['decoder']
    D, Menc = hp.attention_dim, 2 * hp.encoder_lstm_units
    keys = jax.random.normal(ks[0], (B, Tin, D)) * 0.3
    values = jax.random.normal(ks[1], (B, Tin, Menc)) * 0.5
    mask = (jnp.arange(Tin)[None, :] < jnp.asarray([[Tin], [Tin - 4]])).astype(jnp.float32)
    teacher = jax.random.uniform(ks[2], (T, B, M), minval=-4., maxval=4.)
    use_teacher = (jax.random.uniform(ks[3], (T,)) < 0.5).astype(jnp.float32)
    keep = 1.0 - hp.tacotron_dropout_rate
    m1 = jax.random.bernoulli(ks[4], keep, (T, B, hp.prenet_layers[0])
                              ).astype(jnp.float32) / keep
    m2 = jax.random.bernoulli(ks[5], keep, (T, B, hp.prenet_layers[1])
                              ).astype(jnp.float32) / keep
    zkeep = 1.0 - hp.tacotron_zoneout_rate
    zo = tuple(jax.random.bernoulli(k, zkeep, (T, B, U)).astype(jnp.float32)
               for k in ks[6:10])
    gw = jax.random.normal(ks[10], (T, B, M * hp.outputs_per_step))  # loss weights

    def loss(fn, params, keys, values, teacher):
        frames, stops, aligns = fn(cfg, params, keys, values, mask, teacher,
                                   use_teacher, m1, m2, zo)
        return (jnp.sum(frames * gw) + jnp.sum(jnp.tanh(stops))
                + jnp.sum(aligns * aligns))

    args = (dec_params, keys, values, teacher)
    try:
        g_custom = jax.grad(partial(loss, fd.decoder_scan),
                            argnums=(0, 1, 2, 3))(*args)
        g_auto = jax.grad(partial(loss, fd.decoder_scan_reference),
                          argnums=(0, 1, 2, 3))(*args)
    finally:
        fd.LOC_MAT_BYTES = saved_budget
    flat_c = jax.tree_util.tree_flatten_with_path(g_custom)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(g_auto)[0]
    assert len(flat_c) == len(flat_a)
    for (kp, a), (_, b) in zip(flat_c, flat_a):
        assert _rel_diff(a, b) < 1e-4, \
            f'custom-vjp mismatch at {jax.tree_util.keystr(kp)}: {_rel_diff(a, b)}'


@pytest.mark.parametrize('constraint', [None, 'window', 'monotonic'])
def test_fused_synthesis_matches_flax_scan(constraint):
    """Free-running mode (dropout 0): fused synthesis scan == nn.scan while_loop,
    including the early-exit chunking, stop fill, and the synthesis-time
    attention constraint variants."""
    hp = default_hparams()
    extra = ',tacotron_dropout_rate=0.0,max_iters=10,decoder_chunk_size=4'
    if constraint is not None:
        extra += (',synthesis_constraint=True,attention_win_size=3'
                  f',synthesis_constraint_type={constraint}')
    hp.parse(TINY + extra + ',fused_decoder=True')
    hp_ref = hp.replace(fused_decoder=False)
    batch = make_batch(hp)
    state = tt.create_train_state(hp_ref, jax.random.PRNGKey(0), batch)
    rngs = {'dropout': jax.random.PRNGKey(1)}

    def synth(h):
        model = Tacotron(h)
        return model.apply({'params': state.params, 'batch_stats': state.batch_stats},
                           batch['inputs'], batch['input_lengths'],
                           mel_targets=None, max_iters=hp.max_iters,
                           deterministic=True, rngs=rngs)

    of, orr = synth(hp), synth(hp_ref)
    for k in ('decoder_output', 'mel_outputs', 'stop_token_prediction',
              'alignments', 'stop_finished'):
        assert np.abs(np.asarray(of[k], np.float32)
                      - np.asarray(orr[k], np.float32)).max() < 2e-4, k


def test_fused_train_step_loss_decreases():
    """End-to-end: default (fused) train step optimizes."""
    hp = default_hparams()
    hp.parse(TINY)
    assert hp.fused_decoder
    batch = make_batch(hp, B=8)
    state = tt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    jt = jax.jit(partial(tt.train_step, hp=hp))
    state, m0 = jt(state, batch, jax.random.PRNGKey(0))
    for _ in range(15):
        state, m = jt(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m['loss']))
    assert float(m['loss']) < float(m0['loss'])
