"""Coverage for less-traveled configuration paths: paper profile, masked decoder
losses, fine-tuning freeze, attention smoothing, natural eval."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.config import default_hparams, paper_hparams
from tacotron2_tpu.training import tacotron_trainer as tt
from tacotron2_tpu.training import wavenet_trainer as wt

TACO_TINY = ("embedding_dim=32,enc_conv_channels=32,enc_conv_num_layers=1,"
             "encoder_lstm_units=16,attention_dim=16,attention_filters=8,"
             "attention_kernel=[7],prenet_layers=[16,16],decoder_lstm_units=32,"
             "postnet_channels=32,postnet_num_layers=2,cbhg_kernels=4,"
             "cbhg_conv_channels=16,cbhg_projection=16,cbhg_highway_units=16,"
             "cbhg_rnn_units=16,num_freq=65,outputs_per_step=2,decoder_scan_unroll=1")

WN_TINY = ("layers=4,stacks=2,residual_channels=8,gate_channels=16,"
           "skip_out_channels=8,hop_size=32,win_size=128,n_fft=256,num_freq=129")


def taco_batch(hp, B=4, Tin=12, Tout=8):
    rng = jax.random.PRNGKey(0)
    b = dict(
        inputs=jax.random.randint(rng, (B, Tin), 2, 60),
        input_lengths=jnp.full((B,), Tin, jnp.int32),
        mel_targets=jax.random.uniform(rng, (B, Tout, hp.num_mels), minval=-4., maxval=4.),
        stop_token_targets=jnp.zeros((B, Tout), jnp.float32),
        targets_lengths=jnp.asarray([Tout, Tout - 2, Tout, Tout - 4], jnp.int32),
    )
    if hp.predict_linear:
        b['linear_targets'] = jax.random.uniform(rng, (B, Tout, hp.num_freq),
                                                 minval=-4., maxval=4.)
    return b


def wn_batch(hp, B=2, Tc=6):
    rng = np.random.default_rng(0)
    hop = hp.get_hop_size()
    return dict(audio=rng.uniform(-0.5, 0.5, (B, Tc * hop)).astype(np.float32),
                input_lengths=np.full((B,), Tc * hop, np.int32),
                mel_conditions=rng.uniform(0, 1, (B, Tc, hp.num_mels)).astype(np.float32))


def test_paper_profile_wavenet_train_step():
    """Paper profile distinctives: MoL-30, 2D upsample, no legacy scaling, cdf loss."""
    hp = paper_hparams()
    assert hp.out_channels == 30 and hp.upsample_type == '2D' and not hp.legacy
    hp.parse(WN_TINY + ',out_channels=30,upsample_scales=[4,8]')
    hp.validate()
    batch = wn_batch(hp)
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    _, m = jax.jit(partial(wt.train_step, hp=hp))(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m['loss']))


def test_paper_profile_tacotron_no_linear():
    hp = paper_hparams()
    hp.parse(TACO_TINY)
    assert not hp.predict_linear and not hp.clip_outputs
    batch = taco_batch(hp)
    state = tt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    _, m = jax.jit(partial(tt.train_step, hp=hp))(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m['loss']))
    assert float(m['linear_loss']) == 0.0


def test_mask_decoder_losses():
    hp = default_hparams()
    hp.parse(TACO_TINY + ',mask_decoder=True,cross_entropy_pos_weight=20')
    batch = taco_batch(hp)
    state = tt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    _, m = jax.jit(partial(tt.train_step, hp=hp))(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m['loss']))
    # masked loss must differ from unmasked on ragged lengths
    hp2 = default_hparams()
    hp2.parse(TACO_TINY)
    state2 = tt.create_train_state(hp2, jax.random.PRNGKey(0), batch)
    _, m2 = jax.jit(partial(tt.train_step, hp=hp2))(state2, batch, jax.random.PRNGKey(0))
    assert abs(float(m['before_loss']) - float(m2['before_loss'])) > 1e-6


def test_fine_tuning_freezes_encoder():
    hp = default_hparams()
    hp.parse(TACO_TINY + ',tacotron_fine_tuning=True')
    batch = taco_batch(hp)
    state = tt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    new_state, _ = jax.jit(partial(tt.train_step, hp=hp))(state, batch, jax.random.PRNGKey(0))
    emb0 = np.asarray(state.params['inputs_embedding'])
    emb1 = np.asarray(new_state.params['inputs_embedding'])
    np.testing.assert_array_equal(emb0, emb1)  # frozen
    enc0 = np.asarray(jax.tree_util.tree_leaves(state.params['encoder_convolutions'])[0])
    enc1 = np.asarray(jax.tree_util.tree_leaves(new_state.params['encoder_convolutions'])[0])
    np.testing.assert_array_equal(enc0, enc1)  # frozen
    dec0 = np.asarray(state.params['decoder']['frame_projection']['kernel'])
    dec1 = np.asarray(new_state.params['decoder']['frame_projection']['kernel'])
    assert not np.array_equal(dec0, dec1)  # trained


def test_attention_smoothing_mode():
    hp = default_hparams()
    hp.parse(TACO_TINY + ',smoothing=True')
    batch = taco_batch(hp)
    state = tt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    m = jax.jit(partial(tt.eval_step, hp=hp))(state, batch, jax.random.PRNGKey(0))
    # smoothing normalization still yields a distribution over inputs
    np.testing.assert_allclose(np.asarray(m['alignments'].sum(axis=1)), 1.0, atol=1e-4)


def test_synthesis_constraint_window():
    """Windowed attention masking at synthesis (reference attention.py:201-214)."""
    from tacotron2_tpu.models.tacotron.model import Tacotron
    hp = default_hparams()
    hp.parse(TACO_TINY + ',synthesis_constraint=True,attention_win_size=3')
    batch = taco_batch(hp)
    state = tt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    model = Tacotron(hp)
    out = jax.jit(partial(model.apply, deterministic=True, max_iters=5))(
        {'params': state.params, 'batch_stats': state.batch_stats},
        batch['inputs'], batch['input_lengths'],
        rngs={'dropout': jax.random.PRNGKey(1)})
    align = np.asarray(out['alignments'])  # (B, T_in, steps)
    # each step's attention mass is confined near the previous argmax
    for b in range(align.shape[0]):
        prev = 0
        for t in range(align.shape[2]):
            cur = align[:, :, t][b].argmax()
            assert abs(int(cur) - prev) <= hp.attention_win_size
            prev = int(cur)


def test_stop_token_length_recovery():
    from tacotron2_tpu.inference.tacotron_synthesizer import Synthesizer
    hp = default_hparams()
    s = Synthesizer()
    s._hp = hp
    logits = np.full((2, 20), -5.0)
    logits[0, 12:] = 5.0   # stops at frame 13
    lengths = s._get_output_lengths(logits)
    assert lengths[0] == 13
    assert lengths[1] == 20  # never stops → full length


def test_hparams_freeze_after_first_use():
    """Mutating an Hparams after compiled code captured it must raise: identity-hashed
    hp doubles as a jit/lru_cache key, so in-place edits would serve stale traces."""
    import dataclasses
    import pytest
    hp = default_hparams()
    hp.parse(TACO_TINY)
    hp.tacotron_batch_size = 4        # pre-use mutation is fine
    batch = taco_batch(hp)
    tt.create_train_state(hp, jax.random.PRNGKey(0), batch)  # freezes hp
    with pytest.raises(dataclasses.FrozenInstanceError):
        hp.tacotron_batch_size = 8
    hp2 = hp.replace(tacotron_batch_size=8)  # the sanctioned mutation path
    assert hp2.tacotron_batch_size == 8 and not hp2.frozen
    assert hp.tacotron_batch_size == 4
