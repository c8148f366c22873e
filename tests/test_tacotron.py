import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.models.tacotron.model import Tacotron
from tacotron2_tpu.parallel import mesh as mesh_lib
from tacotron2_tpu.training import tacotron_trainer as tt

TINY = ("embedding_dim=32,enc_conv_channels=32,enc_conv_num_layers=1,encoder_lstm_units=16,"
        "attention_dim=16,attention_filters=8,attention_kernel=[7],prenet_layers=[16,16],"
        "decoder_lstm_units=32,postnet_channels=32,postnet_num_layers=2,"
        "cbhg_kernels=4,cbhg_conv_channels=16,cbhg_projection=16,cbhg_highway_units=16,"
        "cbhg_rnn_units=16,num_freq=65,outputs_per_step=2,decoder_scan_unroll=1")


@pytest.fixture(scope='module')
def tiny_hp():
    hp = default_hparams()
    hp.parse(TINY)
    return hp


def make_batch(hp, B=4, Tin=12, Tout=8, seed=0):
    rng = jax.random.PRNGKey(seed)
    return dict(
        inputs=jax.random.randint(rng, (B, Tin), 2, 60),
        input_lengths=jnp.concatenate([jnp.full((B - 1,), Tin, jnp.int32),
                                       jnp.array([Tin - 3], jnp.int32)]),
        mel_targets=jax.random.uniform(rng, (B, Tout, hp.num_mels), minval=-4.0, maxval=4.0),
        stop_token_targets=jnp.zeros((B, Tout), jnp.float32),
        targets_lengths=jnp.full((B,), Tout, jnp.int32),
        linear_targets=jax.random.uniform(rng, (B, Tout, hp.num_freq), minval=-4.0, maxval=4.0),
    )


@pytest.fixture(scope='module')
def state_and_batch(tiny_hp):
    batch = make_batch(tiny_hp)
    state = tt.create_train_state(tiny_hp, jax.random.PRNGKey(0), batch)
    return state, batch


def test_forward_shapes(tiny_hp, state_and_batch):
    state, batch = state_and_batch
    hp = tiny_hp
    model = Tacotron(hp)
    rngs = {'dropout': jax.random.PRNGKey(1), 'zoneout': jax.random.PRNGKey(2),
            'teacher': jax.random.PRNGKey(3)}
    out = jax.jit(partial(model.apply, deterministic=True))(
        {'params': state.params, 'batch_stats': state.batch_stats},
        batch['inputs'], batch['input_lengths'], mel_targets=batch['mel_targets'],
        rngs=rngs)
    B, Tout = batch['mel_targets'].shape[:2]
    Tin = batch['inputs'].shape[1]
    assert out['decoder_output'].shape == (B, Tout, hp.num_mels)
    assert out['mel_outputs'].shape == (B, Tout, hp.num_mels)
    assert out['stop_token_prediction'].shape == (B, Tout)
    assert out['alignments'].shape == (B, Tin, Tout // hp.outputs_per_step)
    assert out['linear_outputs'].shape == (B, Tout, hp.num_freq)
    # alignments are a distribution over input positions
    np.testing.assert_allclose(np.asarray(out['alignments'].sum(axis=1)), 1.0, atol=1e-4)
    # attention never attends to masked positions (last row has length Tin-3)
    assert float(out['alignments'][-1, -3:, :].sum()) < 1e-5
    # clipping respected
    assert float(out['mel_outputs'].max()) <= hp.max_abs_value + 1e-5
    assert float(out['mel_outputs'].min()) >= -hp.max_abs_value - hp.lower_bound_decay - 1e-5


def test_synthesis_mode_shapes(tiny_hp, state_and_batch):
    state, batch = state_and_batch
    hp = tiny_hp
    model = Tacotron(hp)
    rngs = {'dropout': jax.random.PRNGKey(1)}
    out = jax.jit(partial(model.apply, deterministic=True, max_iters=6))(
        {'params': state.params, 'batch_stats': state.batch_stats},
        batch['inputs'], batch['input_lengths'], rngs=rngs)
    B = batch['inputs'].shape[0]
    r = hp.outputs_per_step
    assert out['mel_outputs'].shape == (B, 6 * r, hp.num_mels)
    assert out['stop_token_prediction'].shape == (B, 6 * r)


def test_loss_decreases(tiny_hp, state_and_batch):
    state, batch = state_and_batch
    jt = jax.jit(partial(tt.train_step, hp=tiny_hp))
    rng = jax.random.PRNGKey(0)
    state1, m0 = jt(state, batch, rng)
    for _ in range(15):
        state1, m = jt(state1, batch, rng)
    assert float(m['loss']) < float(m0['loss'])
    assert np.isfinite(float(m['loss']))
    assert float(m['grad_norm']) > 0


def test_eval_step(tiny_hp, state_and_batch):
    state, batch = state_and_batch
    je = jax.jit(partial(tt.eval_step, hp=tiny_hp))
    m = je(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m['loss']))
    assert m['mel_outputs'].shape == batch['mel_targets'].shape


def test_data_parallel_mesh(tiny_hp, state_and_batch):
    state, batch = state_and_batch
    assert len(jax.devices()) == 8, 'conftest must force 8 virtual devices'
    mesh = mesh_lib.make_mesh(tiny_hp)
    jt, _ = tt.make_jitted_steps(tiny_hp, mesh)
    batch8 = make_batch(tiny_hp, B=8)
    sb = mesh_lib.shard_batch(batch8, mesh)
    rstate = mesh_lib.replicate(state, mesh)
    state1, metrics = jt(rstate, sb, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))
    # batch is actually sharded over the data axis
    shard_shapes = {s.data.shape for s in sb['inputs'].addressable_shards}
    assert shard_shapes == {(1, batch8['inputs'].shape[1])}


def test_teacher_forcing_schedule(tiny_hp):
    from tacotron2_tpu.training import schedules
    hp = tiny_hp.replace(tacotron_teacher_forcing_mode='scheduled')
    assert float(schedules.teacher_forcing_ratio(hp, 0)) == 1.0
    assert float(schedules.teacher_forcing_ratio(hp, hp.tacotron_teacher_forcing_start_decay)) == pytest.approx(1.0)
    end = hp.tacotron_teacher_forcing_start_decay + hp.tacotron_teacher_forcing_decay_steps
    assert float(schedules.teacher_forcing_ratio(hp, end)) == pytest.approx(0.0, abs=1e-6)
    mid = hp.tacotron_teacher_forcing_start_decay + hp.tacotron_teacher_forcing_decay_steps // 2
    assert 0.3 < float(schedules.teacher_forcing_ratio(hp, mid)) < 0.7


def test_lr_schedule(tiny_hp):
    from tacotron2_tpu.training import schedules
    hp = tiny_hp
    assert float(schedules.tacotron_learning_rate(hp, 0)) == pytest.approx(1e-3)
    assert float(schedules.tacotron_learning_rate(hp, hp.tacotron_start_decay)) == pytest.approx(1e-3)
    assert float(schedules.tacotron_learning_rate(hp, 10_000_000)) == pytest.approx(1e-4)


def test_synthesis_chunked_matches_unchunked(tiny_hp):
    """The chunked early-exit decode (nn.while_loop over CHUNK-step scans) must be
    numerically identical to one straight scan when no early exit triggers.
    Dropout off so the two paths' rng folding can't diverge; stop projection biased
    hard negative so untrained weights can't fire an early exit."""
    hp = default_hparams()
    hp.parse(TINY + ',tacotron_dropout_rate=0.0,decoder_chunk_size=4')
    hp_one = hp.replace(decoder_chunk_size=8)
    batch = make_batch(hp)
    state = tt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    params = jax.tree_util.tree_map(lambda x: x, state.params)
    params['decoder']['stop_projection']['bias'] = (
        params['decoder']['stop_projection']['bias'] - 100.0)
    variables = {'params': params, 'batch_stats': state.batch_stats}

    def run(h):
        model = Tacotron(h)
        return model.apply(variables, batch['inputs'], batch['input_lengths'],
                           max_iters=8, deterministic=True,
                           rngs={'dropout': jax.random.PRNGKey(1)})
    out_chunked, out_single = run(hp), run(hp_one)
    np.testing.assert_allclose(np.asarray(out_chunked['mel_outputs']),
                               np.asarray(out_single['mel_outputs']), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_chunked['stop_token_prediction']),
                               np.asarray(out_single['stop_token_prediction']),
                               atol=1e-5)


def test_synthesis_early_exit_stops_decoding(tiny_hp):
    """With the stop projection biased to fire immediately, the while_loop must exit
    after the first chunk: later steps keep the 'already stopped' fill value."""
    hp = default_hparams()
    hp.parse(TINY + ',tacotron_dropout_rate=0.0,decoder_chunk_size=4')
    batch = make_batch(hp)
    state = tt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    params = jax.tree_util.tree_map(lambda x: x, state.params)
    import flax
    params = flax.core.unfreeze(params) if hasattr(flax.core, 'unfreeze') else params
    params['decoder']['stop_projection']['bias'] = (
        params['decoder']['stop_projection']['bias'] + 100.0)
    variables = {'params': params, 'batch_stats': state.batch_stats}
    model = Tacotron(hp)
    out = model.apply(variables, batch['inputs'], batch['input_lengths'],
                      max_iters=16, deterministic=True,
                      rngs={'dropout': jax.random.PRNGKey(1)})
    stops = np.asarray(out['stop_token_prediction'])  # (B, 16*r)
    r = hp.outputs_per_step
    # first chunk (4 steps * r) computed: logits ~100, not the 1e3 fill
    assert np.all(stops[:, :4 * r] < 500.0)
    # remaining chunks never ran: fill value survives
    assert np.all(stops[:, 4 * r:] == 1e3)
    assert bool(np.all(np.asarray(out['stop_finished'])))
