import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.models.wavenet import distributions as dist
from tacotron2_tpu.models.wavenet.model import WaveNet, compute_wavenet_loss
from tacotron2_tpu.models.wavenet.modules import receptive_field_size
from tacotron2_tpu.training import wavenet_trainer as wt

TINY = ("layers=4,stacks=2,residual_channels=8,gate_channels=16,skip_out_channels=8,"
        "upsample_scales=[4,5],hop_size=20,win_size=80,n_fft=256,num_freq=129,"
        "max_time_steps=200,wavenet_batch_size=2,cin_channels=80")


@pytest.fixture(scope='module')
def hp_tiny():
    hp = default_hparams()
    hp.parse(TINY)
    return hp


def make_batch(hp, B=2, Tc=10, seed=0):
    rng = np.random.default_rng(seed)
    hop = hp.get_hop_size()
    T = Tc * hop
    return dict(
        audio=rng.uniform(-0.5, 0.5, (B, T)).astype(np.float32),
        input_lengths=np.asarray([T, T - hop], np.int32),
        mel_conditions=rng.uniform(0, 1, (B, Tc, hp.num_mels)).astype(np.float32),
    )


def test_receptive_field():
    # reference wavenet.py:54-71: 20 layers 2 stacks k=3 → 4093? (k-1)*sum(dilations)+1
    assert receptive_field_size(20, 2, 3) == 2 * (2 * 1023) + 1
    assert receptive_field_size(4, 2, 3) == 2 * (1 + 2 + 1 + 2) + 1


def test_forward_shapes(hp_tiny):
    hp = hp_tiny
    batch = make_batch(hp)
    model = WaveNet(hp)
    x = model.encode_input(jnp.asarray(batch['audio']))
    variables = jax.jit(lambda: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        x, jnp.asarray(batch['mel_conditions']), None, train=False))()
    y_hat = jax.jit(partial(model.apply, train=False))(
        variables, x, jnp.asarray(batch['mel_conditions']), None)
    assert y_hat.shape == (2, batch['audio'].shape[1], hp.out_channels)


@pytest.mark.parametrize('upsample_type', ['NearestNeighbor', '1D', '2D', 'Resize', 'SubPixel'])
def test_upsample_variants(hp_tiny, upsample_type):
    from tacotron2_tpu.models.wavenet.modules import UpsampleNetwork
    hp = hp_tiny
    net = UpsampleNetwork(hp.num_mels, upsample_type, tuple(hp.upsample_scales),
                          hp.freq_axis_kernel_size, 'Relu', 0.4, True, 0.3)
    c = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 7, hp.num_mels)), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), c)
    out = jax.jit(net.apply)(v, c)
    assert out.shape == (2, 7 * hp.get_hop_size(), hp.num_mels)
    if upsample_type == 'NearestNeighbor':
        np.testing.assert_allclose(out[:, 0], c[:, 0], atol=1e-6)


def test_incremental_matches_parallel(hp_tiny):
    """Teacher-forced incremental generation must reproduce the parallel pass.

    Run UNCONDITIONED (like the reference, the incremental path aligns local
    conditioning to the current output index, one off from the parallel path, so exact
    equality only holds without c). Incremental step t consumes y[t-1] (step 0
    consumes the zero init = the conv left-padding), so params_inc[:, 1+t] must equal
    parallel y_hat[:, t]."""
    hp = default_hparams()
    hp.parse(TINY + ',cin_channels=-1')
    T = 60
    model = WaveNet(hp)
    y = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, (2, T)), jnp.float32)
    x = model.encode_input(y)
    variables = jax.jit(lambda: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        x, None, None, train=False))()
    parallel = jax.jit(partial(model.apply, train=False))(variables, x, None, None)
    inc = jax.jit(lambda v, r, t: model.apply(v, r, None, None, T, None, t,
                                              method=WaveNet.incremental))(
        variables, jax.random.PRNGKey(5), y)
    params_inc = inc['params']
    np.testing.assert_allclose(np.asarray(params_inc[:, 1:, :]),
                               np.asarray(parallel[:, :-1, :]), atol=1e-4)
    # teacher-forced audio echoes the targets
    np.testing.assert_allclose(np.asarray(inc['audio']), np.asarray(y), atol=1e-6)


def test_incremental_matches_parallel_conditioned(hp_tiny):
    """Conditioned cross-check: the path synthesis actually uses.

    Incremental output index t consumes audio y[t-1] and upsampled conditioning
    c_up[t]; parallel output index t consumes y[t] and c_up[t]. Feeding the
    parallel pass c_up shifted LEFT by one therefore makes parallel[:, t] consume
    (y[t], c_up[t+1]) — exactly what incremental[:, t+1] consumes — so
    inc_params[:, 1:] must equal parallel[:, :-1] with conditioning active.

    One caveat: incremental step 0 processes the zero init sample WITH c_up[0]
    and writes the (conditioned, nonzero) layer outputs into the ring buffers,
    whereas the parallel pass left-pads every layer with true zeros. That extra
    history step perturbs outputs only within the receptive field, so the
    comparison starts at t = receptive_field."""
    hp = hp_tiny
    Tc = 4
    batch = make_batch(hp, Tc=Tc)
    hop = hp.get_hop_size()
    T = Tc * hop
    y = jnp.asarray(batch['audio'][:, :T])
    c = jnp.asarray(batch['mel_conditions'][:, :Tc])
    model = WaveNet(hp)
    x = model.encode_input(y)
    variables = jax.jit(lambda: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        x, c, None, train=False))()

    c_up = jax.jit(lambda v, c_: model.apply(v, c_,
                                             method=WaveNet.upsample_conditioning))(
        variables, c)
    assert c_up.shape[1] == T
    # shift conditioning left by one; the padded last frame only feeds
    # parallel[:, -1], which the comparison drops
    c_shift = jnp.concatenate([c_up[:, 1:], c_up[:, -1:]], axis=1)
    parallel = jax.jit(partial(model.apply, train=False, c_is_upsampled=True))(
        variables, x, c_shift, None)
    inc = jax.jit(lambda v, r, c_, t: model.apply(v, r, c_, None, None, None, t,
                                                  method=WaveNet.incremental))(
        variables, jax.random.PRNGKey(5), c, y)
    rf = model.receptive_field
    assert rf < T - 1
    np.testing.assert_allclose(np.asarray(inc['params'][:, 1 + rf:, :]),
                               np.asarray(parallel[:, rf:-1, :]),
                               atol=2e-5, rtol=1e-4)


def test_free_running_generation(hp_tiny):
    hp = hp_tiny
    batch = make_batch(hp, Tc=3)
    model = WaveNet(hp)
    c = jnp.asarray(batch['mel_conditions'])[:, :3]
    x = model.encode_input(jnp.asarray(batch['audio'][:, :3 * hp.get_hop_size()]))
    variables = jax.jit(lambda: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        x, c, None, train=False))()
    out = jax.jit(lambda v, r, c_: model.apply(v, r, c_, None,
                                               method=WaveNet.incremental))(
        variables, jax.random.PRNGKey(5), c)
    audio = np.asarray(out['audio'])
    assert audio.shape == (2, 3 * hp.get_hop_size())
    assert np.abs(audio).max() <= 1.0
    assert np.isfinite(audio).all()


def test_train_step_loss_decreases(hp_tiny):
    hp = hp_tiny
    batch = make_batch(hp)
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    jt = jax.jit(partial(wt.train_step, hp=hp))
    rng = jax.random.PRNGKey(0)
    state, m0 = jt(state, batch, rng)
    for _ in range(20):
        state, m = jt(state, batch, rng)
    assert np.isfinite(float(m['loss']))
    assert float(m['loss']) < float(m0['loss'])
    # EMA params track but lag the raw params
    p = jax.tree_util.tree_leaves(state.params)[0]
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))


def test_train_step_remat_parity(hp_tiny):
    # wavenet_remat recomputes residual blocks in the backward (model.py:48);
    # it must not change the math — loss and updated params stay (near-)identical.
    hp = hp_tiny
    batch = make_batch(hp)
    rng = jax.random.PRNGKey(3)
    outs = {}
    for remat in (False, True):
        hpv = hp.replace(wavenet_remat=remat)
        state = wt.create_train_state(hpv, jax.random.PRNGKey(0), batch)
        jt = jax.jit(partial(wt.train_step, hp=hpv))
        state, m = jt(state, batch, rng)
        outs[remat] = (float(m['loss']),
                       np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
    assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-6)
    np.testing.assert_allclose(outs[False][1], outs[True][1], rtol=1e-5, atol=1e-6)


def test_mulaw_quantize_model(hp_tiny):
    hp = default_hparams()
    hp.parse(TINY + ",input_type='mulaw-quantize',quantize_channels=256,out_channels=256")
    B, Tc = 2, 3
    hop = hp.get_hop_size()
    rng = np.random.default_rng(0)
    batch = dict(
        audio=rng.integers(0, 256, (B, Tc * hop)).astype(np.int32),
        input_lengths=np.asarray([Tc * hop, Tc * hop], np.int32),
        mel_conditions=rng.uniform(0, 1, (B, Tc, hp.num_mels)).astype(np.float32),
    )
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    jt = jax.jit(partial(wt.train_step, hp=hp))
    state, m = jt(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m['loss']))
    # CE of untrained uniform model ≈ log(256)
    assert abs(float(m['loss']) - np.log(256)) < 1.0
    # generation returns ids
    out = wt.generate(state.ema_params, hp, jax.random.PRNGKey(1),
                      jnp.asarray(batch['mel_conditions']))
    assert out['audio'].dtype in (jnp.int32, jnp.int64)
    assert int(out['audio'].max()) < 256


def test_distribution_losses_sane():
    rng = jax.random.PRNGKey(0)
    B, T = 2, 50
    y = jax.random.uniform(rng, (B, T), minval=-0.9, maxval=0.9)
    # gaussian centered at target with small scale → small loss
    good = jnp.stack([y, jnp.full((B, T), -5.0)], axis=-1)
    bad = jnp.stack([jnp.zeros((B, T)), jnp.full((B, T), 2.0)], axis=-1)
    assert float(dist.gaussian_mle_loss(good, y, 65536)) < float(dist.gaussian_mle_loss(bad, y, 65536))
    # MoL: perfect mean, tight scale → lower loss than diffuse
    nr = 10
    logits = jnp.zeros((B, T, nr))
    means_good = jnp.repeat(y[..., None], nr, axis=-1)
    tight = jnp.concatenate([logits, means_good, jnp.full((B, T, nr), -7.0)], axis=-1)
    diffuse = jnp.concatenate([logits, jnp.zeros((B, T, nr)), jnp.full((B, T, nr), 0.0)], axis=-1)
    assert float(dist.discretized_mix_logistic_loss(tight, y, 256)) < \
        float(dist.discretized_mix_logistic_loss(diffuse, y, 256))
    # sampling stays in range
    s = dist.sample_from_discretized_mix_logistic(tight, rng)
    assert float(jnp.abs(s).max()) <= 1.0


def test_gaussian_cdf_loss():
    rng = jax.random.PRNGKey(0)
    y = jax.random.uniform(rng, (2, 20), minval=-0.5, maxval=0.5)
    y_hat = jnp.stack([y, jnp.full((2, 20), -4.0)], axis=-1)
    loss = dist.gaussian_mle_loss(y_hat, y, 65536, use_cdf=True)
    assert np.isfinite(float(loss))
    # CDF loss is non-negative (probability ≤ 1)
    assert float(loss) >= 0.0
