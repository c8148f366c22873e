import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.models.wavenet.model import WaveNet
from tacotron2_tpu.training import wavenet_trainer as wt
from tacotron2_tpu.training.weight_norm_init import data_dependent_init

TINY = ("layers=4,stacks=2,residual_channels=16,gate_channels=32,skip_out_channels=16,"
        "upsample_scales=[4,8],hop_size=32,win_size=128,n_fft=256,"
        "wavenet_weight_normalization=True,wavenet_init_scale=1.0")


def make_batch(hp, B=2, Tc=8, seed=0):
    rng = np.random.default_rng(seed)
    hop = hp.get_hop_size()
    return dict(audio=rng.uniform(-0.5, 0.5, (B, Tc * hop)).astype(np.float32),
                input_lengths=np.full((B,), Tc * hop, np.int32),
                mel_conditions=rng.uniform(0, 1, (B, Tc, hp.num_mels)).astype(np.float32))


def test_weight_norm_reparam_and_init():
    hp = default_hparams()
    hp.parse(TINY)
    batch = make_batch(hp)
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    # wn_g params exist
    assert 'wn_g' in state.params['residual_block_1']['causal_conv']

    new_params = data_dependent_init(state.params, batch, hp)
    # after init, each conv's output over this batch is ~zero-mean unit-std
    model = WaveNet(hp)
    x = model.encode_input(jnp.asarray(batch['audio']))
    _, inter = model.apply({'params': new_params}, x,
                           jnp.asarray(batch['mel_conditions']), None, train=False,
                           mutable=[], capture_intermediates=True)
    inter = inter.get('intermediates', inter)
    y = np.asarray(inter['residual_block_2']['causal_conv']['__call__'][0], np.float32)
    assert abs(y.mean()) < 0.05
    assert abs(y.std() - 1.0) < 0.15
    y2 = np.asarray(inter['skip_conv1']['__call__'][0], np.float32)
    assert abs(y2.mean()) < 0.05 and abs(y2.std() - 1.0) < 0.15
    # upsample convs are weight-normalized too (reference wavenet.py:194-195)
    assert 'wn_g' in state.params['upsample_network']['subpixel_conv_1']
    y3 = np.asarray(inter['upsample_network']['subpixel_conv_2']['__call__'][0],
                    np.float32)
    assert abs(y3.mean()) < 0.05 and abs(y3.std() - 1.0) < 0.15


def test_weight_norm_training_works():
    hp = default_hparams()
    hp.parse(TINY)
    batch = make_batch(hp)
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    jt = jax.jit(partial(wt.train_step, hp=hp))
    state, m0 = jt(state, batch, jax.random.PRNGKey(0))
    for _ in range(10):
        state, m = jt(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m['loss']))
    assert float(m['loss']) < float(m0['loss'])
