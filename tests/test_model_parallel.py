"""WaveNet tensor-parallel training over a (data, model) mesh on 8 virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.parallel import mesh as mesh_lib
from tacotron2_tpu.parallel.sharding_rules import (shard_wavenet_state,
                                                   wavenet_param_shardings)
from tacotron2_tpu.training import wavenet_trainer as wt

TINY = ("layers=4,stacks=2,residual_channels=16,gate_channels=32,skip_out_channels=16,"
        "upsample_scales=[4,8],hop_size=32,win_size=128,n_fft=256,num_freq=129,"
        "wavenet_batch_size=4")


def make_batch(hp, B=4, Tc=6, seed=0):
    rng = np.random.default_rng(seed)
    hop = hp.get_hop_size()
    return dict(
        audio=rng.uniform(-0.5, 0.5, (B, Tc * hop)).astype(np.float32),
        input_lengths=np.full((B,), Tc * hop, np.int32),
        mel_conditions=rng.uniform(0, 1, (B, Tc, hp.num_mels)).astype(np.float32),
    )


def test_tp_train_step_matches_dp():
    hp = default_hparams()
    hp.parse(TINY)
    hp.mesh_model_axis = 2
    hp.mesh_data_axis = 4
    batch = make_batch(hp)
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(1)

    # single-device reference step
    from functools import partial
    ref_state, ref_metrics = jax.jit(partial(wt.train_step, hp=hp))(state, batch, rng)
    ref_loss = float(ref_metrics['loss'])

    # (4 data, 2 model) mesh, gate-sharded params
    mesh = mesh_lib.make_mesh(hp)
    assert dict(mesh.shape) == {'data': 4, 'model': 2}
    tx = wt.make_optimizer(hp)
    state_tp = shard_wavenet_state(state, mesh, tx)
    # gate kernels really are sharded over the model axis
    k = state_tp.params['residual_block_1']['causal_conv']['kernel']
    assert len({s.device for s in k.addressable_shards}) >= 2
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(hp.kernel_size, hp.residual_channels, hp.gate_channels // 2)}

    sb = mesh_lib.shard_batch(batch, mesh)
    tp_step = wt.make_tp_train_step(hp, mesh)
    state_tp2, metrics = tp_step(state_tp, sb, rng)
    tp_loss = float(metrics['loss'])
    assert np.isfinite(tp_loss)
    # same math as the single-device step (f32, deterministic dropout rng)
    np.testing.assert_allclose(tp_loss, ref_loss, rtol=1e-4)
    # params update equivalently
    ref_k = np.asarray(ref_state.params['residual_block_1']['causal_conv']['kernel'])
    tp_k = np.asarray(jax.device_get(state_tp2.params['residual_block_1']['causal_conv']['kernel']))
    np.testing.assert_allclose(tp_k, ref_k, atol=1e-5)


def test_sharding_spec_fallback_on_indivisible():
    hp = default_hparams()
    hp.parse(TINY + ',gate_channels=30,residual_channels=16')  # 30 not divisible by 4
    hp.mesh_model_axis = 4
    hp.mesh_data_axis = 2
    batch = make_batch(hp)
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    mesh = mesh_lib.make_mesh(hp)
    shardings = wavenet_param_shardings(state.params, mesh)
    spec = shardings['residual_block_1']['causal_conv']['kernel'].spec
    assert spec == jax.sharding.PartitionSpec()  # fell back to replicated


def test_data_parallel_generation():
    """Sharded Pallas AR generation over the mesh data axis (interpret mode on CPU)."""
    from tacotron2_tpu.ops.pallas import wavenet_ar
    hp = default_hparams()
    hp.parse("layers=4,stacks=2,residual_channels=8,gate_channels=16,skip_out_channels=8,"
             "upsample_scales=[4,8],hop_size=32,win_size=128,n_fft=256")
    hp.mesh_model_axis = 1
    hp.mesh_data_axis = 4
    assert wavenet_ar.supports(hp)
    batch = make_batch(hp, B=4, Tc=4)
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    mesh = mesh_lib.make_mesh(hp, devices=jax.devices()[:4])
    c = jnp.asarray(batch['mel_conditions'])
    out = wt.generate_data_parallel(state.ema_params, hp, jax.random.PRNGKey(1), c, mesh)
    assert out['audio'].shape == (4, 4 * hp.get_hop_size())
    assert np.isfinite(np.asarray(out['audio'])).all()
    # each shard ran on its own device
    assert len({s.device for s in out['audio'].addressable_shards}) == 4


def test_hybrid_multislice_mesh_layout():
    """mesh_num_slices>1 must produce a slice-major layout: the model axis stays
    inside one slice (ICI), the data axis's outer dim walks across slices (DCN)."""
    hp = default_hparams()
    hp.parse(TINY)
    hp.mesh_model_axis = 2
    hp.mesh_data_axis = 4
    hp.mesh_num_slices = 2
    mesh = mesh_lib.make_mesh(hp)
    assert dict(mesh.shape) == {'data': 4, 'model': 2}
    # contiguous-group simulation: devices 0-3 stand in for slice 0, 4-7 slice 1
    ids = np.array([[d.id for d in row] for row in mesh.devices])
    slice_of = ids // 4
    # every model-axis row lives inside one slice
    assert all(len(set(row)) == 1 for row in slice_of), slice_of
    # the data axis crosses slices: first half slice 0, second half slice 1
    assert list(slice_of[:, 0]) == [0, 0, 1, 1], slice_of

    # model axis wider than a slice must be rejected (TP may not cross DCN)
    hp_bad = default_hparams()
    hp_bad.parse(TINY)
    hp_bad.mesh_model_axis = 8
    hp_bad.mesh_data_axis = 1
    hp_bad.mesh_num_slices = 2
    with pytest.raises(ValueError, match='inside one slice'):
        mesh_lib.make_mesh(hp_bad)


def test_hybrid_multislice_train_step_parity():
    """TP+DP train step on a 2-slice hybrid mesh matches the single-device step."""
    hp = default_hparams()
    hp.parse(TINY)
    hp.mesh_model_axis = 2
    hp.mesh_data_axis = 4
    hp.mesh_num_slices = 2
    batch = make_batch(hp)
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(1)
    from functools import partial
    _, ref_metrics = jax.jit(partial(wt.train_step, hp=hp))(state, batch, rng)

    mesh = mesh_lib.make_mesh(hp)
    state_tp = shard_wavenet_state(state, mesh, wt.make_optimizer(hp))
    sb = mesh_lib.shard_batch(batch, mesh)
    _, metrics = wt.make_tp_train_step(hp, mesh)(state_tp, sb, rng)
    np.testing.assert_allclose(float(metrics['loss']), float(ref_metrics['loss']),
                               rtol=1e-4)
