"""Pallas AR kernel correctness (interpret mode on CPU).

The kernel is validated against the lax.scan incremental path by teacher-forcing the
scan with the kernel's own output: identical input histories must yield identical
distribution params at every step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.config import default_hparams
from tacotron2_tpu.models.wavenet.model import WaveNet
from tacotron2_tpu.ops.pallas import wavenet_ar
from tacotron2_tpu.training import wavenet_trainer as wt

TINY = ("layers=4,stacks=2,residual_channels=8,gate_channels=16,skip_out_channels=8,"
        "upsample_scales=[4,8],hop_size=32,win_size=128,n_fft=256,num_freq=129,"
        "cin_channels=80")


def _setup(hp):
    B, Tc = 2, 8
    rng = np.random.default_rng(0)
    batch = dict(audio=rng.uniform(-0.5, 0.5, (B, Tc * 32)).astype(np.float32),
                 input_lengths=np.full((B,), Tc * 32, np.int32),
                 mel_conditions=rng.uniform(0, 1, (B, Tc, 80)).astype(np.float32))
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    model = WaveNet(hp)
    c = jnp.asarray(batch['mel_conditions'])
    c_up = jax.jit(lambda p, cc: model.apply(
        {'params': p}, cc, method=WaveNet.upsample_conditioning))(state.params, c)
    return state, model, c, c_up


KT = pytest.mark.kernel_tier


@pytest.mark.parametrize('out_cfg,fused', [
    pytest.param('gaussian', False, marks=KT),
    pytest.param('mol', False, marks=KT),
    ('gaussian', True),  # default production config: the representative default-tier case
    pytest.param('mol', True, marks=KT)])
def test_kernel_matches_scan(out_cfg, fused):
    """fused=True exercises the restructured critical path (wavenet_fused_ar):
    same packed weights, algebraically identical step, one serial matmul/layer."""
    hp = default_hparams()
    hp.parse(TINY + (',out_channels=2' if out_cfg == 'gaussian' else ',out_channels=30')
             + f',wavenet_fused_ar={fused}')
    assert wavenet_ar.supports(hp)
    state, model, c, c_up = _setup(hp)

    noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(7), 2, c_up.shape[1])
    weights = wavenet_ar.pack_params(state.params, hp)
    audio_pk, params_pk = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                                 interpret=True)
    assert audio_pk.shape == (2, c_up.shape[1])
    assert float(jnp.abs(audio_pk).max()) <= 1.0

    out_scan = model.apply({'params': state.params}, jax.random.PRNGKey(7), c,
                           None, None, None, jnp.asarray(audio_pk),
                           method=WaveNet.incremental)
    diff = np.abs(np.asarray(out_scan['params']) - np.asarray(params_pk)).max()
    assert diff < 2e-2, f'kernel/scan divergence {diff}'


def test_supports_gates():
    hp = default_hparams()
    assert wavenet_ar.supports(hp)  # default: raw scalar, gaussian, cin=80
    hp2 = default_hparams().replace(gin_channels=16)
    assert wavenet_ar.supports(hp2)  # global conditioning is kernel-supported
    hp3 = default_hparams()
    hp3.input_type = 'mulaw-quantize'
    hp3.quantize_channels = 256
    hp3.out_channels = 256
    assert wavenet_ar.supports(hp3)  # small-vocab categorical is kernel-supported
    hp4 = default_hparams()
    hp4.input_type = 'mulaw-quantize'  # 16-bit vocab: in-kernel-PRNG big-vocab path
    assert hp4.quantize_channels == 2 ** 16
    hp4.out_channels = hp4.quantize_channels
    assert wavenet_ar.supports(hp4) and wavenet_ar.is_big_vocab(hp4)
    assert wavenet_ar.max_batch(hp4) == 8  # bf16 embed+head cap the batch tile
    # k=1 has no past taps: ring buffers would be 0-slot; scan path handles it
    assert not wavenet_ar.supports(default_hparams().replace(kernel_size=1))


def test_generate_dispatch_fallback():
    """wt.generate must fall back to the scan path off-TPU and for unsupported cfgs."""
    hp = default_hparams()
    hp.parse(TINY)
    state, model, c, c_up = _setup(hp)
    out = wt.generate(state.ema_params, hp, jax.random.PRNGKey(1), c, use_pallas=False)
    assert out['audio'].shape == (2, c_up.shape[1])


@pytest.mark.kernel_tier
@pytest.mark.parametrize('variant', ['weight_norm', 'no_bias'])
def test_kernel_matches_scan_special_configs(variant):
    """Weight-normalized and bias-less configs must flow through pack_params correctly."""
    hp = default_hparams()
    extra = (',wavenet_weight_normalization=True' if variant == 'weight_norm'
             else ',use_bias=False')
    hp.parse(TINY + ',out_channels=2' + extra)
    assert wavenet_ar.supports(hp)
    state, model, c, c_up = _setup(hp)
    if variant == 'weight_norm':
        # make wn_g visibly non-trivial so a reparam bug would show. The upsample
        # convs (weight-normalized too) are left alone: both paths consume the same
        # c_up, so scaling them only amplifies bf16 noise without diagnostic value.
        state = state.replace(params=jax.tree_util.tree_map_with_path(
            lambda p, x: x * 3.0 if ('wn_g' in jax.tree_util.keystr(p)
                                     and 'upsample' not in jax.tree_util.keystr(p))
            else x, state.params))

    noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(7), 2, c_up.shape[1])
    weights = wavenet_ar.pack_params(state.params, hp)
    audio_pk, params_pk = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                                 interpret=True)
    out_scan = model.apply({'params': state.params}, jax.random.PRNGKey(7), c,
                           None, None, None, jnp.asarray(audio_pk),
                           method=WaveNet.incremental)
    ref = np.asarray(out_scan['params'])
    diff = np.abs(ref - np.asarray(params_pk)).max()
    # relative tolerance: the kernel stores weights in bf16; the x3 wn_g gains blow up
    # activation magnitudes, so absolute error scales with them (a reparam BUG would
    # produce O(1) relative error)
    rel = diff / max(1e-6, np.abs(ref).max())
    assert rel < 5e-2, f"{variant}: kernel/scan relative divergence {rel} (abs {diff})"


@pytest.mark.kernel_tier
@pytest.mark.parametrize('fused', [True, False])
def test_kernel_categorical_matches_scan(fused):
    """mulaw-quantize (categorical) through the kernel: teacher-forced cross-check.
    Both layer-stack variants (fused critical path + plain chain) stay covered."""
    hp = default_hparams()
    hp.parse(TINY + ",input_type='mulaw-quantize',quantize_channels=256,out_channels=256"
             + f',wavenet_fused_ar={fused}')
    assert wavenet_ar.supports(hp)
    state, model, c, c_up = _setup_q(hp)

    noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(7), 2, c_up.shape[1])
    weights = wavenet_ar.pack_params(state.params, hp)
    audio_pk, params_pk = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                                 interpret=True)
    assert audio_pk.dtype == jnp.int32
    assert int(audio_pk.min()) >= 0 and int(audio_pk.max()) < 256

    out_scan = model.apply({'params': state.params}, jax.random.PRNGKey(7), c,
                           None, None, None, jnp.asarray(audio_pk),
                           method=WaveNet.incremental)
    diff = np.abs(np.asarray(out_scan['params']) - np.asarray(params_pk)).max()
    assert diff < 5e-2, f'categorical kernel/scan divergence {diff}'


def _setup_q(hp):
    B, Tc = 2, 8
    rng = np.random.default_rng(0)
    batch = dict(audio=rng.integers(0, hp.quantize_channels,
                                    (B, Tc * 32)).astype(np.int32),
                 input_lengths=np.full((B,), Tc * 32, np.int32),
                 mel_conditions=rng.uniform(0, 1, (B, Tc, 80)).astype(np.float32))
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    model = WaveNet(hp)
    c = jnp.asarray(batch['mel_conditions'])
    c_up = jax.jit(lambda p, cc: model.apply(
        {'params': p}, cc, method=WaveNet.upsample_conditioning))(state.params, c)
    return state, model, c, c_up


@pytest.mark.kernel_tier
@pytest.mark.parametrize('fused', [True, False])
def test_kernel_global_conditioning_matches_scan(fused):
    """Speaker-conditioned generation through the kernel: the merged (B, L*G)
    global bias (pack_global) must reproduce the scan path's per-layer conv1x1g adds
    (reference wavenet.py:151-158). Covered on both layer-stack variants."""
    hp = default_hparams()
    hp.parse(TINY + ',out_channels=2,gin_channels=16,n_speakers=4'
             + f',wavenet_fused_ar={fused}')
    assert wavenet_ar.supports(hp)
    B, Tc = 2, 8
    rng = np.random.default_rng(0)
    batch = dict(audio=rng.uniform(-0.5, 0.5, (B, Tc * 32)).astype(np.float32),
                 input_lengths=np.full((B,), Tc * 32, np.int32),
                 mel_conditions=rng.uniform(0, 1, (B, Tc, 80)).astype(np.float32),
                 speaker_ids=np.asarray([1, 3], np.int32))
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    model = WaveNet(hp)
    c = jnp.asarray(batch['mel_conditions'])
    g = jnp.asarray(batch['speaker_ids'])
    c_up = jax.jit(lambda p, cc: model.apply(
        {'params': p}, cc, method=WaveNet.upsample_conditioning))(state.params, c)

    noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(7), B, c_up.shape[1])
    weights = wavenet_ar.pack_params(state.params, hp)
    g_emb = model.apply({'params': state.params}, g, method=WaveNet._embed_global)
    g_cond = wavenet_ar.pack_global(state.params, hp, g_emb)
    audio_pk, params_pk = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                                 g_cond=g_cond, interpret=True)

    out_scan = model.apply({'params': state.params}, jax.random.PRNGKey(7), c,
                           g, None, None, jnp.asarray(audio_pk),
                           method=WaveNet.incremental)
    diff = np.abs(np.asarray(out_scan['params']) - np.asarray(params_pk)).max()
    assert diff < 2e-2, f'gin kernel/scan divergence {diff}'

    # speakerless vs speaker-conditioned output must actually differ
    audio_ng, _ = wavenet_ar.generate_ar(weights, c_up, noise, hp, interpret=True)
    assert float(np.abs(np.asarray(audio_pk) - np.asarray(audio_ng)).max()) > 1e-4


@pytest.mark.kernel_tier
def test_generate_batch_tiling(monkeypatch):
    """B > B_MAX must tile over kernel launches (padded tail) — same distribution
    params as the scan teacher-forced cross-check on the full batch."""
    monkeypatch.setattr(wavenet_ar, 'B_MAX', 4)
    hp = default_hparams()
    hp.parse(TINY + ',out_channels=2')
    B, Tc = 6, 4
    rng = np.random.default_rng(3)
    batch = dict(audio=rng.uniform(-0.5, 0.5, (2, 4 * 32)).astype(np.float32),
                 input_lengths=np.full((2,), 4 * 32, np.int32),
                 mel_conditions=rng.uniform(0, 1, (2, 4, 80)).astype(np.float32))
    state = wt.create_train_state(hp, jax.random.PRNGKey(0), batch)
    model = WaveNet(hp)
    c = jnp.asarray(rng.uniform(0, 1, (B, Tc, 80)).astype(np.float32))
    out = wt.generate(state.params, hp, jax.random.PRNGKey(1), c,
                      use_pallas=True, return_params=True)
    assert out['audio'].shape == (B, Tc * 32)
    assert out['params'].shape[0] == B

    out_scan = model.apply({'params': state.params}, jax.random.PRNGKey(7), c,
                           None, None, None, jnp.asarray(out['audio']),
                           method=WaveNet.incremental)
    diff = np.abs(np.asarray(out_scan['params']) - np.asarray(out['params'])).max()
    assert diff < 2e-2, f'tiled kernel/scan divergence {diff}'


def test_kernel_streaming_state_carry_exact():
    """Streaming: two state-carried chunks must be BIT-IDENTICAL to one long call
    with the same noise (ring buffers, next-step h, and the absolute step offset
    round-trip exactly through the state outputs)."""
    hp = default_hparams()
    hp.parse(TINY + ',out_channels=2')
    state, model, c, c_up = _setup(hp)
    T = c_up.shape[1]
    assert T == 256  # 2 x CHUNK(128)

    noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(7), 2, T)
    weights = wavenet_ar.pack_params(state.params, hp)
    full_audio, _ = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                           interpret=True, return_params=False)
    a1, _, st = wavenet_ar.generate_ar(weights, c_up[:, :128], noise[:, :128],
                                       hp, interpret=True, return_params=False,
                                       return_state=True)
    assert int(st[2]) == 128
    a2, _ = wavenet_ar.generate_ar(weights, c_up[:, 128:], noise[:, 128:],
                                   hp, interpret=True, return_params=False,
                                   state_in=st)
    streamed = np.concatenate([np.asarray(a1), np.asarray(a2)], axis=1)
    assert np.array_equal(streamed, np.asarray(full_audio))


def test_stream_vocode_generator():
    """The stream_vocode wrapper yields chunks covering the full conditioning."""
    hp = default_hparams()
    hp.parse(TINY + ',out_channels=2')
    state, model, c, c_up = _setup(hp)
    chunks = list(wt.stream_vocode(state.params, hp, jax.random.PRNGKey(3), c,
                                   chunk_samples=128, first_chunk_samples=128,
                                   interpret=True))
    assert len(chunks) == 2
    audio = np.concatenate([np.asarray(x) for x in chunks], axis=1)
    assert audio.shape == (2, c_up.shape[1])
    assert np.abs(audio).max() <= 1.0


def test_stream_vocoder_reuse_matches_one_shot():
    """A long-lived StreamVocoder (servers: weights packed once at load) streams
    the same audio as the one-shot stream_vocode wrapper, request after request."""
    hp = default_hparams()
    hp.parse(TINY + ',out_channels=2')
    state, model, c, c_up = _setup(hp)
    one_shot = np.concatenate([np.asarray(x) for x in wt.stream_vocode(
        state.params, hp, jax.random.PRNGKey(3), c,
        chunk_samples=128, first_chunk_samples=128, interpret=True)], axis=1)
    voc = wt.StreamVocoder(state.params, hp, interpret=True)
    for _ in range(2):  # second request reuses the packed weights / jitted prep
        audio = np.concatenate([np.asarray(x) for x in voc.stream(
            jax.random.PRNGKey(3), c, chunk_samples=128,
            first_chunk_samples=128)], axis=1)
        assert np.array_equal(audio, one_shot)
    # chunk 2 must actually depend on chunk 1's carried state: rerunning chunk 1
    # standalone with fresh state produces a different continuation than audio
    # (weak check: the generator consumed state without error and lengths add up)


def test_streaming_postprocess_filter_state():
    """Chunked inverse-preemphasis with carried lfilter state must equal the
    one-shot filter (inference/streaming.py applies it per chunk)."""
    from scipy.signal import lfilter

    from tacotron2_tpu.ops import audio as audio_ops
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 1000)
    full = audio_ops.inv_preemphasis(x, 0.97, True)
    zi = np.zeros(1)
    outs = []
    for i in range(0, len(x), 256):
        y, zi = lfilter([1.0], [1.0, -0.97], x[i:i + 256], zi=zi)
        outs.append(y)
    assert np.allclose(np.concatenate(outs), full, atol=1e-12)


def test_kernel_eval_nll_matches_host_ce():
    """y_eval (in-kernel natural-eval NLL) must equal the host-side masked CE
    computed from streamed params — validated on the small-vocab config where both
    paths exist. The same kernel code path serves big vocab, where params cannot
    leave the chip at all (see test_kernel_big_vocab_eval_nll)."""
    hp = default_hparams()
    hp.parse(TINY + ",input_type='mulaw-quantize',quantize_channels=256,out_channels=256")
    state, model, c, c_up = _setup_q(hp)
    T = c_up.shape[1]
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.integers(0, 256, (2, T)).astype(np.int32))

    noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(7), 2, T)
    weights = wavenet_ar.pack_params(state.params, hp)
    audio_a, params_pk = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                                interpret=True)
    audio_b, nll = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                          interpret=True, return_params=False,
                                          y_eval=y)
    # identical noise → identical generation on both calls
    assert np.array_equal(np.asarray(audio_a), np.asarray(audio_b))
    logp = jax.nn.log_softmax(params_pk, axis=-1)
    ref_nll = -np.take_along_axis(np.asarray(logp),
                                  np.asarray(y)[..., None], axis=-1)[..., 0]
    assert np.abs(ref_nll - np.asarray(nll)).max() < 1e-3


@pytest.mark.kernel_tier
def test_kernel_big_vocab_eval_nll():
    """Big-vocab natural eval stays on the kernel: greedy generation + in-kernel
    NLL vs the scan oracle's teacher-forced params CE on the same history."""
    hp = default_hparams()
    hp.parse(TINY + ",input_type='mulaw-quantize',quantize_channels=4096,"
                    "out_channels=4096")
    assert wavenet_ar.is_big_vocab(hp)
    state, model, c, c_up = _setup_q(hp)
    T = c_up.shape[1]
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.integers(0, 4096, (2, T)).astype(np.int32))

    noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(7), 2, T)
    weights = wavenet_ar.pack_params(state.params, hp)
    audio_pk, nll = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                           interpret=True, return_params=False,
                                           greedy=True, y_eval=y)
    out_scan = model.apply({'params': state.params}, jax.random.PRNGKey(7), c,
                           None, None, None, jnp.asarray(audio_pk),
                           method=WaveNet.incremental)
    logp = jax.nn.log_softmax(out_scan['params'], axis=-1)
    ref_nll = -np.take_along_axis(np.asarray(logp),
                                  np.asarray(y)[..., None], axis=-1)[..., 0]
    # kernel params are bf16-weight products; compare with a loose tolerance
    assert np.abs(ref_nll - np.asarray(nll)).max() < 0.15, \
        np.abs(ref_nll - np.asarray(nll)).max()


@pytest.mark.kernel_tier
def test_kernel_big_vocab_greedy_matches_scan():
    """Categorical vocab > 1024 (in-kernel Gumbel path, here exercised greedily so
    interpret mode needs no PRNG): the kernel's per-step argmax ids must match the
    scan path's argmax over teacher-forced params on the identical history.

    The head weights are boosted so argmax gaps dwarf bf16 rounding (the bf16
    embedding/head storage is what distinguishes the big-vocab packing). The
    stochastic (PRNG) path is validated on hardware: gumbel mean 0.577 and the
    sampling smoke in scripts/dev_prng_probe.py / dev_bigvocab_ar.py."""
    hp = default_hparams()
    hp.parse(TINY + ",input_type='mulaw-quantize',quantize_channels=4096,"
                    "out_channels=4096")
    assert wavenet_ar.supports(hp) and wavenet_ar.is_big_vocab(hp)
    assert wavenet_ar.max_batch(hp) == 8
    state, model, c, c_up = _setup_q(hp)
    state = state.replace(params=jax.tree_util.tree_map_with_path(
        lambda p, x: x * 20.0 if 'skip_conv2' in jax.tree_util.keystr(p) else x,
        state.params))

    noise = wavenet_ar.make_noise(hp, jax.random.PRNGKey(7), 2, c_up.shape[1])
    assert noise.shape[-1] == 1  # big vocab: placeholder, Gumbel is in-kernel
    weights = wavenet_ar.pack_params(state.params, hp)
    assert weights['first_w'].dtype == jnp.bfloat16  # 16 MB-class VMEM packing
    audio_pk, params_pk = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                                 interpret=True,
                                                 return_params=False, greedy=True)
    assert params_pk is None
    assert audio_pk.dtype == jnp.int32
    assert int(audio_pk.min()) >= 0 and int(audio_pk.max()) < 4096

    out_scan = model.apply({'params': state.params}, jax.random.PRNGKey(7), c,
                           None, None, None, jnp.asarray(audio_pk),
                           method=WaveNet.incremental)
    ids_scan = np.argmax(np.asarray(out_scan['params']), axis=-1)
    match = float(np.mean(ids_scan == np.asarray(audio_pk)))
    # teacher-forcing makes per-step comparisons independent (no AR compounding);
    # the only mismatches are bf16-vs-f32 argmax near-ties, whose rate is the
    # probability that the top-2 of 4096 random logits are within bf16 relative
    # error (~2-3% here, independent of the weight boost since both scale)
    assert match >= 0.93, f'greedy id agreement {match}'
