"""WaveNet train/eval steps (reference wavenet_vocoder/models/wavenet.py:476-648,
wavenet_vocoder/train.py).

Optimization parity: Adam with noam/exponential LR, per-gradient norm clip (100) +
value clip (±5) (reference wavenet.py:586-596), and an exponential moving average of
all trainable parameters maintained in the train state (replacing the reference's
`ema.apply` op chain + shadow saver, wavenet.py:601-613 / train.py:67-85).
"""

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core, struct

from ..config import Hparams
from ..models.wavenet.model import WaveNet, compute_wavenet_loss

from ..parallel import mesh as mesh_lib
from . import schedules


class WaveNetTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    ema_params: core.FrozenDict
    opt_state: Any


def make_optimizer(hp: Hparams) -> optax.GradientTransformation:
    transforms = []
    if hp.wavenet_clip_gradients:
        # reference clips each gradient's norm to 100 then values to ±5
        def per_grad_clip(grads):
            def clip_one(g):
                norm = jnp.sqrt(jnp.sum(jnp.square(g)) + 1e-12)
                g = g * jnp.minimum(1.0, hp.wavenet_gradient_max_norm / norm)
                return jnp.clip(g, -hp.wavenet_gradient_max_value,
                                hp.wavenet_gradient_max_value)
            return jax.tree_util.tree_map(clip_one, grads)
        transforms.append(optax.stateless(lambda updates, params: per_grad_clip(updates)))
    transforms.append(optax.adam(
        learning_rate=lambda step: schedules.wavenet_learning_rate(hp, step),
        b1=hp.wavenet_adam_beta1, b2=hp.wavenet_adam_beta2,
        eps=hp.wavenet_adam_epsilon))
    return optax.chain(*transforms)


def _batch_mask(batch: Dict[str, Any]) -> jnp.ndarray:
    T = batch['audio'].shape[1]
    return (jnp.arange(T)[None, :] < batch['input_lengths'][:, None]).astype(jnp.float32)


def create_train_state(hp: Hparams, rng: jax.Array, example_batch: Dict[str, Any],
                       dtype=jnp.float32) -> WaveNetTrainState:
    hp.freeze()  # hp is a jit/lru_cache key from here on
    model = WaveNet(hp, dtype=dtype)
    x = model.encode_input(jnp.asarray(example_batch['audio']))

    def init_fn():
        return model.init({'params': rng, 'dropout': jax.random.fold_in(rng, 1)},
                          x, example_batch.get('mel_conditions'),
                          example_batch.get('speaker_ids'), train=False)
    variables = jax.jit(init_fn)()
    params = variables['params']
    tx = make_optimizer(hp)
    # EMA starts as a genuine copy — aliased buffers break jit donation
    ema = jax.tree_util.tree_map(lambda x: x.copy(), params)
    return WaveNetTrainState(step=jnp.zeros((), jnp.int32), params=params,
                             ema_params=ema, opt_state=tx.init(params))


def train_step(state: WaveNetTrainState, batch: Dict[str, Any], rng: jax.Array,
               hp: Hparams, dtype=jnp.float32
               ) -> Tuple[WaveNetTrainState, Dict[str, jnp.ndarray]]:
    model = WaveNet(hp, dtype=dtype)
    tx = make_optimizer(hp)
    step_rng = jax.random.fold_in(rng, state.step)
    mask = _batch_mask(batch)
    y = batch['audio']
    c = batch.get('mel_conditions')
    g = batch.get('speaker_ids')

    def loss_fn(params):
        x = model.encode_input(y)
        y_hat = model.apply({'params': params}, x, c, g, train=True,
                            rngs={'dropout': step_rng})
        return compute_wavenet_loss(hp, y_hat, y, mask)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    # EMA after the update, matching ema.apply chained after adam (wavenet.py:601-613)
    decay = hp.wavenet_ema_decay
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), state.ema_params, new_params)
    metrics = dict(loss=loss, grad_norm=optax.global_norm(grads),
                   learning_rate=schedules.wavenet_learning_rate(hp, state.step))
    new_state = state.replace(step=state.step + 1, params=new_params,
                              ema_params=new_ema, opt_state=new_opt_state)
    return new_state, metrics


def eval_teacher_forced_step(state: WaveNetTrainState, batch: Dict[str, Any],
                             hp: Hparams, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Teacher-forced eval loss on the raw (live) weights — the reference's eval
    model shares variables with the train graph (wavenet_vocoder/train.py:168-177);
    EMA weights are used only for AR generation/synthesis."""
    model = WaveNet(hp, dtype=dtype)
    mask = _batch_mask(batch)
    y = batch['audio']
    x = model.encode_input(y)
    y_hat = model.apply({'params': state.params}, x, batch.get('mel_conditions'),
                        batch.get('speaker_ids'), train=False)
    return dict(loss=compute_wavenet_loss(hp, y_hat, y, mask), y_hat=y_hat)


from functools import lru_cache


@lru_cache(maxsize=8)
def _fast_generate_fn(hp: Hparams, dtype, interpret: bool, return_params: bool,
                      with_g: bool, with_nll: bool = False):
    """Jitted pallas-path generator; cached so repeat calls don't retrace."""
    from ..ops.pallas import wavenet_ar
    model = WaveNet(hp, dtype=dtype)

    @jax.jit
    def fn(params, c, g, rng, y=None):
        c_up = model.apply({'params': params}, c,
                           method=WaveNet.upsample_conditioning)
        k_noise, k_seed = jax.random.split(rng)
        noise = wavenet_ar.make_noise(hp, k_noise, c.shape[0], c_up.shape[1])
        seed = jax.random.randint(k_seed, (1,), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)  # in-kernel PRNG (big vocab)
        weights = wavenet_ar.pack_params(params, hp)
        g_cond = None
        if with_g:
            g_emb = model.apply({'params': params}, g,
                                method=WaveNet._embed_global)
            g_cond = wavenet_ar.pack_global(params, hp, g_emb)
        y_eval = None
        if with_nll:
            # pad/trim ground truth to the generated length for in-kernel scoring
            T = c_up.shape[1]
            y_eval = jnp.zeros((c.shape[0], T), jnp.int32)
            y_eval = y_eval.at[:, :min(T, y.shape[1])].set(
                y[:, :T].astype(jnp.int32))
        return wavenet_ar.generate_ar(weights, c_up, noise, hp, g_cond=g_cond,
                                      interpret=interpret,
                                      return_params=return_params, seed=seed,
                                      y_eval=y_eval)
    return fn


@lru_cache(maxsize=8)
def _scan_generate_fn(hp: Hparams, dtype, with_c: bool, with_g: bool,
                      with_targets: bool, synthesis_length: Optional[int]):
    model = WaveNet(hp, dtype=dtype)

    @jax.jit
    def fn(params, rng, c, g, targets):
        return model.apply({'params': params}, rng, c, g, synthesis_length, None,
                           targets, method=WaveNet.incremental)
    return fn


def generate(params, hp: Hparams, rng: jax.Array, c: Optional[jnp.ndarray],
             g: Optional[jnp.ndarray] = None, synthesis_length: Optional[int] = None,
             targets: Optional[jnp.ndarray] = None, dtype=jnp.float32,
             use_pallas: Optional[bool] = None,
             return_params: bool = True,
             y_eval: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """Autoregressive generation.

    Dispatches to the on-chip Pallas AR kernel when the config supports it (scalar
    or small-vocab categorical input, local conditioning, free-running); otherwise
    the lax.scan path. Batches larger than the kernel's B_MAX are tiled over
    B_MAX-sized kernel launches (padding the last tile) instead of silently losing
    the kernel speedup. Set use_pallas=False to force the scan path.

    y_eval (categorical only): (B, T) int32 ground-truth ids — the kernel scores
    its own autoregressive params against them in place and the result carries
    'nll' (B, T) per-step -log softmax(params)[y]. This is how big-vocab natural
    eval stays on the kernel: at Q=65536 the full params array is tens of GB and
    cannot leave the chip (or even be allocated) on ANY path."""
    from ..ops.pallas import wavenet_ar

    hp.freeze()  # lru_cache below keys on hp identity
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    if y_eval is not None:
        assert hp.input_type == 'mulaw-quantize' and wavenet_ar.supports(hp)
        assert not return_params, 'y_eval replaces params streaming'
        fn = _fast_generate_fn(hp, dtype, not on_tpu, False,
                               g is not None and hp.gin_channels > 0,
                               with_nll=True)
        audio, nll = fn(params, c, g, rng, y=y_eval)
        return dict(audio=audio, nll=nll)
    if use_pallas is None:
        use_pallas = (on_tpu and targets is None and c is not None
                      and wavenet_ar.supports(hp)
                      # big-vocab categorical can't stream params back — eval
                      # paths that need them pass y_eval (in-kernel NLL) instead
                      and not (return_params and wavenet_ar.is_big_vocab(hp)))
    if use_pallas:
        fn = _fast_generate_fn(hp, dtype, not on_tpu, return_params,
                               g is not None and hp.gin_channels > 0)
        B = c.shape[0]
        bm = wavenet_ar.max_batch(hp)
        if B <= bm:
            audio, dist_params = fn(params, c, g, rng)
        else:
            audio_t, params_t = [], []
            for i in range(0, B, bm):
                c_i, g_i = c[i:i + bm], (g[i:i + bm] if g is not None else None)
                n = c_i.shape[0]
                if n < bm:  # pad the tail tile: one compiled shape for all tiles
                    c_i = jnp.concatenate(
                        [c_i, jnp.repeat(c_i[-1:], bm - n, axis=0)])
                    if g_i is not None:
                        g_i = jnp.concatenate(
                            [g_i, jnp.repeat(g_i[-1:], bm - n, axis=0)])
                a_i, p_i = fn(params, c_i, g_i, jax.random.fold_in(rng, i))
                audio_t.append(a_i[:n])
                if p_i is not None:
                    params_t.append(p_i[:n])
            audio = jnp.concatenate(audio_t)
            dist_params = jnp.concatenate(params_t) if params_t else None
        out = dict(audio=audio)
        if dist_params is not None:
            out['params'] = dist_params
        return out
    fn = _scan_generate_fn(hp, dtype, c is not None, g is not None,
                           targets is not None, synthesis_length)
    return fn(params, rng, c, g, targets)


class StreamVocoder:
    """Prepared streaming vocoder: all per-model work (device_put of the weight
    tree, kernel weight packing, jitting the conditioning upsampler) happens ONCE
    at construction, so a served request pays only the per-chunk AR kernel work.
    `stream_vocode` constructs one per call; long-lived servers keep one around
    (inference/streaming.StreamingSynthesizer does)."""

    def __init__(self, params, hp: Hparams, dtype=jnp.float32,
                 interpret: Optional[bool] = None):
        from ..ops.pallas import wavenet_ar
        self._ar = wavenet_ar
        hp.freeze()
        assert wavenet_ar.supports(hp), 'streaming requires a kernel-supported config'
        on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
        self._interpret = (not on_tpu) if interpret is None else interpret
        self._hp = hp
        # orbax-restored trees are host numpy; without this every upsample call
        # re-ships the weights over the host link (the round-4 TTFA long pole)
        self._params = jax.device_put(params)
        self._model = WaveNet(hp, dtype=dtype)
        self._upsample = jax.jit(lambda p, cc: self._model.apply(
            {'params': p}, cc, method=WaveNet.upsample_conditioning))
        self._weights = wavenet_ar.pack_params(self._params, hp)
        self._g_cache = {}

    def _global_cond(self, g: Optional[jnp.ndarray]):
        if g is None or self._hp.gin_channels <= 0:
            return None
        key = tuple(np.asarray(g).ravel().tolist())
        if key not in self._g_cache:
            g_emb = self._model.apply({'params': self._params}, g,
                                      method=WaveNet._embed_global)
            self._g_cache[key] = self._ar.pack_global(self._params, self._hp, g_emb)
        return self._g_cache[key]

    def stream(self, rng: jax.Array, c: jnp.ndarray,
               g: Optional[jnp.ndarray] = None, chunk_samples: int = 16384,
               first_chunk_samples: int = 4096):
        """Yield waveform chunks for one conditioning batch as they are generated.

        The AR kernel carries its generation state (per-layer ring buffers,
        next-step h, absolute step offset) across calls, so the chunk sequence is
        bit-identical to one long call with the same per-chunk noise — but the
        first audio arrives after `first_chunk_samples` of samples instead of
        after the whole utterance, and memory stays constant for unbounded-length
        synthesis. Chunk sizes must be multiples of the kernel CHUNK (128
        samples); only the final (ragged) chunk may be unaligned.

        The reference's incremental path has no streaming analog (one monolithic
        tf.while_loop over all samples, reference wavenet.py:888-895)."""
        wavenet_ar, hp = self._ar, self._hp
        assert chunk_samples % wavenet_ar.CHUNK == 0
        assert first_chunk_samples % wavenet_ar.CHUNK == 0
        c_up = self._upsample(self._params, c)
        g_cond = self._global_cond(g)
        B, T = c_up.shape[0], c_up.shape[1]
        assert B <= wavenet_ar.max_batch(hp)
        state = None
        pos = 0
        key = rng
        while pos < T:
            n = first_chunk_samples if pos == 0 else chunk_samples
            n = min(n, T - pos)
            last = pos + n >= T
            key, k_noise, k_seed = jax.random.split(key, 3)
            noise = wavenet_ar.make_noise(hp, k_noise, B, n)
            seed = jax.random.randint(k_seed, (1,), 0, jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            out = wavenet_ar.generate_ar(self._weights, c_up[:, pos:pos + n],
                                         noise, hp, g_cond=g_cond,
                                         interpret=self._interpret,
                                         return_params=False, seed=seed,
                                         state_in=state, return_state=not last)
            if last:
                audio, _ = out
            else:
                audio, _, state = out
            pos += n
            yield audio


def stream_vocode(params, hp: Hparams, rng: jax.Array, c: jnp.ndarray,
                  g: Optional[jnp.ndarray] = None, chunk_samples: int = 16384,
                  first_chunk_samples: int = 4096, dtype=jnp.float32,
                  interpret: Optional[bool] = None):
    """One-shot streaming vocode (see StreamVocoder.stream). Servers should hold
    a StreamVocoder instead: this wrapper re-packs weights every call."""
    voc = StreamVocoder(params, hp, dtype=dtype, interpret=interpret)
    yield from voc.stream(rng, c, g, chunk_samples=chunk_samples,
                          first_chunk_samples=first_chunk_samples)


def generate_data_parallel(params, hp: Hparams, rng: jax.Array, c: jnp.ndarray,
                           mesh) -> Dict[str, jnp.ndarray]:
    """Scale-out synthesis: shard the batch over the mesh data axis, one Pallas AR
    kernel per chip with replicated weights (aggregate throughput scales linearly).

    Requires c.shape[0] divisible by the data-axis size and a kernel-supported config.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas import wavenet_ar

    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    B = c.shape[0]
    assert B % n_data == 0, f'batch {B} not divisible by data axis {n_data}'
    assert (wavenet_ar.supports(hp) and not wavenet_ar.is_big_vocab(hp)
            and B // n_data <= wavenet_ar.B_MAX)
    model = WaveNet(hp)
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')

    def per_shard(params, c_shard, rng):
        c_up = model.apply({'params': params}, c_shard,
                           method=WaveNet.upsample_conditioning)
        noise = wavenet_ar.make_noise(hp, jax.random.fold_in(
            rng, jax.lax.axis_index(mesh_lib.DATA_AXIS)), c_shard.shape[0],
            c_up.shape[1])
        weights = wavenet_ar.pack_params(params, hp)
        audio, dist_params = wavenet_ar.generate_ar(weights, c_up, noise, hp,
                                                    interpret=not on_tpu)
        return audio, dist_params

    fn = shard_map(per_shard, mesh=mesh,
                   in_specs=(P(), P(mesh_lib.DATA_AXIS), P()),
                   out_specs=(P(mesh_lib.DATA_AXIS), P(mesh_lib.DATA_AXIS)),
                   check_vma=False)
    audio, dist_params = jax.jit(fn)(params, c, rng)
    return dict(audio=audio, params=dist_params)


def make_jitted_steps(hp: Hparams, mesh, dtype=None):
    if dtype is None:
        from .tacotron_trainer import resolve_compute_dtype
        dtype = resolve_compute_dtype(hp)
    hp.freeze()
    rep = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharding(mesh)
    jt = jax.jit(partial(train_step, hp=hp, dtype=dtype),
                 in_shardings=(rep, data, rep), out_shardings=(rep, rep),
                 donate_argnums=(0,))
    je = jax.jit(partial(eval_teacher_forced_step, hp=hp, dtype=dtype),
                 in_shardings=(rep, data), out_shardings=rep)
    return jt, je


def make_tp_train_step(hp: Hparams, mesh, dtype=jnp.float32):
    """Tensor-parallel (data x model mesh) train step.

    The state arrives pre-placed by sharding_rules.shard_wavenet_state (gate-sharded
    kernels); layouts propagate from the arguments, and GSPMD inserts the collectives
    for the row-parallel out/skip projections and the gradient all-reduce."""
    hp.freeze()
    return jax.jit(partial(train_step, hp=hp, dtype=dtype), donate_argnums=(0,))
