"""Tacotron train/eval steps: pure jitted functions over a device mesh.

TPU-native replacement of the reference's 3-phase graph protocol + session loop
(reference tacotron/models/tacotron.py:273-463, tacotron/train.py:114-239): a single
`train_step = jit(value_and_grad + optax update)` with GSPMD batch sharding; gradient
averaging across devices is XLA's all-reduce instead of in-graph tower math.
"""

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from ..config import Hparams
from ..models.tacotron.losses import compute_losses
from ..models.tacotron.model import Tacotron
from ..parallel import mesh as mesh_lib
from . import schedules


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: Any


def make_optimizer(hp: Hparams) -> optax.GradientTransformation:
    """Adam + clipped-exponential LR + global-norm clip (reference tacotron.py:371-437).

    Fine-tuning freezes encoder + embedding (reference tacotron.py:401)."""
    tx = optax.chain(
        optax.clip_by_global_norm(1.0) if hp.tacotron_clip_gradients else optax.identity(),
        optax.adam(learning_rate=lambda step: schedules.tacotron_learning_rate(hp, step),
                   b1=hp.tacotron_adam_beta1, b2=hp.tacotron_adam_beta2,
                   eps=hp.tacotron_adam_epsilon),
    )
    if hp.tacotron_fine_tuning:
        def trainable(path_tuple) -> bool:
            name = '/'.join(str(getattr(p, 'key', p)) for p in path_tuple).lower()
            return not ('inputs_embedding' in name or 'encoder_' in name)

        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda p, _: 'train' if trainable(p) else 'freeze', params)
        tx = optax.multi_transform({'train': tx, 'freeze': optax.set_to_zero()},
                                   label_fn)
    return tx


def create_train_state(hp: Hparams, rng: jax.Array, example_batch: Dict[str, Any],
                       dtype=jnp.float32) -> TrainState:
    hp.freeze()  # hp is a jit static key from here on; mutation would go stale
    model = Tacotron(hp, dtype=dtype)
    init_rngs = {'params': rng,
                 'dropout': jax.random.fold_in(rng, 1),
                 'zoneout': jax.random.fold_in(rng, 2),
                 'teacher': jax.random.fold_in(rng, 3)}
    # jit the init: eager scan dispatch is orders of magnitude slower than compiled
    init_fn = jax.jit(partial(model.init, deterministic=False))
    variables = init_fn(init_rngs, example_batch['inputs'],
                        example_batch['input_lengths'],
                        mel_targets=example_batch['mel_targets'])
    params = variables['params']
    batch_stats = variables.get('batch_stats', core.FrozenDict())
    tx = make_optimizer(hp)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params))


def train_step(state: TrainState, batch: Dict[str, Any], rng: jax.Array,
               hp: Hparams, dtype=jnp.float32) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step. Pure; jit with static (hp, dtype)."""
    model = Tacotron(hp, dtype=dtype)
    tx = make_optimizer(hp)
    step_rng = jax.random.fold_in(rng, state.step)
    rngs = {'dropout': step_rng,
            'zoneout': jax.random.fold_in(step_rng, 1),
            'teacher': jax.random.fold_in(step_rng, 2)}
    tfr = schedules.teacher_forcing_ratio(hp, state.step)

    def loss_fn(params):
        outputs, mutated = model.apply(
            {'params': params, 'batch_stats': state.batch_stats},
            batch['inputs'], batch['input_lengths'],
            mel_targets=batch['mel_targets'],
            deterministic=False, teacher_forcing_ratio=tfr,
            rngs=rngs, mutable=['batch_stats'])
        total, metrics = compute_losses(outputs, batch, params, hp)
        return total, (metrics, mutated['batch_stats'])

    (loss, (metrics, new_batch_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics['grad_norm'] = optax.global_norm(grads)
    metrics['learning_rate'] = schedules.tacotron_learning_rate(hp, state.step)
    metrics['teacher_forcing_ratio'] = tfr
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_batch_stats, opt_state=new_opt_state)
    return new_state, metrics


def eval_step(state: TrainState, batch: Dict[str, Any], rng: jax.Array,
              hp: Hparams, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Evaluation forward pass. natural_eval forces ratio 0 (pure autoregressive);
    otherwise eval uses the SAME teacher-forcing ratio as training at this step
    (reference helpers.py:100-107)."""
    model = Tacotron(hp, dtype=dtype)
    rngs = {'dropout': rng, 'zoneout': jax.random.fold_in(rng, 1),
            'teacher': jax.random.fold_in(rng, 2)}
    tfr = (jnp.float32(0.0) if hp.tacotron_natural_eval
           else schedules.teacher_forcing_ratio(hp, state.step))
    outputs = model.apply({'params': state.params, 'batch_stats': state.batch_stats},
                          batch['inputs'], batch['input_lengths'],
                          mel_targets=batch['mel_targets'],
                          deterministic=True, teacher_forcing_ratio=tfr, rngs=rngs)
    _, metrics = compute_losses(outputs, batch, state.params, hp)
    metrics['mel_outputs'] = outputs['mel_outputs']
    metrics['alignments'] = outputs['alignments']
    metrics['stop_token_prediction'] = outputs['stop_token_prediction']
    if 'linear_outputs' in outputs:
        metrics['linear_outputs'] = outputs['linear_outputs']
    return metrics


def resolve_compute_dtype(hp: Hparams):
    """hp.compute_dtype, applied on accelerators only (CPU tests/smokes stay f32:
    emulated bf16 is slower and buys nothing there)."""
    on_accel = jax.devices()[0].platform in ('tpu', 'axon', 'gpu')
    return (jnp.bfloat16 if (on_accel and hp.compute_dtype == 'bfloat16')
            else jnp.float32)


def make_jitted_steps(hp: Hparams, mesh, dtype=None):
    """Compile train/eval steps with explicit shardings over the mesh: state
    replicated, batch sharded on the data axis. dtype=None resolves
    hp.compute_dtype (bf16 on TPU — the production training precision)."""
    if dtype is None:
        dtype = resolve_compute_dtype(hp)
    hp.freeze()
    rep = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharding(mesh)

    jt = jax.jit(partial(train_step, hp=hp, dtype=dtype),
                 in_shardings=(rep, data, rep), out_shardings=(rep, rep),
                 donate_argnums=(0,))
    je = jax.jit(partial(eval_step, hp=hp, dtype=dtype),
                 in_shardings=(rep, data, rep), out_shardings=rep)
    return jt, je
