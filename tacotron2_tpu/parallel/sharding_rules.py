"""Parameter sharding rules for model parallelism.

The reference is data-parallel only (SURVEY §2.9); this module adds a WaveNet
tensor-parallel option the TF1 design could not express: gate-producing kernels are
column-sharded over the 'model' mesh axis and the out/skip kernels row-sharded, so the
gated activations stay sharded through the GLU and XLA inserts the reduce for the
residual/skip sums (GSPMD decides the exact collectives).
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def _spec_for_wavenet_param(path: str, ndim: int) -> P:
    """PartitionSpec for one WaveNet parameter, by flax path."""
    if 'causal_conv' in path and path.endswith('kernel'):
        return P(None, None, MODEL_AXIS)         # (k, R, G): shard gate
    if ('conv1x1c' in path or 'conv1x1g' in path) and path.endswith('kernel'):
        return P(None, MODEL_AXIS)               # (cin/gin, G): shard gate
    if ('causal_conv' in path or 'conv1x1c' in path or 'conv1x1g' in path) \
            and path.endswith('bias'):
        return P(MODEL_AXIS)                     # (G,)
    if ('conv1x1_out' in path or 'conv1x1_skip' in path) and path.endswith('kernel'):
        return P(MODEL_AXIS, None)               # (G/2, R|S): row-sharded
    return P()                                   # replicated


def wavenet_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree matching `params` for WaveNet tensor parallelism."""
    def one(path_tuple, leaf):
        path = '/'.join(str(getattr(p, 'key', p)) for p in path_tuple)
        spec = _spec_for_wavenet_param(path, leaf.ndim)
        # skip specs whose sharded dim is not divisible by the axis size
        axis = mesh.shape[MODEL_AXIS]
        for dim, name in enumerate(spec):
            if name == MODEL_AXIS and leaf.shape[dim] % axis != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(one, params)


def shard_wavenet_state(state, mesh: Mesh, tx) -> Any:
    """Place a WaveNetTrainState with TP params.

    Optimizer moments are re-initialized from the sharded params so they inherit the
    same layout (avoids per-step resharding); when converting a mid-training
    checkpoint to TP, Adam moments restart — the reference has no TP at all, so this
    is strictly additive capability."""
    p_sh = wavenet_param_shardings(state.params, mesh)
    rep = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(jax.device_put, state.params, p_sh)
    ema = jax.tree_util.tree_map(jax.device_put, state.ema_params, p_sh)
    opt_state = jax.jit(tx.init)(params)
    return state.replace(step=jax.device_put(state.step, rep), params=params,
                         ema_params=ema, opt_state=opt_state)
