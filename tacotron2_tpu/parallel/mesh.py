"""Device mesh + sharding layer — the framework's distributed backend.

TPU-native replacement for the reference's in-graph tower replication with CPU
parameter server (SURVEY §2.9/§2.10; reference tacotron.py:103, wavenet.py:268):
a `jax.sharding.Mesh` over ('data', 'model') axes, NamedSharding specs, and GSPMD
partitioning under jit. Gradient all-reduce (the reference's hand-rolled tower
averaging, tacotron.py:405-423) becomes an XLA collective inserted automatically.
"""

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Hparams

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(hp: Optional[Hparams] = None, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh.

    By default all devices go on the data axis (the reference is DP-only); setting
    hp.mesh_model_axis > 1 carves a model-parallel dimension for WaveNet channel
    sharding.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    model = 1 if hp is None else max(1, hp.mesh_model_axis)
    data = hp.mesh_data_axis if (hp is not None and hp.mesh_data_axis > 0) else n // model
    if data * model != n:
        raise ValueError(f'mesh {data}x{model} does not cover {n} devices')
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), tree)
