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


def detect_num_slices(devices) -> int:
    """Number of TPU slices spanned by `devices` (1 when the attribute is absent —
    CPU/GPU, single-slice TPU, or older jax)."""
    slices = {getattr(d, 'slice_index', None) for d in devices}
    slices.discard(None)
    return max(1, len(slices))


def _hybrid_device_array(devices, data: int, model: int, num_slices: int):
    """Slice-major (data, model) device layout for a multi-slice job.

    The data axis's outer dimension walks across slices so gradient all-reduce
    (the only cross-slice traffic under pure-DP-over-DCN) is the collective that
    rides DCN, while each model-axis group sits inside one slice's ICI. With real
    slice_index attributes we defer to mesh_utils.create_hybrid_device_mesh (which
    also optimizes the intra-slice ICI order); without them (simulation, CPU) the
    devices are grouped contiguously into `num_slices` equal slices.
    """
    if data % num_slices != 0:
        raise ValueError(f'data axis {data} not divisible by {num_slices} slices')
    per_slice_data = data // num_slices
    # defer to mesh_utils only when the hardware actually reports num_slices
    # distinct slices (CPU backends may expose slice_index but report one slice)
    if detect_num_slices(devices) == num_slices:
        from jax.experimental import mesh_utils
        return mesh_utils.create_hybrid_device_mesh(
            (per_slice_data, model), (num_slices, 1), devices=devices)
    # simulation fallback: contiguous groups stand in for slices (this matches
    # real pods' process-major device order, minus the ICI-topology optimization)
    arr = np.asarray(devices).reshape(num_slices, per_slice_data, model)
    return arr.reshape(data, model)


def make_mesh(hp: Optional[Hparams] = None, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh.

    By default all devices go on the data axis (the reference is DP-only); setting
    hp.mesh_model_axis > 1 carves a model-parallel dimension for WaveNet channel
    sharding. Multi-slice jobs (hp.mesh_num_slices > 1, or auto-detected from
    device slice_index) get a DCN-aware slice-major layout: the model axis never
    crosses a slice boundary.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    model = 1 if hp is None else max(1, hp.mesh_model_axis)
    data = hp.mesh_data_axis if (hp is not None and hp.mesh_data_axis > 0) else n // model
    if data * model != n:
        raise ValueError(f'mesh {data}x{model} does not cover {n} devices')
    num_slices = (hp.mesh_num_slices if hp is not None and hp.mesh_num_slices > 0
                  else detect_num_slices(devices))
    if num_slices > 1:
        if (n // num_slices) % model != 0:
            raise ValueError(
                f'model axis {model} does not fit inside one slice of '
                f'{n // num_slices} devices (model parallelism must stay on ICI)')
        dev_array = _hybrid_device_array(devices, data, model, num_slices)
    else:
        dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict onto the mesh, batch-axis sharded.

    Single-process: device_put the full batch. Multi-process (pod / multi-slice):
    each process passes only ITS rows (the loader's process_shard slice) and the
    global array is assembled from the per-host shards without any cross-host data
    movement (jax.make_array_from_process_local_data)."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def local_batch_slice(batch: Dict[str, Any], process_index: int,
                      process_count: int) -> Dict[str, Any]:
    """This host's contiguous rows of a global batch — the fallback for data
    sources without a native process_shard path."""
    def slc(x):
        B = x.shape[0]
        assert B % process_count == 0, f'batch {B} % processes {process_count} != 0'
        per = B // process_count
        return x[process_index * per:(process_index + 1) * per]
    return jax.tree_util.tree_map(slc, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated(mesh)), tree)
