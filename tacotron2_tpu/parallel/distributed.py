"""Multi-process (multi-host / multi-slice) runtime initialization.

The reference has no distributed backend at all — its "multi-GPU" is in-graph tower
replication in one process (SURVEY §2.10). The TPU-native equivalent is a
first-class component: `jax.distributed.initialize` connects the per-host processes,
after which `jax.devices()` spans the whole pod, one `Mesh` covers ICI (and DCN for
multi-slice), and GSPMD/collectives handle all cross-chip traffic. The data pipeline
stays process-local: each host loads only its shard (loader `process_shard`) and
`mesh.shard_batch` assembles global arrays from the per-host pieces.

v5e pod recipe (one command per host; TPU VMs auto-detect all three parameters):

    T2_DISTRIBUTED=1 python train.py --model='Tacotron-2' --hparams='...'

On GPU/CPU clusters, set the standard JAX env instead:
    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i
"""

import os
from typing import Optional

import jax

from ..utils.infolog import log


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Connect this process to the distributed runtime when configured.

    Triggered by T2_DISTRIBUTED=1 (TPU pods: zero-config auto-detection) or by the
    standard JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID variables.
    Safe to call multiple times and in single-process runs (no-op). Must run before
    any JAX backend initialization to take effect.

    Returns True when a multi-process runtime is (already) active."""
    if jax.process_count() > 1:
        return True

    env = os.environ
    coordinator_address = coordinator_address or env.get('JAX_COORDINATOR_ADDRESS')
    num_processes = num_processes if num_processes is not None else (
        int(env['JAX_NUM_PROCESSES']) if 'JAX_NUM_PROCESSES' in env else None)
    process_id = process_id if process_id is not None else (
        int(env['JAX_PROCESS_ID']) if 'JAX_PROCESS_ID' in env else None)

    want = env.get('T2_DISTRIBUTED') == '1' or coordinator_address is not None
    if not want:
        return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        log('jax.distributed initialized: process {}/{} ({} global devices)'.format(
            jax.process_index(), jax.process_count(), jax.device_count()))
        return jax.process_count() > 1
    except Exception as e:
        log(f'jax.distributed.initialize failed ({e}); continuing single-process')
        return False


def process_shard() -> Optional[tuple]:
    """(process_index, process_count) for the loader, or None single-process."""
    if jax.process_count() > 1:
        return (jax.process_index(), jax.process_count())
    return None
