"""Checkpoint save/restore via orbax.

TPU-native equivalent of the reference's tf.train.Saver(max_to_keep=20) flow
(reference tacotron/train.py:183,200-217,317-319) and the WaveNet EMA shadow saver
(reference wavenet_vocoder/train.py:67-85): the full TrainState pytree — including EMA
params when present — is checkpointed, so restore covers optimizer state and step.
"""

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 20):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> list:
        return sorted(self._mgr.all_steps())

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f'no checkpoint found in {self._dir}')
        # restore on host then let the caller re-place onto the mesh
        template = jax.tree_util.tree_map(
            lambda x: jax.device_get(x) if hasattr(x, 'shape') else x, state_template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.close()
