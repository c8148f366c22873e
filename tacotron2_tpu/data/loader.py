"""Host-side input pipeline for Tacotron training.

Replaces the reference's feeder-thread + tf.FIFOQueue design (reference
tacotron/feeder.py:14-260) with a plain generator + background prefetch thread.
Semantics preserved:
  - deterministic train/test split (sklearn train_test_split, random_state 1234,
    test rounded down to a batch multiple, leftovers returned to train)
  - length bucketing: read `bucket_group_batches`×batch examples, sort by mel length,
    chunk, shuffle batches (feeder.py:152-165)
  - padding values: inputs 0 (pad symbol), mel/linear -max_abs_value (symmetric),
    stop tokens 1; target lengths rounded up to a multiple of outputs_per_step

TPU-first change: batch shapes are additionally rounded up to coarse multiples
(hp.pad_text_multiple / hp.pad_mel_multiple) so XLA compiles a small, bounded set of
shapes instead of one program per batch; masks carry the true lengths.
"""

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
from sklearn.model_selection import train_test_split

from ..config import Hparams
from ..text import text_to_sequence


from ..utils import round_down as _round_down, round_up as _round_up  # noqa: E402


class TacotronDataset:
    """Metadata + batching for preprocessed training_data (train.txt)."""

    def __init__(self, metadata_filename: str, hparams: Hparams,
                 base_dir: Optional[str] = None):
        self._hp = hparams
        base = base_dir or os.path.dirname(metadata_filename)
        self._mel_dir = os.path.join(base, 'mels')
        self._linear_dir = os.path.join(base, 'linear')
        self._cleaner_names = [c.strip() for c in hparams.cleaners.split(',')]

        with open(metadata_filename, encoding='utf-8') as f:
            self._metadata = [line.strip().split('|') for line in f]
        frame_shift_ms = hparams.get_hop_size() / hparams.sample_rate
        self.hours = sum(int(x[4]) for x in self._metadata) * frame_shift_ms / 3600

        if hparams.tacotron_test_size is None:
            assert hparams.tacotron_test_batches is not None
        test_size = (hparams.tacotron_test_size if hparams.tacotron_test_size is not None
                     else hparams.tacotron_test_batches * hparams.tacotron_batch_size)
        indices = np.arange(len(self._metadata))
        train_idx, test_idx = train_test_split(
            indices, test_size=test_size, random_state=hparams.tacotron_data_random_state)
        keep = _round_down(len(test_idx), hparams.tacotron_batch_size)
        train_idx = np.concatenate([train_idx, test_idx[keep:]])
        test_idx = test_idx[:keep]
        self._train_meta = [self._metadata[i] for i in train_idx]
        self._test_meta = [self._metadata[i] for i in test_idx]
        self.test_steps = len(self._test_meta) // hparams.tacotron_batch_size

        self._pad = 0
        self._target_pad = -hparams.max_abs_value if hparams.symmetric_mels else 0.0
        self._token_pad = 1.0

    # ------------------------------------------------------------------
    def __len__(self):
        return len(self._train_meta)

    def _load_example(self, meta: Sequence[str], input_data: np.ndarray):
        mel = np.load(os.path.join(self._mel_dir, meta[1]))
        token_target = np.zeros(len(mel) - 1, np.float32)
        linear = (np.load(os.path.join(self._linear_dir, meta[2]))
                  if self._hp.predict_linear else None)
        return (input_data, mel, token_target, linear, len(mel))

    def train_batches(self, seed: int = 0,
                      process_shard: Optional[Sequence[int]] = None
                      ) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite generator of bucketed, padded train batches.

        Batch composition (bucketing, batch shuffle, within-batch order, pad sizes)
        is decided from metadata alone with a seeded RNG, so it is identical on every
        host. With process_shard=(index, count) — the multi-host path — only this
        host's contiguous slice of each global batch is loaded from disk and
        returned; hosts then assemble the global batch with
        jax.make_array_from_process_local_data (mesh.shard_batch)."""
        hp = self._hp
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self._train_meta))
        offset = 0
        n = hp.tacotron_batch_size
        while True:
            group = []
            for _ in range(n * hp.bucket_group_batches):
                if offset >= len(order):
                    order = rng.permutation(len(self._train_meta))
                    offset = 0
                group.append(int(order[offset]))
                offset += 1
            # bucket by mel length from metadata (== len(mel), written by the
            # preprocessor); stable sort keeps draw order on ties
            group.sort(key=lambda i: int(self._train_meta[i][4]))
            batches = [group[i:i + n] for i in range(0, len(group), n)]
            rng.shuffle(batches)
            for bidx in batches:
                yield self._prepare_batch_indices(bidx, rng, process_shard)

    def test_batches(self) -> List[Dict[str, np.ndarray]]:
        """Fixed eval batches (bucketed once, reference feeder.py:121-150)."""
        hp = self._hp
        rng = np.random.default_rng(hp.tacotron_data_random_state)
        idxs = list(range(len(self._test_meta)))
        idxs.sort(key=lambda i: int(self._test_meta[i][4]))
        n = hp.tacotron_batch_size
        batches = [idxs[i:i + n] for i in range(0, len(idxs), n)]
        return [self._prepare_batch_indices(b, rng, None, meta=self._test_meta)
                for b in batches]

    # ------------------------------------------------------------------
    def _prepare_batch_indices(self, bidx: List[int], rng,
                               process_shard: Optional[Sequence[int]],
                               meta: Optional[List] = None) -> Dict[str, np.ndarray]:
        hp = self._hp
        r = hp.outputs_per_step
        meta = self._train_meta if meta is None else meta
        idx = rng.permutation(len(bidx))
        bidx = [bidx[int(i)] for i in idx]
        metas = [meta[i] for i in bidx]

        # global padded shapes from metadata only (must agree across hosts)
        seqs = [np.asarray(text_to_sequence(m[5], self._cleaner_names), np.int32)
                for m in metas]
        input_lengths = np.asarray([len(s) for s in seqs], np.int32)
        targets_lengths = np.asarray([int(m[4]) for m in metas], np.int32)
        in_max = _round_up(int(input_lengths.max()), hp.pad_text_multiple)
        mel_max = _round_up(_round_up(int(targets_lengths.max()), r),
                            _round_up(hp.pad_mel_multiple, r))

        if process_shard is not None:
            pi, pc = process_shard
            assert len(bidx) % pc == 0, \
                f'batch {len(bidx)} not divisible by process count {pc}'
            per = len(bidx) // pc
            lo, hi = pi * per, (pi + 1) * per
        else:
            lo, hi = 0, len(bidx)

        # only this host's rows touch the filesystem (sequences reused from the
        # shape pass above — each text is tokenized exactly once per batch)
        batch = [self._load_example(m, s)
                 for m, s in zip(metas[lo:hi], seqs[lo:hi])]
        # wire dtype: float16 halves host->device feed bandwidth (JAX promotes the
        # targets back to f32 arithmetic on device; quantization noise ~1e-3 rel)
        wire = np.float16 if hp.transfer_dtype == 'float16' else np.float32
        inputs = np.stack([np.pad(x[0], (0, in_max - len(x[0])),
                                  constant_values=self._pad) for x in batch])
        mel_targets = np.stack([np.pad(x[1], [(0, mel_max - len(x[1])), (0, 0)],
                                       constant_values=self._target_pad) for x in batch])
        token_targets = np.stack([np.pad(x[2], (0, mel_max - len(x[2])),
                                         constant_values=self._token_pad) for x in batch])
        out = dict(inputs=inputs, input_lengths=input_lengths[lo:hi],
                   mel_targets=mel_targets.astype(wire),
                   stop_token_targets=token_targets.astype(wire),
                   targets_lengths=targets_lengths[lo:hi])
        if hp.predict_linear:
            out['linear_targets'] = np.stack([
                np.pad(x[3], [(0, mel_max - len(x[3])), (0, 0)],
                       constant_values=self._target_pad) for x in batch]).astype(wire)
        return out


class Prefetcher:
    """Background-thread batch prefetch (replaces feeder threads + FIFOQueue(8))."""

    def __init__(self, iterator: Iterator, depth: int = 8):
        self._it = iterator
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:  # propagate to consumer
            self._err = e

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            # drain queued items before surfacing a producer error
            try:
                return self._q.get(timeout=0.2)
            except queue.Empty:
                if self._err is not None:
                    raise self._err
                if not self._thread.is_alive():
                    raise StopIteration

    def close(self):
        self._stop.set()
