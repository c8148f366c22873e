#!/usr/bin/env python
"""Real multi-process data-parallel training parity check (CPU, localhost).

`__graft_entry__.dryrun_multichip` *simulates* multi-host sharding inside one
process; this script actually runs it as N OS processes: each process calls
`jax.distributed.initialize` against a localhost coordinator, sees only its own
CPU device, loads only its rows of every global batch (loader `process_shard`),
assembles global arrays with `jax.make_array_from_process_local_data`
(mesh.shard_batch), and drives the production `tacotron_train` loop — lead-host
checkpointing, eval slicing and all. Process 0's per-step losses must match a
single-process run of the identical config to float tolerance, which proves the
per-host loader shards compose to the exact global batch under real process
boundaries and cross-process collectives.

This is the multi-host capability the reference cannot express at all (its
"multi-GPU" is in-graph tower replication in one process — reference
tacotron/models/tacotron.py:405-423, SURVEY §2.10).

Usage:
    python scripts/run_multiprocess_cpu.py [--steps 8] [--nprocs 2]
        [--workdir DIR] [--json-out FILE]

Exits 0 and prints a JSON summary line on success. Internal child mode is
spawned by the orchestrator (`--child-id I`, -1 = single-process reference run).
"""

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tiny model (fast CPU compile), batch 8 so 2 processes x 1 device take 4 rows each
TINY_HPARAMS = (
    'embedding_dim=32,enc_conv_channels=32,enc_conv_num_layers=1,encoder_lstm_units=16,'
    'attention_dim=16,attention_filters=8,attention_kernel=[7],prenet_layers=[16,16],'
    'decoder_lstm_units=32,postnet_channels=32,postnet_num_layers=2,cbhg_kernels=4,'
    'cbhg_conv_channels=16,cbhg_projection=16,cbhg_highway_units=16,cbhg_rnn_units=16,'
    'outputs_per_step=2,tacotron_batch_size=8,tacotron_test_size=None,'
    'tacotron_test_batches=1,griffin_lim_iters=2,bucket_group_batches=2,'
    'pad_mel_multiple=16,decoder_scan_unroll=1,predict_linear=False')

HOP, N_MELS, FRAMES = 275, 80, 16
STEP_RE = re.compile(r'Step\s+(\d+) \[.*?loss=([0-9.naninf]+),')


def write_corpus(base: str, n: int = 32) -> str:
    """Synthetic preprocessed training_data/ (what preprocess.py emits)."""
    import numpy as np
    td = os.path.join(base, 'training_data')
    for sub in ('mels', 'audio', 'linear'):
        os.makedirs(os.path.join(td, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        frames = FRAMES + 2 * (i % 3)
        mel = rng.uniform(-4, 4, (frames, N_MELS)).astype(np.float32)
        np.save(os.path.join(td, 'mels', f'mel-{i}.npy'), mel)
        rows.append(f'audio-{i}.npy|mel-{i}.npy|mel-{i}.npy|{frames * HOP}|{frames}|'
                    f'parity sentence number {i}.')
    with open(os.path.join(td, 'train.txt'), 'w') as f:
        f.write('\n'.join(rows) + '\n')
    return td


def run_child(args) -> int:
    """One training process. --child-id >=0: join the distributed runtime."""
    if args.local_devices > 1 and args.child_id >= 0:
        # the reference run (child-id -1) stays a true 1-device job, so parity is
        # proven against the strongest baseline: N procs x K devices vs 1 x 1
        flags = os.environ.get('XLA_FLAGS', '')
        if '--xla_force_host_platform_device_count' not in flags:
            os.environ['XLA_FLAGS'] = (
                flags +
                f' --xla_force_host_platform_device_count={args.local_devices}').strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')  # never touch a TPU tunnel here
    if args.child_id >= 0:
        jax.distributed.initialize(coordinator_address=f'localhost:{args.port}',
                                   num_processes=args.nprocs,
                                   process_id=args.child_id)
        assert jax.process_count() == args.nprocs, jax.process_count()
        assert jax.local_device_count() == args.local_devices
        name = f'mp-p{args.child_id}'
    else:
        assert jax.process_count() == 1
        name = 'sp'

    from tacotron2_tpu.config import default_hparams
    from tacotron2_tpu.training.tacotron_train import tacotron_train
    from tacotron2_tpu.utils import infolog

    hp = default_hparams()
    hp.parse(TINY_HPARAMS)
    if args.child_id >= 0 and args.local_devices > 1:
        # hosts-as-slices: the hybrid slice-major mesh layout puts this process's
        # devices on a contiguous data-axis block, so the gradient all-reduce is
        # the only collective crossing process (DCN-analog) boundaries
        hp.mesh_num_slices = args.nprocs
    log_dir = os.path.join(args.workdir, f'logs-{name}')
    os.makedirs(log_dir, exist_ok=True)
    infolog.init(os.path.join(log_dir, 'Terminal_train_log'), name, None)
    infolog.log('process {}/{} local_devices={} global_devices={}'.format(
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count()))

    train_args = argparse.Namespace(
        base_dir=args.workdir, tacotron_input='training_data/train.txt',
        model='Tacotron', restore=False, summary_interval=10_000,
        embedding_interval=0, checkpoint_interval=args.steps,
        eval_interval=args.steps, tacotron_train_steps=args.steps,
        profile_step=0, slack_url=None)
    tacotron_train(train_args, log_dir, hp)
    return 0


def parse_losses(log_path: str):
    losses = {}
    with open(log_path) as f:
        for line in f:
            m = STEP_RE.search(line)
            if m:
                losses[int(m.group(1))] = float(m.group(2))
    return [losses[k] for k in sorted(losses)]


def free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def orchestrate(args) -> int:
    import numpy as np
    workdir = args.workdir or tempfile.mkdtemp(prefix='t2mp_')
    os.makedirs(workdir, exist_ok=True)
    write_corpus(workdir)

    env = dict(os.environ)
    # strip the axon sitecustomize: children must run pure-CPU jax, and
    # jax.distributed must initialize before any backend exists
    env['PYTHONPATH'] = REPO
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)  # 1 local device per process
    base_cmd = [sys.executable, os.path.abspath(__file__),
                '--steps', str(args.steps), '--nprocs', str(args.nprocs),
                '--local-devices', str(args.local_devices),
                '--workdir', workdir]

    t0 = time.time()
    print(f'[mp] single-process reference run ({args.steps} steps)...', flush=True)
    subprocess.run(base_cmd + ['--child-id', '-1'], env=env, check=True,
                   timeout=args.timeout, cwd=workdir)

    port = free_port()
    print(f'[mp] launching {args.nprocs} distributed processes '
          f'(coordinator localhost:{port})...', flush=True)
    child_logs = [open(os.path.join(workdir, f'child-{i}.err'), 'w')
                  for i in range(args.nprocs)]
    procs = [subprocess.Popen(base_cmd + ['--child-id', str(i), '--port', str(port)],
                              env=env, cwd=workdir, stderr=log)
             for i, log in zip(range(args.nprocs), child_logs)]
    deadline = time.time() + args.timeout
    codes = [p.wait(timeout=max(1, deadline - time.time())) for p in procs]
    for log in child_logs:
        log.close()
    if any(c != 0 for c in codes):
        for i in range(args.nprocs):
            with open(os.path.join(workdir, f'child-{i}.err')) as f:
                tail = f.read()[-2000:]
            print(f'--- child {i} stderr tail ---\n{tail}', file=sys.stderr)
        raise AssertionError(f'distributed child exit codes: {codes}')

    sp = parse_losses(os.path.join(workdir, 'logs-sp', 'Terminal_train_log'))
    mp = parse_losses(os.path.join(workdir, 'logs-mp-p0', 'Terminal_train_log'))
    assert len(sp) == len(mp) == args.steps, (len(sp), len(mp))
    # proof the runtime really spanned N processes
    with open(os.path.join(workdir, 'logs-mp-p0', 'Terminal_train_log')) as f:
        head = f.read()
    m = re.search(r'process 0/(\d+) local_devices=(\d+) global_devices=(\d+)', head)
    assert m is not None, 'no process-evidence line in the multi-process log'
    assert (int(m.group(1)) == args.nprocs
            and int(m.group(2)) == args.local_devices
            and int(m.group(3)) == args.nprocs * args.local_devices), m.group(0)
    ok = np.allclose(sp, mp, rtol=2e-3, atol=2e-4)
    result = {
        'ok': bool(ok),
        'nprocs': args.nprocs,
        'local_devices': args.local_devices,
        'steps': args.steps,
        'single_process_losses': sp,
        'multi_process_losses': mp,
        'max_abs_diff': float(np.max(np.abs(np.array(sp) - np.array(mp)))),
        'process_evidence': m.group(0) if m else None,
        'wall_sec': round(time.time() - t0, 1),
    }
    line = json.dumps(result)
    print(line, flush=True)
    if args.json_out:
        with open(args.json_out, 'w') as f:
            f.write(line + '\n')
    if not ok:
        print('[mp] LOSS MISMATCH', file=sys.stderr)
        return 1
    print(f'[mp] OK: {args.nprocs}-process losses match single-process '
          f'(max |diff| {result["max_abs_diff"]:.2e})', flush=True)
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=8)
    p.add_argument('--nprocs', type=int, default=2)
    p.add_argument('--local-devices', type=int, default=1, dest='local_devices',
                   help='virtual CPU devices per process (>1 = hosts-as-slices: '
                        'a multi-slice DCN-analog topology over localhost TCP)')
    p.add_argument('--workdir', default=None)
    p.add_argument('--json-out', default=None)
    p.add_argument('--timeout', type=int, default=1200)
    p.add_argument('--child-id', type=int, default=None,
                   help='internal: run as a training process (-1 = single-process)')
    p.add_argument('--port', type=int, default=0)
    args = p.parse_args()
    if args.child_id is not None:
        sys.exit(run_child(args))
    sys.exit(orchestrate(args))


if __name__ == '__main__':
    main()
