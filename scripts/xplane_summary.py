#!/usr/bin/env python
"""Summarize a jax.profiler xplane trace: per-op device time, grouped.

Usage: python scripts/xplane_summary.py TRACE_DIR [top_n]
Finds the newest *.xplane.pb under TRACE_DIR and prints total + top ops for each
device plane (TPU core), grouping XLA fusion names by their leading op kind.
"""

import glob
import os
import sys
from collections import defaultdict

try:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
except ImportError:  # proto location moved across TF versions
    from tensorflow.core.profiler.protobuf import xplane_pb2


def load(trace_dir: str) -> xplane_pb2.XSpace:
    paths = sorted(glob.glob(os.path.join(trace_dir, '**', '*.xplane.pb'),
                             recursive=True), key=os.path.getmtime)
    assert paths, f'no xplane.pb under {trace_dir}'
    xs = xplane_pb2.XSpace()
    with open(paths[-1], 'rb') as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(xs: xplane_pb2.XSpace, top_n: int = 25):
    for plane in xs.planes:
        if 'TPU' not in plane.name and 'Device' not in plane.name:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        totals = defaultdict(float)
        n_events = defaultdict(int)
        span_lo, span_hi = float('inf'), 0.0
        for line in plane.lines:
            # 'XLA Ops' is the synchronous execution timeline; 'Async XLA Ops'
            # durations overlap compute and would double-count device time
            if line.name not in ('XLA Ops',):
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, '?')
                dur = ev.duration_ps / 1e6  # -> us
                t0 = (line.timestamp_ns * 1e3 + ev.offset_ps) / 1e6
                span_lo = min(span_lo, t0)
                span_hi = max(span_hi, t0 + dur)
                key = name.split('.')[0].split('(')[0]
                totals[key] += dur
                n_events[key] += 1
        if not totals:
            continue
        print(f'== plane: {plane.name}  (lines: {[l.name for l in plane.lines]})')
        total = sum(totals.values())
        print(f'   sum of op durations: {total/1e3:.2f} ms; '
              f'span: {(span_hi-span_lo)/1e3:.2f} ms')
        for k, v in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f'   {v/1e3:9.3f} ms  {n_events[k]:6d}x  {k}')


if __name__ == '__main__':
    summarize(load(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 25)
