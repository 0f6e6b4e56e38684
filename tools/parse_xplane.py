#!/usr/bin/env python
"""Parse a JAX profiler trace (.xplane.pb) into per-op device times.

``jax.profiler.trace`` (or ``RVST_PROFILE=dir python bench.py``)
writes xplane protobufs the TensorBoard profile plugin renders; the
installed plugin/TF combination cannot convert them, so this parses
the XSpace directly (schema: tensorflow.tsl xplane.proto) and prints,
for each TPU device plane, the ops ranked by total self-duration plus
an occupancy summary — the tool behind the per-op numbers quoted in
docs/performance.md.

Usage:  python tools/parse_xplane.py <trace_dir_or_xplane.pb> [top_n]
"""
import collections
import glob
import os
import sys


def load_xspace(path):
    os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION',
                          'python')
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    if os.path.isdir(path):
        hits = sorted(glob.glob(os.path.join(
            path, '**', '*.xplane.pb'), recursive=True))
        if not hits:
            raise FileNotFoundError(f'no .xplane.pb under {path}')
        path = hits[-1]
    xs = xplane_pb2.XSpace()
    with open(path, 'rb') as fp:
        xs.ParseFromString(fp.read())
    return xs, path


def device_op_times(xs, merge_by_name=True):
    """{plane_name: (total_window_ps, [(name, total_ps, count)])} for
    TPU device planes (XLA op lines)."""
    out = {}
    for plane in xs.planes:
        if 'TPU' not in plane.name and 'Device' not in plane.name:
            continue
        ev_names = plane.event_metadata
        agg = collections.Counter()
        cnt = collections.Counter()
        t_lo, t_hi = None, 0
        for line in plane.lines:
            # XLA Ops lines carry per-op events; steps/modules excluded
            lname = line.name.lower()
            if 'xla op' not in lname and 'ops' != lname:
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                agg[name] += ev.duration_ps
                cnt[name] += 1
                start = line.timestamp_ns * 1000 + ev.offset_ps
                t_lo = start if t_lo is None else min(t_lo, start)
                t_hi = max(t_hi, start + ev.duration_ps)
        if agg:
            window = (t_hi - t_lo) if t_lo is not None else 0
            out[plane.name] = (window, [(n, agg[n], cnt[n])
                                        for n in agg])
    return out


def fuse_key(name):
    """Group 'fusion.123' -> 'fusion', keep custom-call names."""
    base = name.split('.')[0]
    return base


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else '/tmp/rvst_trace'
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    xs, used = load_xspace(path)
    print(f'trace: {used}')
    planes = device_op_times(xs)
    if not planes:
        print('no TPU device planes with XLA-op lines found; planes:')
        for plane in xs.planes:
            print(f'  {plane.name}: lines '
                  f'{[ln.name for ln in plane.lines][:8]}')
        return
    for pname, (window, rows) in planes.items():
        total = sum(r[1] for r in rows)
        print(f'\n== {pname} ==')
        print(f'busy {total/1e9:.3f} ms over {window/1e9:.3f} ms window '
              f'({100.0*total/max(window,1):.0f}% occupancy)')
        print(f'{"op":58s} {"ms":>9s} {"%":>5s} {"count":>7s}')
        for name, ps, c in sorted(rows, key=lambda r: -r[1])[:top_n]:
            print(f'{name[:58]:58s} {ps/1e9:9.3f} '
                  f'{100.0*ps/total:5.1f} {c:7d}')
        # grouped view
        grp = collections.Counter()
        for name, ps, c in rows:
            grp[fuse_key(name)] += ps
        print('-- grouped --')
        for name, ps in grp.most_common(12):
            print(f'{name[:58]:58s} {ps/1e9:9.3f} {100.0*ps/total:5.1f}')


if __name__ == '__main__':
    main()
