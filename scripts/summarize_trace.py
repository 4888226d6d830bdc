"""Summarize an XLA profiler trace: top device ops by total self-time.

Usage: python scripts/summarize_trace.py /tmp/rhs_trace [N]
Reads the newest .xplane.pb under the trace dir via xprof's XSpace proto.
"""
import glob
import os
import sys
from collections import defaultdict


def load_xspace(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        sys.exit(f"no .xplane.pb under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2 as pb  # noqa
    xs = pb.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs, path


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rhs_trace"
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    try:
        xs, path = load_xspace(trace_dir)
    except ImportError:
        # fall back to tensorflow's bundled proto
        from tensorflow.core.profiler.protobuf import xplane_pb2 as pb
        paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                          recursive=True)
        path = max(paths, key=os.path.getmtime)
        xs = pb.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
    print("trace:", path)

    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        stats = defaultdict(lambda: [0.0, 0])   # name -> [ns, count]
        for line in plane.lines:
            if "XLA Op" not in line.name and "Steps" != line.name \
               and not line.name.startswith("XLA"):
                # fall through: accept all lines on device planes
                pass
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                stats[name][0] += ev.duration_ps / 1e6  # -> us
                stats[name][1] += 1
        if not stats:
            continue
        total = sum(v[0] for v in stats.values())
        print(f"\n=== {plane.name} (total {total/1e3:.3f} ms across lines)")
        for name, (us, cnt) in sorted(stats.items(),
                                      key=lambda kv: -kv[1][0])[:topn]:
            print(f"{us/1e3:9.3f} ms {cnt:5d}x  {name[:110]}")


if __name__ == "__main__":
    main()
