"""Parse the newest .xplane.pb: per-op totals, compute vs async-DMA split."""
import glob
import os
import re
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xtrace"
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True),
               key=os.path.getmtime)
xspace = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    xspace.ParseFromString(f.read())

ASYNC = ("copy-start", "slice-start", "copy-done", "slice-done",
         "all-reduce-start", "all-reduce-done")


def base_name(name):
    # strip %name.123 = ... -> op kind + shapes summary
    m = re.match(r"%([a-zA-Z0-9_.\-]+) = (.*)", name)
    return m.group(1) if m else name


for plane in xspace.planes:
    print(f"== plane: {plane.name}")
    for line in plane.lines:
        nev = len(line.events)
        if nev == 0:
            continue
        evmeta = plane.event_metadata
        totals, counts, full = {}, {}, {}
        for ev in line.events:
            name = evmeta[ev.metadata_id].name
            totals[name] = totals.get(name, 0) + ev.duration_ps
            counts[name] = counts.get(name, 0) + 1
        total_all = sum(totals.values())
        is_async = lambda n: any(n.lstrip("%").startswith(a) for a in ASYNC)
        sync_tot = sum(v for k, v in totals.items() if not is_async(k))
        async_tot = total_all - sync_tot
        print(f"  -- line: {line.name} ({nev} events) total "
              f"{total_all/1e12*1000/steps:.2f} ms/step | sync "
              f"{sync_tot/1e12*1000/steps:.2f} | async-span "
              f"{async_tot/1e12*1000/steps:.2f}")
        if "XLA Ops" not in line.name:
            continue
        print("  TOP SYNC OPS:")
        items = [(v, k) for k, v in totals.items() if not is_async(k)]
        for ps, name in sorted(items, reverse=True)[:60]:
            print(f"  {ps/1e12*1000/steps:8.3f} ms/step x{counts[name]:<3}"
                  f" {name[:150]}")
        # aggregate by op kind
        kinds = {}
        for k, v in totals.items():
            if is_async(k):
                continue
            kind = base_name(k).rstrip("0123456789.").rstrip("_")
            kinds[kind] = kinds.get(kind, 0) + v
        print("  BY KIND:")
        for kind, ps in sorted(kinds.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {ps/1e12*1000/steps:8.3f} ms/step  {kind}")
