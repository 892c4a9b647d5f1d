"""Parse a jax.profiler xplane.pb and print the top XLA ops by device time.

Usage: python tools/parse_xplane.py <trace.xplane.pb> [top_n]
Groups ops by name with numeric suffixes stripped so per-layer clones of the
same fusion aggregate into one row.
"""

from __future__ import annotations

import collections
import re
import sys


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if "TPU" in p.name]
    if not planes:
        print("no TPU plane found; planes:", [p.name for p in xs.planes])
        return
    p = planes[0]
    ev_meta = {m.id: m.name for m in p.event_metadata.values()}
    for line in p.lines:
        if line.name != "XLA Ops":
            continue
        tot, cnt = collections.Counter(), collections.Counter()
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            g = re.sub(r"[.\d]+(?= |$)", "", name.split(" = ")[0]) + " = " + (
                name.split(" = ")[1][:80] if " = " in name else ""
            )
            tot[g] += ev.duration_ps
            cnt[g] += 1
        total = sum(tot.values())
        print(f"total device time: {total/1e9:.1f} ms over {sum(cnt.values())} events")
        for name, d in tot.most_common(top_n):
            print(f"{d/1e9:9.3f} ms {d/total*100:5.1f}%  n={cnt[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
