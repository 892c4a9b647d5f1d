"""Aggregate an xplane.pb's XLA-op device time into coarse subsystem buckets.

Usage: python tools/xplane_groups.py <trace.xplane.pb> [regex=label ...]
Default labels target the vocos GAN step; pass custom `pattern=label` pairs
to rebucket. Unmatched ops land in 'other' (top 15 printed for inspection).
"""

from __future__ import annotations

import collections
import re
import sys


DEFAULT_RULES = [
    (r"copy-done|copy-start|%copy", "copies/dma"),
    (r"fft", "fft"),
    (r"f32\[32\]\{0", "weightnorm-32ch(mrd)"),
    (r"f32\[1024\]\{0|f32\[512\]\{0|f32\[128\]\{0|f32\[5,1,(1024|512|128)", "weightnorm-mpd"),
    (r",32\]\{3", "mrd-convs"),
    (r",(1024|512|128)\]\{2,|,(1024|512|128)\]\{3,", "mpd-convs"),
    (r"abs_reduce", "l1-losses"),
    (r"reduce_fusion", "reduces-misc"),
]


def main():
    if len(sys.argv) < 2:
        sys.exit("usage: xplane_groups.py <capture.xplane.pb> [name=regex ...]")
    path = sys.argv[1]
    rules = [tuple(a.split("=", 1)) for a in sys.argv[2:]] or DEFAULT_RULES
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    p = next((pl for pl in xs.planes if "TPU" in pl.name), None)
    if p is None:
        sys.exit(f"no TPU plane in {path} (planes: {[pl.name for pl in xs.planes]})")
    ev_meta = {m.id: m.name for m in p.event_metadata.values()}
    buckets = collections.Counter()
    counts = collections.Counter()
    other = collections.Counter()
    total = 0
    for line in p.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            total += ev.duration_ps
            for pat, label in rules:
                if re.search(pat, name):
                    buckets[label] += ev.duration_ps
                    counts[label] += 1
                    break
            else:
                buckets["other"] += ev.duration_ps
                counts["other"] += 1
                key = re.sub(r"[.\d]+", "", name.split(" = ")[0]) + " " + (
                    name.split(" = ")[1][:60] if " = " in name else ""
                )
                other[key] += ev.duration_ps
    print(f"total device: {total/1e9:.1f} ms")
    for label, ps in buckets.most_common():
        print(f"  {ps/1e9:8.2f} ms {ps/total*100:5.1f}%  n={counts[label]:6d}  {label}")
    print("top 'other':")
    for key, ps in other.most_common(15):
        print(f"  {ps/1e9:8.2f} ms  {key}")


if __name__ == "__main__":
    main()
