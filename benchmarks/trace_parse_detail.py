"""Detail view of the captured 8B window trace: per-line breakdown and a
timeline slice inside one slow scan iteration."""

import glob
import sys
from collections import defaultdict

import jax

files = glob.glob("/tmp/lvt_trace/**/*.xplane.pb", recursive=True)
pd = jax.profiler.ProfileData.from_serialized_xspace(
    open(files[0], "rb").read())

for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    print(f"=== plane: {plane.name} ===")
    for line in plane.lines:
        evs = list(line.events)
        if not evs:
            continue
        tot = sum(e.duration_ns for e in evs) / 1e6
        print(f"\n--- line: {line.name!r} events={len(evs)} "
              f"total={tot:.1f} ms ---")
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for e in evs:
            agg[e.name] += e.duration_ns
            cnt[e.name] += 1
        for name, ns in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {ns / 1e6:9.2f} ms x{cnt[name]:5d}  {name[:100]}")

    # timeline slice: find a slow while iteration and list events inside
    for line in plane.lines:
        evs = sorted(line.events, key=lambda e: e.start_ns)
        whiles = [e for e in evs if e.name.startswith("%while.1")
                  and e.duration_ns > 80e6]
        if not whiles:
            continue
        w = whiles[0]
        print(f"\n--- inside {w.name[:40]} "
              f"({w.duration_ns / 1e6:.1f} ms) on line {line.name!r} ---")
        inner = [e for e in evs
                 if w.start_ns <= e.start_ns < w.start_ns + w.duration_ns
                 and e is not w][:60]
        for e in inner:
            print(f"  +{(e.start_ns - w.start_ns) / 1e6:8.3f} ms "
                  f"{e.duration_ns / 1e6:8.3f} ms  {e.name[:90]}")
        break
