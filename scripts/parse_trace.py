#!/usr/bin/env python
"""Parse the xplane from /tmp/jax_trace: per-line totals + compute-op ranking."""

import glob
import sys
from collections import defaultdict

import jax

import os

files = glob.glob("/tmp/jax_trace/**/*.xplane.pb", recursive=True)
if not files:
    sys.exit("no *.xplane.pb under /tmp/jax_trace — run scripts/profile_step.py first")
pd = jax.profiler.ProfileData.from_file(max(files, key=os.path.getmtime))
STEPS = 6

for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    print(f"plane {plane.name}")
    for line in plane.lines:
        evs = list(line.events)
        tot = sum(e.duration_ns for e in evs) / 1e6
        print(f"  line {line.name!r}: {len(evs)} events, {tot:.2f} ms total")

    # aggregate by op class and by name for 'compute' ops
    by_class = defaultdict(float)
    by_name = defaultdict(float)
    cnt = defaultdict(int)
    for line in plane.lines:
        for e in line.events:
            n = e.name
            if not n or n.startswith("jit_") or n[0].isdigit():
                continue
            d = e.duration_ns / 1e6
            if "copy-start" in n or "copy-done" in n:
                cls = "async-copy"
            elif "slice-start" in n or "slice-done" in n:
                cls = "async-slice"
            elif "convolution" in n:
                cls = "convolution"
            elif "custom-call" in n or "tpu_custom_call" in n:
                cls = "custom-call(pallas)"
            elif "fusion" in n:
                cls = "fusion"
            elif "dot" in n:
                cls = "dot"
            else:
                cls = "other"
            by_class[cls] += d
            if cls in ("convolution", "fusion", "dot", "custom-call(pallas)", "other"):
                key = n.split(" = ")[0]
                by_name[key] += d
                cnt[key] += 1
    print("\nper-class totals (ms/step):")
    for c, v in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"  {c:22s} {v/STEPS:8.2f}")
    print("\ntop compute ops (ms/step):")
    for n, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:50]:
        print(f"  {v/STEPS:8.3f} x{cnt[n]//STEPS:<3d} {n[:100]}")
