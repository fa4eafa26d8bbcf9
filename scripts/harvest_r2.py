#!/usr/bin/env python
"""Harvest round-2 validation/parity logs into committed CSV curves + a
markdown summary table (stdout). Usage: python scripts/harvest_r2.py"""
import glob
import os
import re

OUT = "validation/r2"
os.makedirs(OUT, exist_ok=True)

rows = []
for log in sorted(glob.glob("results/validation_r2/*.log")):
    name = os.path.basename(log)[:-4]
    evals, extras = [], {}
    last_train = None
    for line in open(log, errors="replace"):
        m = re.match(r"\s*eval @ (\d+): return ([-\d.]+)(.*)", line)
        if m:
            evals.append((int(m.group(1)), float(m.group(2))))
            for em in re.finditer(r"(\w+_rate|won|success)[ =]([\d.]+)", m.group(3)):
                extras.setdefault(em.group(1), []).append(
                    (int(m.group(1)), float(em.group(2))))
        elif "steps" in line and "value_loss" in line:
            last_train = line.strip()
    if not evals:
        continue
    with open(f"{OUT}/{name}_eval.csv", "w") as f:
        f.write("".join(f"{s},{r}\n" for s, r in evals))
    for key, series in extras.items():
        with open(f"{OUT}/{name}_{key}.csv", "w") as f:
            f.write("".join(f"{s},{v}\n" for s, v in series))
    first = evals[0]
    best = max(evals, key=lambda x: x[1])
    last = evals[-1]
    extra_txt = " ".join(
        f"{k}={series[-1][1]:.2f}" for k, series in sorted(extras.items()))
    rows.append((name, first, last, best, extra_txt))

print("| run | first eval | final eval | best eval | extra |")
print("|---|---|---|---|---|")
for name, first, last, best, extra in rows:
    print(f"| {name} | {first[1]:.1f} @ {first[0]/1e6:.1f}M "
          f"| {last[1]:.1f} @ {last[0]/1e6:.1f}M "
          f"| {best[1]:.1f} @ {best[0]/1e6:.1f}M | {extra} |")
