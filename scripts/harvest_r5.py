#!/usr/bin/env python
"""Harvest round-5 validation logs into committed CSV curves + a markdown
summary table (stdout). Parses both the on-policy "eval @" console lines and
off-policy progress.txt eval_return records.

Usage: python scripts/harvest_r5.py
"""
import glob
import json
import os
import re

OUT = "validation/r5"
os.makedirs(OUT, exist_ok=True)

rows = []
for log in sorted(glob.glob("results/validation_r5/*.log")):
    name = os.path.basename(log)[:-4]
    evals, extras = [], {}
    run_dir = None
    for line in open(log, errors="replace"):
        m = re.match(r"\s*eval @ (\d+): return ([-\d.]+)(.*)", line)
        if m:
            evals.append((int(m.group(1)), float(m.group(2))))
            for em in re.finditer(r"(\w+)[=](-?[\d.]+)", m.group(3)):
                extras.setdefault(em.group(1), []).append(
                    (int(m.group(1)), float(em.group(2))))
        rm = re.match(r"results saved under (\S+)", line)
        if rm:
            run_dir = rm.group(1)
    # off-policy runs log eval_return only to progress.txt
    if not evals and run_dir and os.path.exists(f"{run_dir}/logs/progress.txt"):
        for l in open(f"{run_dir}/logs/progress.txt"):
            r = json.loads(l)
            if "eval_return" in r:
                evals.append((r["steps"], r["eval_return"]))
            for k, v in r.items():
                if k.startswith("eval_") and k != "eval_return":
                    extras.setdefault(k[5:], []).append((r["steps"], v))
    if not evals:
        continue
    with open(f"{OUT}/{name}_eval.csv", "w") as f:
        f.write("".join(f"{s},{r}\n" for s, r in evals))
    for key, series in extras.items():
        with open(f"{OUT}/{name}_{key}.csv", "w") as f:
            f.write("".join(f"{s},{v}\n" for s, v in series))
    first, best, last = evals[0], max(evals, key=lambda x: x[1]), evals[-1]
    extra_txt = " ".join(
        f"{k}={series[-1][1]:.2f}" for k, series in sorted(extras.items()))
    rows.append((name, first, last, best, extra_txt))

print("| run | first eval | final eval | best eval | extra (final) |")
print("|---|---|---|---|---|")
for name, first, last, best, extra in rows:
    print(f"| {name} | {first[1]:.1f} @ {first[0]/1e6:.1f}M "
          f"| {last[1]:.1f} @ {last[0]/1e6:.1f}M "
          f"| {best[1]:.1f} @ {best[0]/1e6:.1f}M | {extra} |")
