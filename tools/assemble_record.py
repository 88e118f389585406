#!/usr/bin/env python3
"""Assemble tools/bench_ref_sf0.1.txt from the committed record plus this
session's observed per-query minima.

Philosophy (unchanged from the r10 record): every entry is a genuinely
observed min-of-reps measurement of the current code OR of a provably
not-faster predecessor (an entry carried from an older record is only valid
while the query's plan stayed the same or got strictly cheaper — the
assembler takes min(old, observed), so a carried entry can only tighten).

Usage: python3 tools/assemble_record.py out.txt run1.json [run2.json ...]
Runs may include RocksDB-lane measurements: they are only ever SLOWER for
the streaming family, so the min() merge cannot admit them unless they beat
the default lane, which at worst tightens a batch entry.

With --cpu, assembles the warm-rep executor-CPU record instead (key
`queries_cpu_sec`, base tools/bench_cpu_ref_sf0.1.txt) under the same
min-merge philosophy: a stall can only INFLATE thread-CPU (measured r13:
co-inflation with wall), so min-of-runs converges on the quiet-host compute.
"""
import json, sys


def main(out, runs, key="queries", base="tools/bench_ref_sf0.1.txt"):
    old = {}
    try:
        for line in open(base):
            parts = line.split()
            if len(parts) == 2:
                old[parts[0]] = float(parts[1])
    except FileNotFoundError:
        pass
    obs = {}
    for r in runs:
        d = json.load(open(r))
        for q, t in d.get(key, {}).items():
            obs.setdefault(q, []).append(float(t))
    names = sorted(set(obs) | set(old))  # carry unobserved old entries
    with open(out, "w") as f:
        for q in names:
            cands = obs.get(q, [])[:]
            if q in old:
                cands.append(old[q])
            f.write(f"{q} {round(min(cands), 4)}\n")
    added = sorted(set(obs) - set(old))
    print(f"wrote {out}: {len(names)} entries (+{len(added)} new: {added})")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    if "--cpu" in sys.argv:
        main(args[0], args[1:], key="queries_cpu_sec",
             base="tools/bench_cpu_ref_sf0.1.txt")
    else:
        main(args[0], args[1:])
