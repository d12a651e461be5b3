"""Rank the compiled production step's ops by the TPU cost model's
estimated_cycles (backend_config) — locates the priciest scheduled ops."""
import os, re, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
txt = open("/tmp/step_hlo.txt").read()
rows = []
for line in txt.splitlines():
    m = re.search(r'"estimated_cycles":"(\d+)"', line)
    if not m:
        continue
    cyc = int(m.group(1))
    it = 1
    m2 = re.search(r'"iteration_bounds":\[([^\]]*)\]', line)
    head = line.strip().split(" metadata=")[0]
    opm = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ([^ ]+) ?= ?", line)
    name = line.strip().split(" ")[0]
    kind = "?"
    mk = re.search(r"= (?:\w+\[[^\]]*\]\S*) (\w[\w\-\.]*)\(", line)
    if mk:
        kind = mk.group(1)
    meta = ""
    mm = re.search(r'op_name="([^"]{0,120})"', line)
    if mm:
        meta = mm.group(1)
    rows.append((cyc, kind, name[:60], meta))
rows.sort(reverse=True)
tot = sum(r[0] for r in rows)
print(f"total estimated cycles {tot/1e6:.1f}M  (~{tot/940e6*1e3:.1f} ms @940MHz)")
for cyc, kind, name, meta in rows[:30]:
    print(f"{cyc/1e6:8.2f}M ~{cyc/940e3:6.2f} ms  {kind:12s} {name:40s} {meta}")
