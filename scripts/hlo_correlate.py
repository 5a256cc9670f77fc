"""Join a profile table (op self-ms from profile_step.py output) with the
dumped optimized HLO (/tmp/step_hlo.txt) to attribute device time to engine
source lines.

Usage: hlo_correlate.py <profile_txt> <hlo_txt>
"""
import re
import sys
from collections import defaultdict


def main():
    prof_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof3.txt"
    hlo_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/step_hlo.txt"

    rows = []
    for line in open(prof_path):
        m = re.match(r"^(\S+)\s+(\d+\.\d+)\s+(\d+)\s*$", line)
        if m:
            rows.append((m.group(1), float(m.group(2)), int(m.group(3))))

    meta = {}
    pat = re.compile(
        r"%(\S+?) = .*?metadata=\{op_name=\"([^\"]*)\""
        r"(?:.*?source_file=\"([^\"]*)\")?(?:.*?source_line=(\d+))?")
    for line in open(hlo_path):
        m = pat.search(line)
        if m:
            name, op, sf, sl = m.groups()
            meta[name] = (op, sf, sl)

    agg = defaultdict(float)
    print(f"{'self ms':>8s}  {'op':28s} {'source'}")
    for name, ms, cnt in rows:
        op, sf, sl = meta.get(name, ("?", None, None))
        opshort = "/".join(p for p in op.split("/")
                           if not p.startswith(("jit(", "cond", "branch",
                                                "while", "body")))
        src = f"{(sf or '?').split('/')[-1]}:{sl}" if sf else "?"
        agg[(opshort[:60], src)] += ms
        if ms >= 0.07:
            print(f"{ms:8.3f}  {name:28s} {opshort[:50]:50s} {src}")
    print("\n--- aggregated by (op, source) ---")
    for (op, src), ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms:8.3f}  {op:60s} {src}")


if __name__ == "__main__":
    main()
