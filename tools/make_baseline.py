#!/usr/bin/env python3
"""Write BENCH_BASELINE.txt from a bench_out.json recorded on a QUIET
host at sf0.1 — the committed per-query reference Bench's transient-
outlier re-run (>3x baseline -> run twice, keep min, record both)
compares against.

Usage: python3 tools/make_baseline.py [bench_out.json] [BENCH_BASELINE.txt]
"""
import json
import os
import sys


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
    dst = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BASELINE.txt"
    j = json.load(open(src))
    sf = os.path.basename(j["sf"].rstrip("/"))
    qs = j["queries"]
    with open(dst, "w") as f:
        f.write(f"sf {sf}\n")
        for name in sorted(qs):
            f.write(f"{name} {qs[name]:.3f}\n")
    print(f"wrote {dst}: sf={sf}, {len(qs)} queries, "
          f"anchors={ {k: round(v, 2) for k, v in j.get('anchors', {}).items()} }")


if __name__ == "__main__":
    main()
