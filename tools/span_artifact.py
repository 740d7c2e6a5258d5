#!/usr/bin/env python3
"""Fold a check_oracle log over the sf1e_span corpus into
CORRECTNESS_sf1e_span.json (the committed artifact the judge reads).
Dev tool only (driver-side python).

Usage: python3 tools/span_artifact.py <check_oracle.log> <note>
"""
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(log_path, note):
    queries = {}
    for line in open(log_path):
        m = re.match(r"^(OK|FAIL)\s+(\w+):\s*(.*)", line)
        if m:
            status, name, detail = m.groups()
            queries[name] = {"match": status == "OK",
                             "gate": "duckdb hash (check_oracle)"}
            if status == "FAIL":
                queries[name]["detail"] = detail.strip()
    green = sum(1 for v in queries.values() if v["match"])
    art = {
        "sf": "sf1e_span (density-preserving, graft.ScaleGen span mode "
              "x10 of sf0.1; digest-pinned recipe)",
        "note": note,
        "green": green,
        "total": len(queries),
        "queries": dict(sorted(queries.items())),
    }
    out = os.path.join(ROOT, "CORRECTNESS_sf1e_span.json")
    json.dump(art, open(out, "w"), indent=1)
    print(f"{out}: {green}/{len(queries)} green")
    return 0 if green == len(queries) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
