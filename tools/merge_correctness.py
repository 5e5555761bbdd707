#!/usr/bin/env python3
"""Assemble a CORRECTNESS_sfN.json from the Python oracle compare plus
checker-verified and policy-skip entries (SCALE.md documents which
keys use which gate at each SF).

Usage: merge_correctness.py BASE.json OUT.json \\
         [--pass name:rows:via]... [--skip name:reason]...
"""
import json
import sys


def main(argv):
    base, out = argv[0], argv[1]
    d = json.load(open(base))
    i = 2
    while i < len(argv):
        if argv[i] == "--pass":
            name, rows, via = argv[i + 1].split(":", 2)
            d["queries"][name] = {"pass": True, "rows": int(rows),
                                  "via": via}
            i += 2
        elif argv[i] == "--skip":
            name, reason = argv[i + 1].split(":", 1)
            d["queries"][name] = {"pass": None, "err": reason}
            i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    d["passed"] = sum(1 for v in d["queries"].values() if v.get("pass"))
    d["failed"] = sum(1 for v in d["queries"].values()
                      if v.get("pass") is False)
    json.dump(d, open(out, "w"), indent=1, sort_keys=True)
    print(f"{out}: {d['passed']} passed, {d['failed']} failed, "
          f"{len(d['queries'])} entries")


if __name__ == "__main__":
    main(sys.argv[1:])
