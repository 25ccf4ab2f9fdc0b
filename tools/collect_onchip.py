"""Merge an on-chip runbook's outputs (/tmp/onchip_r*/*.json) into one
committable artifact: bench/<dirname>_results.json.

Each runbook step writes a single JSON line (or nothing on failure, with
stderr in the matching .err file). This collects whatever exists, keyed
by step name, and records failures so partial runs stay honest.

    python tools/collect_onchip.py [/tmp/onchip_r4]
"""

from __future__ import annotations

import json
import os
import sys


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/onchip_r4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(
        repo, "bench", os.path.basename(os.path.normpath(src)) + "_results.json")
    results: dict = {}
    failures: dict = {}
    if not os.path.isdir(src):
        print(f"no {src}; nothing to collect", file=sys.stderr)
        return 1
    for name in sorted(os.listdir(src)):
        if not name.endswith(".json"):
            continue
        step = name[:-5]
        path = os.path.join(src, name)
        line = ""
        with open(path) as f:
            for raw in f:
                if raw.strip().startswith("{"):
                    line = raw.strip()  # keep the LAST json line
        if line:
            try:
                results[step] = json.loads(line)
                continue
            except json.JSONDecodeError as e:
                failures[step] = f"unparseable: {e}"
        else:
            err = ""
            errp = os.path.join(src, step + ".err")
            if os.path.exists(errp):
                with open(errp) as f:
                    err = f.read()[-400:]
            failures[step] = err.strip() or "no output"
    doc = {"results": results}
    if failures:
        doc["failures"] = failures
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"collected {len(results)} results, {len(failures)} failures "
          f"-> {out_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
