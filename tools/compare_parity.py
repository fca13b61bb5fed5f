#!/usr/bin/env python
"""Diff two per-ref selection logs (BASELINE.md protocol item 2).

    python tools/compare_parity.py runA.json runB.json

Prints agreement rates and the first disagreements. Use with
``hybridgl-main --parity_log`` outputs from two builds (or one produced by
instrumenting the reference with the same record schema).
"""

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hybridgl_tpu.eval.parity import ParityLog, compare  # noqa: E402


def main():
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a = ParityLog.load(sys.argv[1])
    b = ParityLog.load(sys.argv[2])
    out = compare(a, b)
    print(json.dumps({k: v for k, v in out.items() if k != "diffs"}, indent=2))
    for ref_id, sent, ia, ib in out["diffs"][:20]:
        print(f"  ref {ref_id}: {sent!r}: {ia} vs {ib}")


if __name__ == "__main__":
    main()
