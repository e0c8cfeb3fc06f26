#!/usr/bin/env python
"""Export trainer metrics (JSONL) to CSV — the offline analogue of the
reference's `src/main/export_wandb.py` (pull run history to CSV).

Usage: python scripts/export_metrics.py saves/opt_trainer/metrics.jsonl out.csv
"""

import csv
import json
import sys


def main():
    src = sys.argv[1]
    dst = sys.argv[2] if len(sys.argv) > 2 else src.replace(".jsonl", ".csv")
    rows = []
    keys = []
    with open(src) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            rows.append(rec)
            for k in rec:
                if k not in keys:
                    keys.append(k)
    with open(dst, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f"wrote {len(rows)} rows -> {dst}")


if __name__ == "__main__":
    main()
