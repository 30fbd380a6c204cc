"""Keep only the LAST run's records in appended JSONL result files.

The round-5 PM6 recalibration re-ran the qm9/organics families in place;
util's JSONL savers APPEND, so each results file then held the old-surface
block followed by the new-surface block (plus, for one crashed seed, a
partial block). This one-shot tool rewrites each file keeping only the
final block — a block starts where the monotone `total_num_steps` counter
resets downward (train streams restart at 0, eval streams at the first
eval's step count).

Usage: python experiments/qm9_pm6/strip_stale_blocks.py <results_dir>...
"""
from __future__ import annotations

import json
import os
import sys


def strip_file(path: str) -> None:
    with open(path) as fh:
        records = [json.loads(line) for line in fh if line.strip()]
    if not records:
        return
    start = 0
    prev = None
    for i, rec in enumerate(records):
        step = rec.get('total_num_steps', 0)
        if prev is not None and step < prev:
            start = i
        prev = step
    if start == 0:
        print(f'{path}: single block ({len(records)} records), unchanged')
        return
    with open(path, 'w') as fh:
        for rec in records[start:]:
            fh.write(json.dumps(rec) + '\n')
    print(f'{path}: kept final block ({len(records) - start} of '
          f'{len(records)} records)')


def main() -> None:
    for results_dir in sys.argv[1:]:
        for name in sorted(os.listdir(results_dir)):
            if name.endswith('.txt'):
                strip_file(os.path.join(results_dir, name))


if __name__ == '__main__':
    main()
