#!/usr/bin/env python
"""Run the FULL test suite (fast + slow tiers) and persist an auditable
artifact (``TESTS_r{N}.json``) with per-tier counts, durations and the exact
pytest invocations — so "suite green" is a checked-in, timestamped record
rather than a per-round claim.

Usage:
    python tools/run_test_gate.py --round 4 [--skip-overfit]

Tiers:
    fast     pytest -q                       (default selection, no slow)
    slow     pytest -q -m slow               (model-level/integration)
    overfit  pytest -q -m overfit            (long accuracy proxy; skipped
                                              with --skip-overfit — its
                                              result lives in ACCURACY.json)
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tier(name, args):
    cmd = [sys.executable, '-m', 'pytest', '-q'] + args
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    dt = time.time() - t0
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ''
    counts = {v: int(k) for k, v in
              re.findall(r'(\d+) (passed|failed|errors?|skipped|deselected|'
                         r'xfailed|xpassed)', tail)}
    return {
        'tier': name,
        'cmd': ' '.join(cmd[2:]),
        'rc': proc.returncode,
        'wall_s': round(dt, 1),
        'summary_line': tail,
        **counts,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--round', type=int, default=0)
    p.add_argument('--skip-overfit', action='store_true')
    p.add_argument('--out', default=None)
    args = p.parse_args()

    tiers = [('fast', []), ('slow', ['-m', 'slow'])]
    if not args.skip_overfit:
        tiers.append(('overfit', ['-m', 'overfit']))

    records = []
    for name, extra in tiers:
        print(f'=== tier {name} ===', flush=True)
        rec = run_tier(name, extra)
        print(json.dumps(rec), flush=True)
        records.append(rec)

    out = args.out or os.path.join(REPO, f'TESTS_r{args.round:02d}.json')
    artifact = {
        'date': time.strftime('%Y-%m-%d %H:%M:%S'),
        'all_green': all(r['rc'] == 0 for r in records),
        'total_passed': sum(r.get('passed', 0) for r in records),
        'total_failed': sum(r.get('failed', 0) for r in records),
        'tiers': records,
    }
    with open(out, 'w') as f:
        json.dump(artifact, f, indent=1)
        f.write('\n')
    print(f'wrote {out}')
    return 0 if artifact['all_green'] else 1


if __name__ == '__main__':
    sys.exit(main())
