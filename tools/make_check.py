#!/usr/bin/env python3
"""Dev-only round artifact builder: runs tools/check_oracle.py in exact
mode against pre-dumped Verify output for each scale and writes the
tri-scale CHECK_r{N}.json (the per-query artifact rounds 10/11 shipped).

Usage: python3 tools/make_check.py <round> <out.json> \
           sf0.001=/tmp/out1 sf0.01=/tmp/out2 sf0.1=/tmp/out3

The testdata root defaults to /root/testdata; override with the
GRAFT_TESTDATA env var (ADVICE r13: a relocated dataset must not
silently record n_queries=0).
"""
import json, os, re, subprocess, sys, datetime

rnd, out = int(sys.argv[1]), sys.argv[2]
testdata = os.environ.get('GRAFT_TESTDATA', '/root/testdata')
scales = {}
for arg in sys.argv[3:]:
    sf, vdir = arg.split('=', 1)
    proc = subprocess.run(
        [sys.executable, 'tools/check_oracle.py', f'{testdata}/{sf}', vdir],
        capture_output=True, text=True)
    # a crashed sweep must fail the build, not record an empty scale
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        sys.exit(f'check_oracle.py failed for {sf} (rc={proc.returncode})')
    queries = {}
    for line in proc.stdout.splitlines():
        m = re.match(r'ok   (\S+) \((\d+) rows\)', line)
        if m:
            queries[m.group(1)] = {'ok': True, 'rows': int(m.group(2))}
            continue
        m = re.match(r'FAIL (\S+):', line)
        if m:
            queries[m.group(1)] = {'ok': False,
                                   'detail': line.split(':', 1)[1].strip()}
    if not queries:
        sys.exit(f'{sf}: parsed zero queries from check_oracle.py output — '
                 'bad Verify dir or output format drift')
    n_ok = sum(1 for q in queries.values() if q['ok'])
    scales[sf] = {'n_queries': len(queries), 'n_ok': n_ok,
                  'n_fail': len(queries) - n_ok,
                  'queries': dict(sorted(queries.items()))}
    print(f'{sf}: {n_ok}/{len(queries)} ok')

doc = {'generated_utc': datetime.datetime.now(datetime.timezone.utc)
           .isoformat(timespec='seconds'),
       'mode': 'exact', 'round': rnd, 'scales': scales}
json.dump(doc, open(out, 'w'), indent=1, sort_keys=False)
print('wrote', out)
