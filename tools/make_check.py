#!/usr/bin/env python3
"""Dev-only round artifact builder: runs tools/check_oracle.py in exact
mode against pre-dumped Verify output for each scale and writes the
tri-scale CHECK_r{N}.json (the per-query artifact rounds 10/11 shipped).

Usage: python3 tools/make_check.py <round> <out.json> \
           sf0.001=/tmp/out1 sf0.01=/tmp/out2 sf0.1=/tmp/out3
"""
import json, re, subprocess, sys, datetime

rnd, out = int(sys.argv[1]), sys.argv[2]
scales = {}
for arg in sys.argv[3:]:
    sf, vdir = arg.split('=', 1)
    proc = subprocess.run(
        [sys.executable, 'tools/check_oracle.py', f'/root/testdata/{sf}', vdir],
        capture_output=True, text=True)
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
