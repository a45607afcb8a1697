#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate (not part of the
engine). Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB with the sfDir tables registered as
views, sorts columns by name and rows by value, and diffs.

Default mode is EXACT (repr-level, zero tolerance) to match the driver's
hash compare — a float that differs in its shortest repr is a FAIL even if
numerically within an ulp. Pass --tol for the legacy precision-aware
tolerant compare (debugging aid only; the driver will NOT be this lenient).
Optional trailing names restrict the check to those queries."""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pathlib

argv = [a for a in sys.argv[1:] if a not in ('--tol', '--lint')]
EXACT = '--tol' not in sys.argv
# --lint: schema-only sweep — bind every oracle SQL in DuckDB (no Spark
# output needed beyond oracle_sql.json) and fail on HUGEINT output
# columns. Pair with `graft.Verify <sf> <out> --oracle-only`.
LINT = '--lint' in sys.argv
sf, out = argv[0], argv[1]
only = set(argv[2:])
con = duckdb.connect()
for p in pathlib.Path(sf).glob('*.parquet'):
    con.sql(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    if LINT:
        try:
            rel = con.sql(sql)
            hug = [c for c, t in zip(rel.columns, rel.types)
                   if 'HUGEINT' in str(t).upper()]
        except Exception as e:
            print(f'FAIL {name}: oracle does not bind: {e}'); fails += 1; continue
        if hug:
            print(f'FAIL {name}: oracle emits HUGEINT column(s) {hug}'); fails += 1
        else:
            print(f'ok   {name} (schema)')
        continue
    d = pathlib.Path(out) / name
    if not d.exists():
        print(f'FAIL {name}: no spark output'); fails += 1; continue
    got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    rel = con.sql(sql)
    # Oracle-schema lint (VERDICT r11 item 2): DuckDB sum(BIGINT) widens
    # to HUGEINT, which the driver's pandas fetch renders float64 against
    # Spark's int64 -> hash red even when every value is identical. This
    # class shipped reds in r9/r10/r11; fail it at the schema level.
    hug = [c for c, t in zip(rel.columns, rel.types)
           if 'HUGEINT' in str(t).upper()]
    if hug:
        print(f'FAIL {name}: oracle emits HUGEINT column(s) {hug} '
              f'(driver renders float64 vs spark int64 -> hash red; '
              f'CAST(... AS BIGINT))'); fails += 1; continue
    exp = rel.df()
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f'FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}'); fails += 1; continue
    if len(got) != len(exp):
        print(f'FAIL {name}: rows {len(got)} vs {len(exp)}'); fails += 1; continue
    # Dtype blind spot (VERDICT r11 item 2): the repr(float()) compare
    # below silently absorbs an int64-vs-float64 dtype mismatch the
    # driver hashes as different ('301030' vs '301030.0'). Identical
    # values imply identical nulls, so a kind mismatch here is a true
    # source-dtype divergence, never a nullable-int rendering artifact.
    dkinds = {frozenset(('i', 'f')), frozenset(('u', 'f'))}
    badt = [c for c in got.columns
            if frozenset((got[c].dtype.kind, exp[c].dtype.kind)) in dkinds]
    if badt:
        print(f'FAIL {name}: int-vs-float dtype mismatch on {badt} '
              f'(spark {[str(got[c].dtype) for c in badt]} vs '
              f'oracle {[str(exp[c].dtype) for c in badt]})'); fails += 1; continue
    # array-typed cells (numpy arrays / lists) are unhashable and crash
    # sort_values — convert to a stable tuple repr first
    for df in (got, exp):
        for c in df.columns:
            if df[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, '__len__') and not isinstance(v, (str, bytes))).any():
                df[c] = df[c].map(lambda v: str(tuple(v)) if not isinstance(v, (str, bytes)) and hasattr(v, '__iter__') else v)
    gv = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ev = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    bad = 0
    import pandas as pd

    def col_abs_tol(col):
        # Precision-aware tolerance: infer the rounding each float column
        # asserts from its shortest-repr decimal places (a double that is
        # round(x, k) round-trips as a k-decimal string). One ulp of the
        # final rounded digit (x1.5) is legitimate engine divergence:
        # 2dp revenue sums -> 1.5e-2, 4dp ratios -> 1.5e-4. Integer-valued
        # float columns (HUGEINT->float64) get 0.5 (off-by-one is real).
        # Unrounded float columns defer to rel_tol with a tiny abs floor.
        dp = 0
        for series in (gv[col], ev[col]):
            for v in series:
                if isinstance(v, float) and math.isfinite(v):
                    r = repr(v)
                    if 'e' in r or 'E' in r or ('.' in r and len(r.split('.')[1]) > 6):
                        return 1e-9  # unrounded column: rel_tol governs
                    if '.' in r:
                        dp = max(dp, len(r.split('.')[1]))
        return 0.5 if dp == 0 else 1.5 * 10 ** -dp

    for c in got.columns:
        tol = col_abs_tol(c)
        for i, (a, b) in enumerate(zip(gv[c], ev[c])):
            if a is None and b is None: continue
            # NaT/NaN-aware null equality (NaT == NaT is False in pandas)
            try:
                if pd.isna(a) and pd.isna(b): continue
            except (TypeError, ValueError):
                pass
            try:
                if a is None or b is None or (isinstance(a, float) and math.isnan(a) and math.isnan(b)):
                    if not ((a is None and b is None) or (math.isnan(a) and math.isnan(b))):
                        raise ValueError
                    continue
                if isinstance(a, float) or isinstance(b, float):
                    if EXACT:
                        # repr-level equality: the driver hashes canonical
                        # value strings, so bit-different doubles FAIL even
                        # when numerically close. -0.0 vs 0.0 also fails.
                        eq = repr(float(a)) == repr(float(b))
                    else:
                        eq = math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=tol)
                else:
                    eq = (a == b)
            except Exception:
                eq = str(a) == str(b)
            if not eq:
                if bad < 3:
                    print(f'  {name}.{c}[{i}]: spark={a!r} oracle={b!r}')
                bad += 1
    if bad:
        print(f'FAIL {name}: {bad} mismatched values'); fails += 1
    else:
        print(f'ok   {name} ({len(got)} rows)')
print('FAILURES:', fails)
sys.exit(1 if fails else 0)
