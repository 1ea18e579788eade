#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify output
against the DuckDB oracle. Usage: check.py [sfDir] [verifyOutDir]."""
import duckdb, sys, json, os

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

print(f'duckdb {duckdb.__version__}', file=sys.stderr)
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    # driver testdata is one file per table; Spark-written data (e.g.
    # the sf1 scale-up) is a directory of part files
    src = f'{sf}/{t}.parquet'
    if os.path.isdir(src):
        src = f'{src}/*.parquet'
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    # Driver testdata stores events.ts as TIMESTAMP(NANOS); Spark-written
    # scale-ups (data/sf1) store it as BIGINT nanos because Spark reads
    # nanos as long and cannot write the nanos logical type back.
    # Normalize to the same microsecond-truncated TIMESTAMP DuckDB gets
    # from the nanos type, so the oracle SQL works against both.
    if t == 'events':
        cols = con.sql('DESCRIBE events').df()
        tstype = cols.loc[cols['column_name'] == 'ts', 'column_type']
        if len(tstype) and str(tstype.iloc[0]) == 'BIGINT':
            con.sql("CREATE OR REPLACE VIEW events AS "
                    f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) FROM '{src}'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
ok, bad = [], []
for name in sorted(oracle):
    sql = oracle[name]
    pq = f'{out}/{name}'
    if not os.path.isdir(pq):
        bad.append((name, 'missing spark output')); continue
    try:
        sdf = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
    except Exception as e:
        bad.append((name, f'spark read fail: {e}')); continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        bad.append((name, f'oracle fail: {e}')); continue
    sdf = sdf[sorted(sdf.columns)]
    odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        bad.append((name, f'schema: spark={list(sdf.columns)} oracle={list(odf.columns)}')); continue
    if len(sdf) != len(odf):
        bad.append((name, f'rowcount: spark={len(sdf)} oracle={len(odf)}')); continue
    cols = list(sdf.columns)
    sdf = sdf.sort_values(by=cols, ignore_index=True)
    odf = odf.sort_values(by=cols, ignore_index=True)
    mismatches = []
    for c in cols:
        a, b = sdf[c], odf[c]
        if str(a.dtype) != str(b.dtype):
            mismatches.append(f'{c}: dtype {a.dtype} vs {b.dtype}')
        neq = ~((a == b) | (a.isna() & b.isna()))
        if neq.any():
            i = neq.idxmax()
            mismatches.append(f'{c}: {int(neq.sum())} diffs, first@{i}: {a[i]!r} vs {b[i]!r}')
    if mismatches:
        bad.append((name, '; '.join(mismatches)))
    else:
        ok.append(name)

print(f'PASS {len(ok)}/{len(ok)+len(bad)}: {" ".join(ok)}')
for name, why in bad:
    print(f'FAIL {name}: {why}')
sys.exit(1 if bad else 0)
