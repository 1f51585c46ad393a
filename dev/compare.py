#!/usr/bin/env python3
"""Dev harness mimicking the driver's correctness gate: reads the Verify
output dir (spark parquet per query + oracle_sql.json), runs each oracle in
DuckDB over the same sf tables, and compares rows/schema/values."""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, name)
    try:
        sp = pq.read_table(spark_dir).to_pylist()
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        fails += 1
        continue
    try:
        db = con.execute(sql)
        cols = [d[0] for d in db.description]
        dk = [dict(zip(cols, r)) for r in db.fetchall()]
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails += 1
        continue
    # sort columns by name, compare value-by-value like the driver's hash
    def norm(rows):
        return [tuple((k, r[k]) for k in sorted(r)) for r in rows]
    a, b = norm(sp), norm(dk)
    if len(a) != len(b):
        print(f"FAIL {name}: rowcount spark={len(a)} duckdb={len(b)}")
        fails += 1
    elif a != b:
        bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
        print(f"FAIL {name}: first mismatch at row {bad}:\n  spark={a[bad]}\n  duck ={b[bad]}")
        fails += 1
    else:
        print(f"PASS {name} ({len(a)} rows)")
sys.exit(1 if fails else 0)
