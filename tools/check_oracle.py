#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare to the Spark parquet dumps produced by
graft.Verify (sorted columns by name, rows as emitted, values compared with
exact equality after normalization)."""
import sys, json, math, datetime
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
# optional 3rd arg: comma-separated name prefixes to restrict the check
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)

fails = 0
for name, sql in sorted(oracle.items()):
    if only and not any(name.startswith(p) for p in only):
        continue
    try:
        want = con.execute(sql).fetch_arrow_table()
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        wcols, gcols = sorted(want.column_names), sorted(got.column_names)
        if wcols != gcols:
            print(f"FAIL {name}: columns want={wcols} got={gcols}"); fails += 1; continue
        wrows = [[norm(v) for v in row] for row in zip(*[want.column(c).to_pylist() for c in wcols])]
        grows = [[norm(v) for v in row] for row in zip(*[got.column(c).to_pylist() for c in gcols])]
        if len(wrows) != len(grows):
            print(f"FAIL {name}: rows want={len(wrows)} got={len(grows)}"); fails += 1; continue
        bad = [(i, w, g) for i, (w, g) in enumerate(zip(wrows, grows)) if w != g]
        if bad:
            i, w, g = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(wrows)} rows differ; first at {i}:\n  want {w}\n  got  {g}")
            fails += 1
        else:
            print(f"OK   {name} ({len(wrows)} rows)")
    except Exception as ex:
        print(f"ERR  {name}: {ex}"); fails += 1
sys.exit(1 if fails else 0)
