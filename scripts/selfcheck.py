#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff values. Usage:
    python3 scripts/selfcheck.py /tmp/verify_out /root/testdata/sf0.01
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pq.read_table(files[0])
        want = con.sql(oracle[name]).arrow()
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} vs {wcols}"); n_fail += 1; continue
        g = [tuple(str(r[c]) for c in gcols) for r in got.to_pylist()]
        w = [tuple(str(r[c]) for c in wcols) for r in want.to_pylist()]
        if sorted(g) == sorted(w):
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows")
            sg, sw = sorted(g), sorted(w)
            shown = 0
            for i in range(max(len(sg), len(sw))):
                a = sg[i] if i < len(sg) else None
                b = sw[i] if i < len(sw) else None
                if a != b:
                    print(f"  spark:  {a}\n  oracle: {b}")
                    shown += 1
                    if shown >= 3: break
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
