#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB executing oracle_sql.json over the same parquet tables.
Usage: python3 tools/check.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb

def canon(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

def table_of(rows, cols):
    # sort columns by name, then rows lexicographically
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        cur = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
        scols = [d[0] for d in cur.description]
        srows = cur.fetchall()
        oc, orws = table_of(orows, ocols)
        sc, srws = table_of(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}"); n_fail += 1; continue
        if len(orws) != len(srws):
            print(f"FAIL {name}: rows spark={len(srws)} oracle={len(orws)}"); n_fail += 1; continue
        if orws != srws:
            bad = [i for i, (a, b) in enumerate(zip(orws, srws)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {bad}")
            for i in bad:
                print(f"   oracle: {orws[i]}\n   spark : {srws[i]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(srws)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
