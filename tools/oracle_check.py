#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs
<verifyOutDir>/oracle_sql.json's SQL in DuckDB against the sfDir
tables, and compares row counts + sorted-value hashes.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows by string repr (driver-style)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{files[0]}'")
        gcols = [c[0] for c in got.description]
        grows = got.fetchall()
        if name not in oracle:
            print(f"[ROWS-ONLY] {name}: {len(grows)} rows, cols={gcols}")
            if len(grows) == 0: n_fail += 1
            else: n_pass += 1
            continue
        try:
            exp = con.execute(oracle[name])
            ecols = [c[0] for c in exp.description]
            erows = exp.fetchall()
            # the driver's hasher is TYPE-sensitive through Arrow: a
            # DuckDB HUGEINT (bare SUM of BIGINT) arrives as
            # decimal128 and mismatches Spark's int64 even when values
            # are equal — catch that class of failure here too.
            # LIMIT 0 keeps the schema probe from re-running the query.
            etypes = {f.name: str(f.type) for f in
                      con.execute(f"SELECT * FROM ({oracle[name]}) LIMIT 0").arrow().schema}
            gtypes = {f.name: str(f.type) for f in
                      con.execute(f"SELECT * FROM '{files[0]}' LIMIT 0").arrow().schema}
            badtypes = {c: (gtypes.get(c), etypes.get(c)) for c in etypes
                        if c in gtypes and gtypes[c] != etypes[c]}
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); n_fail += 1; continue
        if sorted(gcols) != sorted(ecols):
            print(f"[SCHEMA] {name}: spark={sorted(gcols)} oracle={sorted(ecols)}")
            n_fail += 1; continue
        if badtypes:
            print(f"[TYPES] {name}: spark vs oracle arrow types differ: {badtypes}")
            n_fail += 1; continue
        g, e = canon(grows, gcols), canon(erows, ecols)
        if len(g) != len(e):
            print(f"[ROWS] {name}: spark={len(g)} oracle={len(e)}"); n_fail += 1; continue
        if g != e:
            diff = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
            print(f"[HASH] {name}: {len(g)} rows, first diffs at {diff}")
            for i in diff:
                print(f"    spark : {g[i]}")
                print(f"    oracle: {e[i]}")
            n_fail += 1; continue
        print(f"[OK] {name}: {len(g)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
