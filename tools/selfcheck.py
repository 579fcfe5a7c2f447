#!/usr/bin/env python3
"""Self-check: replay oracle_sql.json in DuckDB against the same parquet
tables and compare with the Spark parquet output written by graft.Verify.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Mirrors the driver's t2 compare: columns sorted by name, rows sorted by all
columns, values compared exactly (floats must already be rounded by the
queries themselves — that's the round policy, not the checker's job).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    def key(r):
        return tuple((v is None, str(v)) for v in r)
    return sorted([tuple(r) for r in rows], key=key)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).fetchall()
            duck_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sp = con.execute(f"SELECT * FROM '{files[0]}'").fetchall()
        sp_cols = [d[0] for d in con.description]
        # sort columns by name (driver behavior)
        d_ix = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        s_ix = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
        if sorted(duck_cols) != sorted(sp_cols):
            print(f"FAIL {name}: columns differ spark={sorted(sp_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        dd = canon([[r[i] for i in d_ix] for r in duck])
        ss = canon([[r[i] for i in s_ix] for r in sp])
        if dd == ss:
            print(f"PASS {name} ({len(ss)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(ss)} spark rows vs {len(dd)} duck rows")
            for i, (a, b) in enumerate(zip(ss, dd)):
                if a != b:
                    print(f"  first diff row {i}:\n    spark={a}\n    duck ={b}")
                    break
            if len(ss) != len(dd):
                only_s = [r for r in ss if r not in dd][:2]
                only_d = [r for r in dd if r not in ss][:2]
                print(f"    only-spark(2)={only_s}\n    only-duck(2) ={only_d}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
