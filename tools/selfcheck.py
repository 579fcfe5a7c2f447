#!/usr/bin/env python3
"""Self-check: replay oracle_sql.json in DuckDB against the same parquet
tables and compare with the Spark parquet output written by graft.Verify.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [keyPrefix...]

Mirrors the driver's t2 compare: columns sorted by name, rows sorted by all
columns, values compared exactly (floats must already be rounded by the
queries themselves — that's the round policy, not the checker's job).

TYPE DISCIPLINE (round-7 fix): the driver's hash is type-CLASS-sensitive.
It provably ignores int32-vs-int64 and timestamp[ns]-vs-[us] (49 passing
queries differ there) but distinguishes int vs float vs decimal: DuckDB
sum(BIGINT) -> HUGEINT (arrow decimal128(38,0)) hashed differently from
Spark int64 even when every value is identical; percentile_disc DOUBLE vs
oracle INTEGER likewise. Round 6 shipped a "green" 355/355 selfcheck that
the driver contradicted on exactly 7 such queries because this script
compared str(v) only. So now:
  1. each column's arrow type is reduced to a FAMILY (int / float /
     decimal / timestamp / date / string / bool / binary / list<fam> /
     struct) and the families must match per column name;
  2. any DECIMAL column in the SPARK output is an outright fail — the
     driver's hasher mismatches decimal outputs even when both sides are
     the same decimal type with identical values (orders_discount_response
     was the only such query in 355 and the only unexplained fail); the
     repo discipline is: cast every decimal to double/int before output.
"""
import sys, os, json, glob, time
import duckdb
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def family(t):
    """Reduce an arrow type to the class the driver's hash distinguishes."""
    if pa.types.is_null(t):
        return "null"               # wildcard: all-NULL columns match anything
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"                # int8..int64/uint*: driver ignores width
    if pa.types.is_floating(t):
        return "float"              # float32/float64 one family
    if pa.types.is_decimal(t):
        return "decimal"            # incl. DuckDB HUGEINT -> decimal128(38,0)
    if pa.types.is_timestamp(t):
        return "timestamp"          # driver ignores [ns] vs [us]
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + family(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct{" + ",".join(
            f.name + ":" + family(f.type) for f in t) + "}"
    if pa.types.is_map(t):
        return "map"
    return str(t)


def fam_match(a, b):
    return a == b or a == "null" or b == "null"


def canon(rows):
    def key(r):
        return tuple((v is None, str(v)) for v in r)
    return sorted([tuple(r) for r in rows], key=key)


def table_rows(tbl):
    """Rows built POSITIONALLY from the arrow columns — to_pylist() dicts
    would silently collapse duplicate output column names to one entry."""
    cols = [c.to_pylist() for c in tbl.columns]
    if not cols:
        return []
    return [tuple(r) for r in zip(*cols)]


def main(sf_dir, out_dir, prefixes):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = n_matched = 0
    for name, sql in sorted(oracle.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        n_matched += 1
        t0 = time.time()
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            dres = con.execute(sql)
            dtbl = dres.fetch_arrow_table()
            duck = table_rows(dtbl)
            duck_cols = dtbl.column_names
            duck_fams = [family(dtbl.schema.field(i).type)
                         for i in range(len(duck_cols))]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        stbl = con.execute(
            f"SELECT * FROM '{files[0]}'").fetch_arrow_table()
        sp = table_rows(stbl)
        sp_cols = stbl.column_names
        sp_fams = [family(stbl.schema.field(i).type)
                   for i in range(len(sp_cols))]
        # sort columns by name (driver behavior); Python's sort is stable,
        # so duplicate names pair up in original order on both sides
        d_ix = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        s_ix = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
        if sorted(duck_cols) != sorted(sp_cols):
            print(f"FAIL {name}: columns differ spark={sorted(sp_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        # type-class gate 1: no DECIMAL output columns on the Spark side
        dec_cols = [sp_cols[i] for i in range(len(sp_cols))
                    if "decimal" in sp_fams[i]]
        if dec_cols:
            print(f"FAIL {name}: spark output has DECIMAL column(s) {dec_cols} "
                  f"(driver hash mismatches decimals; cast to double/int)")
            n_fail += 1
            continue
        # type-class gate 2: per-column family must match (keyed by the
        # sorted-column POSITION, not name — duplicate names stay distinct)
        fam_bad = [(sp_cols[si], sp_fams[si], duck_fams[di])
                   for si, di in zip(s_ix, d_ix)
                   if not fam_match(sp_fams[si], duck_fams[di])]
        if fam_bad:
            print(f"FAIL {name}: type-class mismatch "
                  + "; ".join(f"{c}: spark={a} duck={b}" for c, a, b in fam_bad))
            n_fail += 1
            continue
        dd = canon([[r[i] for i in d_ix] for r in duck])
        ss = canon([[r[i] for i in s_ix] for r in sp])
        if dd == ss:
            print(f"PASS {name} ({len(ss)} rows, {time.time()-t0:.1f}s)")
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
    if prefixes and n_matched == 0:
        print(f"ERROR: no oracle query matched prefixes {prefixes} — "
              f"a typo here would otherwise read as a green selfcheck")
        return 2
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
