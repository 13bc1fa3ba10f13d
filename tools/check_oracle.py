#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view named after the table,
runs every oracle SQL from <verifyOutDir>/oracle_sql.json, and compares
against the Spark result parquet at <verifyOutDir>/<name>/ —
column-name-sorted, row-sorted, exact value equality (no float
tolerance: oracles are written so double results are bit-identical
or rounded on both sides).
"""
import json, sys, glob, os
import duckdb

# Driver-compat dtype allowlist (VERDICT r6 item 2): the driver's pandas
# canonicalizer crashes on non-scalar columns (array<...> → unhashable
# ndarray) and hashes DuckDB HUGEINT differently from int64 (DuckDB
# widens sum(BIGINT) → HUGEINT unless the final SELECT casts it back).
# Any column outside this set on EITHER side is a lint failure even when
# values match locally.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                 "FLOAT", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN"}

def lint_types(con, name, sql, spark_glob):
    """DESCRIBE both sides; return list of lint-failure strings."""
    errs = []
    for side, q in (("oracle", sql),
                    ("spark", f"SELECT * FROM read_parquet('{spark_glob}')")):
        for row in con.execute(f"DESCRIBE {q}").fetchall():
            col, typ = row[0], row[1]
            t = typ.upper()
            if "[" in t or t.startswith(("STRUCT", "MAP", "LIST", "UNION")):
                errs.append(f"{side}.{col} is non-scalar ({typ}) — "
                            "driver pandas canonicalizer crashes on these")
            elif t not in ALLOWED_TYPES:
                errs.append(f"{side}.{col} has driver-unsafe type {typ} "
                            "(HUGEINT/DECIMAL hash differently than int64 "
                            "— CAST the final SELECT)")
    return errs

def canon(rows, cols):
    # sort columns by name, then rows lexicographically by string repr
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in idx]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        # Driver testdata tables are single files; ScaleUp-derived trees
        # (scaledata/sf1, sf3) are Spark output DIRECTORIES — glob the
        # part files so either shape registers.
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output at {spark_glob}")
            n_fail += 1
            continue
        try:
            lint = lint_types(con, name, sql, spark_glob)
            if lint:
                print(f"FAIL {name}: dtype lint: " + "; ".join(lint))
                n_fail += 1
                continue
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
            sq = con.execute(f"SELECT * FROM read_parquet('{spark_glob}')")
            scols = [d[0] for d in sq.description]
            srows = sq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        orows_c, ocols_s = canon(orows, ocols)
        srows_c, scols_s = canon(srows, scols)
        if [c.lower() for c in ocols_s] != [c.lower() for c in scols_s]:
            print(f"FAIL {name}: columns differ oracle={ocols_s} spark={scols_s}")
            n_fail += 1
            continue
        if len(orows_c) != len(srows_c):
            print(f"FAIL {name}: rowcount oracle={len(orows_c)} spark={len(srows_c)}")
            n_fail += 1
            continue
        mism = 0
        first = None
        for a, b in zip(orows_c, srows_c):
            if a != b:
                mism += 1
                if first is None:
                    first = (a, b)
        if mism:
            print(f"FAIL {name}: {mism}/{len(orows_c)} rows differ; first: oracle={first[0]} spark={first[1]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(orows_c)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
