#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark output), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the same fixture
tables, and compares as sorted row multisets with exact values.
"""
import sys, json, glob, os
import duckdb

def norm(v):
    if isinstance(v, float):
        # exact compare, but normalize -0.0 and NaN representation
        if v != v:
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def rows_of(res, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in res)

# Driver-hash equivalence class of a DuckDB type. Empirically (r4): int
# widths TINYINT..BIGINT hash identically (python ints), but HUGEINT
# (int128) does NOT, and distinct float/decimal/timestamp representations
# would not either. Two columns are hash-safe iff their classes match.
def hash_class(t):
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s.startswith(("HUGEINT", "UHUGEINT")):
        return "hugeint"
    return s

def connect(sf_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table = directory of part files
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def time_oracles(sf_dir, out_dir, budget_sec):
    """Pre-round gate risk scan: run EVERY oracle SQL in DuckDB and flag
    anything slower than budget_sec (a pathological oracle is the class
    that zeroed round 10's correctness gate). Usage:
        python3 scripts/check_oracle.py --time <sfDir> <verifyOutDir> [budget]
    """
    import time
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    slow = []
    rows = []
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.sql(oracle[name]).fetchall()
            dt = time.time() - t0
        except Exception as e:
            print(f"  {name}: ERROR {str(e).splitlines()[0][:160]}")
            slow.append((name, float("inf")))
            continue
        rows.append((dt, name))
        if dt > budget_sec:
            slow.append((name, dt))
    for dt, name in sorted(rows, reverse=True)[:10]:
        print(f"  {dt:6.1f}s {name}")
    if slow:
        print(f"GATE RISK: {len(slow)} oracle(s) over {budget_sec}s: {slow}")
    elif rows:
        print(f"ALL ORACLES within {budget_sec}s budget "
              f"(max {max(rows)[0]:.1f}s {max(rows)[1]})")
    else:
        print("no oracles found in oracle_sql.json")
    sys.exit(1 if slow else 0)

def main():
    if sys.argv[1] == "--time":
        time_oracles(sys.argv[2], sys.argv[3],
                     float(sys.argv[4]) if len(sys.argv) > 4 else 30.0)
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"  {name}: NO SPARK OUTPUT"); n_fail += 1; continue
        sres = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in sres.description]
        stypes = dict(zip(scols, [hash_class(t) for t in sres.types]))
        srows = rows_of(sres.fetchall(), scols)
        if name not in oracle:
            print(f"  {name}: no oracle (rows-only) rows={len(srows)}")
            continue
        try:
            dres = con.sql(oracle[name])
            dcols = [d[0] for d in dres.description]
            # The driver hashes DuckDB values by serialized type; HUGEINT
            # (int128, e.g. from a bare sum(BIGINT) outer column) hashes
            # differently from Spark's int64 even when values match (r4 q101).
            # Fail loudly here so the class can't recur.
            dtypes = dict(zip(dcols, [hash_class(t) for t in dres.types]))
            hazards = [f"{c}:{t}" for c, t in dtypes.items() if t == "hugeint"]
            if hazards:
                print(f"  {name}: ORACLE TYPE HAZARD (driver hash-unsafe): {hazards}")
                n_fail += 1; continue
            # Spark vs oracle column hash-classes must agree (q101's bug
            # class generalized: matching values in different serialized
            # types still hash-mismatch on the driver).
            drift = {c: (stypes.get(c), dtypes.get(c))
                     for c in set(stypes) | set(dtypes)
                     if stypes.get(c) != dtypes.get(c)}
            if drift:
                print(f"  {name}: ORACLE TYPE DRIFT (driver hash-unsafe): {drift}")
                n_fail += 1; continue
            drows = rows_of(dres.fetchall(), dcols)
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {str(e).splitlines()[0][:200]}")
            n_fail += 1; continue
        if sorted(scols) != sorted(dcols):
            print(f"  {name}: SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1; continue
        if srows == drows:
            print(f"  {name}: PASS rows={len(srows)}"); n_pass += 1
        else:
            n_fail += 1
            print(f"  {name}: VALUE MISMATCH spark_rows={len(srows)} duck_rows={len(drows)}")
            diff_s = [r for r in srows if r not in set(drows)][:3]
            diff_d = [r for r in drows if r not in set(srows)][:3]
            print(f"    spark-only: {diff_s}")
            print(f"    duck-only : {diff_d}")
    print(f"PASS={n_pass} FAIL={n_fail}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
