#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle gate: run Verify's
parquet dumps against oracle_sql.json in DuckDB and diff values.
Usage: oracle_check.py <sfDir> <verifyOutDir>
(Developer tool only — the shipped library is pure Scala/Spark.)
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, int):
        return float(v) if False else v
    return str(v)

def table_key(rows, cols):
    # sort columns by name (driver semantics), then sort rows
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in idx]

# Output types the driver's Arrow hasher treats identically to Spark's.
# Anything else (HUGEINT from uncast window SUM(BIGINT), DECIMAL, TINYINT)
# hash-mismatches even on bit-identical values — the q188 class of failure.
SAFE_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE", "BOOLEAN",
              "TIMESTAMP", "TIMESTAMP WITH TIME ZONE"}

def type_preflight(con, oracles):
    """DESCRIBE every oracle; fail on any output column whose DuckDB type
    is outside SAFE_TYPES (HUGEINT/DECIMAL must be explicitly cast)."""
    bad = 0
    for name in sorted(oracles):
        try:
            rows = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            print(f"TYPEFAIL {name}: describe error: {e}")
            bad += 1
            continue
        offenders = [(c, t) for c, t, *_ in rows if t not in SAFE_TYPES]
        if offenders:
            print(f"TYPEFAIL {name}: unsafe oracle output types {offenders}"
                  " — cast explicitly (e.g. CAST(x AS BIGINT))")
            bad += 1
    return bad

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_typefail = type_preflight(con, oracles)
    if "--types-only" in sys.argv:
        print(f"== {len(oracles)} oracles, {n_typefail} typefail ==")
        return 1 if n_typefail else 0
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gk, gc = table_key(got, got_cols)
        wk, wc = table_key(want, want_cols)
        if gc != wc:
            print(f"FAIL {name}: columns spark={gc} oracle={wc}")
            n_fail += 1
        elif gk != wk:
            diffs = [(a, b) for a, b in zip(gk, wk) if a != b]
            print(f"FAIL {name}: rows spark={len(gk)} oracle={len(wk)}, "
                  f"first diffs: {diffs[:3]}"
                  + (f" extra_spark={gk[len(wk):][:2]}" if len(gk) > len(wk) else "")
                  + (f" extra_oracle={wk[len(gk):][:2]}" if len(wk) > len(gk) else ""))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gk)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_typefail} typefail ==")
    return 1 if (n_fail or n_typefail) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
