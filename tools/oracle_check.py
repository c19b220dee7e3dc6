#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL
in DuckDB over the testdata parquet and compare against the parquet
Verify wrote for the same query name (row count, column names, sorted
value hash). Usage: oracle_check.py <sfDir> <verifyOutDir> [name...]
"""
import sys, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # normalize -0.0 and represent with repr (exact)
        if v == 0.0:
            v = 0.0
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_sig(rows, cols):
    lines = sorted(",".join(norm_cell(c) for c in r) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return h, lines


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no verify output")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet({files!r})")
            gcols = [c.lower() for c in got.columns]
            gidx = sorted(range(len(gcols)), key=lambda i: gcols[i])
            grows = [[r[i] for i in gidx] for r in got.fetchall()]
            exp = con.sql(sql)
            ecols = [c.lower() for c in exp.columns]
            eidx = sorted(range(len(ecols)), key=lambda i: ecols[i])
            erows = [[r[i] for i in eidx] for r in exp.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1
            continue
        gh, gl = table_sig(grows, gcols)
        eh, el = table_sig(erows, ecols)
        if gh == eh:
            print(f"PASS {name} rows={len(grows)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: hash mismatch rows {len(grows)} vs {len(erows)}")
            diff_g = [l for l in gl if l not in set(el)][:3]
            diff_e = [l for l in el if l not in set(gl)][:3]
            for d in diff_g:
                print(f"   spark: {d}")
            for d in diff_e:
                print(f"  duckdb: {d}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
