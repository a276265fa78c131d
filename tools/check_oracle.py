#!/usr/bin/env python3
"""Dev-side replica of the driver's t2 correctness gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

For each query result parquet under <verify_out_dir>/<name>/, run the
matching oracle SQL from oracle_sql.json in DuckDB against the parquet
tables in <sf_dir>, then compare: row count, column names (sorted), and
a hash of all values with columns sorted by name and rows sorted by all
columns. Floats rounded to 9 significant-ish decimals before hashing to
absorb engine-level ulp noise (the real driver may be stricter - keep
oracle SQL exact where possible).
"""
import sys, json, glob, os
import duckdb


def fetch(rel):
    """Fetch through Arrow (like the driver does) so type-level drift —
    e.g. DuckDB HUGEINT (sum of ints) arriving as decimal128 instead of
    int64 — is visible locally instead of only in the driver's gate."""
    tbl = rel.arrow()
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, rows


def canon(rows, cols):
    # sort columns by name, then rows lexicographically by repr
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            rr.append(repr(v))
        out.append(tuple(rr))
    out.sort()
    return out


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"  {name}: NO RESULT FILES")
            n_fail += 1
            continue
        gcols, grows = fetch(con.execute(f"SELECT * FROM read_parquet({files!r})"))
        if name not in oracle:
            print(f"  {name}: rows-only check, {len(grows)} rows "
                  f"{'PASS' if len(grows) > 0 else 'FAIL (0 rows)'}")
            n_pass += len(grows) > 0
            n_fail += len(grows) == 0
            continue
        try:
            ecols, erows = fetch(con.execute(oracle[name]))
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"  {name}: SCHEMA MISMATCH spark={sorted(gcols)} oracle={sorted(ecols)}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(grows)} oracle={len(erows)}")
            n_fail += 1
            continue
        cg, ce = canon(grows, gcols), canon(erows, ecols)
        if cg != ce:
            bad = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b][:3]
            print(f"  {name}: VALUE MISMATCH at sorted-rows {bad}")
            for i in bad:
                print(f"    spark : {cg[i]}")
                print(f"    oracle: {ce[i]}")
            n_fail += 1
            continue
        print(f"  {name}: PASS ({len(grows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
