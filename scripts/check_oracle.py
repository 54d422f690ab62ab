#!/usr/bin/env python3
"""Local differential gate, mimicking the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each <name>.parquet in verifyOutDir (written by graft.Verify), runs
oracle_sql.json[name] in DuckDB with views over <sfDir>/*.parquet, sorts
columns by name and rows by all columns, and compares values exactly.
"""
import json, sys, math
from pathlib import Path

import duckdb


def canon(rows, cols):
    # sort columns by name, then rows by stringified values
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(row):
        return tuple("\x00" if v is None else repr(v) for v in row)
    return [c for c in sorted(cols)], sorted(out, key=key)


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        import decimal
        if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
            return float(a) == float(b)
    except Exception:
        pass
    # duckdb timestamps vs parquet timestamps
    return str(a) == str(b)


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    names = sorted(d.name for d in out.iterdir() if d.is_dir())
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = list((out / name).glob("*.parquet"))
        if not files:
            print(f"  {name}: NO OUTPUT FILES")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM '{out / name}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if name not in oracle:
            print(f"  {name}: no oracle (rows={len(got_rows)}) [rows-only]")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"  {name}: COLUMN MISMATCH spark={gc} duck={ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(gr)} duck={len(er)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if not all(eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"  {name}: VALUE MISMATCH at sorted-row {bad[0]}:")
            print(f"    cols : {gc}")
            print(f"    spark: {bad[1]}")
            print(f"    duck : {bad[2]}")
            n_fail += 1
        else:
            print(f"  {name}: OK ({len(gr)} rows)")
            n_pass += 1
    print(f"\nPASS={n_pass} FAIL={n_fail} rows-only={n_noracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
