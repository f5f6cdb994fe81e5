#!/usr/bin/env python
"""Local mirror of the driver's t2 DuckDB-oracle compare (SURVEY §5.2 item 2).

Usage: parity.py <sfDir> <outDir> [key ...]

Reads each Spark result parquet under <outDir>/<key>/ and compares it to
the DuckDB run of oracle_sql.json[key] against the same fixture tables.
Compare semantics mirror the driver's description: columns sorted by name,
then row-order-sensitive value compare (queries are required to be fully
ORDER BY'd — rule D1).
"""
import json, sys, glob
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_ok = n_bad = 0
    for key, sql in sorted(oracles.items()):
        if only and key not in only:
            continue
        files = glob.glob(f"{out_dir}/{key}/*.parquet")
        if not files:
            print(f"FAIL {key}: no spark result parquet"); n_bad += 1; continue
        def eq(x, y):
            if repr(x) == repr(y):
                return True
            try:
                return bool(x == y)
            except Exception:
                return False
        try:
            gdesc = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{files[0]}')").fetchall()}
            wdesc = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
            gc, wc = sorted(gdesc), sorted(wdesc)
            if gc != wc:
                print(f"FAIL {key}: columns {gc} vs {wc}"); n_bad += 1; continue
            tdiff = [(c, gdesc[c], wdesc[c]) for c in gc if gdesc[c] != wdesc[c]]
            if tdiff:
                print(f"FAIL {key}: dtype mismatch {tdiff}"); n_bad += 1; continue
            proj = ", ".join(f'"{c}"' for c in gc)
            got = con.execute(
                f"SELECT {proj} FROM read_parquet('{files[0]}')").fetchall()
            want = con.execute(f"SELECT {proj} FROM ({sql})").fetchall()
        except Exception as e:
            print(f"FAIL {key}: {e}"); n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {key}: rows {len(got)} vs {len(want)}"); n_bad += 1; continue
        bad = [(i, c, x, y)
               for i, (gr, wr) in enumerate(zip(got, want))
               for c, x, y in zip(gc, gr, wr) if not eq(x, y)]
        if bad:
            n_bad += 1
            print(f"FAIL {key}: {len(bad)} value mismatches")
            for i, c, x, y in bad[:4]:
                print(f"  row={i} col={c}: spark={x!r} duckdb={y!r}")
        else:
            n_ok += 1
            print(f"OK   {key} ({len(got)} rows)")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
