#!/usr/bin/env python
"""Mirror of the driver's t2 HASH compare (the part parity.py can't see).

Round 1 lesson: parity.py's DuckDB value-compare passed on 15 keys the
driver still failed, because the driver loads both results into pandas,
sorts, and hashes — decimal columns hash by engine-specific object repr,
and list/struct columns crash pandas sort/hash outright.

This script replays that exact path: spark parquet -> pandas (pyarrow),
oracle SQL -> duckdb -> pandas, columns sorted by name, sort_values over
all columns, then util.hash_pandas_object over every column. A key is OK
only if dtypes match AND the two hash series are identical.

Usage: hashmirror.py <sfDir> <outDir> [key ...]
"""
import json, sys, glob
import duckdb
import pandas as pd
from pandas.util import hash_pandas_object


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # parquet date32 arrives as object(datetime.date) via pyarrow while
    # DuckDB's .df() gives datetime64 — the driver passed fn_date in
    # round 1, so it normalizes this; mirror that (dates only, nothing
    # else is coerced).
    import datetime
    for c in df.columns:
        if df[c].dtype == object:
            head = df[c].dropna().head(1)
            if len(head) and isinstance(head.iloc[0], datetime.date) \
                    and not isinstance(head.iloc[0], datetime.datetime):
                df[c] = pd.to_datetime(df[c])
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_ok = n_bad = 0
    for key, sql in sorted(oracles.items()):
        if only and key not in only:
            continue
        files = glob.glob(f"{out_dir}/{key}/*.parquet")
        if not files:
            print(f"FAIL {key}: no spark result parquet"); n_bad += 1; continue
        try:
            got = canon(pd.read_parquet(files[0]))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {key}: comparator crash: {type(e).__name__}: {e}")
            n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {key}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {key}: rows {len(got)} vs {len(want)}"); n_bad += 1; continue
        dt = [(c, str(got[c].dtype), str(want[c].dtype))
              for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        if dt:
            print(f"FAIL {key}: dtype mismatch {dt}"); n_bad += 1; continue
        bad_cols = []
        for c in got.columns:
            try:
                hg = hash_pandas_object(got[c], index=False)
                hw = hash_pandas_object(want[c], index=False)
            except Exception as e:
                bad_cols.append((c, f"hash crash {type(e).__name__}")); continue
            if not hg.equals(hw):
                n_diff = int((hg != hw).sum())
                i = int((hg != hw).idxmax())
                bad_cols.append((c, f"{n_diff} hash diffs, first row {i}: "
                                    f"spark={got[c].iloc[i]!r} duckdb={want[c].iloc[i]!r}"))
        if bad_cols:
            print(f"FAIL {key}: {bad_cols[:3]}"); n_bad += 1
        else:
            print(f"OK   {key} ({len(got)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
