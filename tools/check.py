#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads oracle_sql.json + per-query parquet dirs produced by `graft.Verify`,
runs each oracle SQL in DuckDB over the same sf tables, and compares
schema / row count / values (columns sorted by name, rows sorted).
Driver-side only — never imported by the Scala engine.
"""
import sys, json, math, glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — we engineered bit-equality
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def rows_of(df):
    # Fetch through pandas like the driver does: its hash is dtype-
    # sensitive (DuckDB HUGEINT -> object vs Spark int64 broke q27/q70
    # in round 1 despite equal values), and array cells crash its
    # sort_values (q47/q47b/q64). Reproduce both failure classes here.
    df = df[sorted(df.columns)]
    # Compare dtype KIND, not exact width: round 1 showed the driver's
    # hash treats int32 vs int64 as equal (q23/q45/q58 were green) but
    # object (DuckDB HUGEINT) vs int64 as different (q27/q70 were red).
    dtypes = [t.kind for t in df.dtypes]
    # Scan a bounded sample of non-null cells, not just row 0: a column
    # whose first cell is None/empty but holds ndarrays later would
    # otherwise slip past this guard and crash the driver's sort_values.
    def has_array_cell(col):
        sample = col.dropna().head(64)
        return any(type(v).__name__ == "ndarray" for v in sample)
    arrayish = [c for c in df.columns if len(df) and has_array_cell(df[c])]
    data = sorted(tuple(norm(v) for v in row)
                  for row in df.itertuples(index=False, name=None))
    return list(df.columns), dtypes, arrayish, data


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = 0
    failures = []
    all_dirs = {p.rstrip("/").split("/")[-1] for p in glob.glob(f"{out}/*/")}
    for name in sorted(all_dirs | set(oracle)):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            failures.append(f"{name}: NO OUTPUT parquet")
            continue
        # Read the Spark side via pandas/pyarrow — the driver's path.
        # (Round 3 lesson: reading it through duckdb.read_parquet coerced
        # DECIMAL to float64 on both sides and masked q105's object-vs-
        # float64 dtype divergence; pyarrow surfaces decimal128 as object
        # exactly like the driver sees it.)
        got_df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                           ignore_index=True)
        gcols, gtypes, garr, grows = rows_of(got_df)
        if name not in oracle:
            status = "rows-only"
            if len(grows) > 0:
                n_ok += 1
                print(f"  ok(rows-only) {name}: {len(grows)} rows")
            else:
                failures.append(f"{name}: rows-only check, 0 rows")
            continue
        try:
            ecols, etypes, earr, erows = rows_of(con.execute(oracle[name]).df())
        except Exception as e:
            failures.append(f"{name}: ORACLE SQL ERROR {e}")
            continue
        if garr or earr:
            failures.append(
                f"{name}: ARRAY CELLS crash the driver checker "
                f"(spark={garr} oracle={earr}) — scalarize both sides")
        elif gcols != ecols:
            failures.append(f"{name}: SCHEMA got={gcols} exp={ecols}")
        elif gtypes != etypes:
            diffs = [(c, g, e) for c, g, e in zip(gcols, gtypes, etypes)
                     if g != e]
            failures.append(
                f"{name}: DTYPES differ (driver hash is dtype-sensitive) "
                f"{diffs}")
        elif len(grows) != len(erows):
            failures.append(f"{name}: ROWS got={len(grows)} exp={len(erows)}")
        elif grows != erows:
            diffs = [(g, e) for g, e in zip(grows, erows) if g != e][:3]
            failures.append(f"{name}: VALUES differ, first diffs={diffs}")
        else:
            n_ok += 1
            print(f"  ok {name}: {len(grows)} rows")
    print(f"\n{n_ok} ok, {len(failures)} failed")
    for f in failures:
        print(f"  FAIL {f}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
