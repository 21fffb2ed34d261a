#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name> (Spark parquet output) and runs the
matching SQL from oracle_sql.json in DuckDB against the raw tables in
<sf_dir>; compares after sorting columns by name and rows by all columns.
"""
import sys, os, json, glob

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        # ScaleGen replicas are Spark-written directories; driver testdata
        # is a single file per table.
        src = (f"read_parquet('{p}/**/*.parquet')" if os.path.isdir(p)
               else f"read_parquet('{p}')")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        if t == "events":
            ts_type = dict((r[0], r[1]) for r in
                           con.execute("DESCRIBE events").fetchall())["ts"]
            if ts_type == "BIGINT":
                # replica encoding: raw nanos as INT64 (Spark cannot write
                # TIMESTAMP(NANOS)); rebuild the µs-truncated timestamp the
                # same way Tables.events does
                con.execute("DROP VIEW events")
                con.execute(f"CREATE VIEW events AS SELECT * REPLACE "
                            f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    produced = {os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d)}
    failures = 0
    for name in sorted(produced | set(oracle)):
        if name not in produced:
            print(f"FAIL {name}: oracle present but no Spark output")
            failures += 1
            continue
        spark_df = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        bad = []
        for c in s.columns:
            sv, dv = s[c].to_numpy(), d[c].to_numpy()
            # Dtype-strict: the driver hashes each side's native representation,
            # so an integer column on one side and a float/object column on the
            # other (e.g. DuckDB HUGEINT from an uncast sum()) is a hash
            # mismatch even when values are numerically equal. Replicate that.
            skind, dkind = sv.dtype.kind, dv.dtype.kind
            numeric = {"i", "u", "f"}
            if skind != dkind and (skind in numeric or dkind in numeric) \
                    and not (skind in "iu" and dkind in "iu"):
                bad.append(f"{c}: dtype mismatch spark={sv.dtype} duck={dv.dtype} "
                           f"(uncast DuckDB sum()? wrap in CAST(... AS BIGINT))")
                continue
            if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
                sv = sv.astype(float); dv = dv.astype(float)
                both_nan = np.isnan(sv) & np.isnan(dv)
                eq = both_nan | (sv == dv)
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}: row {i} spark={sv[i]!r} duck={dv[i]!r} "
                               f"maxdiff={np.nanmax(np.abs(sv - dv))}")
            else:
                eq = pd.Series(sv).astype(str) == pd.Series(dv).astype(str)
                if not eq.all():
                    i = int(np.argmin(eq.to_numpy()))
                    bad.append(f"{c}: row {i} spark={sv[i]!r} duck={dv[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3]))
            failures += 1
        else:
            print(f"PASS {name} ({len(s)} rows, {len(s.columns)} cols)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
