#!/usr/bin/env python3
"""Driver-semantics-faithful oracle compare for graft.Verify output.

Usage: python3 scripts/compare.py <verify_outdir> <sfdir> [prefix1,prefix2]

Reads each query's Spark parquet TYPED (pyarrow via pandas — Decimal
columns stay `decimal.Decimal` objects, exactly what the round driver
sees), runs the paired DuckDB oracle SQL and fetches through the
client (`fetchdf`, which coerces DECIMAL to float64 — also what the
driver sees), then hash-compares cell-by-cell with type-aware
formatting. This intentionally reproduces the driver's asymmetry: a
query that emits DECIMAL output hashes differently on the two sides
EVEN WHEN every value is integer-identical — the r7/r8 blind spot
(the old /tmp/compare.py read the Spark parquet back *through* DuckDB,
collapsing both sides to float64 and hiding exactly that divergence
for two rounds; `events_moments` shipped red twice).

Formatting rules (per cell):
  - None/NaN/NaT            -> "NULL"
  - float (any width)       -> "%.6f"
  - decimal.Decimal         -> "decimal:<str>"   (never equals a float)
  - bool                    -> "true"/"false"
  - int (any width)         -> str
  - bytes                   -> "0x" + hex
  - list/ndarray            -> "[" + ",".join(recurse) + "]"
  - timestamp/date          -> isoformat

PRECONDITION: rows are compared POSITIONALLY (no row sort), which is
sound only because every registered query ends in ORDER BY and Spark
part files glob-sort into global order. A future unordered query would
flap as spurious MISMATCH; the mismatch diagnostics detect that case
and print "rows differ only in ORDER" so the flap self-explains.
"""
import sys, json, glob, hashlib, decimal, datetime

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "partsupp",
          "orders", "lineitem", "events", "documents", "embeddings"]


def fmt(v):
    if v is None:
        return "NULL"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(fmt(e) for e in v) + "]"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        return "decimal:" + str(v)
    if isinstance(v, (float, np.floating)):
        if np.isnan(v):
            return "NULL"
        return "%.6f" % v
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, str):
        # type-marked: int 5 and string "5" must NOT hash equal — the
        # repo contract sends exact big integers as STRING on both
        # sides, so a BIGINT-vs-VARCHAR divergence is exactly the class
        # the driver's typed hash flags
        return "s:" + v
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        if pd.isna(v):
            return "NULL"
        return v.isoformat()
    if v is pd.NaT or (isinstance(v, type(pd.NA)) if hasattr(pd, "NA") else False):
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def table_hash(df):
    df = df.reindex(sorted(df.columns), axis=1)
    h = hashlib.md5()
    for row in df.itertuples(index=False, name=None):
        h.update(("|".join(fmt(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    prefixes = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        except Exception:
            pass
    fails = []
    for name, sql in sorted(oracle.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        parts = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not parts:
            print(name, "NO SPARK OUTPUT")
            fails.append(name)
            continue
        try:
            o = con.execute(sql).fetchdf()
        except Exception as e:
            print(name, "ORACLE ERROR", str(e)[:200])
            fails.append(name)
            continue
        # TYPED read of the Spark side — pyarrow, never through DuckDB
        s = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        cols_ok = sorted(o.columns) == sorted(s.columns)
        ok = cols_ok and len(o) == len(s) and table_hash(o) == table_hash(s)
        print(name, "OK" if ok else "MISMATCH",
              f"rows spark={len(s)} oracle={len(o)}")
        if not ok:
            fails.append(name)
            print("  spark cols", list(s.columns),
                  "oracle cols", list(o.columns))
            if cols_ok and len(o) == len(s):
                sc = s.reindex(sorted(s.columns), axis=1)
                oc = o.reindex(sorted(o.columns), axis=1)
                # order-only divergence check (see PRECONDITION above):
                # same row multiset in a different order means the query
                # lost its total ORDER BY, not its values
                srows = sorted("|".join(fmt(v) for v in r)
                               for r in sc.itertuples(index=False, name=None))
                orows = sorted("|".join(fmt(v) for v in r)
                               for r in oc.itertuples(index=False, name=None))
                if srows == orows:
                    print("  rows differ only in ORDER — the query's "
                          "ORDER BY is not a total order on both engines")
                shown = 0
                # itertuples, NOT .iloc[i]: a row Series upcasts mixed
                # dtypes (int32 beside float64 prints as float) — the
                # same per-column typing the hash uses must diagnose
                for i, (rs_t, ro_t) in enumerate(zip(
                        sc.itertuples(index=False, name=None),
                        oc.itertuples(index=False, name=None))):
                    rs = [fmt(v) for v in rs_t]
                    ro = [fmt(v) for v in ro_t]
                    if rs != ro:
                        print(f"  row {i}: spark={rs} oracle={ro}")
                        shown += 1
                        if shown >= 3:
                            break
            else:
                print(s.head(3))
                print(o.head(3))
    print("FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
