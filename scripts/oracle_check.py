"""Local replica of the driver's CORRECTNESS gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` DuckDB
twin at one sf dir and compares row count, schema (column-name set),
and values (columns sorted by name, rows sorted by every column —
the driver's hash canonicalization). Use before a driver run after
ANY engine change::

    python scripts/oracle_check.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(list(v)) if isinstance(v, (list, tuple, np.ndarray))
                else str(v))
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def _values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            ok = np.array_equal(av.to_numpy(np.float64), bv.to_numpy(np.float64))
        elif pd.api.types.is_integer_dtype(av) and pd.api.types.is_integer_dtype(bv):
            ok = np.array_equal(av.to_numpy(np.int64), bv.to_numpy(np.int64))
        else:
            ok = (av.astype(str).to_numpy() == bv.astype(str).to_numpy()).all()
        if not ok:
            return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=None,
                    help="check only the first N entries (driver window)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from bobo_spark.session import get_spark

    spark = get_spark("oracle_check")
    q, o = e.queries(), e.oracle_sql()
    names = args.names or list(q)
    if args.first:
        names = names[:args.first]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    n_fail = 0
    results = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = q[name](spark, args.sf).toPandas()
            if name not in o:
                results[name] = {"rows": len(sdf), "oracle": "none (rows-only)"}
                print(f"  {name}: {len(sdf)} rows, NO-ORACLE  "
                      f"[{time.time()-t0:.1f}s]")
                continue
            odf = con.sql(o[name]).df()
            a, b = _canon(sdf), _canon(odf)
            rows = len(a) == len(b)
            schema = list(a.columns) == list(b.columns)
            vals = rows and schema and _values_match(a, b)
            ok = rows and schema and vals
            results[name] = {"rows_match": rows, "schema_match": schema,
                             "hash_match": vals, "spark_rows": len(a),
                             "oracle_rows": len(b)}
            if not ok:
                n_fail += 1
                print(f"FAIL {name}: rows={rows} schema={schema} vals={vals} "
                      f"({len(a)} vs {len(b)})")
                if not schema:
                    print(f"   spark cols: {list(a.columns)}")
                    print(f"   oracle cols: {list(b.columns)}")
            else:
                print(f"  ok {name}: {len(a)} rows  [{time.time()-t0:.1f}s]")
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            results[name] = {"err": f"{type(ex).__name__}: {ex}"}
            print(f"ERR  {name}: {type(ex).__name__}: {ex}")
    summary = {"checked": len(names), "failed": n_fail, "results": results}
    with open("/tmp/oracle_check_results.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"checked": len(names), "failed": n_fail,
                      "detail": "/tmp/oracle_check_results.json"}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
