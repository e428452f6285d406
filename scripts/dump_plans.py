"""Dump .explain('formatted') for named queries() entries to
plans/<tag>/<name>_<suffix>.txt (judge evidence for plan claims).

Usage: python scripts/dump_plans.py --tag r06 --suffix before [names...]
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r06")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from bobo_spark.session import get_spark

    spark = get_spark("plan_dump")
    qmap = entrymod.queries()
    names = args.names or list(qmap)
    outdir = os.path.join("plans", args.tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qmap[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {e!r}"
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
