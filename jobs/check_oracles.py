"""Dev tool: run queries() vs oracle_sql() side-by-side like the driver does.

Usage: python jobs/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from docprocai_service_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(rows, cols):
    h = hashlib.sha256()
    for row in sorted(tuple(str(row[c]) for c in cols) for row in rows):
        h.update("|".join(row).encode())
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check", cores=8, shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, os_ = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in os_:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [r.asDict() for r in sdf.collect()]
            ores = con.execute(os_[name])
            ocols_raw = [d[0] for d in ores.description]
            orows = [dict(zip(ocols_raw, r)) for r in ores.fetchall()]
            ocols = sorted(ocols_raw)
            ok_rows = len(srows) == len(orows)
            ok_schema = scols == ocols
            ok_hash = ok_schema and value_hash(srows, scols) == value_hash(orows, ocols)
            status = "OK " if (ok_rows and ok_schema and ok_hash) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(f"{status} {name}: rows {len(srows)}/{len(orows)} schema "
                  f"{ok_schema} hash {ok_hash}")
            if not ok_schema:
                print("   spark:", scols, " oracle:", ocols)
            if ok_schema and not ok_hash and len(srows) < 40:
                sset = {tuple(str(r[c]) for c in scols) for r in srows}
                oset = {tuple(str(r[c]) for c in ocols) for r in orows}
                for x in sorted(sset - oset)[:5]:
                    print("   spark-only:", x)
                for x in sorted(oset - sset)[:5]:
                    print("   oracle-only:", x)
        except Exception as e:
            failures += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
