"""Extra measurement harness for the optimization round (bench.py is FROZEN).

Per-query isolation per the optimization guide §1: times each declared query
with BOTH the driver's methodology (`.count()`, best of N) and the noop sink
(`df.write.format("noop")` — computes every column, §1.4), labels jobs so the
UI is readable (§1.5), and captures `.explain("formatted")` to
plans/<tag>/<query>_<when>.txt.

Usage:
  python bench_extra.py --queries contamination_docs,pagerank_tpch \
      --sf-dir /root/testdata/sf1.0 --reps 2 --plans plans/r07 --suffix before

Prints one JSON line: {"sf_dir":…, "count_s": {q: best}, "noop_s": {q: best}}.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True, help="comma list or 'headline'")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir to write explain() files")
    ap.add_argument("--suffix", default="before", help="plan file suffix (before/after)")
    ap.add_argument("--noop", action="store_true", help="also time the noop sink")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--quiet", action="store_true",
                    help="wait for loadavg < threshold before each query (bench.py protocol)")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if args.queries == "headline":
        names = list(bench.HEADLINE)
    else:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]
    for n in names:
        if n not in qs:
            raise SystemExit(f"unknown query {n!r}")

    spark = bench.make_spark(args.cpus)
    bench.warmup(spark)
    sc = spark.sparkContext

    count_s: dict[str, float] = {}
    noop_s: dict[str, float] = {}
    loads: dict[str, float] = {}
    for name in names:
        if args.quiet:
            loads[name] = bench._wait_quiet(wait_s=float(
                os.environ.get("SPARK_GRAFT_QUERY_QUIET_WAIT_S", "180")))
        else:
            loads[name] = float(open("/proc/loadavg").read().split()[0])
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            plan = spark._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        best = float("inf")
        for _ in range(args.reps):
            sc.setJobDescription(f"{name}: count")
            t0 = time.time()
            qs[name](spark, args.sf_dir).count()
            best = min(best, time.time() - t0)
        count_s[name] = round(best, 3)
        if args.noop:
            best = float("inf")
            for _ in range(args.reps):
                sc.setJobDescription(f"{name}: noop")
                t0 = time.time()
                qs[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            noop_s[name] = round(best, 3)
        sc.setJobDescription(None)
    spark.stop()
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": args.cpus,
                      "count_s": count_s, "noop_s": noop_s, "loadavg": loads}))


if __name__ == "__main__":
    main()
