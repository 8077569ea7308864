"""Round-13 fixed-overhead anatomy probe (guide §1 measure-first).

For each named query, split the wall into phases:
  build    — QUERIES[name](spark, sf_dir) Python/py4j plan construction
  analyze  — df.schema (Catalyst analysis)
  exec1    — first noop write (optimize + codegen + AQE jobs + tasks)
  exec2    — second noop write of a FRESH identical plan (warm codegen)
and count the Spark jobs each execution submitted (AQE job fan-out).

Also probes the per-job floor (spark.range noop) and the cold/warm cost
of spark.read.parquet per table, to size the load_table metadata cache.

Usage: python scripts/profile_overhead.py [--sf DIR] name...
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--tables", action="store_true", help="probe read.parquet costs")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    from flink_template_spark import plans
    from flink_template_spark.session import get_spark, silence_bounded_window_warns

    spark = get_spark(
        app_name="profile_r13", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    silence_bounded_window_warns(spark)
    tracker = spark.sparkContext.statusTracker()

    def n_jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    def noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # per-job floor: trivial single-stage job, min of 5
    floor = min(noop(spark.range(1)) for _ in range(5))
    print(f"per-job floor (range(1) noop): {floor*1000:.0f} ms", flush=True)

    if args.tables:
        from flink_template_spark.tables import TABLE_NAMES, load_table

        for name in TABLE_NAMES:
            t0 = time.perf_counter()
            load_table(spark, args.sf, name)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            load_table(spark, args.sf, name)
            warm = time.perf_counter() - t0
            print(
                f"read.parquet {name:12s} cold {cold*1000:6.0f} ms"
                f"  warm {warm*1000:6.0f} ms",
                flush=True,
            )

    if args.names:
        # warm-up: first query untimed
        plans.QUERIES[args.names[0]](spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        hdr = f"{'query':38s} {'build':>7s} {'analyze':>8s} {'exec1':>7s} {'exec2':>7s} {'jobs1':>5s} {'jobs2':>5s}"
        print(hdr, flush=True)
        for name in args.names:
            spark.sparkContext.setJobDescription(f"r13-profile:{name}")
            t0 = time.perf_counter()
            df = plans.QUERIES[name](spark, args.sf)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = df.schema
            t_analyze = time.perf_counter() - t0
            j0 = n_jobs()
            t_exec1 = noop(df)
            j1 = n_jobs()
            df2 = plans.QUERIES[name](spark, args.sf)
            j2 = n_jobs()
            t_exec2 = noop(df2)
            j3 = n_jobs()
            spark.sparkContext.setJobDescription(None)
            print(
                f"{name:38s} {t_build*1000:6.0f}m {t_analyze*1000:7.0f}m"
                f" {t_exec1*1000:6.0f}m {t_exec2*1000:6.0f}m"
                f" {j1-j0:5d} {j3-j2:5d}",
                flush=True,
            )


if __name__ == "__main__":
    main()
