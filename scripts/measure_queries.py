"""Round-12 optimization measurement harness.

Usage: python scripts/measure_queries.py [--sf DIR] [--runs N] [--explain DIR] name...
Runs each named query via the noop sink (guide §1.4), min-of-N wall,
labels jobs (guide §1.5), optionally dumps .explain("formatted").
Prints one line per query: name min_wall all_walls.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir to write <name>.txt explain files")
    ap.add_argument("--suffix", default="", help="suffix for explain filenames, e.g. _before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    from flink_template_spark import plans
    from flink_template_spark.session import get_spark, silence_bounded_window_warns

    spark = get_spark(app_name="measure_r12", master=f"local[{cpus}]", shuffle_partitions=cpus)
    silence_bounded_window_warns(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    names = args.names
    if names == ["HEADLINE"]:
        import bench
        names = bench.HEADLINE

    # one untimed warm run of the first query (JVM + parquet footer caches)
    plans.QUERIES[names[0]](spark, args.sf).write.format("noop").mode("overwrite").save()

    for name in names:
        walls = []
        for r in range(args.runs):
            spark.sparkContext.setJobDescription(f"r12-measure:{name}:{r}")
            t0 = time.perf_counter()
            df = plans.QUERIES[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = plans.QUERIES[name](spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w") as fh:
                fh.write(txt)
        print(f"{min(walls):8.3f}  {name}  {walls}", flush=True)


if __name__ == "__main__":
    main()
