"""Command-line surface: run library queries, ad-hoc SQL, or the trip
pipeline without writing a driver script.

    python -m flink_template_spark list
    python -m flink_template_spark query q1_pricing_summary --sf-dir /root/testdata/sf0.01
    python -m flink_template_spark sql "SELECT COUNT(*) FROM lineitem"
    python -m flink_template_spark trip-pipeline --source /path/to/events_dir

The reference's only "CLI" is its jar entry point
(TripAggregatorApplication.kt:54); this is the engine's equivalent plus
the query library the reference never had.
"""

from __future__ import annotations

import argparse
import sys

# progress-ledger capacity shared by the recorder bound and the
# truncation flag — one constant so they cannot drift (r9 review)
_LEDGER_MAX = 16384


def _spark(args):
    from flink_template_spark.session import get_spark

    return get_spark(app_name=f"flink_template_spark.{args.cmd}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="flink_template_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries (* = DuckDB oracle)")

    q = sub.add_parser("query", help="run a library query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--explain", action="store_true", help="print the physical plan")

    s = sub.add_parser("sql", help="ad-hoc SQL over the registered views")
    s.add_argument("stmt")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    s.add_argument("--limit", type=int, default=20)

    t = sub.add_parser("trip-pipeline", help="run the streaming trip pipeline")
    t.add_argument("--source", required=True, help="directory of trip-event JSONL")
    t.add_argument("--checkpoint", default="/tmp/trip_pipeline_ckpt")
    t.add_argument("--timeout", type=float, default=None,
                   help="stop after N seconds (default: run until Ctrl-C)")
    t.add_argument("--progress-log", default=None, metavar="FILE",
                   help="write the per-batch progress ledger (JSONL) plus a "
                        "final totals line here when the run ends; '-' for "
                        "stderr. The reference's only monitoring is a hot-"
                        "path debug log (TripAggregatorApplication.kt:67)")

    args = p.parse_args(argv)

    if args.cmd == "list":
        from flink_template_spark import plans

        for name in sorted(plans.QUERIES):
            mark = "*" if name in plans.ORACLES else " "
            print(f"{mark} {name}")
        return 0

    if args.cmd == "query":
        from flink_template_spark import plans

        if args.name not in plans.QUERIES:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        spark = _spark(args)
        df = plans.QUERIES[args.name](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "sql":
        from flink_template_spark.sql import register_sql_functions, run_sql

        spark = _spark(args)
        register_sql_functions(spark)
        run_sql(spark, args.sf_dir, args.stmt).show(args.limit, truncate=False)
        return 0

    if args.cmd == "trip-pipeline":
        from flink_template_spark.app import run_trip_pipeline

        spark = _spark(args)
        recorder = None
        if args.progress_log is not None:
            from flink_template_spark.streaming.monitoring import ProgressRecorder

            # ledger bound: ~22 h at the 5 s trigger cadence before the
            # deque rolls; the totals line marks (possible) truncation
            # explicitly so rolled totals can't pass as run totals
            recorder = ProgressRecorder(max_batches=_LEDGER_MAX)
            spark.streams.addListener(recorder)
        query = run_trip_pipeline(
            spark, source_path=args.source, checkpoint_dir=args.checkpoint
        )
        try:
            query.awaitTermination(args.timeout)
            if args.timeout is not None:
                query.stop()
        finally:
            if recorder is not None:
                import json as _json

                # listener callbacks are async on the bus thread; the
                # final batch's progress event can trail query.stop().
                # Wait (bounded) for the ledger to stabilize before
                # writing it out.
                import time as _time

                # a non-empty ledger is stable after two equal reads; an
                # EMPTY one must dwell longer (2 s) before concluding the
                # run genuinely had no input — the bus thread can deliver
                # the first progress event shortly after stop() — but not
                # burn the full 5 s timeout either (r9 review)
                seen, stable = -1, 0
                for _ in range(20):
                    n = len(recorder.records)
                    stable = stable + 1 if n == seen else 0
                    seen = n
                    if n > 0 and stable >= 1:
                        break
                    if n == 0 and stable >= 8:
                        break
                    _time.sleep(0.25)
                out = (
                    sys.stderr
                    if args.progress_log == "-"
                    else open(args.progress_log, "w")
                )
                try:
                    from flink_template_spark.streaming.monitoring import totals_of

                    # ONE snapshot feeds both the record lines and the
                    # totals, so a late-delivered event can't make them
                    # disagree (r9 review)
                    records = recorder.records
                    for rec in records:
                        print(_json.dumps(rec), file=out)
                    totals = totals_of(records)
                    if len(records) >= _LEDGER_MAX:
                        # deque at capacity: older batches MAY have been
                        # evicted (a run of exactly _LEDGER_MAX batches
                        # flags too — fullness is the observable)
                        totals["ledger_truncated"] = True
                    print(_json.dumps({"totals": totals}), file=out)
                finally:
                    if out is not sys.stderr:
                        out.close()
                spark.streams.removeListener(recorder)
        return 0

    return 2  # pragma: no cover


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
