"""Scalable global ranking: ROW_NUMBER / RANK / DENSE_RANK over a
TOTAL order WITHOUT a single-partition window.

A plain ``Window.orderBy(...)`` (no partitionBy) makes Spark move every
row to ONE partition (WindowExec warns "No Partition Defined"); at
100 TB that is one executor sorting the world. The reference has no
ranking at all (SURVEY.md §2.5) — this module is the engine's scale
path for the global-rank queries in plans.windows_analytic, which keep
the naive plan only because their input (supplier) is a dimension
table.

Two-pass range-partitioned rank — the classic distributed top-N/rank
recipe (same shape TPC engines and MPP databases use):

1. ``repartitionByRange(n, keys)`` + ``sortWithinPartitions`` — a range
   exchange samples key quantiles, so partition p holds keys strictly
   before partition p+1's, and EQUAL keys land in the SAME partition
   (range boundaries are key values). Parallel sort, no global funnel.
2. per-partition local window (partitionBy spark_partition_id) for
   local row_number / rank / dense_rank — runs on n partitions at once.
3. a tiny per-partition stats table (n rows: row count + distinct-key
   count) → cumulative offsets via a window over those n rows (bounded
   by partition count, not data) → broadcast-joined back; global rank =
   local rank + rows-before-partition, global dense_rank = local +
   distinct-keys-before-partition.

Determinism: ``row_number`` is deterministic iff order_by + tiebreak is
a total order; rank/dense_rank are deterministic on order_by alone.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_PID = "__rg_pid"


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def with_global_ranks(
    df: DataFrame,
    order_by: Sequence[tuple[Column | str, bool]],
    *,
    tiebreak: Sequence[Column | str] = (),
    row_number_col: str | None = "rn",
    rank_col: str | None = None,
    dense_rank_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add globally-consistent ranking columns to ``df``.

    ``order_by``: (column, ascending) pairs — the semantic sort key;
    rank/dense_rank tie on equality of this key. ``tiebreak``: extra
    columns appended only to the row_number order to make it total.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    key_cols = [_as_col(c) for c, _ in order_by]
    sort_key = [
        (_as_col(c).asc() if asc else _as_col(c).desc()) for c, asc in order_by
    ]
    full_sort = sort_key + [_as_col(c).asc() for c in tiebreak]

    # Pass 1: range exchange on the semantic key (ties co-located), then
    # partition-local sort including the tiebreak.
    #
    # The LAZY localCheckpoint is load-bearing, not an optimization:
    # `ranged` feeds BOTH the stats aggregation and the pass-2 output,
    # and RangePartitioner samples its boundaries with a per-RDD seed —
    # two independent evaluations can draw DIFFERENT boundaries, making
    # the offsets describe a partitioning the output rows don't have
    # (observed at sf0.1: a gap + a duplicate in the "global" rank).
    # Checkpointing pins one materialized partitioning that every
    # consumer shares; eager=False defers the checkpoint MATERIALIZATION
    # to the first action (both subtrees then reference the same
    # computed RDD). Known trade, accepted deliberately: wrapping the
    # checkpoint resolves the plan to an RDD at construction time, and
    # a range exchange computes its sampled boundaries when that RDD is
    # built — so constructing (or explain-ing) a with_global_ranks
    # consumer runs the pass-1 sampling job even without an action.
    # The alternative, persist(), stays fully lazy but pins an
    # InMemoryRelation per call in the session cache with no unpersist
    # point (this function cannot know when its caller is done);
    # checkpoint blocks are GC-scoped instead — the same trade
    # operators.components and plans.safety make.
    ranged = (
        df.repartitionByRange(n, *sort_key)
        .sortWithinPartitions(*full_sort)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    # Tiny stats: one row per partition -> cumulative offsets. The
    # single-partition window here is over <= n rows (partition count,
    # independent of data volume).
    key_struct = F.struct(*key_cols)
    stats = ranged.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("__rg_cnt"),
        F.count_distinct(key_struct).alias("__rg_keys"),
    )
    # single-partition window BY DESIGN: it sees ≤ n rows (one per range
    # partition — bounded by partition count, never data volume). The
    # WindowExec no-partition WARN it triggers is unavoidable plan-side
    # (Spark 4 folds away constant partition keys); bench.py scopes that
    # one logger to ERROR so real full-data window funnels stand out.
    w_cum = W.orderBy(_PID).rowsBetween(W.unboundedPreceding, W.currentRow)
    offsets = stats.select(
        F.col(_PID).alias("__rg_opid"),
        (F.sum("__rg_cnt").over(w_cum) - F.col("__rg_cnt")).alias("__rg_row_off"),
        (F.sum("__rg_keys").over(w_cum) - F.col("__rg_keys")).alias("__rg_key_off"),
    )

    # Pass 2: local windows per range partition + broadcast offset add.
    w_local = W.partitionBy(_PID).orderBy(*full_sort)
    w_local_key = W.partitionBy(_PID).orderBy(*sort_key)
    out = ranged.join(F.broadcast(offsets), F.col(_PID) == F.col("__rg_opid"))
    if row_number_col:
        out = out.withColumn(
            row_number_col,
            F.row_number().over(w_local) + F.col("__rg_row_off"),
        )
    if rank_col:
        out = out.withColumn(
            rank_col, F.rank().over(w_local_key) + F.col("__rg_row_off")
        )
    if dense_rank_col:
        out = out.withColumn(
            dense_rank_col, F.dense_rank().over(w_local_key) + F.col("__rg_key_off")
        )
    return out.drop(_PID, "__rg_opid", "__rg_cnt", "__rg_keys",
                    "__rg_row_off", "__rg_key_off")


def with_global_prefix_sum(
    df: DataFrame,
    order_by: Sequence[tuple[Column | str, bool]],
    value_col: Column | str,
    *,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add an inclusive global prefix sum of ``value_col`` over the
    total order ``order_by`` — same two-pass range-partitioned shape as
    :func:`with_global_ranks` (no single-partition window): range
    exchange + local cumulative window, then a per-partition totals
    table (≤ n rows) turned into broadcast offsets.

    ``order_by`` must be a TOTAL order (include a tiebreak column);
    equal keys land in one partition under the range exchange, and the
    local sort makes the within-partition prefix deterministic. Sums
    are whatever type ``value_col`` carries — use integers for
    cross-engine exactness (float prefix sums are order-dependent by
    nature; this operator guarantees one fixed order, but an oracle
    computes its own).
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    val = _as_col(value_col)
    sort_key = [
        (_as_col(c).asc() if asc else _as_col(c).desc()) for c, asc in order_by
    ]

    # Same lazy-localCheckpoint rationale as with_global_ranks: the
    # range exchange samples boundaries with a per-RDD seed, and two
    # independent evaluations (totals subtree vs output subtree) could
    # otherwise disagree on which partition a row is in.
    ranged = (
        df.withColumn("__ps_val", val)
        .repartitionByRange(n, *sort_key)
        .sortWithinPartitions(*sort_key)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = ranged.groupBy(_PID).agg(F.sum("__ps_val").alias("__ps_tot"))
    # ≤ n rows (one per range partition) — bounded by partition count
    w_cum = W.orderBy(_PID).rowsBetween(W.unboundedPreceding, W.currentRow)
    offsets = totals.select(
        F.col(_PID).alias("__ps_opid"),
        (F.sum("__ps_tot").over(w_cum) - F.col("__ps_tot")).alias("__ps_off"),
    )
    w_local = (
        W.partitionBy(_PID)
        .orderBy(*sort_key)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ranged.join(F.broadcast(offsets), F.col(_PID) == F.col("__ps_opid"))
        .withColumn(out_col, F.sum("__ps_val").over(w_local) + F.col("__ps_off"))
        .drop(_PID, "__ps_opid", "__ps_off", "__ps_val")
    )


def with_global_prefix_max(
    df: DataFrame,
    order_by: Sequence[tuple[Column | str, bool]],
    value_col: Column | str,
    *,
    out_col: str = "prefix_max",
    inclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a global prefix MAX of ``value_col`` over the total order
    ``order_by`` — the running-dominance primitive behind skyline /
    pareto-frontier queries. Same two-pass range-partitioned shape as
    :func:`with_global_prefix_sum`: range exchange + local cumulative
    window, then a per-partition maxima table (≤ n rows) turned into
    broadcast offsets (max composes under prefix splits exactly like
    sum, minus the subtraction — exclusive offsets use a 1-PRECEDING
    frame instead).

    ``inclusive=False`` (default) computes the STRICT prefix (all rows
    BEFORE this one in the order): the first row gets NULL. MAX is
    order-insensitive within the prefix, so unlike prefix sums this is
    cross-engine exact for any comparable type."""
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    val = _as_col(value_col)
    sort_key = [
        (_as_col(c).asc() if asc else _as_col(c).desc()) for c, asc in order_by
    ]

    # Same lazy-localCheckpoint rationale as with_global_ranks: pin ONE
    # sampled range partitioning for both the maxima and output subtrees.
    ranged = (
        df.withColumn("__pm_val", val)
        .repartitionByRange(n, *sort_key)
        .sortWithinPartitions(*sort_key)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    maxima = ranged.groupBy(_PID).agg(F.max("__pm_val").alias("__pm_max"))
    # ≤ n rows (one per range partition) — bounded by partition count;
    # the offset for partition p is the max over partitions BEFORE p
    w_prev = W.orderBy(_PID).rowsBetween(W.unboundedPreceding, -1)
    offsets = maxima.select(
        F.col(_PID).alias("__pm_opid"),
        F.max("__pm_max").over(w_prev).alias("__pm_off"),
    )
    end = W.currentRow if inclusive else -1
    w_local = (
        W.partitionBy(_PID).orderBy(*sort_key).rowsBetween(W.unboundedPreceding, end)
    )
    # greatest() skips NULLs (first row / first partition), returning
    # NULL only when BOTH prefix pieces are empty — the strict-prefix
    # "no predecessor" signal callers test with isNull
    return (
        ranged.join(F.broadcast(offsets), F.col(_PID) == F.col("__pm_opid"))
        .withColumn(
            out_col,
            F.greatest(F.max("__pm_val").over(w_local), F.col("__pm_off")),
        )
        .drop(_PID, "__pm_opid", "__pm_off", "__pm_val")
    )


def ntile_closed_form(k: int, rn: str = "rn", n: str = "n") -> Column:
    """NTILE(k) as a closed form of a global row number column ``rn``
    and a total-count column ``n`` (both in scope of the surrounding
    select): q = n div k rows per tile, the first r = n mod k tiles
    take one extra row. Lets the scalable two-pass ranking replace a
    single-partition NTILE window. ceil-div via (a + b - 1) div b; the
    q = 0 arm of the conditional is unreachable (rn <= n = r·(q+1)
    when q = 0) and never evaluated — Spark's If is lazy, so the
    div-by-zero branch cannot throw under ANSI. The interpolated
    column names are backtick-quoted so names that collide with SQL
    keywords (or need quoting) resolve instead of silently parsing as
    something else."""
    rnq, nq = f"`{rn}`", f"`{n}`"
    big = (F.col(nq) % k) * (F.expr(f"{nq} DIV {k}") + 1)
    return F.when(
        F.col(rnq) <= big,
        F.expr(f"({rnq} + ({nq} DIV {k})) DIV (({nq} DIV {k}) + 1)"),
    ).otherwise(
        F.expr(
            f"({nq} % {k}) + (({rnq} - ({nq} % {k}) * (({nq} DIV {k}) + 1))"
            f" + ({nq} DIV {k}) - 1) DIV ({nq} DIV {k})"
        )
    )
