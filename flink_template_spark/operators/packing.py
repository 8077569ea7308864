"""Sequence packing: assign documents to fixed token-budget bins — the
batching step of an LLM training-data pipeline (pack short documents
together so every training sequence is ~budget tokens).

Two tiers:

- ``pack_greedy``: the real packer — greedy next-fit in doc_id order
  within each group (a doc that would overflow the open bin closes it
  and starts the next; an oversized doc gets a bin alone, never split).
  Packing is inherently sequential per group, so this is a grouped-map
  ``applyInPandas``: Spark shuffles once on the group key, each group's
  rows are packed in one Arrow batch of NARROW rows (id + token count
  only — the text never enters Python). At 100 TB the group key is a
  shard/date column, giving thousands of independent groups; the Python
  cost is O(rows) integer arithmetic, not O(bytes).
- ``pack_chunked``: pure-expression stream chunking — cumulative token
  count divided by the budget. Documents may straddle a boundary
  (offset_in_bin says where a doc starts inside its bin), which is the
  "concat-then-chunk" packing used when documents are split across
  sequences. One window scan, fully codegen'd, no Python.

Both are deterministic functions of (group, doc order) — both have
DuckDB oracles (the greedy one via a recursive CTE that replays the
same fold).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def pack_greedy(
    docs_with_counts: DataFrame,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(group, doc_id, n_tokens, bin_id): greedy next-fit per group.

    ``docs_with_counts`` needs exactly (group_col, id_col, tokens_col) —
    compute the token count JVM-side first so Python sees narrow rows.
    """
    out_schema = (
        f"{group_col} string, {id_col} bigint, "
        f"{tokens_col} bigint, bin_id bigint"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins = []
        bin_id, filled = 0, 0
        first = True
        for n in pdf[tokens_col]:
            n = int(n)
            if not first and filled + n > budget:
                bin_id += 1
                filled = n
            else:
                filled += n
            first = False
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[[group_col, id_col, tokens_col, "bin_id"]]

    narrow = docs_with_counts.select(group_col, id_col, tokens_col)
    return narrow.groupBy(group_col).applyInPandas(_pack, schema=out_schema)


def greedy_oracle_sql(budget: int, group_col: str = "lang") -> str:
    """DuckDB recursive CTE replaying the same greedy fold, one step per
    row rank (all groups advance in parallel per recursion round)."""
    return f"""
WITH RECURSIVE d AS (
  SELECT {group_col}, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY doc_id) AS rn
  FROM documents
),
packed({group_col}, rn, doc_id, n_tokens, bin_id, filled) AS (
  SELECT {group_col}, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.{group_col}, d.rn, d.doc_id, d.n_tokens,
    CASE WHEN p.filled + d.n_tokens > {budget} THEN p.bin_id + 1
         ELSE p.bin_id END,
    CASE WHEN p.filled + d.n_tokens > {budget} THEN d.n_tokens
         ELSE p.filled + d.n_tokens END
  FROM packed p JOIN d ON d.{group_col} = p.{group_col} AND d.rn = p.rn + 1
)
SELECT {group_col}, doc_id, n_tokens, bin_id FROM packed
"""


def pack_chunked(
    docs_with_counts: DataFrame,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Concat-then-chunk packing: bin = cumulative-token-count DIV budget
    at the doc's start; offset_in_bin = where the doc begins in its bin."""
    w = (
        W.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).cast("bigint")
    return docs_with_counts.select(
        group_col,
        id_col,
        F.col(tokens_col).cast("bigint").alias(tokens_col),
        (start / budget).cast("bigint").alias("bin_id"),
        (start % budget).cast("bigint").alias("offset_in_bin"),
    )
