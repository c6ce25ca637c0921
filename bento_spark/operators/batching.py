"""Batch-shape processors: archive / unarchive / split / select_parts /
insert_part.

Reference semantics (batch = ordered list of parts,
/root/reference/internal/message/message.go:4):
- `archive` combines a batch into one message (lines/json_array/concat,
  processor_archive.go:59, formats :186-196)
- `unarchive` explodes one message into a batch (processor_unarchive.go:48,
  formats :336-354)
- `split` re-chunks batches to size N (processor_split.go:19)
- `select_parts` keeps messages at given batch indexes
  (processor_select_parts.go:17)
- `insert_part` inserts a synthesized message at a batch index
  (processor_insert_part.go:43)

Spark-first: a "batch" is a group key; position is a window-function
row_number. Archive = groupBy + collect_list over an explicit ordering;
unarchive = explode. Split is a physical concern (repartition /
maxRecordsPerBatch) — exposed for parity but usually a no-op.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

IDX_COL = "_batch_index"


def with_batch_index(df: DataFrame, batch_key: str, order_by: str) -> DataFrame:
    """batch_index()/batch_size() equivalents (reference
    internal/bloblang/query/functions.go:186,201) as window functions."""
    w = Window.partitionBy(batch_key).orderBy(order_by)
    return df.withColumn(IDX_COL, F.row_number().over(w) - 1).withColumn(
        "_batch_size", F.count(F.lit(1)).over(Window.partitionBy(batch_key))
    )


def select_parts(df: DataFrame, batch_key: str, order_by: str, indexes: Sequence[int]) -> DataFrame:
    """Keep rows at the given 0-based positions within each batch; negative
    indexes count from the end (reference message.go:47-61)."""
    df = with_batch_index(df, batch_key, order_by)
    size = F.col("_batch_size")
    conds = F.lit(False)  # empty indexes selects no parts (not a TypeError)
    for i in indexes:
        c = (F.col(IDX_COL) == F.lit(i)) if i >= 0 else (F.col(IDX_COL) == size + F.lit(i))
        conds = conds | c
    return df.filter(conds).drop(IDX_COL, "_batch_size")


def insert_part(df: DataFrame, batch_key: str, order_by: str, index: int, row_cols: dict[str, Column]) -> DataFrame:
    """Insert one synthesized row per batch at position 0 (prepend) or -1
    (append). Ordering is logical via the order column, so the synth row
    gets an order value STRICTLY outside the batch's range (numeric -/+1,
    timestamp -/+1ms) — an exact tie with the existing min/max would make
    its position nondeterministic under row_number. Mid-batch indexes have
    no faithful order-column encoding and raise (documented deviation from
    processor_insert_part.go:43, which owns an in-memory list)."""
    if index not in (0, -1):
        raise ValueError(
            f"insert_part supports index 0 (prepend) or -1 (append), got {index}: "
            "batch position is realized through the order column, which cannot "
            "encode a mid-batch insertion"
        )
    dtype = dict(df.dtypes)[order_by]
    agg = F.min(order_by) if index == 0 else F.max(order_by)
    if dtype.startswith("timestamp"):
        step = F.expr("interval 1 millisecond")
        anchor_val = (agg - step) if index == 0 else (agg + step)
    elif dtype in ("int", "bigint", "smallint", "tinyint", "double", "float", "date") or dtype.startswith("decimal"):
        anchor_val = (agg - F.lit(1)) if index == 0 else (agg + F.lit(1))
    else:
        raise ValueError(
            f"insert_part needs a numeric/timestamp order column to place the row, got {order_by} {dtype}"
        )
    # one aggregation: groupBy already yields exactly one row per batch key
    synth = df.groupBy(batch_key).agg(anchor_val.alias(order_by))
    for name, col in row_cols.items():
        synth = synth.withColumn(name, col)
    return df.unionByName(synth, allowMissingColumns=True)


def archive(
    df: DataFrame,
    batch_key: str,
    order_by: str,
    payload_col: str,
    fmt: str = "lines",
    out_col: str = "archived",
) -> DataFrame:
    """Combine each batch into one row: formats lines (newline join),
    json_array, concatenate (processor_archive.go:186-196).

    sort_array over (order, payload) structs keeps the agg a single shuffle
    with deterministic order — no window + second shuffle.
    """
    # cast BEFORE collect_list (codegen projection) and extract the struct
    # field with getField (GetArrayStructFields, codegen) — F.transform is
    # interpreted per element, banned from hot paths (CLAUDE.md, measured in
    # dedupe_fuzzy)
    payload = F.col(payload_col) if fmt == "json_array" else F.col(payload_col).cast("string")
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col(order_by).alias("o"), payload.alias("p")))
    )
    vals = pairs.getField("p")
    if fmt == "lines":
        out = F.array_join(vals, "\n")
    elif fmt == "json_array":
        out = F.to_json(vals)
    elif fmt == "concatenate":
        out = F.array_join(vals, "")
    else:
        raise ValueError(f"unsupported archive format: {fmt}")
    return df.groupBy(batch_key).agg(out.alias(out_col))


def unarchive(
    df: DataFrame,
    payload_col: str,
    fmt: str = "lines",
    out_col: str = "part",
) -> DataFrame:
    """Explode one row into many: lines / json_array / csv
    (processor_unarchive.go:336-354)."""
    if fmt == "json_map":
        # one row per (key, value) of a JSON object (processor_unarchive.go
        # json_map: member key lands in metadata — here as a column).
        # Malformed/non-object payloads keep ONE row with the error column
        # set (reference errors the message for output routing) instead of
        # silently vanishing in the explode.
        from bento_spark.operators.errors import set_error_when

        parsed = F.from_json(F.col(payload_col), "map<string,string>")
        df = df.withColumn("_kv_map", parsed)
        df = set_error_when(
            df, F.col("_kv_map").isNull() & F.col(payload_col).isNotNull(),
            "unarchive json_map: payload is not a JSON object",
        )
        kv = F.explode_outer(F.col("_kv_map"))
        return df.select("*", kv.alias(f"{out_col}_key", out_col)).drop("_kv_map")
    if fmt == "lines":
        parts = F.split(F.col(payload_col), "\n")
    elif fmt == "json_array":
        parts = F.from_json(F.col(payload_col), "array<string>")
    elif fmt == "csv_row":
        parts = F.split(F.col(payload_col), ",")
    else:
        raise ValueError(f"unsupported unarchive format: {fmt}")
    # explode_outer, not explode: a NULL payload (or a json_array that fails
    # to parse) must keep its row — explode would silently vanish it, where
    # the reference errors the message for output routing (same protocol as
    # the json_map branch above)
    if fmt == "json_array":
        from bento_spark.operators.errors import set_error_when

        df = df.withColumn("_parts", parts)
        df = set_error_when(
            df, F.col("_parts").isNull() & F.col(payload_col).isNotNull(),
            "unarchive json_array: payload is not a JSON array",
        )
        return df.withColumn(out_col, F.explode_outer(F.col("_parts"))).drop("_parts")
    return df.withColumn(out_col, F.explode_outer(parts))


def split(df: DataFrame, rows_per_partition_hint: int | None = None) -> DataFrame:
    """Re-chunking is physical in Spark; expose as an optional repartition
    honoring the requested chunk size (processor_split.go:19 parity). Costs
    one count() job to size the partition count — split is a deliberate
    re-chunking step, not a free hint."""
    if rows_per_partition_hint:
        n = max(1, -(-df.count() // int(rows_per_partition_hint)))  # ceil div
        return df.repartition(n)
    return df
