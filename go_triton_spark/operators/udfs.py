"""UDF surface (SURVEY section 2.2 'UDF/UDAF/UDTF' row): one
oracle-checked example per kind, all Arrow-batched (never row-at-a-time
Python in hot paths).

- scalar pandas_udf  : text normalization
- grouped-agg pandas_udf (UDAF): integer reduction (numpy int64 —
  exact, so oracle parity holds; float reductions would need the
  decimal-sum pattern instead)
- Python UDTF        : tokenizer emitting (token, idx) rows
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from go_triton_spark.operators.registry import query, spread, tables


@pandas_udf(T.StringType())
def _normalize_text(s: pd.Series) -> pd.Series:
    return s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)


@query(
    "udf_scalar_pandas",
    oracle="""
    SELECT doc_id,
           lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_text
    FROM documents WHERE doc_id < 100
    """,
    tags=("udf",),
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-vectorized string normalization)."""
    (d,) = tables(spark, sf_dir, "documents")
    return (d.where(F.col("doc_id") < 100)
            .select("doc_id", _normalize_text("text").alias("norm_text")))


@pandas_udf(T.LongType())
def _sum_ids(v: pd.Series) -> int:
    return int(v.to_numpy().sum())  # int64: exact at any order


@pandas_udf(T.LongType())
def _count_rows(v: pd.Series) -> int:
    return len(v)


@query(
    "udaf_grouped_pandas",
    oracle="""
    SELECT user_id, cast(sum(event_id) as bigint) AS id_sum, count(*) AS n
    FROM events GROUP BY user_id
    """,
    tags=("udf", "udaf"),
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (UDAF): per-group numpy reduction.
    Spark shuffles by the group key and hands each group's column to
    the UDF as one Arrow batch."""
    (e,) = tables(spark, sf_dir, "events")
    # note: grouped-agg pandas UDFs cannot mix with JVM aggregates in
    # one agg() — both columns are pandas UDFs here
    return (e.groupBy("user_id")
            .agg(_sum_ids("event_id").alias("id_sum"),
                 _count_rows("event_id").alias("n")))


@udtf(returnType="tok: string, idx: int", useArrow=True)
class _Tokenize:
    def eval(self, doc_id: int, text: str):
        for i, tok in enumerate(text.split(" ")):
            yield tok, i


@query(
    "udtf_tokenize",
    oracle="""
    SELECT doc_id, ws[i] AS tok, cast(i - 1 as bigint) AS idx
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
          WHERE doc_id < 50) t
    CROSS JOIN generate_series(1, 200) s(i)
    WHERE i <= len(ws)
    """,
    tags=("udf", "udtf"),
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row -> N output rows.
    The generator runs per-partition; no driver involvement."""
    (d,) = tables(spark, sf_dir, "documents")
    d.where(F.col("doc_id") < 50).createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("tokenize_udtf", _Tokenize)
    return spark.sql("""
        SELECT d.doc_id, t.tok, t.idx
        FROM _udtf_docs d, LATERAL tokenize_udtf(d.doc_id, d.text) t
    """)


@query(
    "grouped_map_demean",
    oracle="""
    SELECT event_id, event_type,
           value - (cast(sum(cast(value as decimal(30,8))) OVER
                         (PARTITION BY event_type) as double)
                    / (count(*) OVER (PARTITION BY event_type)))
             AS value_demeaned
    FROM events
    """,
    tags=("udf", "grouped-map"),
)
def grouped_map_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-group feature normalization
    (demean within event_type). Each group arrives as one pandas
    DataFrame; output schema is declared. The mean uses an exact
    decimal sum (python Fraction-free: decimal str round-trip via
    pandas object sum would drift — so sum int-scaled) to match the
    oracle's decimal-sum mean bit-for-bit.

    At 100 TB: one shuffle on the group key; groups stream through
    Arrow. For unbounded groups prefer the pure-window form (the
    oracle's own plan) — this operator exists to prove the grouped-map
    API surface.
    """
    from decimal import Decimal

    (e,) = tables(spark, sf_dir, "events")
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value_demeaned", T.DoubleType()),
    ])

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        # exact decimal mean, matching cast(sum(decimal(30,8)) as
        # double)/count on the SQL side
        total = sum(Decimal(repr(v)).quantize(Decimal("1.00000000"))
                    for v in pdf["value"])
        mean = float(total) / len(pdf)
        return pd.DataFrame({
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "value_demeaned": pdf["value"] - mean,
        })

    return e.groupBy("event_type").applyInPandas(demean, schema=schema)


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id, length(text) AS n_chars_arrow,
           len(string_split(text, ' ')) AS n_tokens_arrow
    FROM documents
    """,
    tags=("udf", "arrow"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy batch path — RecordBatches processed
    with pyarrow.compute directly, no pandas materialization (the
    variant to reach for when the per-batch work is columnar kernels:
    ~2× less peak memory than mapInPandas on wide batches). Here the
    kernel computes char and whitespace-token counts per document."""
    import pyarrow as pa
    import pyarrow.compute as pc

    (d,) = tables(spark, sf_dir, "documents")

    def counts(batches):
        for batch in batches:
            text = batch.column(batch.schema.get_field_index("text"))
            n_chars = pc.utf8_length(text)
            n_tokens = pc.list_value_length(
                pc.split_pattern(text, pattern=" "))
            yield pa.RecordBatch.from_arrays(
                [batch.column(batch.schema.get_field_index("doc_id")),
                 pc.cast(n_chars, pa.int64()),
                 pc.cast(n_tokens, pa.int64())],
                names=["doc_id", "n_chars_arrow", "n_tokens_arrow"])

    # spread the full-table Arrow pass (single local file scans as ONE
    # partition; no-op at cluster scale) — the narrow gate-filtered UDF
    # queries above stay unspread on purpose, their row counts are
    # bounded by their filters
    # rows_per_task 25k: the Arrow pass is ~µs/row, so round 6's
    # unconditional 32-way exchange cost 1.8x at sf0.1; cost-aware it
    # skips locally and still fans out at x20+ corpus sizes
    return spread(d.select("doc_id", "text"), spark,
                  rows_per_task=25_000).mapInArrow(
        counts, "doc_id long, n_chars_arrow long, n_tokens_arrow long")
