"""Structured-Streaming ingest of transcript turns -> extracted triples.

The reference has no streaming surface (SURVEY §2.12); its closest analogs
are the push-visitor API and the write-only writer-KB sink. Here the batch
extraction stage is reused verbatim inside a streaming query: the same
deterministic extractor runs per micro-batch via foreachBatch, appending to
the triple store — so batch and streaming emit identical triples by
construction (tested).

Streaming design at scale: readStream from the transcripts source
(files/Kafka), watermark on ts for late turns, per-conversation ordering is
guaranteed only within a micro-batch — the canonical-id/link stages stay in
the periodic batch compaction (lambda-style), because connected-components
is not incrementally maintainable without a stateful operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def stream_extract_to_parquet(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    use_arrow_extractor: bool = False,
):
    """File-source streaming: watch input_dir for transcript parquet,
    extract relations per micro-batch, append parquet. Returns the query."""
    from kr_spark.pipeline.extract import (
        extract_relations_arrow,
        extract_relations_expr,
    )

    extractor = extract_relations_arrow if use_arrow_extractor else extract_relations_expr
    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .parquet(input_dir)
        .withWatermark("ts", "10 minutes")
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        extracted = extractor(batch_df).withColumn("epoch", F.lit(epoch_id))
        extracted.write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_turn_counts(transcript_stream: DataFrame) -> DataFrame:
    """Per-5-minute windowed turn counts by role with late-data watermark —
    the standard streaming aggregation shape over this source."""
    return (
        transcript_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), F.col("role"))
        .agg(F.count("*").alias("n_turns"))
    )
