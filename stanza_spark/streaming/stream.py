"""Structured Streaming surface: incremental crawl ingestion and
event-time windowed aggregation.

The reference's only streaming analog is ``Pipeline.stream`` — plain
micro-batching with no time semantics (/root/reference/stanza/pipeline/
core.py:477-503).  Here incremental ingestion reuses the *batch* pipeline
inside ``foreachBatch`` (the recommended pattern: one code path for batch
and stream), with exactly-once sink semantics provided by the checkpoint +
idempotent parquet append; the windowed aggregation shows
watermark-bounded state for late events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.annotate import annotate
from ..operators.mentions import decode_mentions
from ..operators.triples import extract_triples

PAGES_SCHEMA = ("doc_id bigint, url string, warc_ts timestamp, "
                "text string, lang string")


def stream_pages_to_triples(spark: SparkSession, input_dir: str,
                            out_dir: str, checkpoint_dir: str):
    """File-source stream of pages -> annotate -> triples, appended to
    parquet via foreachBatch.  availableNow trigger: drains everything
    currently in the source then stops (incremental batch, resumable via
    the checkpoint)."""
    src = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int):
        w = annotate(batch_df).localCheckpoint(eager=True)
        m = decode_mentions(w).localCheckpoint(eager=True)
        t = extract_triples(w, m)
        t.write.mode("append").parquet(out_dir)

    return (
        src.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events_stream: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window counts with a watermark bounding state:
    late events beyond the watermark are dropped, state for closed windows
    is evicted — the streaming form of queries_relational.q_rel_hourly_counts."""
    return (
        events_stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def stream_windowed_counts(spark: SparkSession, input_dir: str,
                           query_name: str = "evcounts"):
    """events parquet dir as a stream -> windowed counts -> memory sink
    (append mode: only watermark-closed windows emit)."""
    src = (
        spark.readStream
        .schema("event_id bigint, ts timestamp_ntz, user_id bigint, "
                "event_type string, value double, props string")
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    agg = windowed_event_counts(src)
    return (
        agg.writeStream.format("memory").queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
