"""Structured Streaming variant of the quality-filter pipeline.

The reference has no streaming surface at all (SURVEY.md §2.10 — its
"incremental" is batch micro-incrementality via a high watermark). This
module extends the engine the Spark-native way: the same annotation stage
(annotate_quality_arrow — stateless, deterministic per row) applied to a
stream, plus a watermarked tumbling-window summary, so a Common-Crawl
ingestion feed can be filtered continuously with the same semantics as the
batch path (same gate set → same keep/drop per row, pytest-enforced by
running a bounded stream to completion and diffing against batch output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cloud_data_quality_spark.operators.quality_filter import (
    QualityThresholds,
    annotate_quality_arrow,
)


def annotate_stream(stream_df: DataFrame,
                    thresholds: QualityThresholds | None = None) -> DataFrame:
    """Stateless per-row annotation — directly valid on a streaming frame."""
    return annotate_quality_arrow(stream_df, thresholds=thresholds)


def windowed_quality_summary(
    stream_df: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    thresholds: QualityThresholds | None = None,
) -> DataFrame:
    """Watermarked tumbling-window roll-up of keep/drop counts per language —
    the streaming analogue of quality_summary. Late rows beyond the watermark
    are dropped by Spark's state store, bounding state size."""
    ann = annotate_stream(stream_df, thresholds)
    return (
        ann.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), "lang_pred", "keep")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def run_stream_to_parquet(
    spark,
    source_path: str,
    output_path: str,
    checkpoint_path: str,
    schema: str = "url string, warc_ts timestamp, html binary, "
                  "text string, lang string",
    thresholds: QualityThresholds | None = None,
):
    """File-source stream → annotate → kept rows to parquet, exactly-once via
    the checkpoint. Returns the StreamingQuery (caller awaits/stops)."""
    stream = (spark.readStream.schema(schema).parquet(source_path))
    kept = annotate_stream(stream, thresholds).where(F.col("keep"))
    return (kept.writeStream
            .format("parquet")
            .option("path", output_path)
            .option("checkpointLocation", checkpoint_path)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
