"""Streaming corpus dedup against the persistent fingerprint store.

Two dedup modes exist for streams:

* streaming/stateful.py — applyInPandasWithState: dedup state lives in the
  STREAM's state store (optionally TTL-bounded). Right when the dedup
  horizon is a window, wrong when it is "everything ever crawled" — state
  would grow to corpus size inside the streaming checkpoint.
* THIS module — foreachBatch + SeenFingerprintStore: the dedup horizon is
  the whole accumulated corpus, held in an fp-bucketed CATALOG TABLE
  (functions/corpus.SeenFingerprintStore) instead of stream state. Each
  micro-batch is one "crawl wave": within-batch canonical dedup, anti-join
  against the store (store side never shuffles — bucketed), survivors
  appended to both the output and the store.

Restart semantics: foreachBatch may REPLAY a batch after a crash, and the
store append is not transactional with the output write. Exactly-once
therefore needs BOTH halves of the recipe:

* output side — per-batch subdirectories keyed by batch_id, overwritten
  on replay (the standard foreachBatch file-sink pattern);
* store side — every append is tagged wave_id=f"stream_{batch_id}" and
  the replayed batch's store read EXCLUDES its own wave's fingerprints
  (SeenFingerprintStore.dedup_wave(wave_id=...)). Without the exclusion a
  replay would anti-join against its own half-committed fps, drop every
  document, and overwrite the batch dir with an empty frame — permanent
  data loss. With it, the replay recomputes the identical survivor set
  (same source offsets → same input), rewrites the same output, and
  re-appends the same fps (duplicate rows under one wave_id are harmless
  for anti-join existence). The output write runs BEFORE the append, so
  a crash between them re-emits rather than suppresses."""

from __future__ import annotations

from pyspark.sql import SparkSession

from cloud_data_quality_spark.functions.corpus import SeenFingerprintStore


def run_incremental_dedup_stream(
    spark: SparkSession,
    stream_df,
    output_path: str,
    checkpoint_path: str,
    store_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    trigger_available_now: bool = True,
):
    """Dedup a document stream against all previously-seen content.
    Returns the StreamingQuery; caller awaits/stops."""
    store = SeenFingerprintStore(spark, store_table, n_buckets=n_buckets)

    def _batch(batch_df, batch_id: int) -> None:
        store.dedup_wave(
            batch_df, text_col=text_col, id_col=id_col,
            wave_id=f"stream_{batch_id}",
            output_writer=lambda survivors: (
                survivors.write.mode("overwrite")
                .parquet(f"{output_path}/batch_id={batch_id}")))

    writer = stream_df.writeStream.foreachBatch(_batch) \
        .option("checkpointLocation", checkpoint_path)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
