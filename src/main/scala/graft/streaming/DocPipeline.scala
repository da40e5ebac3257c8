package graft.streaming

import graft.queries.{SampleOps, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus-prep (builder north star): the same quality gate,
  * deterministic sampling, and near-exact dedup that
  * SampleOps.q_pipeline_prep runs in batch, applied to an unbounded
  * document stream — identical column expressions (shared via TextOps /
  * SampleOps), so a doc admitted by the batch pipeline is admitted by
  * the streaming one.
  *
  * Expects the documents schema plus an ingest timestamp:
  * (ts timestamp, doc_id long, lang string, text string).
  *
  * Scale notes: the quality/sample stages are stateless per-row
  * expressions — they pipeline inside the source stage with zero
  * state. Only the dedup holds state, bounded by watermark horizon ×
  * distinct-fingerprint cardinality within it.
  */
object DocPipeline {

  /** Stateless gate: quality threshold + language allow-list +
    * optional deterministic hash-rate sampling (the default 1000 ‰
    * keeps everything, so defaults match the batch pipeline exactly —
    * pass a lower rate to downsample). Safe in any output mode.
    */
  def qualityGate(docs: DataFrame, minQuality: Double = 0.45,
      keepPerMille: Int = 1000): DataFrame =
    docs
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .filter(col("quality") >= minQuality &&
        col("lang").isin("en", "fr", "de", "es") &&
        SampleOps.hashDraw(col("doc_id"), 4) % 1000 < keepPerMille)

  /** Near-exact (word-order-insensitive) dedup within the watermark
    * horizon: first document with a given normalized fingerprint wins,
    * later permutations/duplicates are dropped; state expires with the
    * watermark instead of growing forever.
    */
  def dedupNormalized(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", TextOps.normalizedFp(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")

  /** The full streaming prep: gate → dedup, mirroring
    * SampleOps.q_pipeline_prep's stage order.
    */
  def prep(docs: DataFrame, minQuality: Double = 0.45,
      keepPerMille: Int = 1000): DataFrame =
    dedupNormalized(qualityGate(docs, minQuality, keepPerMille))
      .select(col("ts"), col("doc_id"), col("lang"), col("quality"),
        size(split(col("text"), "\\s+", -1)).cast("long").as("n_tokens"))

  /** Streaming incremental dedup against a MATERIALIZED fingerprint
    * index — the streaming twin of `TextOps.dedupIncrAgainst`, the
    * shape a continuous-ingest pipeline actually runs: admit only
    * stream documents whose normalized fingerprint is absent from the
    * persisted corpus index ([[graft.sources.Sinks.writeFpIndex]])
    * AND not seen earlier in the stream within the watermark horizon.
    *
    * Scale shape: the stream-static `left_anti` join re-plans the
    * index side per micro-batch (so a nightly index refresh is picked
    * up without restarting the query) and broadcasts it when small;
    * within-stream dedup state is watermark-bounded exactly like
    * [[dedupNormalized]]. Between index refreshes, a fingerprint
    * first seen on the stream is deduped by the watermark state; the
    * index append (batch-side `writeFpIndex(…, Append)`) closes the
    * loop for horizons beyond the watermark.
    */
  def dedupIncrStream(docs: DataFrame, index: DataFrame): DataFrame = {
    val candidates = docs
      .withColumn("fp", TextOps.normalizedFp(col("text")))
      .join(index.select("fp"), Seq("fp"), "left_anti")
    // null fingerprints (null documents) admit INDIVIDUALLY — the
    // within-stream dedup would otherwise collapse unrelated null
    // docs into one (they share no content), same rule as the batch
    // q_dedup_incr split
    candidates.filter(col("fp").isNotNull)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
      .unionByName(candidates.filter(col("fp").isNull))
  }
}
