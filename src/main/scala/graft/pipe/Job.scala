package graft.pipe

import graft.extract.Extractor
import graft.schema._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.util.CollectionAccumulator

/** The extraction pipeline (north rule):
  *
  *   read -> dedupe+stable-order (one window over fine-grained keys)
  *        -> mapPartitions(extract)  [typed, per-partition lineage]
  *        -> repartitionByRange(conv_id, turn_idx) + sortWithinPartitions
  *        -> write + metrics table
  *
  * Scale notes (100 TB / 10^12 turns):
  *  - The dedupe window partitions by (conv_id, turn_idx) — groups are a
  *    handful of rows even for mega-conversations, so the shuffle is
  *    skew-free by construction; no salting needed on this path.
  *  - Extraction is a narrow map over the window's hash partitioning —
  *    a mega-conversation's turns are already spread across partitions
  *    (hash includes turn_idx), which IS the salting the north rule asks
  *    for; `saltedRepartition` below is the explicit variant for inputs
  *    that arrive clustered by conv_id (e.g. Iceberg sorted files).
  *  - Final presentation order uses RANGE partitioning, which splits a
  *    mega-conversation across consecutive partitions instead of
  *    hotspotting one reducer (AQE skew-split still applies on top).
  *  - Extraction is a pure function of the row (deterministic under task
  *    retry; reference contract: vkit/utility/pool.py:86-96).
  */
object Job {

  /** Explicit salted repartition for conv_id-clustered inputs: hash on
    * (conv_id, turn_idx % salt) so one mega-conversation lands on `salt`
    * different reducers.
    */
  def saltedRepartition(ds: Dataset[Turn], partitions: Int,
      salt: Int): Dataset[Turn] =
    ds.repartition(partitions, col("conv_id"),
      pmod(col("turn_idx"), lit(salt)))

  /** Dedupe duplicate (conv_id, turn_idx) rows keeping the latest ts
    * (row_number()=1 — FIXTURES.md edge case), with a deterministic
    * tiebreak on the payload so replays are stable.
    */
  def dedupe(spark: SparkSession, turns: Dataset[Turn]): Dataset[Turn] = {
    import spark.implicits._
    val w = Window.partitionBy($"conv_id", $"turn_idx")
      .orderBy($"ts".desc, length($"text").desc, $"text".desc)
    turns.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn").as[Turn]
  }

  /** Run extraction over deduped turns; lineage rows are collected via a
    * CollectionAccumulator (per-partition: rows in/out, errors, wall).
    */
  def extract(spark: SparkSession, turns: Dataset[Turn], runId: String)
      : (Dataset[ExtractedTurn], CollectionAccumulator[LineageRow]) = {
    import spark.implicits._
    val acc = spark.sparkContext.collectionAccumulator[LineageRow](
      s"lineage-$runId")
    val out = turns.mapPartitions { it =>
      val t0 = System.nanoTime()
      var rowsIn = 0L
      var errors = 0L
      val part = TaskContext.getPartitionId()
      val stage = Option(TaskContext.get()).map(_.stageId()).getOrElse(-1)
      val mapped = it.map { t =>
        rowsIn += 1
        val ex = Extractor.extract(t)
        if (ex.error.nonEmpty) errors += 1
        ExtractedTurn(t.conv_id, t.turn_idx, t.role, t.tool, ex.extractor,
          ex.extracted_text, ex.spans, ex.spans.length, ex.error,
          ex.extractor_version)
      }
      // emit lineage once the iterator is exhausted (single pass)
      new Iterator[ExtractedTurn] {
        def hasNext: Boolean = {
          val h = mapped.hasNext
          if (!h && rowsIn >= 0) maybeEmit()
          h
        }
        private var emitted = false
        private def maybeEmit(): Unit = if (!emitted) {
          emitted = true
          acc.add(LineageRow(runId, stage, part, rowsIn, rowsIn, errors,
            (System.nanoTime() - t0) / 1000000L,
            Versions.ExtractorVersion))
        }
        def next(): ExtractedTurn = mapped.next()
      }
    }
    (out, acc)
  }

  /** Full pipeline: dedupe -> global (conv_id, turn_idx) range order ->
    * extract. The range shuffle runs BEFORE extraction on purpose:
    * RangePartitioning samples its child by re-executing it, so ordering
    * after extraction would run every extractor twice (caught by the
    * lineage accounting test). mapPartitions preserves ordering and
    * partitioning, so the output stays globally ordered; range
    * partitioning also splits a mega-conversation across consecutive
    * partitions instead of hotspotting one reducer.
    */
  def run(spark: SparkSession, turns: Dataset[Turn], runId: String,
      orderOutput: Boolean = true)
      : (Dataset[ExtractedTurn], CollectionAccumulator[LineageRow]) = {
    val deduped = dedupe(spark, turns)
    val ordered =
      if (orderOutput)
        deduped.repartitionByRange(col("conv_id"), col("turn_idx"))
          .sortWithinPartitions("conv_id", "turn_idx")
      else deduped
    extract(spark, ordered, runId)
  }

  /** Lineage rows collected so far (call after an action). */
  def lineage(spark: SparkSession,
      acc: CollectionAccumulator[LineageRow]): Dataset[LineageRow] = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    spark.createDataset(acc.value.asScala.toSeq)
  }
}
