package graft.ops

import graft.pipe.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("binary columns round-trip through parquet and feature pass") {
    import spark.implicits._
    val media = Multimodal.synthMedia(spark, 50)
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
      .toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(spark, back).collect()
    assert(feats.length == 50)
    assert(feats.forall(_.embedding.length == Multimodal.EmbeddingDim))
    assert(feats.forall(f => f.width >= 64 && f.height >= 64))
    assert(feats.count(_.kind == "video") > 0)
    // determinism: same id -> same features regardless of partitioning
    val feats2 = Multimodal.extractFeatures(spark,
      Multimodal.synthMedia(spark, 50).repartition(7)).collect()
    assert(feats.sortBy(_.media_id).map(_.content_hash).toSeq ==
      feats2.sortBy(_.media_id).map(_.content_hash).toSeq)
  }

  test("embedding from bytes feeds the ANN path") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.synthMedia(spark, 40))
    val corpus = feats.select($"media_id".as("id"),
      $"embedding".as("vec"))
    val queries = feats.filter($"media_id" < 2)
      .select($"media_id".as("qid"), $"embedding".as("qvec"))
    val top = Ann.bruteForceTopK(spark, corpus, queries, 3).collect()
    assert(top.length == 6) // 2 queries x top-3
  }
}
