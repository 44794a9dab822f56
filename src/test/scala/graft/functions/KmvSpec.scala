package graft.functions

import graft.ops.MinHashDedup
import graft.pipe.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Reference estimate computed directly from the definition. */
  private def refEstimate(values: Seq[Long], k: Int): Long = {
    val hashes = values.map(MinHashDedup.mix64).distinct
      .sorted(Ordering.fromLessThan[Long](
        java.lang.Long.compareUnsigned(_, _) < 0))
    if (hashes.length < k) hashes.length.toLong
    else {
      val kth = BigInt(hashes(k - 1)) & ((BigInt(1) << 64) - 1)
      ((BigInt(k - 1) << 64) / kth).toLong
    }
  }

  test("exact branch: below k the sketch IS the distinct count") {
    val s = spark
    import s.implicits._
    val df = (1L to 500L).flatMap(i => Seq(i % 40, i % 40)).toDF("v")
    val got = df.agg(KmvDistinct.kmvDistinct($"v", 256).as("d"))
      .collect()(0).getLong(0)
    assert(got == 40L)
  }

  test("estimator branch matches the definitional reference and is " +
    "within ~4/sqrt(k) of truth") {
    val s = spark
    import s.implicits._
    val n = 5000L
    val values = (1L to n).map(_ * 7919L)
    val k = 256
    val got = values.toDF("v").repartition(8)
      .agg(KmvDistinct.kmvDistinct($"v", k).as("d"))
      .collect()(0).getLong(0)
    assert(got == refEstimate(values, k), s"got $got")
    val err = math.abs(got - n).toDouble / n
    assert(err < 4.0 / math.sqrt(k.toDouble), s"err $err")
  }

  test("partial merge is exact: any partitioning yields the identical " +
    "estimate (map-side combine safe)") {
    val s = spark
    import s.implicits._
    val values = (1L to 3000L).map(i => i % 1000 * 31L)
    val expected = refEstimate(values, 64)
    for (parts <- Seq(1, 3, 13)) {
      val got = values.toDF("v").repartition(parts)
        .agg(KmvDistinct.kmvDistinct($"v", 64).as("d"))
        .collect()(0).getLong(0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("grouped aggregation + SQL surface + null skipping") {
    val s = spark
    import s.implicits._
    GraftOpFunctions.register(s)
    val df = (1L to 2000L)
      .map(i => (if (i % 2 == 0) "a" else "b", i % 300))
      .toDF("g", "v")
      .union(Seq(("a", null.asInstanceOf[java.lang.Long]))
        .toDF("g", "v"))
    df.createOrReplaceTempView("kmv_v")
    val rows = s.sql(
      """SELECT g, graft_kmv_distinct(v, 256) AS d FROM kmv_v
         GROUP BY g ORDER BY g""").collect()
    // evens 0..298 (150 values), odds 1..299 (150 values); null skipped
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 150L), ("b", 150L)))
  }

  test("sketch store: merging persisted per-slice blobs equals the " +
    "direct estimate over the union, for any slicing") {
    val s = spark
    import s.implicits._
    val rows = (1L to 4000L).map(i => (("s" + i % 7), i % 900 * 13L))
    val df = rows.toDF("slice", "v")
    val direct = df.agg(KmvDistinct.kmvDistinct($"v", 128).as("d"))
      .collect()(0).getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv")
      .toString
    df.groupBy($"slice")
      .agg(KmvDistinct.kmvSketch($"v", 128).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val merged = s.read.parquet(dir)
      .agg(KmvDistinct.kmvMergeEstimate($"sk", 128).as("d"))
      .collect()(0).getLong(0)
    assert(merged == direct, s"merged $merged direct $direct")
    // and merging a SUBSET of slices equals the direct estimate over
    // that subset's rows
    val subsetDirect = df.filter($"slice".isin("s1", "s4"))
      .agg(KmvDistinct.kmvDistinct($"v", 128).as("d"))
      .collect()(0).getLong(0)
    val subsetMerged = s.read.parquet(dir)
      .filter($"slice".isin("s1", "s4"))
      .agg(KmvDistinct.kmvMergeEstimate($"sk", 128).as("d"))
      .collect()(0).getLong(0)
    assert(subsetMerged == subsetDirect)
  }

  test("merging a blob written with a LARGER k fails loudly (the " +
    "detectable direction of a sketch-table k mismatch)") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).toDF("v")
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv-k")
      .toString
    df.agg(KmvDistinct.kmvSketch($"v", 64).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val e = intercept[Exception] {
      spark.read.parquet(dir)
        .agg(KmvDistinct.kmvMergeEstimate($"sk", 16)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("written with a larger k")),
      e.toString)
  }

  test("sketch/merge SQL surface") {
    val s = spark
    import s.implicits._
    GraftOpFunctions.register(s)
    (1L to 500L).map(i => ("g", i % 70)).toDF("g", "v")
      .createOrReplaceTempView("kmv_sk_v")
    val est = s.sql(
      """SELECT graft_kmv_merge(sk, 128) AS d FROM
         (SELECT g, graft_kmv_sketch(v, 128) AS sk FROM kmv_sk_v
          GROUP BY g)""").collect()(0).getLong(0)
    assert(est == 70L)
  }

  test("estimator saturates at Long.MaxValue for adversarially tiny " +
    "k-th hashes instead of wrapping negative") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = KmvDistinct(Literal(1L), 4)
    val st = new KmvState(4)
    // plant the four smallest possible unsigned hashes directly (the
    // mix64 inverse makes such inputs constructible): kth = 4, so
    // (k-1)*2^64/4 = 3*2^62*... far beyond Long range
    Seq(1L, 2L, 3L, 4L).foreach(h => st.set.add(h))
    assert(agg.eval(st) == Long.MaxValue)
  }

  test("wrong input type is rejected at analysis time") {
    val s = spark
    import s.implicits._
    val e = intercept[Exception] {
      Seq("x").toDF("v")
        .agg(KmvDistinct.kmvDistinct($"v", 16)).collect()
    }
    assert(e.getMessage.contains("BIGINT") ||
      e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
  }
}
