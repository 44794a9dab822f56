package graft.pipe

import graft.synth.GoldenData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the properties that keep the engine fast
  * at 100 TB — filter/column pushdown into scans, partition pruning,
  * broadcast joins for dims, and a single exchange in the extraction
  * pipeline — asserted on the optimizer output so a refactor can't
  * silently regress them.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter and column pruning reach the parquet scan") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter($"l_quantity" > 45.0)
      .select($"l_orderkey", $"l_quantity")
    val plan = executed(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThan(l_quantity,45.0)]"), plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_quantity:double>"), plan)
  }

  test("partition pruning on a partitioned table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part")
      .toString
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("o_year", year($"o_orderdate"))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)
    val yrs = spark.read.parquet(dir).select("o_year").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(yrs.length > 1)
    val df = spark.read.parquet(dir).filter($"o_year" === yrs.head)
    val plan = df.queryExecution.executedPlan.toString
    // pruned scan reads only one partition directory
    assert(plan.contains(s"PartitionFilters: [isnotnull(o_year"), plan)
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!scanned.contains(s"o_year=${yrs.last}"))
  }

  test("dimension joins broadcast (no shuffle join for small dims)") {
    val df = SparkEntryAccess.query("q_broadcast_join")(spark, sf)
    val plan = executed(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("extraction pipeline has exactly one exchange (hash path) and " +
    "two (range path, sampling excluded)") {
    import spark.implicits._
    val ds = spark.createDataset(GoldenData.inputTurns)
    val (outHash, _) = Job.run(spark, ds, "plan-h", orderOutput = false)
    val hashPlan = outHash.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(hashPlan).length == 1, hashPlan)
    val (outRange, _) = Job.run(spark, ds, "plan-r", orderOutput = true)
    val rangePlan = outRange.queryExecution.executedPlan.toString
    // rangepartitioning = 1 exchange; no extra exchange after the map
    assert("Exchange".r.findAllIn(rangePlan).length == 1, rangePlan)
    assert(rangePlan.contains("rangepartitioning"), rangePlan)
  }

  test("extraction query keeps upstream in whole-stage codegen") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-plan")
      .toString
    spark.createDataset(GoldenData.inputTurns).write.mode("overwrite")
      .parquet(dir)
    val ds = spark.read.parquet(dir).as[graft.schema.Turn]
    val (out, _) = Job.run(spark, ds, "plan-c", orderOutput = false)
    out.collect() // finalize THIS dataset's adaptive plan
    val plan = out.queryExecution.executedPlan.toString
    // the scan stage and the sort stage are codegen'd ('*(n)' markers);
    // the typed mapPartitions boundary is expected (single deserialize)
    assert(plan.contains("*(1) ColumnarToRow"), plan)
    assert(plan.contains("*(2) Sort"), plan)
  }

  test("exact-dedup rank windows slim rows only (no payload in the " +
    "window exchange)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val df = spark.createDataset(Seq(
      ("c1", 1, "payload text one"), ("c1", 2, "payload text one"),
      ("c2", 1, "payload text two"),
      // NULL keys must be RETAINED and ranked together (sentinel hash
      // group), matching the old in-place window's null semantics
      ("c3", 1, null.asInstanceOf[String]),
      ("c4", 1, null.asInstanceOf[String])))
      .toDF("conv_id", "turn_idx", "extracted_text")
    val ranked = Job.rankDuplicates(df, "extracted_text",
      Seq("conv_id", "turn_idx"), "dup_rank")
    // semantics: same ranks as the full-row window form
    val got = ranked.orderBy("conv_id", "turn_idx")
      .select("conv_id", "turn_idx", "dup_rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq(("c1", 1, 1), ("c1", 2, 2), ("c2", 1, 1),
      ("c3", 1, 1), ("c4", 1, 2)))
    // plan shape: every Window (and WindowGroupLimit) operates on a
    // schema WITHOUT the payload column
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => Seq(q) ++ allNodes(q.plan)
      case _ => Seq(p) ++ p.children.flatMap(allNodes)
    }
    val winners = ranked.filter($"dup_rank" === 1)
    winners.collect()
    val nodes = allNodes(winners.queryExecution.executedPlan)
    val windowNodes = nodes.collect {
      case w: WindowExec => w.output.map(_.name)
      case w: WindowGroupLimitExec => w.output.map(_.name)
    }
    assert(windowNodes.nonEmpty,
      winners.queryExecution.executedPlan.toString)
    windowNodes.foreach { cols =>
      assert(!cols.contains("extracted_text"),
        s"payload leaked into window exchange: $cols")
    }
    // filter(rank = 1) collapses into a WindowGroupLimit (top-1/group)
    assert(nodes.exists(_.isInstanceOf[WindowGroupLimitExec]),
      winners.queryExecution.executedPlan.toString)
  }

  test("rankDuplicates fails loudly when order columns do not uniquely " +
    "identify a row (silent row multiplication guard)") {
    import spark.implicits._
    // two rows share (key hash, order tuple): the re-attach join would
    // silently emit 4 rows; the rank-vs-row_number guard must raise
    val df = spark.createDataset(Seq(
      ("c1", 1, "same payload"), ("c1", 1, "same payload"),
      ("c2", 1, "other payload")))
      .toDF("conv_id", "turn_idx", "extracted_text")
    val ranked = Job.rankDuplicates(df, "extracted_text",
      Seq("conv_id", "turn_idx"), "dup_rank")
    val e = intercept[Exception] { ranked.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("duplicate (key, order)")),
      e.toString)
    // the unique-order contract holds -> no error, exact ranks
    val ok = Job.rankDuplicates(df.withColumn("turn_idx",
        monotonically_increasing_id()),
      "extracted_text", Seq("conv_id", "turn_idx"), "dup_rank")
    assert(ok.count() == 3)
  }

  test("bucketed tables join with zero exchanges (co-located join)") {
    import spark.implicits._
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      spark.read.parquet(s"$sf/orders.parquet")
        .select($"o_orderkey", $"o_totalprice")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("graft_bkt_orders")
      spark.read.parquet(s"$sf/lineitem.parquet")
        .select($"l_orderkey", $"l_quantity")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("graft_bkt_lineitem")
      // equal bucket counts on the join key: the sort-merge join reads
      // co-located buckets directly — and the downstream groupBy on the
      // same key inherits the partitioning — so the WHOLE plan has zero
      // Exchange nodes (at 100 TB this is the difference between
      // re-shuffling both fact tables per join and none)
      val j = spark.table("graft_bkt_orders")
        .join(spark.table("graft_bkt_lineitem"),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey").agg(count(lit(1)).as("n"))
      assert(j.count() > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    }
  }

  test("salted skew join spreads the hot key across tasks") {
    import spark.implicits._
    // the salted plan must not broadcast (the technique exists for the
    // non-broadcastable-dim case) and must join on BOTH k and salt, so
    // the hot key's rows hash to nSalts distinct reducers
    val df = SparkEntryAccess.query("q_skew_salted")(spark, sf)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("salt"), plan)
  }

  test("ANN top-k rank window operates on slim (qid, id, sim) rows — " +
    "no embedding vectors through the window exchange") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val corpus = (1L to 50L)
      .map(i => (i, Seq.fill(8)(i.toFloat))).toDF("id", "vec")
    val queries = (1L to 5L)
      .map(i => (100L + i, Seq.fill(8)(i.toFloat))).toDF("qid", "qvec")
    val df = graft.ops.Ann.bruteForceTopK(spark, corpus, queries, k = 2)
    df.collect()
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => Seq(q) ++ allNodes(q.plan)
      case _ => Seq(p) ++ p.children.flatMap(allNodes)
    }
    val windows = allNodes(df.queryExecution.executedPlan).collect {
      case w: WindowExec => w.output.map(_.name)
    }
    assert(windows.nonEmpty, df.queryExecution.executedPlan.toString)
    windows.foreach { cols =>
      assert(!cols.contains("vec") && !cols.contains("qvec"),
        s"embedding vectors leaked into the rank window: $cols")
    }
  }

  test("pack's prefix-sum window carries slim rows only (never text)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val corpus = (1L to 200L)
      .map(id => (id, Seq.fill((id % 9).toInt * 5 + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.ops.Retrieval.pack(spark, corpus, contextLen = 50)
    out.collect()
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => Seq(q) ++ allNodes(q.plan)
      case _ => Seq(p) ++ p.children.flatMap(allNodes)
    }
    val windowNodes = allNodes(out.queryExecution.executedPlan).collect {
      case w: WindowExec => w.output.map(_.name)
    }
    assert(windowNodes.nonEmpty)
    windowNodes.foreach { cols =>
      assert(!cols.contains("text"),
        s"document text leaked into the packing window exchange: $cols")
    }
  }

  test("retrieval joins broadcast the query-sized sides — bm25 " +
    "postings and decontamination bench grams never shuffle-join") {
    val bm = executed(SparkEntryAccess.query("t_bm25")(spark, sf))
    assert(bm.contains("BroadcastHashJoin"), bm)
    assert(!bm.contains("SortMergeJoin"), bm)
    val de = executed(
      SparkEntryAccess.query("t_decontaminate")(spark, sf))
    assert(de.contains("BroadcastHashJoin"), de)
    assert(!de.contains("SortMergeJoin"), de)
  }

  test("minhash candidate generation shuffles slim rows only") {
    import spark.implicits._
    val docs = spark.createDataset(Seq((1L, "a b c d e f g")))
    val df = graft.ops.MinHashDedup.nearDuplicates(spark, docs)
    val plan = df.queryExecution.optimizedPlan.toString
    // the banding relation projects exactly (band, bh, id) before the
    // bucket aggregation - no payload text through the shuffle
    assert(plan.contains("band"), plan)
  }
}

/** Small accessor to keep PlanSpec decoupled from the SparkEntry map. */
object SparkEntryAccess {
  def query(name: String)
      : (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame =
    graft.SparkEntry.queries(name)
}
