package graft.ops

import graft.pipe.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("as-of semantics: latest at-or-before, null when none, equal " +
    "timestamps match, later rows ignored") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts(100), 10L), // views at 90, 100 -> equal-ts 100 wins
      (1L, ts(50), 11L),  // only the view at 40 is at-or-before
      (2L, ts(10), 20L),  // user 2 has no view before 10 -> null
      (3L, ts(99), 30L)   // user 3 has no views at all -> null
    ).toDF("user_id", "ts", "purchase_id")
    val right = Seq(
      (1L, ts(40), 101L),
      (1L, ts(90), 102L),
      (1L, ts(100), 103L),
      (2L, ts(11), 201L) // strictly after the purchase
    ).toDF("user_id", "ts", "view_id")
    val got = AsofJoin.asof(left, right, "user_id", "ts",
      "purchase_id", "view_id")
      .orderBy("purchase_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSeq
    assert(got == Seq((10L, 103L), (11L, 101L), (20L, -1L), (30L, -1L)))
  }

  test("null event times are dropped from both sides (a null-ts right " +
    "row must not match everything as 'earliest')") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, Some(ts(100)), 10L), (1L, None, 11L))
      .map { case (u, t, p) => (u, t.orNull, p) }
      .toDF("user_id", "ts", "purchase_id")
    val right = Seq((1L, Some(ts(90)), 101L), (1L, None, 102L))
      .map { case (u, t, v) => (u, t.orNull, v) }
      .toDF("user_id", "ts", "view_id")
    val got = AsofJoin.asof(left, right, "user_id", "ts",
      "purchase_id", "view_id").collect()
    // null-ts purchase 11 excluded; null-ts view 102 never matches
    assert(got.length == 1 && got(0).getLong(0) == 10L &&
      got(0).getLong(2) == 101L, got.toSeq)
  }

  test("ties among right rows at one (key, ts): the largest id wins " +
    "deterministically") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts(100), 10L)).toDF("user_id", "ts", "purchase_id")
    val right = Seq((1L, ts(100), 7L), (1L, ts(100), 9L), (1L, ts(100), 8L))
      .toDF("user_id", "ts", "view_id")
    val got = AsofJoin.asof(left, right, "user_id", "ts",
      "purchase_id", "view_id").collect()
    assert(got.length == 1 && got(0).getLong(2) == 9L)
  }

  test("one exchange only: the union sorts inside a single hash " +
    "partitioning on the key") {
    val s = spark
    import s.implicits._
    val left = (1L to 200L).map(i => (i % 7, ts(i), i))
      .toDF("user_id", "ts", "purchase_id")
    val right = (1L to 300L).map(i => (i % 7, ts(i), 1000L + i))
      .toDF("user_id", "ts", "view_id")
    val df = AsofJoin.asof(left, right, "user_id", "ts",
      "purchase_id", "view_id")
    df.collect()
    // count exchanges on the adaptive plan TREE (the string form
    // prints the same exchange twice: final + initial plan sections)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => Seq(q) ++ allNodes(q.plan)
      case _ => Seq(p) ++ p.children.flatMap(allNodes)
    }
    val nodes = allNodes(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 1,
      df.queryExecution.executedPlan.toString)
    assert(!nodes.exists(_.nodeName.contains("NestedLoop")),
      df.queryExecution.executedPlan.toString)
  }
}
