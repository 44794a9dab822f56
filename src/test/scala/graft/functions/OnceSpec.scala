package graft.functions

import graft.pipe.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** graft_once (r6 optimization): a value-identity no-op that pins an
  * expensive computed column to ONE evaluation site — predicate
  * pushdown otherwise substitutes the defining expression into the
  * filter and evaluates it a second time below upstream exchanges.
  */
class OnceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("once() is a value no-op (same results, same nulls)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("a b c", 1L), (null, 2L), ("x", 3L))
      .toDF("text", "id")
    val plain = df.select($"id", size(split($"text", " ")).as("n"))
      .collect().map(r => (r.getLong(0), r.get(1))).toSet
    val onced = df.select($"id",
      OnceOps.once(size(split($"text", " "))).as("n"))
      .collect().map(r => (r.getLong(0), r.get(1))).toSet
    assert(plain == onced)
  }

  test("a filter on a once()-wrapped column is NOT pushed below the " +
    "defining projection (single evaluation site in the plan)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = spark.range(100).toDF("id")
      .repartition(4)
      .withColumn("q", OnceOps.once(pmod($"id" * 37, lit(97))))
      .filter($"q" > 10)
    assert(df.count() == 88)
    // the defining expression appears exactly once in the physical plan
    // (without the barrier, pushdown duplicates it into a filter below
    // the repartition exchange)
    val plan = df.queryExecution.executedPlan.toString
    val occurrences = "pmod".r.findAllIn(plan).length
    assert(occurrences == 1, s"expected 1 evaluation site, plan:\n$plan")
  }
}
