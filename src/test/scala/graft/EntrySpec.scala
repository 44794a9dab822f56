package graft

import graft.pipe.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() must return rows (>0) and sane columns. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry returns non-empty extraction output") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.contains("extracted_text"))
    val n = df.count()
    assert(n > 0, s"entry produced $n rows")
    assert(df.filter("extracted_text != ''").count() > 0)
  }
}
