package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis columns for training-data pipelines, built from
  * codegen'd built-ins only (no UDFs): token counting, quality scoring,
  * document fingerprinting. Mirrors the classifier-feature shape of the
  * reference's block stats (word counts / densities,
  * vkit-analogue: Boilerplate.TextBlock) lifted to document level.
  */
object TextStats {

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def tokens(text: Column): Column = split(text, " ")

  def nTokens(text: Column): Column = size(tokens(text)).cast("long")

  def meanTokenLen(text: Column): Column =
    round((length(text) - nTokens(text) + 1).cast("double") /
      nTokens(text), 4)

  def stopwordRatio(text: Column): Column =
    round(size(filter(tokens(text),
      t => t.isin(stopwords: _*))).cast("double") / nTokens(text), 4)

  def uniqTokenRatio(text: Column): Column =
    round(size(array_distinct(tokens(text))).cast("double") /
      nTokens(text), 4)

  /** QUAL-1 frozen quality score in [0,1]: length band + stopword band +
    * repetition penalty. Deterministic, SQL-mirrorable.
    */
  def qualityScore(text: Column): Column = {
    val nt = nTokens(text)
    val lenScore = when(nt >= 20 && nt <= 1000, 0.4)
      .when(nt >= 5, 0.2).otherwise(0.0)
    val swr = stopwordRatio(text)
    val swScore = when(swr >= 0.01 && swr <= 0.4, 0.3).otherwise(0.0)
    val uq = uniqTokenRatio(text)
    val uqScore = when(uq >= 0.3, 0.3).when(uq >= 0.1, 0.1).otherwise(0.0)
    round(lenScore + swScore + uqScore, 2)
  }

  /** FP-1 document fingerprint: polynomial rolling hash (Karp-Rabin) of
    * the text chars, base 31 mod 1e9+7 (modulus small enough that
    * acc*31+c never overflows a signed 64-bit long) — computed with
    * codegen'd `aggregate` over the char codes, no UDF.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(filter(split(text, ""), c => c =!= ""),
        c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * 31L + c, lit(1000000007L)))
}
