package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BPE-1: deterministic subword token counting over a FROZEN in-repo
  * merge table — LLM-corpus budgeting is done in subword tokens, not
  * whitespace words, so sizing runs off `TextStats.nTokens` alone
  * systematically over-counts short function words and under-counts
  * long rare words.
  *
  * The algorithm is the public byte-pair-encoding APPLY step (Sennrich
  * et al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units" — public knowledge), specialized to a frozen spec so two
  * engines can mirror it exactly:
  *
  *  1. whitespace-split the text; within each word keep only the
  *     printable-ASCII bytes excluding '|' (0x21-0x7B, 0x7D, 0x7E) —
  *     '|' is the token separator below and non-ASCII code points
  *     split differently between Java regex (UTF-16 units) and RE2
  *     (code points); empty words drop out;
  *  2. encode the word as "|c1||c2||...||cn|" (tokens fenced by single
  *     bars, separated by double bars);
  *  3. apply each merge rule (a, b) -> ab IN TABLE ORDER, each as one
  *     left-to-right non-overlapping string replacement of "|a||b|"
  *     with "|ab|" (the semantics of `replace` in both Spark and
  *     DuckDB, so the merge loop is mirrorable without a recursive
  *     CTE);
  *  4. the word's token count is 1 + (number of "||" separators);
  *     the document count is the sum over words.
  *
  * Applying rules in frozen priority order (rather than re-scanning
  * for the globally lowest-rank pair after every merge) is the
  * deterministic single-pass variant; with a merge table whose
  * products are ordered after their operands it produces the same
  * segmentation on the vocabulary it was built for, and is a pure
  * function of (text, table) everywhere else.
  *
  * The merge table is FROZEN (high-frequency English digraphs and
  * common subwords, hand-ordered so later rules consume earlier
  * products); `contentHash` pins its exact contents into the
  * correctness gate the way the LANGID lexicon hash does — editing a
  * merge without re-pinning the oracle literal breaks the gate.
  */
object Bpe {

  /** Frozen merge table (BPE-1). Order is semantic: rule i runs before
    * rule i+1, and compound rules reference the products of earlier
    * rules.
    */
  val merges: Vector[(String, String)] = Vector(
    ("t", "h"), ("h", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("n", "d"),
    ("t", "i"), ("e", "s"), ("o", "r"), ("t", "e"), ("o", "f"),
    ("e", "d"), ("i", "s"), ("i", "t"), ("a", "l"), ("a", "r"),
    ("s", "t"), ("t", "o"), ("n", "t"), ("n", "g"), ("s", "e"),
    ("h", "a"), ("a", "s"), ("o", "u"), ("i", "o"), ("l", "e"),
    ("v", "e"), ("c", "o"), ("m", "e"), ("d", "e"), ("h", "i"),
    ("r", "i"), ("r", "o"), ("i", "c"),
    ("th", "e"), ("an", "d"), ("in", "g"), ("io", "n"), ("t", "ion"),
    ("e", "nt"), ("ou", "nd"), ("er", "s"), ("th", "at"), ("th", "is"),
    ("w", "it"), ("wit", "h"))

  /** sha256 pin over the exact merge table (hardcoded as a literal in
    * the t_bpe_tokens oracle — the gate's tamper seal).
    */
  lazy val contentHash: String =
    Lexicon.sha256Hex("bpe1:" +
      merges.map { case (a, b) => a + "+" + b }.mkString(","))

  /** Java-regex / RE2-portable class of DROPPED chars (everything
    * outside printable ASCII minus the '|' separator).
    */
  val dropClass: String = "[^\\x21-\\x7B\\x7D\\x7E]"

  /** The nested-replace merge chain over an encoded-word column. */
  private def applyMerges(enc: Column): Column =
    merges.foldLeft(enc) { case (c, (a, b)) =>
      call_function("replace", c,
        lit("|" + a + "||" + b + "|"), lit("|" + a + b + "|"))
    }

  /** BPE-1 token count of a text column as a pure codegen'd Column
    * expression (no UDF): sum over words of the post-merge token count.
    */
  def tokenCount(text: Column): Column = {
    val words = filter(
      transform(split(text, " "), w => regexp_replace(w, dropClass, "")),
      w => w =!= lit(""))
    val counts = transform(words, w => {
      val enc = concat(lit("|"),
        array_join(filter(split(w, ""), c => c =!= lit("")), "||"),
        lit("|"))
      size(split(applyMerges(enc), "\\|\\|")).cast("long")
    })
    aggregate(counts, lit(0L), (acc, x) => acc + x)
  }
}
