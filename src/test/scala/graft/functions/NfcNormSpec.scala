package graft.functions

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Pins the Unicode semantics of [[NfcNormalize]] and the q87
  * normalization-dedup chain that the all-ASCII fixture cannot reach:
  * composed vs decomposed accents, CRLF whitespace, casefolding. All
  * non-ASCII is spelled as unicode escapes so source encoding can
  * never silently change what the test exercises.
  */
class NfcNormSpec extends SparkTestBase {

  // e-acute composed (U+00E9) vs decomposed (e + U+0301 combining acute)
  private val Composed = "caf\u00e9"
  private val Decomposed = "cafe\u0301"

  private def nfcOf(s: String): String = {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(s).toDF("t")
      .select(GraftFunctions.nfcNormalize(col("t")).as("n"))
      .collect().head.getString(0)
  }

  test("composed and decomposed accents normalize identically") {
    assert(Composed != Decomposed, "distinct code-point sequences")
    assert(nfcOf(Decomposed) == Composed)
    assert(nfcOf(Composed) == Composed)
  }

  test("null propagates; empty string is identity") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq(Option("x"), None, Option(""))
      .toDF("t").select(GraftFunctions.nfcNormalize(col("t")).as("n"))
      .collect().map(x => if (x.isNullAt(0)) null else x.getString(0))
    assert(r.toSeq == Seq("x", null, ""))
  }

  test("codegen and interpreted evaluation agree") {
    // A-ring decomposed (A + U+030A) alongside the decomposed e-acute
    val decomposed = Decomposed + " A\u030a"
    val composed = Composed + " \u00c5"
    val e = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)))
    // interpreted eval (the nullSafeEval path)
    val interp = e.eval(null).toString
    // the DataFrame path in nfcOf exercises whole-stage codegen
    assert(interp == nfcOf(decomposed))
    assert(interp == composed)
  }

  test("q87 groups what a reader sees as one document") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-norm").toString
    // four renderings of one doc - composed, decomposed accent,
    // CRLF + double spaces + trailing blank, uppercase - plus one
    // genuinely different document
    val docs = Seq(
      (1L, "Caf\u00e9 corpus quality", "en", "a", 19L),
      (2L, "Cafe\u0301 corpus quality", "en", "a", 20L),
      (3L, "caf\u00e9  corpus\r\nquality ", "en", "b", 22L),
      (4L, "CAF\u00c9 CORPUS QUALITY", "en", "b", 19L),
      (5L, "another document entirely", "en", "b", 25L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q87_normalize_dedup")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 4L), (5L, 1L)), out.toSeq.toString)
    // q22 (md5 of lowercased raw text) collapses only the case
    // variant (docs 1+4); the decomposed and whitespace renderings
    // stay distinct - NFC + whitespace canonicalization is what buys
    // the rest of the collapse
    val exact = SparkEntry.queries("q22_dedup_docs")(spark, tmp).count()
    assert(exact == 4L)
  }
}
