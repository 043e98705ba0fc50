package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, MinHashSignature, PHash64, SimHash64}

/** `SparkSessionExtensions` entry point: injects graft's native
  * expressions at session build time so that
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`) exposes them to
  * pure-SQL users. The runtime path [[graft.functions.GraftFunctions]]
  * registers the same builders on an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two numeric arrays",
      es => CosineSimilarity(es(0), es(1))))
    ext.injectFunction(fn("simhash64",
      "simhash64(tokens) - 64-bit SimHash of a token array",
      es => SimHash64(es(0))))
    ext.injectFunction(fn("phash64",
      "phash64(content) - 64-bit DCT perceptual hash of a binary payload",
      es => PHash64(es(0))))
    ext.injectFunction(fn("minhash_sig32",
      "minhash_sig32(shingles) - 32-hash MinHash signature",
      es => MinHashSignature(es(0), 32)))
    // Whole-operator extension: sessions built with these extensions
    // plan GroupedTopKPlan without the runtime extraStrategies hook.
    ext.injectPlannerStrategy(_ => GroupedTopKStrategy)
  }
}
