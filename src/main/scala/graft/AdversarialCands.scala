package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: ADVERSARIAL candidates-commit sweep (r12 verdict ask #5).
  *
  * The candidates artifact's range-layout exception is documented but
  * was unmeasured: touched buckets are bounded by candidate count, yet
  * a boilerplate-template batch whose pairs all point at one hot OLD
  * partner (a stamped-template clique) concentrates the commit in few
  * buckets with large rewrite mass. This driver measures exactly that:
  *
  *   1. seed a standing state (docs [0, seed));
  *   2. a NORMAL delta batch (the next id range) — the baseline row;
  *   3. an ADVERSARIAL batch: `delta` new docs whose text is the SAME
  *      standing template doc's text plus a per-doc unique tail — the
  *      mine emits (template, new_i) pairs for every i (all landing in
  *      the template's ONE doc_a range bucket) plus the new-new clique
  *      (~delta²/2 pairs in the batch's own bucket);
  *   4. a REPLAY of the same adversarial shape against the now-hot
  *      bucket (the standing-pair rewrite grows by the prior clique).
  *
  * Per batch it prints the candidates artifact's touched directories
  * (snapshot diff), rewritten bytes, new pair count, and the
  * commit_candidates stage seconds — the measured table BASELINE.md
  * records, next to the bounded-cost argument: touched buckets ≤
  * distinct doc_a partners + batch buckets; per-bucket rewrite mass ≤
  * that bucket's standing pair rows + the batch's pairs — output-sized
  * quantities, never corpus-scale, but a hot template's bucket grows
  * with every clique that names it.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.AdversarialCands
  *   [seed] [delta] (defaults 3000 / 250, layout range250)
  */
object AdversarialCands {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val seed = args.headOption.map(_.toLong).getOrElse(3000L)
    val delta = if (args.length > 1) args(1).toLong else 250L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files
      .createTempDirectory("graft-advcands").toString
    val layout = Some(graft.operators.PartitionedCommit.Layout.Range(delta))
    val docs = graft.sources.Tables(spark, sfDir, "documents")

    def snap(p: String): Map[String, (Long, Long)] = {
      val d = new java.io.File(p)
      if (!d.exists()) Map.empty
      else d.listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
        .map(f => f.getName -> (
          f.listFiles().map(_.length()).sum,
          f.listFiles().map(_.lastModified()).max)).toMap
    }

    def run(name: String, batch: org.apache.spark.sql.DataFrame): Unit = {
      val before = snap(s"$root/cands")
      val stages = scala.collection.mutable.Map.empty[String, Double]
      val t0 = System.nanoTime()
      val rep = graft.streaming.DocumentPipeline.upsertBatch(
        batch, s"$root/corpus", s"$root/shingles", s"$root/cands",
        layout = layout,
        onStage = (n, s) => stages.synchronized {
          stages(n) = stages.getOrElse(n, 0.0) + s; () })
      val wall = (System.nanoTime() - t0) / 1e9
      val after = snap(s"$root/cands")
      val touched = after.filter { case (k, v) => before.get(k) != Some(v) }
      println(f"""{"batch":"$name","wall_sec":$wall%.2f,""" +
        s""""new_pairs":${rep.newCandidates},""" +
        s""""cand_rows":${rep.candidateRows},""" +
        s""""buckets_total":${after.size},""" +
        s""""buckets_touched":${touched.size},""" +
        s""""rewritten_bytes":${touched.values.map(_._1).sum},""" +
        f""""commit_candidates_sec":${stages.getOrElse("commit_candidates", 0.0)}%.2f,""" +
        f""""mine_sec":${stages.getOrElse("mine", 0.0)}%.2f}""")
    }

    // 1. seed (untimed shape, still printed for context)
    run("seed", docs.filter(col("doc_id") < seed))
    // 2. normal delta: the next id range
    run("normal",
      docs.filter(col("doc_id") >= seed && col("doc_id") < seed + delta))
    // 3. adversarial clique: every new doc is the template (doc 42)
    //    plus a unique tail — near-dup of the template AND of each
    //    other. Rows derive from the template row itself so the batch
    //    carries the corpus's full column set.
    def clique(lo: Long): org.apache.spark.sql.DataFrame =
      spark.range(lo, lo + delta).toDF("__new_id")
        .crossJoin(broadcast(docs.filter(col("doc_id") === 42L)))
        .withColumn("doc_id", col("__new_id"))
        .withColumn("text",
          concat(col("text"), lit(" tail"), col("__new_id")))
        .select(docs.columns.map(col): _*)
    run("adversarial", clique(seed + 10 * delta))
    // 4. second clique against the SAME template — the hot doc_a
    //    bucket now also carries the prior clique's pairs
    run("adversarial_replay", clique(seed + 20 * delta))
    spark.stop()
  }
}
