package graft

import org.apache.spark.sql.functions._

/** The pure-SQL face: views + native functions reachable from SQL
  * strings, agreeing with the Column-API formulations.
  */
class GraftSqlSpec extends SparkTestBase {

  test("open registers every corpus table as a queryable view") {
    GraftSql.open(spark, sf())
    graft.sources.Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").count() == 1, n)
    }
  }

  test("a SQL-only analytics statement matches the Column-API result") {
    val viaSql = GraftSql.sql(spark, sf(),
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().toSeq
    val viaApi = graft.sources.Tables(spark, sf(), "lineitem")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
      .collect().toSeq
    assert(viaSql == viaApi)
  }

  test("native expressions are callable from SQL and agree with the Column API") {
    GraftSql.open(spark, sf())
    // text sketches over documents
    val sqlSigs = spark.sql(
      """SELECT doc_id, simhash64(split(text, ' ')) AS sh,
        |  phash64(CAST(lower(text) AS BINARY)) AS ph,
        |  minhash_sig32(split(text, ' '))[0] AS mh0
        |FROM documents ORDER BY doc_id LIMIT 20""".stripMargin).collect()
    val apiSigs = graft.sources.Tables(spark, sf(), "documents")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.simhash64(split(col("text"), " ")).as("sh"),
        graft.functions.GraftFunctions.phash64(
          lower(col("text")).cast("binary")).as("ph"),
        graft.functions.GraftFunctions.minhashSig(split(col("text"), " "))(0)
          .as("mh0"))
      .orderBy(col("doc_id")).limit(20).collect()
    assert(sqlSigs.toSeq == apiSigs.toSeq)
    // vector functions over embeddings: cosine of each vector with
    // itself is 1 (up to float error)
    val cos = spark.sql(
      """SELECT max(abs(cosine_sim(embedding, embedding) - 1.0)) AS err
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin)
      .head().getDouble(0)
    assert(cos < 1e-6)
  }

  test("derived views serve the cached bases: SQL joins match the declared queries") {
    GraftSql.openDerived(spark, sf())
    // the SQL spelling of the release's survivor filter == q36's map
    val sqlSurvivors = spark.sql(
      """SELECT doc_id FROM dup_clusters WHERE is_dup = 0
        |ORDER BY doc_id""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    val apiSurvivors = SparkEntry.queries("q36_dedup_clusters")(spark, sf())
      .filter(col("is_dup") === 0).select("doc_id")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(sqlSurvivors == apiSurvivors)
    // quality_scores view == q31's base columns
    val sqlQ = spark.sql(
      "SELECT doc_id, score FROM quality_scores ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val apiQ = SparkEntry.queries("q31_quality_score")(spark, sf())
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sqlQ == apiQ)
    // pair_candidates view serves q25's pairs with a plain filter
    val sqlPairs = spark.sql(
      """SELECT doc_a, doc_b FROM pair_candidates
        |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val apiPairs = SparkEntry.queries("q25_dedup_ngram_jaccard")(spark, sf())
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sqlPairs == apiPairs)
    // lm_cost view is the q77 model: non-empty, every cost >= 0
    val lm = spark.sql(
      "SELECT count(*), min(cost_micro) FROM lm_cost").head()
    assert(lm.getLong(0) > 0 && lm.getLong(1) >= 0L)
    // quality_survivors view == q84's map (the best-quality release
    // filter is one SQL WHERE away)
    val sqlBest = spark.sql(
      "SELECT doc_id FROM quality_survivors WHERE keep = 1 ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    val apiBest = SparkEntry.queries("q84_quality_survivor")(spark, sf())
      .filter(col("keep") === 1).select("doc_id")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(sqlBest == apiBest)
  }

  test("r8 shared frames are SQL views agreeing with their declared queries") {
    GraftSql.openDerived(spark, sf())
    // user_bitmaps: the SQL popcount rollup IS q209
    val sqlQ209 = spark.sql(
      """SELECT et AS event_type,
        |  CAST(sum(bitmap_count(bm)) AS BIGINT) AS n_users
        |FROM user_bitmaps GROUP BY et ORDER BY et""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val apiQ209 = SparkEntry.queries("q209_bitmap_distinct")(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sqlQ209 == apiQ209)
    // trade_edges: the view is the graph family's frame, and mass
    // conserves — every lineitem contributes exactly one edge unit
    val sqlEdges = spark.sql(
      "SELECT src, dst, w FROM trade_edges ORDER BY src, dst")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val apiEdges = graft.queries.Analytics3.tradeEdges(spark, sf())
      .orderBy(col("src"), col("dst"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(sqlEdges == apiEdges && sqlEdges.nonEmpty)
    val liCount = spark.sql("SELECT count(*) FROM lineitem").head().getLong(0)
    assert(sqlEdges.map(_._3).sum == liCount, "edge mass != lineitem count")
    // media signature views: one row per document, identical to the
    // accessor frames the q73/q189/q190 families ride
    val nDocs = spark.sql("SELECT count(*) FROM documents").head().getLong(0)
    for ((view, api) <- Seq(
        ("phash_sigs",
          graft.queries.MultimodalQueries.phashSigs(spark, sf())),
        ("audio_sigs",
          graft.queries.MultimodalQueries.audioSigs(spark, sf())))) {
      val viaSql = spark.sql(s"SELECT doc_id, sig FROM $view ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
      val viaApi = api.orderBy(col("doc_id"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
      assert(viaSql == viaApi && viaSql.length == nDocs, view)
    }
    val vSql = spark.sql(
      "SELECT doc_id, sigs FROM video_sigs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    val vApi = graft.queries.MultimodalQueries.videoSigs(spark, sf())
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(vSql == vApi && vSql.length == nDocs)
    // the signature views compose in plain SQL: a Hamming self-probe
    // on phash_sigs finds each doc itself at distance 0
    val self = spark.sql(
      """SELECT count(*) FROM phash_sigs a JOIN phash_sigs b
        |ON a.sig = b.sig AND a.doc_id = b.doc_id""".stripMargin)
      .head().getLong(0)
    assert(self == nDocs)
  }

  test("release accounting and quality audit read as SQL views (r9 verdict ask)") {
    val dest = java.nio.file.Files
      .createTempDirectory("graft-sql-release").toString + "/out"
    val report = graft.Release.release(spark, sf(), dest, shardCount = 4)
    graft.GraftSql.openRelease(spark, report)
    // the one-row report view mirrors the Scala report exactly
    val r = spark.sql(
      """SELECT input_docs, dup_dropped, quality_dropped, mix_dropped,
        |  released_docs, n_shards FROM release_report""".stripMargin)
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      (report.inputDocs, report.dupDropped, report.qualityDropped,
        report.mixDropped, report.releasedDocs, report.shards.size.toLong))
    // the shard view reconciles in plain SQL: sum(rows) = released_docs
    val shardAgg = spark.sql(
      """SELECT count(*), sum(rows) FROM release_shards""").head()
    assert(shardAgg.getLong(0) == report.shards.size.toLong)
    assert(shardAgg.getLong(1) == report.releasedDocs)
    val shards = spark.sql(
      "SELECT shard, rows, digest FROM release_shards ORDER BY shard")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).toSeq
    assert(shards == report.shards.map(m => (m.shard, m.rows, m.digest)))
    // the audit view equals QualityRules.audit row for row
    import graft.operators.QualityRules.Rule
    val docs = graft.sources.Tables(spark, sf(), "documents")
    val rules = Seq(
      Rule("has_text", length(col("text")) > 0),
      Rule("id_nonneg", col("doc_id") >= 0),
      Rule("lang_known", col("lang").isin("en", "de", "fr")))
    graft.GraftSql.openAudit(spark, docs, rules)
    val viaSql = spark.sql(
      "SELECT rule, n_rows, n_bad, bad_frac FROM quality_audit ORDER BY rule")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3))).toSeq
    val viaApi = graft.operators.QualityRules.audit(docs, rules)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3))).toSeq
    assert(viaSql == viaApi && viaSql.size == rules.size)
  }
}
