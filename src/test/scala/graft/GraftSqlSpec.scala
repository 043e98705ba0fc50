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
}
