package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Native-expression semantics: cosine (codegen and interpreted paths,
  * nulls, zero vectors), minhash/simhash locality properties, LSH
  * bucket determinism.
  */
class ExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def cosRows(rows: Seq[(Array[Float], Array[Float])],
      codegen: Boolean): Seq[Option[Double]] = {
    GraftFunctions.register(spark)
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try {
      rows.toDF("a", "b")
        .select(GraftFunctions.cosineSim(col("a"), col("b")).as("c"))
        .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("cosine matches manual computation; codegen == interpreted") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val expected = dot /
      (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    val rows = Seq((a, b), (a, a))
    val cg = cosRows(rows, codegen = true)
    val in = cosRows(rows, codegen = false)
    assert(cg == in)
    assert(math.abs(cg.head.get - expected) < 1e-12)
    assert(math.abs(cg(1).get - 1.0) < 1e-12)
  }

  test("cosine: zero vector yields 0.0, null yields null") {
    val z = Array(0.0f, 0.0f)
    val v = Array(1.0f, 2.0f)
    assert(cosRows(Seq((z, v)), codegen = true).head.contains(0.0))
    GraftFunctions.register(spark)
    val withNull = Seq((Some(v), None: Option[Array[Float]]))
      .toDF("a", "b")
      .select(GraftFunctions.cosineSim(col("a"), col("b")).as("c"))
      .collect()
    assert(withNull.head.isNullAt(0))
  }

  test("cosine works via SQL registration too") {
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 0f), Array(0f, 1.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val c = spark.sql("SELECT cosine_sim(a, b) AS c FROM vecs").head().getDouble(0)
    assert(math.abs(c) < 1e-12)
  }

  test("simhash: identical token sets hash identically; near sets are close") {
    GraftFunctions.register(spark)
    val base = (1 to 40).map(i => s"tok$i")
    val near = base.updated(0, "changed")
    val far = (1 to 40).map(i => s"other$i")
    val sigs = Seq(("a", base), ("b", base), ("c", near), ("d", far))
      .toDF("id", "toks")
      .select(col("id"), GraftFunctions.simhash64(col("toks")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(sigs("a") == sigs("b"))
    assert(ham(sigs("a"), sigs("c")) < ham(sigs("a"), sigs("d")),
      s"near=${ham(sigs("a"), sigs("c"))} far=${ham(sigs("a"), sigs("d"))}")
  }

  test("minhash: signature length 32; jaccard estimate tracks exact overlap") {
    GraftFunctions.register(spark)
    val x = (1 to 100).map(i => s"sh$i")
    val y = (51 to 150).map(i => s"sh$i") // exact J = 50/150 = 1/3
    val rows = Seq(("x", x), ("y", y)).toDF("id", "sh")
      .select(col("id"), GraftFunctions.minhashSig(col("sh")).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rows("x").size == 32)
    val est = rows("x").zip(rows("y")).count { case (a, b) => a == b } / 32.0
    assert(est > 0.05 && est < 0.7, s"estimate $est far from 1/3")
  }

  test("nearest centroids: codegen agrees with brute force, ties to lower id") {
    // centroids: unit axes e0, e1, plus a DUPLICATE of e0 at index 2 —
    // the tie must resolve to the lower id (0, never 2)
    val cents = Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(1.0, 0.0, 0.0))
    val vecs = Seq(
      (0L, Array(0.9f, 0.1f, 0f)), // dots (.9,.1,.9): tie → 0 first, then 2
      (1L, Array(0.1f, 0.9f, 0f)), // dots (.1,.9,.1): 1, then tie → 0
      (2L, Array(-1f, -1f, 0f))) // both dots negative; order still total
    val df = vecs.toDF("id", "e")
      .repartition(2) // stop ConvertToLocalRelation from pre-evaluating
      .select(col("id"), NearestCentroids(col("e"), cents, 2).as("c"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // whole-stage codegen must cover the projection (no fallback) —
    // AQE's final-plan rendering marks codegen stages with a `*(n)`
    // prefix rather than spelling WholeStageCodegen
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") || plan.contains("WholeStageCodegen"),
      s"projection not codegen'd:\n$plan")
    assert(got(0L) == Seq(0, 2))
    assert(got(1L) == Seq(1, 0))
    assert(got(2L) == Seq(0, 1)) // all dots equal (-1): ids ascending, no dups
    // interpreted eval agrees with the codegen'd result
    val expr = new NearestCentroids(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.9f, 0.1f, 0f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)), cents, 2)
    assert(expr.eval(null).asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq == Seq(0, 2))
  }

  test("shingle/winnow native expressions match their HOF formulations exactly") {
    import org.apache.spark.sql.GraftPlanBridge
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d", "e")),
      (2L, Seq("a", "b")), // below both windows
      (3L, Seq("x", "x", "x", "x")), // duplicate windows → distinct hashes
      (4L, Seq.empty[String]))
      .toDF("id", "tk")
    val shNative = GraftPlanBridge.column(
      graft.functions.ShingleHash(GraftPlanBridge.expression(col("tk")), 3))
    val shHof = when(size(col("tk")) >= 3,
      array_distinct(transform(sequence(lit(0), size(col("tk")) - 3),
        i => xxhash64(concat_ws(" ",
          element_at(col("tk"), i + 1),
          element_at(col("tk"), i + 2),
          element_at(col("tk"), i + 3))))))
      .otherwise(array().cast("array<long>"))
    val wnNative = GraftPlanBridge.column(
      graft.functions.WinnowMin(GraftPlanBridge.expression(col("tk")), 4))
    val wnHof = when(size(col("tk")) >= 4,
      array_min(transform(sequence(lit(0), size(col("tk")) - 4),
        i => md5(concat_ws(" ",
          element_at(col("tk"), i + 1),
          element_at(col("tk"), i + 2),
          element_at(col("tk"), i + 3),
          element_at(col("tk"), i + 4))))))
    val rows = docs.select(col("id"),
      shNative.as("sn"), shHof.as("sh"), wnNative.as("wn"), wnHof.as("wh"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"shingle mismatch id=${r.getLong(0)}")
      assert(r.get(3) == r.get(4), s"winnow mismatch id=${r.getLong(0)}")
    }
    // duplicate windows deduped to one hash; short/empty arrays → empty/null
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getSeq[Long](1).size == 1)
    assert(byId(2L).getSeq[Long](1).isEmpty && byId(2L).isNullAt(3))
    assert(byId(4L).getSeq[Long](1).isEmpty)
  }

  test("lsh bucket: deterministic across invocations and in [0, 256)") {
    GraftFunctions.register(spark)
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 64 + j).toFloat)))
    def buckets() = vecs.toDF("id", "e")
      .select(col("id"), GraftFunctions.lshBucket(col("e")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b1 = buckets(); val b2 = buckets()
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < 256))
  }
}
