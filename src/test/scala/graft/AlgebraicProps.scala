package graft

import graft.functions.TopKAggregator
import graft.operators.{DedupClusters, SkewJoin}
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based algebraic invariants (SURVEY.md §5.3): generated
  * inputs, not fixtures — the laws must hold for *any* data.
  */
object AlgebraicProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("AlgebraicProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val keyVals: Gen[List[(Long, Long)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 100L)))

  property("saltedJoin == plain inner join, any data, any salt count") =
    forAll(keyVals, keyVals, Gen.choose(1, 6)) { (l, r, salts) =>
      import spark.implicits._
      val large = l.toDF("k", "lv")
      val small = r.zipWithIndex
        .map { case ((k, v), i) => (k, v, i) }
        .toDF("k", "rv", "rid")
      val plain = large.join(small, Seq("k"))
        .select("k", "lv", "rv", "rid")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val salted = SkewJoin.saltedJoin(large, small, "k", salts)
        .select("k", "lv", "rv", "rid")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      plain == salted
    }

  private val edges: Gen[List[(Long, Long)]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))

  property("cluster labels: shared per edge, and label is component min") =
    forAll(edges) { es =>
      es.isEmpty || {
        import spark.implicits._
        val lab = DedupClusters.assign(es.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        val edgeLaw = es.forall { case (a, b) => lab(a) == lab(b) }
        val minLaw = lab.forall { case (id, c) => c <= id && lab(c) == c }
        edgeLaw && minLaw
      }
    }

  private val scored: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 500L),
      Gen.choose(0, 20).map(_.toDouble)))

  property("TopKAggregator == sort-take per group") =
    forAll(scored, Gen.choose(1, 5)) { (rows, k) =>
      import spark.implicits._
      // ids must be unique for a deterministic expectation
      val data = rows.zipWithIndex.map { case ((g, _, s), i) => (g, i.toLong, s) }
      val got = data.toDF("grp", "id", "score").as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues(r => (r._3, r._2))
        .agg(new TopKAggregator(k).toColumn.name("top"))
        .collect().toMap
      val expected = data.groupBy(_._1).view.mapValues(
        _.sortBy { case (_, id, s) => (-s, id) }.take(k).map(_._2)).toMap
      got.keySet == expected.keySet &&
        expected.forall { case (g, ids) => got(g) == ids }
    }
}
