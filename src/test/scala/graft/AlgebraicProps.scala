package graft

import graft.functions.TopKAggregator
import graft.operators.{DedupClusters, PageRank, SkewJoin}
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

  // occurrence frames with deliberately skewed keys: key 0 is hot
  private val occurrences: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, Gen.zip(
      Gen.frequency(3 -> Gen.const(0L), 2 -> Gen.choose(1L, 6L)),
      Gen.choose(0L, 15L)))

  property("saltedSelfPairs == plain self-join pair multiset, any skew/threshold") =
    forAll(occurrences, Gen.choose(1, 8), Gen.choose(1, 4)) { (occ, hotDf, buckets) =>
      import spark.implicits._
      val df = occ.distinct.toDF("g", "id")
      def multiset(hot: Int) = SkewJoin
        .saltedSelfPairs(df, "g", "id", hot, buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      multiset(hotDf) == multiset(Int.MaxValue)
    }

  /** Random word-salad corpora: ids unique, 0-8 tokens from a 6-word
    * alphabet (small so bigram collisions actually happen).
    */
  private val corpora: Gen[List[(Long, String)]] =
    Gen.listOfN(8, Gen.zip(
      Gen.choose(0L, 1000000L),
      Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
        .map(_.take(8).mkString(" "))))
      .map(_.distinctBy(_._1))

  property("LM merge is exactly a rebuild, for any split of any corpus") =
    forAll(corpora, corpora) { (l, r) =>
      import spark.implicits._
      // doc ids must be disjoint (the merge contract)
      val left = l.toDF("doc_id", "text")
      val right = r.filterNot(x => l.exists(_._1 == x._1)).toDF("doc_id", "text")
      val incr = graft.operators.IncrementalLm
        .merge(graft.operators.IncrementalLm.fit(left), right)
        .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
      val rebuild = graft.operators.IncrementalLm
        .fit(left.unionByName(right))
        .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
      incr == rebuild
    }

  property("q76 segment accounting: dup + kept token mass = total tokens") =
    forAll(corpora) { rows =>
      val nonEmpty = rows.filter(_._2.trim.nonEmpty)
      (nonEmpty.isEmpty) || {
        import spark.implicits._
        val tmp = java.nio.file.Files
          .createTempDirectory("graft-prop-seg").toString
        nonEmpty.toDF("doc_id", "text")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$tmp/documents.parquet")
        val out = SparkEntry.queries("q76_dup_segments")(spark, tmp)
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
        nonEmpty.forall { case (id, text) =>
          val toks = text.split(" ").count(_.nonEmpty)
          out.get(id) match {
            case Some((dup, kept)) => dup + kept == toks
            case None => toks == 0
          }
        }
      }
    }

  property("KMeansLite is deterministic and returns unit centroids") =
    forAll(Gen.choose(1L, 1000L)) { seedish =>
      import spark.implicits._
      val vecs = (0 until 40).map(i =>
        (i.toLong, Array.tabulate(8)(j =>
          math.sin((seedish * 31 + i) * 8 + j).toFloat)))
      val df = vecs.toDF("vec_id", "embedding")
      val c1 = graft.functions.KMeansLite.fit(df, "embedding", "vec_id", k = 4)
      val c2 = graft.functions.KMeansLite.fit(df, "embedding", "vec_id", k = 4)
      val identical = c1.zip(c2).forall { case (a, b) => a.sameElements(b) }
      val unit = c1.forall { c =>
        math.abs(c.map(x => x * x).sum - 1.0) < 1e-9
      }
      identical && unit
    }

  // any multigraph over a small node alphabet (parallel edges and
  // self-loops included — both faces must treat them identically)
  private val rankEdges: Gen[List[(String, String, Long)]] =
    Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 5), Gen.choose(0, 5), Gen.choose(1L, 20L))
        .map { case (a, b, w) => (s"n$a", s"n$b", w) })
      .map(_.take(12))

  property("PageRank faces agree bit-for-bit on any graph, any depth") =
    forAll(rankEdges, Gen.choose(1, 4)) { (es, k) =>
      import spark.implicits._
      val out = PageRank.ranks(es.toDF("src", "dst", "w"), k)
      val dist = out.collect().map(r => r.getString(0) -> r.getLong(1))
        .sortBy(_._1).toSeq
      out.unpersist()
      dist == PageRank.ranksLocal(es, k).sortBy(_._1)
    }
}
