package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {

  private def li = spark.read.parquet(s"${sf()}/lineitem.parquet")

  /** Mean per-file normalized span of `c` across the files under
    * `path`: 0 = each file covers a point, 1 = every file covers the
    * whole global range. The file-skipping figure of merit — parquet
    * min/max pruning removes a file iff the predicate misses its span.
    */
  private def meanSpan(path: String, c: String): Double = {
    val fs = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
    // global span from the laid-out dataset itself (not a hardcoded
    // source table — the wide-domain test lays out a synthetic frame)
    val g = spark.read.parquet(path)
      .agg(min(col(c).cast("long")), max(col(c).cast("long"))).head()
    // BigInt subtraction: a full-width signed domain overflows hi − lo
    // in long arithmetic (the exact bug the full-width test pins)
    val span = (BigInt(g.getLong(1)) - BigInt(g.getLong(0)))
      .max(BigInt(1)).toDouble
    val spans = fs.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(c).cast("long")), max(col(c).cast("long"))).head()
      (BigInt(r.getLong(1)) - BigInt(r.getLong(0))).toDouble / span
    }
    spans.sum / spans.length
  }

  test("interleave is monotone in each dimension's bits and invertible-disjoint") {
    val df = spark.range(0, 256).toDF("i")
      .select((col("i") / 16).cast("long").as("a"),
        (col("i") % 16).cast("long").as("b"))
      .withColumn("z", ZOrder.interleave(col("a"), col("b"), 4))
    // 16x16 grid -> 256 DISTINCT z values (the curve is a bijection)
    assert(df.select("z").distinct().count() == 256)
    // spot-check canonical Morton values: (a=1,b=0) -> 2, (0,1) -> 1;
    // (3,5): a=0b11 -> positions 1,3 = 10; b=0b101 -> positions 0,4 = 17
    val m = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((1L, 0L)) == 2L && m((0L, 1L)) == 1L && m((3L, 5L)) == 27L)
  }

  test("z-order layout tightens per-file spans on BOTH columns; linear sort only on one") {
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val ldir = java.nio.file.Files.createTempDirectory("linear").toString
    ZOrder.write(li, "l_partkey", "l_suppkey", 8, zdir)
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(ldir)

    // the linear layout prunes partkey perfectly but leaves suppkey
    // files spanning ~the full range; z-order splits the budget
    val zPart = meanSpan(zdir, "l_partkey")
    val zSupp = meanSpan(zdir, "l_suppkey")
    val lSupp = meanSpan(ldir, "l_suppkey")
    assert(zPart < 0.7, s"z-order partkey span too wide: $zPart")
    assert(zSupp < 0.7, s"z-order suppkey span too wide: $zSupp")
    assert(lSupp > 0.9, s"linear layout should NOT cluster suppkey: $lSupp")

    // layout is a permutation: nothing lost, nothing invented
    val a = spark.read.parquet(zdir)
    assert(a.count() == li.count())
    val s1 = a.agg(sum(col("l_orderkey")), sum(col("l_linenumber"))).head()
    val s2 = li.agg(sum(col("l_orderkey")), sum(col("l_linenumber"))).head()
    assert(s1 == s2)
  }

  test("empty or all-null layout input fails loudly") {
    intercept[IllegalArgumentException] {
      ZOrder.layout(li.filter(lit(false)), "l_partkey", "l_suppkey", 2)
        .count()
    }
  }

  test("wide domains (epoch-micros span) still cluster — no long overflow") {
    import spark.implicits._
    // a ~6-year span of epoch-micros (~1.9e14): the former
    // (c-lo)*2^bits form wrapped 2⁶³ here and produced garbage keys;
    // the divide-first form must keep both columns clustered
    val base = 1700000000000000L
    val rows = (0 until 4096).map { i =>
      val t = base + (i.toLong * 46655243111L) % 190000000000000L
      (t, (i * 2654435761L) % 1000L)
    }
    val df = rows.toDF("ts_us", "key")
    val dir = java.nio.file.Files.createTempDirectory("zwide").toString
    ZOrder.write(df, "ts_us", "key", 8, dir)
    val tSpan = meanSpan(dir, "ts_us")
    val kSpan = meanSpan(dir, "key")
    assert(tSpan < 0.7, s"wide-domain ts files span too much: $tSpan")
    assert(kSpan < 0.7, s"key files span too much: $kSpan")
    assert(spark.read.parquet(dir).count() == 4096)
  }

  test("rank quantization tightens skewed-column files where linear cannot") {
    import spark.implicits._
    // heavy-tailed column a: ~94% of rows land under 2^10 while the
    // tail reaches ~2^30 — linear buckets over [lo, hi] put nearly the
    // whole row mass into bucket 0, so the z-curve has no information
    // about a for most rows and files mix a-values freely. Rank
    // boundaries split the mass evenly and recover the clustering.
    val rows = (0 until 16384).map { i =>
      val u = (i * 2654435761L) % 16384L // decorrelate skew from order
      val a = if (u % 16 == 15) 1024L + (u * 65537L) % (1L << 30)
        else (u * 131L) % 1024L
      (a, u % 997L)
    }
    val df = rows.toDF("a", "b")
    val ldir = java.nio.file.Files.createTempDirectory("zlin").toString
    val rdir = java.nio.file.Files.createTempDirectory("zrank").toString
    ZOrder.write(df, "a", "b", 64, ldir)
    ZOrder.writeRanked(df, "a", "b", 64, rdir)

    // figure of merit for a SKEWED column: per-file span of the
    // column's RANK (fraction of the sorted value list covered), not
    // its raw value span — the tail makes raw spans meaningless while
    // rank span is exactly what density-tracking boundaries tighten
    val sortedVals = rows.map(_._1).distinct.sorted.toArray
    def rankOf(v: Long): Int = {
      val i = java.util.Arrays.binarySearch(sortedVals, v)
      if (i >= 0) i else -i - 1
    }
    def meanRankSpan(path: String): Double = {
      val fs = new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
      val spans = fs.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("a")), max(col("a"))).head()
        (rankOf(r.getLong(1)) - rankOf(r.getLong(0))).toDouble /
          sortedVals.length
      }
      spans.sum / spans.length
    }
    val lin = meanRankSpan(ldir)
    val rnk = meanRankSpan(rdir)
    // measured at 64 files: linear ≈0.5+ (files holding bucket-0 rows
    // span the whole 94% low mass; pure-tail files dilute the mean),
    // ranked ≈0.13 — the z-curve theoretical floor for 64 files is
    // 3 bits/dimension = 1/8 rank span, and rank boundaries sit on it
    assert(lin > 0.4, s"skew fixture lost its point — linear span: $lin")
    assert(rnk < 0.2, s"rank layout should tighten skewed files: $rnk")
    assert(rnk < lin / 2, s"rank span $rnk not a 2x win over linear $lin")
    // the uniform column stays clustered under BOTH layouts
    assert(meanSpan(rdir, "b") < 0.7)
    // permutation: nothing lost, nothing invented
    assert(spark.read.parquet(rdir).count() == 16384)
    val s1 = spark.read.parquet(rdir).agg(sum(col("a")), sum(col("b"))).head()
    val s2 = df.agg(sum(col("a")), sum(col("b"))).head()
    assert(s1 == s2)
  }

  test("full-width signed domains (xxhash64-style keys) cluster too") {
    import spark.implicits._
    // keys spread over the ENTIRE signed-long line: hi − lo itself
    // overflows, which the former span arithmetic wrapped into a
    // small span (narrow branch → per-row overflow → random layout);
    // the sign-flip top-bits branch must keep both columns clustered
    val rows = (0 until 4096).map { i =>
      (i.toLong * 0x9E3779B97F4A7C15L, i.toLong % 500L)
    }
    val df = rows.toDF("h", "key")
    val dir = java.nio.file.Files.createTempDirectory("zfull").toString
    ZOrder.write(df, "h", "key", 8, dir)
    val hSpan = meanSpan(dir, "h")
    val kSpan = meanSpan(dir, "key")
    assert(hSpan < 0.7, s"full-width hash files span too much: $hSpan")
    assert(kSpan < 0.7, s"key files span too much: $kSpan")
    assert(spark.read.parquet(dir).count() == 4096)
  }
}
