package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-k nearest (by cosine) centroid ids for an embedding — the IVF
  * coarse-quantizer assignment as a pure MAP-SIDE expression.
  *
  * The centroids are unit-normalized at construction, so cosine ranking
  * reduces to a plain dot product (the query vector's own norm is a
  * positive per-row constant that cannot change the ordering). This is
  * the assignment shape that survives 100 TB: no broadcast join, no
  * groupBy shuffle — each row computes its list ids in-place, exactly
  * like a hash-partitioner computes a bucket. Ties are broken toward
  * the lower centroid id (strict-greater insertion), so assignment is
  * deterministic on every executor.
  *
  * Codegen'd (`doGenCode` with the centroid matrix as a codegen
  * reference object): the assignment runs once per CORPUS row when
  * building the IVF index, so it must stay inside the whole-stage
  * span — a fallback would box every embedding on the widest scan of
  * the pipeline.
  */
case class NearestCentroids(
    child: Expression,
    centroids: Array[Array[Double]],
    k: Int)
  extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<float>/array<double>, got ${o.catalogString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = centroids.length
    val kk = math.min(k, m)
    val bi = new Array[Int](kk)
    val bd = new Array[Double](kk)
    var filled = 0
    var j = 0
    while (j < m) {
      val c = centroids(j)
      var dot = 0.0
      var i = 0
      val lim = math.min(n, c.length)
      while (i < lim) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * c(i)
        i += 1
      }
      // sorted-insert, strict-greater shifts: equal dots keep the
      // earlier (lower) centroid id → deterministic under ties
      if (filled < kk) {
        var p = filled
        while (p > 0 && bd(p - 1) < dot) {
          bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1
        }
        bd(p) = dot; bi(p) = j; filled += 1
      } else if (dot > bd(kk - 1)) {
        var p = kk - 1
        while (p > 0 && bd(p - 1) < dot) {
          bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1
        }
        bd(p) = dot; bi(p) = j
      }
      j += 1
    }
    new GenericArrayData(bi)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, arr => {
      val m = ctx.freshName("m")
      val kk = ctx.freshName("kk")
      val bi = ctx.freshName("bi")
      val bd = ctx.freshName("bd")
      val filled = ctx.freshName("filled")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val lim = ctx.freshName("lim")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      s"""
         |int $m = $cents.length;
         |int $kk = $k < $m ? $k : $m;
         |int[] $bi = new int[$kk];
         |double[] $bd = new double[$kk];
         |int $filled = 0;
         |for (int $j = 0; $j < $m; $j++) {
         |  double[] $c = $cents[$j];
         |  double $dot = 0.0;
         |  int $lim = java.lang.Math.min($arr.numElements(), $c.length);
         |  for (int $i = 0; $i < $lim; $i++) {
         |    $dot += (double) $arr.$get($i) * $c[$i];
         |  }
         |  if ($filled < $kk) {
         |    int $p = $filled;
         |    while ($p > 0 && $bd[$p - 1] < $dot) {
         |      $bd[$p] = $bd[$p - 1]; $bi[$p] = $bi[$p - 1]; $p--;
         |    }
         |    $bd[$p] = $dot; $bi[$p] = $j; $filled++;
         |  } else if ($dot > $bd[$kk - 1]) {
         |    int $p = $kk - 1;
         |    while ($p > 0 && $bd[$p - 1] < $dot) {
         |      $bd[$p] = $bd[$p - 1]; $bi[$p] = $bi[$p - 1]; $p--;
         |    }
         |    $bd[$p] = $dot; $bi[$p] = $j;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($bi);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCentroids {
  /** Column wrapper (the centroid array is plan-time data, so this
    * cannot go through the name-based registry like the other graft
    * functions — it is constructed directly via the sql-package bridge).
    */
  def apply(emb: Column, centroids: Array[Array[Double]], k: Int): Column =
    GraftPlanBridge.column(
      new NearestCentroids(GraftPlanBridge.expression(emb), centroids, k))
}

/** Deterministic sampled spherical k-means for the IVF coarse
  * quantizer (SURVEY.md north star: similarity search / embedding
  * dedup at scale; replaces the round-1 "first 16 vectors" stand-in).
  *
  * Train on a bounded DRIVER-SIDE SAMPLE, never the corpus: at 100 TB
  * the quantizer is fit on a few thousand sampled vectors (standard
  * IVF practice — centroid quality saturates long before sample size
  * does) and the full corpus is assigned by the map-side
  * [[NearestCentroids]] expression. Everything is deterministic: the
  * sample is the first `sampleN` rows in xxhash64(id) order (a seeded
  * pseudo-random permutation, stable across runs/executors),
  * initialization is farthest-point (no RNG), and Lloyd iterations
  * break ties toward lower indices.
  */
object KMeansLite {

  /** Fit `k` unit-norm centroids on a deterministic sample of
    * `df(embCol)`; `idCol` orders the pseudo-random sample.
    */
  def fit(
      df: DataFrame,
      embCol: String,
      idCol: String,
      k: Int = 16,
      sampleN: Int = 1024,
      iters: Int = 8): Array[Array[Double]] = {
    import org.apache.spark.sql.functions._
    val rows = df
      .select(col(embCol).cast("array<double>").as("e"), col(idCol).as("id"))
      .filter(col("e").isNotNull)
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleN)
      .collect()
    val sample: Array[Array[Double]] = rows
      .map(_.getSeq[Double](0))
      .collect { case s if s != null => normalize(s.toArray) }
      .filter(_ != null)
    require(sample.nonEmpty, "k-means sample is empty")
    if (sample.length <= k) return sample
    var cents = initFarthest(sample, k)
    var it = 0
    while (it < iters) {
      cents = lloydStep(sample, cents)
      it += 1
    }
    cents
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    if (s == 0.0) return null
    val n = math.sqrt(s)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) / n; i += 1 }
    out
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Farthest-point init: start from sample(0), repeatedly add the
    * point least similar to its nearest chosen centroid. Deterministic
    * (first index wins ties) and well-spread — the property k-means++
    * buys with randomness.
    */
  private def initFarthest(sample: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val cents = new Array[Array[Double]](k)
    cents(0) = sample(0)
    // maxSim(i) = similarity of sample(i) to its nearest chosen centroid
    val maxSim = sample.map(dot(_, cents(0)))
    var c = 1
    while (c < k) {
      var best = 0; var bestSim = Double.MaxValue
      var i = 0
      while (i < sample.length) {
        if (maxSim(i) < bestSim) { bestSim = maxSim(i); best = i }
        i += 1
      }
      cents(c) = sample(best)
      i = 0
      while (i < sample.length) {
        val s = dot(sample(i), cents(c))
        if (s > maxSim(i)) maxSim(i) = s
        i += 1
      }
      c += 1
    }
    cents
  }

  /** One Lloyd iteration: assign to max-dot centroid (ties → lower id),
    * recompute each centroid as the renormalized mean of its members;
    * an emptied cluster keeps its previous centroid.
    */
  private def lloydStep(
      sample: Array[Array[Double]],
      cents: Array[Array[Double]]): Array[Array[Double]] = {
    val k = cents.length
    val dim = cents(0).length
    val sums = Array.fill(k, dim)(0.0)
    val counts = new Array[Int](k)
    var i = 0
    while (i < sample.length) {
      val v = sample(i)
      var best = 0; var bestDot = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        val d = dot(v, cents(j))
        if (d > bestDot) { bestDot = d; best = j }
        j += 1
      }
      var x = 0
      while (x < dim) { sums(best)(x) += v(x); x += 1 }
      counts(best) += 1
      i += 1
    }
    Array.tabulate(k) { j =>
      if (counts(j) == 0) cents(j)
      else {
        val m = normalize(sums(j))
        if (m == null) cents(j) else m
      }
    }
  }

  /** Fit `k` EUCLIDEAN centroids — no normalization anywhere, because
    * magnitude IS information here: this is the product-quantization
    * sub-codebook trainer (q172), where each codeword must reconstruct
    * its subvector's actual length, not just its direction. Same
    * determinism contract as [[fit]]: the sample is the first `sampleN`
    * rows in xxhash64(id) order, init is farthest-point (by L2
    * distance, first index wins ties), Lloyd assignment breaks ties
    * toward the lower centroid index, and an emptied cluster keeps its
    * previous centroid.
    */
  def fitEuclidean(
      df: DataFrame,
      embCol: String,
      idCol: String,
      k: Int = 16,
      sampleN: Int = 1024,
      iters: Int = 8): Array[Array[Double]] = {
    import org.apache.spark.sql.functions._
    val rows = df
      .select(col(embCol).cast("array<double>").as("e"), col(idCol).as("id"))
      .filter(col("e").isNotNull)
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(sampleN)
      .collect()
    val sample: Array[Array[Double]] = rows
      .map(_.getSeq[Double](0))
      .collect { case s if s != null => s.toArray }
    require(sample.nonEmpty, "k-means sample is empty")
    if (sample.length <= k) return sample
    val cents = new Array[Array[Double]](k)
    cents(0) = sample(0)
    val minD = sample.map(l2sq(_, cents(0)))
    var c = 1
    while (c < k) {
      var best = 0; var bd = -1.0
      var i = 0
      while (i < sample.length) {
        if (minD(i) > bd) { bd = minD(i); best = i }
        i += 1
      }
      cents(c) = sample(best)
      i = 0
      while (i < sample.length) {
        val dd = l2sq(sample(i), cents(c))
        if (dd < minD(i)) minD(i) = dd
        i += 1
      }
      c += 1
    }
    var cur: Array[Array[Double]] = cents
    var it = 0
    while (it < iters) { cur = lloydEuclid(sample, cur); it += 1 }
    cur
  }

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** One Euclidean Lloyd iteration: assign to min-L2 centroid (ties →
    * lower id), recompute each centroid as the plain (un-normalized)
    * mean of its members; an emptied cluster keeps its centroid.
    */
  private def lloydEuclid(
      sample: Array[Array[Double]],
      cents: Array[Array[Double]]): Array[Array[Double]] = {
    val k = cents.length
    val dim = cents(0).length
    val sums = Array.fill(k, dim)(0.0)
    val counts = new Array[Int](k)
    var i = 0
    while (i < sample.length) {
      val v = sample(i)
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        val d = l2sq(v, cents(j))
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      var x = 0
      while (x < dim) { sums(best)(x) += v(x); x += 1 }
      counts(best) += 1
      i += 1
    }
    Array.tabulate(k) { j =>
      if (counts(j) == 0) cents(j)
      else Array.tabulate(dim)(x => sums(j)(x) / counts(j))
    }
  }
}
