package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantization index maintenance: the canonical PQ layout
  * (shared with q172's declared query, which is a view over this
  * module), the codebook trainer, the map-side delta encoder, and the
  * code-distribution drift trigger — the PQ twin of
  * [[IncrementalVectors]] (IVF) with the same contract: a corpus
  * delta costs ONE map pass over the delta at FIXED codebooks (no
  * refit, no join, no shuffle), and codebook staleness is a visible,
  * measured decision ([[codeDrift]]/[[needsRefit]]), never silent
  * decay. IncrementalPqSpec pins the union invariant
  * encode(corpus ∪ delta) ≡ encode(corpus) ∪ encode(delta) and the
  * drift trigger's no-drift/full-drift extremes.
  */
object IncrementalPq {

  /** Canonical layout: M subspaces of Dsub dims, K codewords each —
    * 1 bit/dim on 64-dim vectors, 32× smaller than float32. A layout
    * change is an INDEX change: stored artifacts key their name by it
    * (see the q172 codes cache), so old codes can never be read as
    * new-layout codes.
    */
  val M = 8
  val Dsub = 8
  val K = 16

  /** Train the M Euclidean sub-codebooks on the corpus's deterministic
    * sample ([[graft.functions.KMeansLite.fitEuclidean]] — magnitudes
    * are information, so no normalization anywhere).
    */
  def fitBooks(
      df: DataFrame,
      embCol: String,
      idCol: String,
      k: Int = K): Array[Array[Array[Double]]] =
    Array.tabulate(M) { m =>
      graft.functions.KMeansLite.fitEuclidean(
        df.select(slice(col(embCol), m * Dsub + 1, Dsub).as("sub"),
          col(idCol).as("__pq_id")),
        "sub", "__pq_id", k = k)
    }

  /** Euclidean nearest-codeword ranking through the max-dot
    * [[graft.functions.NearestCentroids]] expression, no new operator:
    * argmin_j ‖x−c_j‖² = argmax_j (x·c_j − ‖c_j‖²/2), so append a
    * constant 1 to the subvector and −‖c_j‖²/2 to each codeword
    * (ties → lower code id, as everywhere).
    */
  def augmented(book: Array[Array[Double]]): Array[Array[Double]] =
    book.map(c => c :+ (-0.5 * c.map(x => x * x).sum))

  /** Encode `(idCol, embCol)` rows to the codes schema
    * `(idCol, c0..c{M-1})` at FIXED codebooks — pure codegen map work;
    * the union of stored codes and an encoded delta IS the maintained
    * PQ index. A 1 M-row delta against a 100 TB corpus costs one pass
    * over the delta.
    */
  def encode(
      df: DataFrame,
      books: Array[Array[Array[Double]]],
      embCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    require(books.length == M, s"expected $M codebooks, got ${books.length}")
    val cols = (0 until M).map { m =>
      element_at(
        graft.functions.NearestCentroids(
          concat(slice(col(embCol), m * Dsub + 1, Dsub),
            array(lit(1.0f))),
          augmented(books(m)), 1),
        1).as(s"c$m")
    }
    df.select(col(idCol) +: cols: _*)
  }

  /** Canonical drift threshold — one constant for every PQ consumer,
    * mirroring [[IncrementalVectors.DefaultDriftThreshold]].
    */
  val DefaultDriftThreshold = 0.25

  /** Per-subspace codeword share distributions of a codes frame, in
    * ONE aggregate: the M code columns stack to (m, code) pairs
    * map-side and the result is ≤ M·K rows collected to the driver.
    */
  private def codeShares(codes: DataFrame): Map[Int, Map[Int, Double]] = {
    val stacked = codes
      .select(posexplode(array((0 until M).map(m => col(s"c$m")): _*))
        .as(Seq("m", "code")))
      .groupBy(col("m"), col("code")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2).toDouble))
    stacked.groupBy(_._1).map { case (m, rows) =>
      val tot = rows.map(_._3).sum
      m -> rows.map { case (_, c, n) => c -> n / tot }.toMap
    }
  }

  /** Codebook staleness between the standing corpus codes and a
    * delta's codes: the MAX over subspaces of the total-variation
    * distance of their codeword-share distributions. 0 = the delta
    * uses the codebooks exactly like the corpus does; 1 = an entirely
    * different code region — reconstruction error is growing even
    * though each assignment is individually "nearest". Max (not mean)
    * because ONE collapsed subspace already corrupts every ADC score
    * that includes it.
    */
  def codeDrift(corpusCodes: DataFrame, deltaCodes: DataFrame): Double = {
    val b = codeShares(deltaCodes)
    if (b.isEmpty) return 0.0
    val a = codeShares(corpusCodes)
    if (a.isEmpty) return 0.0
    (0 until M).map { m =>
      val am = a.getOrElse(m, Map.empty)
      val bm = b.getOrElse(m, Map.empty)
      if (am.isEmpty || bm.isEmpty) 0.0
      else (am.keySet ++ bm.keySet).toSeq.map { c =>
        math.abs(am.getOrElse(c, 0.0) - bm.getOrElse(c, 0.0))
      }.sum / 2.0
    }.max
  }

  /** The refit trigger: true when the delta's code usage has drifted
    * past `threshold` from the standing corpus's.
    */
  def needsRefit(
      corpusCodes: DataFrame,
      deltaCodes: DataFrame,
      threshold: Double = DefaultDriftThreshold): Boolean =
    codeDrift(corpusCodes, deltaCodes) > threshold
}
