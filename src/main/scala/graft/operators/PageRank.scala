package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact integer-scaled PageRank — the engine's iterative
  * graph-computation face (SURVEY §2.4; reference progenitor: the A16
  * xref-bind denormalize, `Batch Processor.py:228-244`, whose
  * entity-link graph is what a rank readout summarizes).
  *
  * Both faces run the SAME fixed-point arithmetic, so they agree
  * bit-for-bit and the declared query (q204) can hash-match a DuckDB
  * oracle — no float drift across engines or iteration orders:
  *
  *   r₀(v)   = Scale DIV n
  *   tele    = (15·Scale) DIV (100·n)
  *   rₜ₊₁(v) = tele + Σ_{u→v} (85·rₜ(u)·w(u,v)) DIV (100·W(u))
  *
  * with W(u) the total out-weight of u, every division an INTEGER
  * floor applied PER EDGE before the sum (integer sums commute — the
  * result is independent of edge order, which a double formulation
  * would not be), and the 85·r·w product carried in DECIMAL(38,0) /
  * BigInt (it crosses 2⁶³ once w exceeds ~10⁵ at full rank mass).
  * Dangling-node mass (a node with no out-edges) leaks by design —
  * both faces and the oracle share that definition, so ranks sum to
  * AT MOST Scale, never exactly.
  *
  * [[ranksLocal]] is the dimension-bounded face: when the corpus
  * collapses to a ≤|dims|² edge frame (q204's nation trade graph),
  * iterating on the driver over the collected edges is the right
  * plan — one corpus-scale aggregation, then O(k·|edges|) local work.
  * [[ranks]] is the 100 TB face for node sets that do NOT collapse
  * (user-level or document-link graphs): each iteration is one
  * edge⋈rank join plus one dst-grain aggregate, the frames persist
  * across iterations so no subtree re-executes, and nothing touches
  * the driver. PageRankSpec proves the two faces identical on the
  * same graph.
  */
object PageRank {

  /** Rank unit scale: 1 rank point = 10¹² units. */
  val Scale: Long = 1000000000000L

  private val teleOf: Long => Long = n => (15L * Scale) / (100L * n)

  /** Driver-side exact power iteration over a collected edge list.
    * Bounded by construction: callers collect only dimension-grain
    * edge frames (≤|dims|² rows). Returns (node, rankUnits) for every
    * node observed as a source or destination, in node order.
    */
  def ranksLocal(
      edges: Seq[(String, String, Long)], iters: Int): Seq[(String, Long)] = {
    require(edges.nonEmpty, "PageRank over an empty edge set")
    require(edges.forall(e => e._3 > 0 && e._1 != null && e._2 != null),
      "edge weights must be positive and keys non-null")
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outW: Map[String, Long] =
      edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    val tele = teleOf(n)
    var r: Map[String, Long] = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val acc = scala.collection.mutable.HashMap.empty[String, Long]
      edges.foreach { case (src, dst, w) =>
        val c = ((BigInt(85) * BigInt(r(src)) * BigInt(w)) /
          (BigInt(100) * BigInt(outW(src)))).toLong
        acc.update(dst, acc.getOrElse(dst, 0L) + c)
      }
      r = nodes.map(nd => nd -> (tele + acc.getOrElse(nd, 0L))).toMap
    }
    nodes.map(nd => nd -> r(nd))
  }

  /** Distributed power iteration: `edges` must carry (src STRING,
    * dst STRING, w LONG>0), keys non-null — the validations the local
    * face enforces run here too, on the PERSISTED frame in one
    * aggregate job (validating before persist would re-execute the
    * caller's corpus-scale lineage per probe), so the two faces can
    * never silently diverge on invalid input (a w=0 row would make
    * its src's divisor 0 and non-ANSI decimal division would NULL the
    * contribution where the local face throws; a null key would drop
    * out of the equi-joins where the local face carries it — both are
    * refused loudly instead). Each iteration is ONE
    * equi-join of the (|nodes|)-grain rank frame into the persisted
    * edge frame and ONE dst-keyed aggregate — shuffles stay at graph
    * grain, never corpus grain (the caller aggregates the corpus into
    * `edges` first). Intermediate rank frames persist eagerly and the
    * predecessor unpersists, so the lineage never re-executes an
    * iteration. Returns (node, r) with r in rank units — the frame is
    * PERSISTED and materialized; the caller owns it and must
    * `unpersist()` when done (the loop's ancestry is already
    * released, only the returned frame stays pinned).
    */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .persist()
    // one aggregate job over the persisted frame checks everything
    // the local face requires; invalid input unpins before throwing
    val probe = e.agg(
      count(lit(1)).as("n_edges"),
      coalesce(sum((col("w").isNull || col("w") <= 0L ||
        col("src").isNull || col("dst").isNull).cast("long")), lit(0L))
        .as("n_bad"))
      .collect()(0)
    if (probe.getLong(0) == 0L || probe.getLong(1) > 0L) {
      e.unpersist()
      require(probe.getLong(0) > 0L, "PageRank over an empty edge set")
      require(probe.getLong(1) == 0L,
        "edge weights must be positive and keys non-null")
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    val tele = teleOf(n)
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("wtot"))
    val ew = e.join(outw, "src").persist()
    ew.count()
    e.unpersist()
    // 85·r fits a long (≤ 8.5e13); the ·w product rides DECIMAL(38,0);
    // `div` floors per edge exactly like the local face's BigInt "/"
    val term = expr(
      "(CAST(85 * r AS DECIMAL(19,0)) * CAST(w AS DECIMAL(19,0))) " +
        "div CAST(100 * wtot AS DECIMAL(19,0))")
    var r = nodes.select(col("node"), lit(Scale / n).as("r")).persist()
    r.count()
    for (_ <- 1 to iters) {
      val prev = r
      val contrib = ew
        .join(prev.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), term.as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("csum"))
      r = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(tele) + coalesce(col("csum"), lit(0L))).as("r"))
        .persist()
      r.count()
      prev.unpersist()
    }
    ew.unpersist()
    nodes.unpersist()
    r
  }
}
