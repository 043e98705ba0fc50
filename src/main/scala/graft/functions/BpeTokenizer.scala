package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer (the public BPE algorithm: Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — makes the engine's token-mass numbers training-real
  * instead of the whitespace/regex approximations (SURVEY.md north
  * star: token counting).
  *
  * Shape at 100 TB: the VOCABULARY is learned once on a bounded
  * aggregate (the top-V distinct words by corpus frequency — word
  * frequencies saturate long before corpus size does, the same
  * bounded-sample posture as [[KMeansLite]]), then APPLIED corpus-wide
  * as a pure map-side expression with the merge table broadcast inside
  * the plan. Training never iterates over the corpus: pair counting
  * runs on the distinct-word frequency table, the standard BPE
  * training layout.
  */
object Bpe {

  /** End-of-word marker symbol (Sennrich's `</w>`): lets merges learned
    * at word boundaries stay distinct from word-internal merges, and
    * makes the token sequence reconstruct the word exactly.
    */
  val EndOfWord = "</w>"

  /** Learn `numMerges` merges from (word, frequency) pairs.
    * Deterministic: the winning pair each round is the most frequent,
    * ties broken lexicographically — no RNG, no hash-order dependence.
    * Stops early when no pair occurs at least twice (weighted).
    */
  def train(
      wordFreqs: Seq[(String, Long)],
      numMerges: Int): Vector[(String, String)] = {
    // each distinct word as its symbol sequence (chars + end marker)
    var words: Array[(Array[String], Long)] = wordFreqs.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, f) => (symbolsOf(w), f) }.toArray
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestN = 1L // require weighted count ≥ 2
      counts.foreach { case (p, n) =>
        if (n > bestN || (n == bestN && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestN = n
        }
      }
      if (best == null) done = true
      else {
        merges += best
        words = words.map { case (syms, f) => (mergeOnce(syms, best), f) }
        round += 1
      }
    }
    merges.result()
  }

  /** Initial symbol sequence of a word: one symbol per Unicode CODE
    * POINT (not UTF-16 code unit — splitting a surrogate pair would
    * make unpaired-surrogate symbols that re-encode as replacement
    * bytes, breaking the round-trip law on emoji/supplementary-plane
    * text) plus the end marker.
    */
  private def symbolsOf(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += EndOfWord
    out.toArray
  }

  /** Replace every adjacent occurrence of `pair` left-to-right. */
  private def mergeOnce(
      syms: Array[String], pair: (String, String)): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Rank lookup for encoding: pair → merge priority (lower = earlier).
    * Values are boxed Integers so an absent pair reads as null — a
    * primitive-Int map would unbox absent to 0, colliding with the
    * first merge's rank.
    */
  def ranks(
      merges: IndexedSeq[(String, String)]): java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer]()
    merges.zipWithIndex.foreach { case (p, i) => m.put(p, Int.box(i)) }
    m
  }

  /** Encode one word: start from chars + end marker, repeatedly apply
    * the present pair with the LOWEST merge rank (the standard BPE
    * encode order — guarantees the same segmentation the training
    * produced on its own sample). Concatenating the result (and
    * stripping the end marker) reconstructs the word exactly.
    */
  def encode(
      word: String,
      rank: java.util.HashMap[(String, String), Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms: Array[String] = symbolsOf(word)
    var continue = true
    while (continue && syms.length > 1) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get((syms(i), syms(i + 1)))
        if (r != null && r.intValue < bestRank) {
          bestRank = r.intValue; best = (syms(i), syms(i + 1))
        }
        i += 1
      }
      if (best == null) continue = false
      else syms = mergeOnce(syms, best)
    }
    syms
  }
}

/** Driver-side vocabulary trainer + cache: merges learned once per
  * (corpus dir, content stamp). The word-frequency aggregate is
  * bounded BEFORE collect (top `VocabWords` rows) — the same
  * driver-safe discipline as the k-means sample and the skew-key
  * probe.
  */
object BpeVocab {

  /** Distinct words the trainer sees (top by corpus frequency). */
  val VocabWords = 2048

  /** Session conf: merge-round budget (= learned subword vocabulary
    * additions). The default suits real corpora; note that on a
    * SMALL-vocabulary corpus any generous budget fully merges every
    * common word into one token — that is correct BPE behavior (the
    * most frequent words become single tokens first), not a bug — so
    * tests that want to SEE subword splitting set a tight budget.
    */
  val MergeBudgetConf = "spark.graft.tokens.bpe.merges"
  val DefaultMerges = 256

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Int), Array[(String, String)]]()

  /** Merges for the corpus under `dir` (stamped: a rewritten corpus
    * retrains instead of serving a stale vocabulary; the session's
    * merge budget keys the cache too).
    */
  def merges(spark: SparkSession, dir: String): Array[(String, String)] = {
    val stamp = graft.queries.Q.dirStamp(dir)
    val budget =
      try spark.conf.get(MergeBudgetConf, DefaultMerges.toString).toInt
      catch { case _: NumberFormatException => DefaultMerges }
    val key = (dir, stamp, budget)
    // train OUTSIDE any map lock: computeIfAbsent would hold the bin
    // lock across the word-frequency Spark job, blocking a concurrent
    // session whose key hashes to the same bin (the overPairLimit
    // lesson). A lost race retrains redundantly — deterministic, so
    // both winners are identical.
    val cached = cache.get(key)
    if (cached != null) return cached
    import org.apache.spark.sql.functions._
    val wf = graft.sources.Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(VocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val trained = Bpe.train(wf, budget).toArray
    // retire other stamps of the same (dir, budget): a long-lived
    // service rewriting its corpus must not accumulate stale tables
    cache.keySet.removeIf(k => k._1 == dir && k._3 == budget && k._2 != stamp)
    val winner = cache.putIfAbsent(key, trained)
    // return a local reference, never a map re-read: a concurrent
    // caller's removeIf (older stamp in hand) may delete this entry
    // between put and get, and a null merge table NPEs in every task
    if (winner != null) winner else trained
  }

  /** Token count of a text column under `merges` (map-side). */
  def tokenCount(text: Column, merges: Array[(String, String)]): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      BpeTokenCount(org.apache.spark.sql.GraftPlanBridge.expression(text), merges))

  /** Token array of a text column under `merges` (map-side). */
  def tokens(text: Column, merges: Array[(String, String)]): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      BpeTokens(org.apache.spark.sql.GraftPlanBridge.expression(text), merges))
}

/** Shared encode plumbing for the two BPE expressions: whitespace
  * pre-tokenization (the repo-wide `split(text, " ")` + drop-empties
  * convention, so BPE masses are comparable with the whitespace
  * numbers), then per-word rank-priority merges. Words repeat
  * Zipf-style, so each task memoizes encodings in a bounded
  * thread-local map — the common path is one hash lookup per word.
  */
private[functions] trait BpeEncoding { self: UnaryExpression =>
  def merges: Array[(String, String)]

  @transient private lazy val rank = Bpe.ranks(merges.toIndexedSeq)

  // per-thread memo; cleared when it outgrows its bound so a
  // pathological vocabulary cannot grow task memory without limit
  @transient private lazy val memo =
    new ThreadLocal[java.util.HashMap[String, Array[String]]] {
      override def initialValue() = new java.util.HashMap()
    }

  protected def encodeWord(w: String): Array[String] = {
    val m = memo.get()
    var toks = m.get(w)
    if (toks == null) {
      toks = Bpe.encode(w, rank)
      if (m.size() >= 65536) m.clear()
      m.put(w, toks)
    }
    toks
  }

  protected def foreachWord(v: Any)(f: String => Unit): Unit = {
    val text = v.asInstanceOf[UTF8String].toString
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) f(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"bpe expressions expect string, got ${o.catalogString}")
  }
}

/** BPE token count of a text column. Not in a codegen hot path (runs
  * once per document, like the signature expressions), so
  * CodegenFallback is acceptable; the memoized encode keeps the per-row
  * cost at ~one hash lookup per word.
  */
case class BpeTokenCount(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression with BpeEncoding with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    var n = 0L
    foreachWord(v) { w => n += encodeWord(w).length }
    n
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** BPE token array of a text column (tokens carry the `</w>` end
  * markers, so the array reconstructs the text modulo whitespace runs).
  */
case class BpeTokens(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression with BpeEncoding with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    foreachWord(v) { w =>
      encodeWord(w).foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
