package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle set — accepts `array<string>` (raw
  * shingles) or `array<long>` (pre-hashed shingles: the scale path —
  * hashing each 8-byte long per seed is far cheaper than re-hashing
  * full shingle strings k times): for each of `k` hash families, the
  * minimum xxhash64(shingle, seed=i) over the set.
  *
  * Per-doc O(|shingles| * k) stays in one JVM loop per row instead of k
  * exploded aggregate passes — the standard Spark-side layout for
  * MinHash-LSH dedup candidate generation (SURVEY.md north star). Not in
  * a codegen hot path (runs once per document, output feeds a band
  * join), so CodegenFallback is acceptable.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"minhash expects array<string> or array<long>, got ${o.catalogString}")
  }

  private lazy val isString = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        var i = 0
        if (isString) {
          val s = arr.getUTF8String(j)
          while (i < k) {
            val h = XxHash64Function.hash(s, StringType, i.toLong)
            if (h < sig(i)) sig(i) = h
            i += 1
          }
        } else {
          val l = arr.getLong(j)
          while (i < k) {
            val h = XxHash64Function.hash(l, LongType, i.toLong)
            if (h < sig(i)) sig(i) = h
            i += 1
          }
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 64-bit SimHash over a token array: each token's xxhash64 votes ±1 on
  * every bit position; the signature sets bits with a positive vote sum.
  * Near-duplicate docs land within small Hamming distance (SURVEY.md
  * north star, SimHash dedup).
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${o.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** LSH signature for ANN over embeddings: sign bits of the vector's dot
  * products against `planes` deterministic random hyperplanes (seeded),
  * packed into a long. Vectors in the same bucket are candidate
  * neighbors — the scale path that avoids the all-pairs cross join.
  */
case class HyperplaneLsh(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<float>/array<double>, got ${o.catalogString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      val m = math.min(n, plane.length)
      while (i < m) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * plane(i)
        i += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HyperplaneLsh {
  /** Deterministic hyperplanes from a fixed seed (no RNG at eval time —
    * resume/retry safe; same buckets on every run and every executor).
    */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }
}

/** Winnowing-style minimum fingerprint: the smallest md5 hex digest
  * over the space-joined `n`-gram windows of a token array, or null
  * below `n` tokens (caller falls back to a whole-text hash) —
  * BIT-IDENTICAL to `array_min(transform(..., md5(concat_ws(" ",
  * ...))))`: md5 runs over the same UTF-8 bytes, and lowercase-hex
  * encoding is monotone in the digest bytes, so the minimum hex
  * string is the minimum unsigned digest. One digest instance and one
  * JVM loop per row instead of a per-element interpreted lambda
  * allocating a String AND a hex digest per window.
  */
case class WinnowMin(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, "window must be positive")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"winnow_min expects array<string>, got ${o.catalogString}")
  }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    if (sz < n) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val window = new Array[UTF8String](n)
    var best: Array[Byte] = null
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) {
        window(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      md.reset()
      val dig = md.digest(UTF8String.concatWs(sep, window: _*).getBytes)
      if (best == null || unsignedLess(dig, best)) best = dig
      i += 1
    }
    val sb = new java.lang.StringBuilder(best.length * 2)
    best.foreach(b => sb.append(f"${b & 0xff}%02x"))
    UTF8String.fromString(sb.toString)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Distinct xxhash64 values of the `n`-gram windows of a token array,
  * space-joined — BIT-IDENTICAL to the Catalyst-HOF formulation
  * `array_distinct(transform(sequence(0, size-n), i ->
  * xxhash64(concat_ws(" ", toks[i+1..i+n]))))` (same seed-42 hash of
  * the same joined string, same first-occurrence dedup order, empty
  * below `n` tokens), but ONE tight JVM loop per row: Spark's
  * higher-order functions are CodegenFallback and evaluate the lambda
  * per element with a fresh concatenated String each — on the shingle
  * pass (the dedup family's dominant cost) that is per-ELEMENT
  * interpretation versus this expression's per-ROW call.
  */
case class ShingleHash(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, "window must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash expects array<string>, got ${o.catalogString}")
  }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) {
        // concat_ws skips nulls; mirror that with empty-skip semantics
        window(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      val joined = UTF8String.concatWs(sep, window: _*)
      seen.add(XxHash64Function.hash(joined, StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[ShingleHash]]'s postings twin: the same distinct `n`-gram hashes
  * `g` (BIT-identical — same seed-42 hash of the same space-joined
  * window, same first-occurrence dedup, empty below `n` tokens), each
  * paired with the seed-42 xxhash64 of its window's FIRST token
  * (`w1h`) — the prefix key the maintained shingle-postings index
  * buckets on ([[graft.operators.ShingleIndex]], the lm_counts
  * `hash(w1)` discipline applied to the dedup miner). Output
  * `array<struct<w1h: long, g: long>>`; a duplicate window keeps its
  * first occurrence, and since a given `g` names one window string,
  * every occurrence carries the same `w1h`.
  */
case class ShinglePostings(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, "window must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1h", LongType, nullable = false),
      StructField("g", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"shingle_postings expects array<string>, got ${o.catalogString}")
  }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    if (sz < n)
      return new GenericArrayData(
        Array.empty[org.apache.spark.sql.catalyst.InternalRow])
    val seen = new java.util.LinkedHashMap[java.lang.Long, java.lang.Long]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) {
        // concat_ws skips nulls; mirror that with empty-skip semantics
        window(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      val joined = UTF8String.concatWs(sep, window: _*)
      val g = XxHash64Function.hash(joined, StringType, 42L)
      if (!seen.containsKey(g)) {
        // a null/absent first token hashes as the empty string — the
        // same value concat_ws's null-skip would have contributed
        val w1 = if (window(0) == null) UTF8String.EMPTY_UTF8 else window(0)
        seen.put(g, XxHash64Function.hash(w1, StringType, 42L))
      }
      i += 1
    }
    val out =
      new Array[org.apache.spark.sql.catalyst.InternalRow](seen.size())
    val it = seen.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = org.apache.spark.sql.catalyst.InternalRow(
        e.getValue.longValue(), e.getKey.longValue())
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
