package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Session-level registration of graft's native expressions, plus
  * Column-API wrappers.
  *
  * Registration goes through the public FunctionRegistry so the
  * expressions are usable from both the Column API (`call_function`)
  * and plain SQL; [[graft.plans.GraftExtensions]] injects the same
  * builders at session build time for spark.sql-only users.
  */
object GraftFunctions {

  /** 8 hyperplanes over the 64-d embedding space, fixed seed: 256
    * buckets — coarse enough that buckets stay populated, refined by
    * multiprobe on the query side.
    */
  private lazy val lshPlanes = HyperplaneLsh.planes(nPlanes = 8, dim = 64)

  /** Independent plane sets for multi-table LSH (OR-amplification):
    * one 8-bit table recalls only ~10–17% of weakly-clustered top-k
    * neighbors (measured in QueriesSpec); T tables recall
    * 1-(1-p)^T. Table 0 uses the default seed = `lsh_bucket8`.
    */
  val LshTables = 4
  private lazy val lshPlanesT: IndexedSeq[Array[Array[Double]]] =
    (0 until LshTables).map(t =>
      HyperplaneLsh.planes(nPlanes = 8, dim = 64, seed = 42L + t))

  private def builders: Seq[(String, Seq[Expression] => Expression)] = {
    val base: Seq[(String, Seq[Expression] => Expression)] = Seq(
      "cosine_sim" -> ((es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
      "dot_product" -> ((es: Seq[Expression]) => DotProduct(es(0), es(1))),
      "vec_norm" -> ((es: Seq[Expression]) => VecNorm(es(0))),
      "simhash64" -> ((es: Seq[Expression]) => SimHash64(es(0))),
      "phash64" -> ((es: Seq[Expression]) => PHash64(es(0))),
      "video_frame_hashes" -> ((es: Seq[Expression]) =>
        VideoFrameHashes(es(0), VideoStride, VideoMaxFrames)),
      "audio_fp64" -> ((es: Seq[Expression]) => AudioFingerprint64(es(0))),
      "nfc_normalize" -> ((es: Seq[Expression]) => NfcNormalize(es(0))),
      "minhash_sig32" -> ((es: Seq[Expression]) => MinHashSignature(es(0), 32)),
      "lsh_bucket8" -> ((es: Seq[Expression]) => HyperplaneLsh(es(0), lshPlanes)))
    base ++ (0 until LshTables).map(t =>
      s"lsh_bucket8_t$t" ->
        ((es: Seq[Expression]) => HyperplaneLsh(es(0), lshPlanesT(t))))
  }

  /** Idempotent per-session registration — call before using wrappers.
    * The short-circuit is a SESSION-SCOPED "graft registered here"
    * flag, not a bare name-exists probe: a user temp function that
    * happens to hold a graft name must be REPLACED (the
    * createOrReplaceTempFunction guarantee — graft's wrappers would
    * otherwise silently call the user's expression; r12 ADVICE), while
    * graft's own prior registration (an earlier call, or a session
    * replay of this one) skips the re-register and its per-name
    * replaced-function WARN, which a bench loop would otherwise turn
    * into hundreds of lines of registry noise. At most one WARN round
    * per session, and only when something else held the names.
    */
  private val registeredSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = synchronized {
    if (registeredSessions.containsKey(spark)) return
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
    registeredSessions.put(spark, java.lang.Boolean.TRUE)
    ()
  }

  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)

  def vecNorm(a: Column): Column = call_function("vec_norm", a)

  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)

  /** 64-bit DCT perceptual hash of a binary media payload. */
  def phash64(content: Column): Column = call_function("phash64", content)

  /** Canonical temporal-signature layout (every frame, first 16): the
    * constants are part of the durable signature artifact's identity —
    * [[graft.queries.MultimodalQueries]] bakes them into the store
    * name, so a layout change misses rather than misreads.
    */
  val VideoStride = 1
  val VideoMaxFrames = 16

  /** Ordered frame pHashes of a video payload (q189 temporal sig). */
  def videoFrameHashes(content: Column): Column =
    call_function("video_frame_hashes", content)

  /** 64-bit energy-envelope audio fingerprint (q190). */
  def audioFp64(content: Column): Column = call_function("audio_fp64", content)

  /** Unicode NFC canonicalization (q87's normalization-dedup step). */
  def nfcNormalize(text: Column): Column = call_function("nfc_normalize", text)

  /** 32-hash MinHash signature of a shingle array. */
  def minhashSig(shingles: Column): Column = call_function("minhash_sig32", shingles)

  /** 8-bit hyperplane-LSH bucket id for a 64-d embedding. */
  def lshBucket(embedding: Column): Column = call_function("lsh_bucket8", embedding)

  /** Bucket in table `t` of the multi-table LSH (0 ≤ t < LshTables). */
  def lshBucketT(embedding: Column, t: Int): Column =
    call_function(s"lsh_bucket8_t$t", embedding)
}
