package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental bigram-LM maintenance (the model behind q77, kept
  * fresh the way [[IncrementalDedup]] keeps the shingle index fresh
  * and [[IncrementalVectors]] the IVF lists).
  *
  * The LM state is the corpus bigram-count table `(w1, bigram, bc)`.
  * Counts are ADDITIVE under disjoint corpus union —
  * `counts(corpus ⊎ delta) = counts(corpus) + counts(delta)` — so a
  * delta batch folds in EXACTLY (no approximation, no refit trigger
  * needed, unlike the k-means quantizer): [[merge]] costs one
  * delta-sized count pass plus a vocabulary-bounded sum, never a
  * corpus re-scan, and [[IncrementalLmSpec]] proves incremental ≡
  * one-pass rebuild. Start counts `sc(w1) = Σ bc(w1, ·)` and the
  * cost table derive from the state by vocabulary-bounded
  * aggregation.
  *
  * [[score]] evaluates documents against a FIXED cost table. When the
  * scored corpus is the fitted corpus (q77), every bigram is present
  * and the OOV cost is irrelevant (pass 0); when scoring NEW text
  * against a standing LM, pass [[oovCost]]'s `ln(N + 1)` (N = total
  * bigram mass — "rarer than anything observed") so a delta document
  * is never silently dropped, scored on a subset of its bigrams, or —
  * worst — handed p = 1 for text the model has never seen.
  */
object IncrementalLm {

  /** One row per bigram instance `(doc_id, w1, bigram)`: tokens bind
    * once per row, window enumeration is a codegen'd HOF — the shared
    * exploded-bigram pass under the trainer and every scorer.
    */
  def bigrams(docs: DataFrame): DataFrame =
    docs
      .withColumn("tk",
        filter(split(col("text"), " "), tk => length(tk) > 0))
      .withColumn("n", size(col("tk")))
      .filter(col("n") >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), col("n") - 1),
          i => struct(
            element_at(col("tk"), i).as("w1"),
            concat_ws(" ",
              element_at(col("tk"), i),
              element_at(col("tk"), i + 1)).as("bigram")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.bigram").as("bigram"))

  /** Fit the count state `(w1, bigram, bc)` from a corpus frame. */
  def fit(docs: DataFrame): DataFrame =
    bigrams(docs)
      .groupBy(col("w1"), col("bigram"))
      .agg(count(lit(1)).as("bc"))

  /** Per-document term frequencies `(doc_id, w1, bigram, tf)` — the
    * KEYED form of the LM state a maintained pipeline stores: because
    * rows carry their doc_id, an updated document's old bigrams retire
    * by key upsert (batch wins per doc) exactly like the shingle
    * index, with no subtract-old-text step and no crash window between
    * a count commit and a corpus commit. [[countsFromTf]] folds it to
    * the aggregate state.
    */
  def docTf(docs: DataFrame): DataFrame =
    bigrams(docs)
      .groupBy(col("doc_id"), col("w1"), col("bigram"))
      .agg(count(lit(1)).as("tf"))

  /** Aggregate count state from the stored per-doc tf table — one
    * vocabulary-bounded shuffle, never a corpus text re-scan.
    */
  def countsFromTf(tf: DataFrame): DataFrame =
    tf.groupBy(col("w1"), col("bigram"))
      .agg(sum(col("tf")).as("bc"))

  /** Fold a DELTA batch of documents into standing counts — exact,
    * delta-sized: the only corpus-grain work is counting the delta;
    * the merge shuffles vocabulary-bounded count rows.
    */
  def merge(standing: DataFrame, deltaDocs: DataFrame): DataFrame =
    standing.unionByName(fit(deltaDocs))
      .groupBy(col("w1"), col("bigram"))
      .agg(sum(col("bc")).as("bc"))

  /** Cost table `(w1, bigram, cost_micro)` from the count state.
    * `cost_micro = round(1e6·ln(sc/bc))` — one exact integer per
    * vocabulary entry, so per-document sums are
    * aggregation-order-independent (q77's float discipline).
    */
  def costTable(counts: DataFrame): DataFrame = {
    val sc = counts.groupBy(col("w1")).agg(sum(col("bc")).as("sc"))
    counts.join(sc, "w1")
      .select(col("w1"), col("bigram"),
        round(log(col("sc").cast("double") / col("bc").cast("double"))
          * 1000000.0, 0).cast("long").as("cost_micro"))
  }

  /** Score documents against a fixed cost table: per doc, mean
    * `cost_micro/1e6` over its bigram instances (q77's output shape
    * `(doc_id, n_bigrams, nll)`). `oovCostMicro` prices bigrams the
    * table has never seen — derive it with [[oovCost]] when scoring
    * text the model was not fitted on. Deliberately NO default: a
    * silent 0 would price unseen bigrams as p = 1, handing
    * keyboard-mash the best score in the corpus — the exact documents
    * a perplexity filter exists to drop. Pass 0 explicitly only when
    * scoring the fitted corpus itself, where OOV cannot occur.
    */
  def score(
      docs: DataFrame,
      cost: DataFrame,
      oovCostMicro: Long): DataFrame =
    bigrams(docs)
      .groupBy(col("doc_id"), col("w1"), col("bigram"))
      .agg(count(lit(1)).as("tf"))
      .join(cost, Seq("w1", "bigram"), "left")
      .withColumn("c", coalesce(col("cost_micro"), lit(oovCostMicro)))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).cast("long").as("n_bigrams"),
        sum(col("tf") * col("c")).as("tot"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("tot").cast("double") /
          (col("n_bigrams").cast("double") * 1000000.0), 6).as("nll"))
      .orderBy(col("doc_id"))

  /** Out-of-vocabulary cost from the count state: `ln(N + 1)` micros,
    * N = total bigram mass (an unseen continuation is priced as rarer
    * than any observed one). One tiny aggregate over the vocabulary
    * table.
    */
  def oovCost(counts: DataFrame): Long = {
    val n = counts.agg(coalesce(sum(col("bc")), lit(0L)).cast("long"))
      .head().getLong(0)
    math.round(math.log(n.toDouble + 1.0) * 1000000.0)
  }
}
