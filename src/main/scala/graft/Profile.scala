package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase-level timing of the shingle-dedup pipeline (the
  * bench's dominant cost) so optimization targets facts, not guesses.
  *
  * Usage: runMain graft.Profile [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = graft.sources.Tables(spark, sfDir, "documents")
    time("read+count")(docs.count())

    val sh = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("tk", filter(split(col("text"), " "), t => length(t) > 0))
      .select(col("doc_id"),
        graft.queries.DedupQueries.shingleHashes(col("tk")).as("s"))
      .persist()
    time("shingle materialize")(sh.count())

    val ex = sh.select(col("doc_id"), explode(col("s")).as("g"))
    time("explode count")(ex.count())

    val inter = ex.as("x")
      .join(ex.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter_cnt"))
    time("pair join+agg")(inter.count())

    time("full q25 (cold cache path)")(
      SparkEntry.queries("q25_dedup_ngram_jaccard")(spark, sfDir)
        .write.mode("overwrite").format("noop").save())
    time("full q25 again (warm)")(
      SparkEntry.queries("q25_dedup_ngram_jaccard")(spark, sfDir)
        .write.mode("overwrite").format("noop").save())

    // Scaling probe: do the core shapes stay linear when the fact
    // table grows 10×? (join-denorm agg = q07 shape; two-window
    // sessionization = q35 shape.) A superlinear jump here would mean
    // a plan that breaks at 100 TB.
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
    val li10 = (1 to 10).map(_ => li).reduce(_ union _)
    val ord = graft.sources.Tables(spark, sfDir, "orders")
    def denorm(f: org.apache.spark.sql.DataFrame) = f
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
    time("join-agg 1x lineitem")(denorm(li).write.mode("overwrite").format("noop").save())
    time("join-agg 10x lineitem")(denorm(li10).write.mode("overwrite").format("noop").save())
    def sess(f: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_shipdate"), col("l_linenumber"))
      f.withColumn("gap", when(datediff(col("l_shipdate"),
          lag(col("l_shipdate"), 1).over(w)) > 30, 1L).otherwise(0L))
        .withColumn("sess", sum(col("gap")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("l_orderkey"), col("sess")).agg(count(lit(1)))
    }
    time("two-window sess 1x")(sess(li).write.mode("overwrite").format("noop").save())
    time("two-window sess 10x")(sess(li10).write.mode("overwrite").format("noop").save())

    // AQE exchange-reuse check: q40/q54 fan one repartitioned corpus
    // into several branches — confirm the runtime plan collapses the
    // identical exchange subtrees instead of re-scanning per branch.
    val q40 = SparkEntry.queries("q40_ann_ivf")(spark, sfDir)
    q40.write.mode("overwrite").format("noop").save()
    val finalPlan = q40.queryExecution.executedPlan.toString
    val reused = "ReusedExchange".r.findAllIn(finalPlan).length
    println(s"PHASE q40 ReusedExchange nodes   $reused")

    // Round-2 scaling probes: the map-side IVF assignment and the
    // salted exact-pair mining must also stay ~linear at 10×.
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism)
    val emb10 = (1 to 10).map(i =>
      emb.withColumn("vec_id", col("vec_id") * 10 + lit(i.toLong)))
      .reduce(_ union _)
    val cents = graft.functions.KMeansLite.fit(emb, "embedding", "vec_id")
    def assignAll(f: org.apache.spark.sql.DataFrame) = f
      .select(col("vec_id"),
        graft.functions.NearestCentroids(col("embedding"), cents, 2).as("cids"))
    time("ivf assign 1x")(assignAll(emb).write.mode("overwrite").format("noop").save())
    time("ivf assign 10x")(assignAll(emb10).write.mode("overwrite").format("noop").save())

    val docs10 = (1 to 10).map(i =>
      docs.withColumn("doc_id", col("doc_id") * 10 + lit(i.toLong)))
      .reduce(_ union _)
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("tk", filter(split(col("text"), " "), t => length(t) > 0))
      .select(col("doc_id"),
        graft.queries.DedupQueries.shingleHashes(col("tk")).as("s"))
    // 10× replicated docs = every shingle's df × 10 (quadratic pair
    // blowup by construction — exactly the hot-shingle scenario);
    // wall-clock here is dominated by real pair output, the point is
    // that it completes without a single-reducer stall
    time("salted pairs on 10x replicated docs")(
      graft.queries.DedupQueries.pairsFromShingles(docs10, hotDf = 64)
        .write.mode("overwrite").format("noop").save())

    // Round-6 probe: the COMPOSED release path. Release.fromStanding's
    // joints (cluster map, semi-join gates, shard write) are probed
    // individually in specs; this times them composed, at 1× and 10×
    // corpus with LINEARLY scaled candidates — a real 10× corpus of
    // new documents carries ~10× the near-dup pairs, so the candidate
    // artifact is replicated with shifted ids rather than re-mined
    // over replicas (which manufactures a quadratic cross-replica
    // pair set and would measure the miner again, not the release).
    def timedS(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $label%-28s $s%8.3f s")
      s
    }
    val relRoot = java.nio.file.Files
      .createTempDirectory("graft-profile-rel").toString
    val cands1 = graft.queries.DedupQueries.candidatesFromShingles(sh)
    def shift(f: org.apache.spark.sql.DataFrame, c: String, i: Int) =
      f.withColumn(c, col(c) * 10 + lit(i.toLong))
    val docsRel10 = (1 to 10).map(i => shift(docs, "doc_id", i))
      .reduce(_ unionAll _)
    val cands10 = (1 to 10)
      .map(i => shift(shift(cands1, "doc_a", i), "doc_b", i))
      .reduce(_ unionAll _)
    def standing(d: org.apache.spark.sql.DataFrame,
        cs: org.apache.spark.sql.DataFrame, tag: String): (String, String) = {
      val c = s"$relRoot/corpus$tag"; val k = s"$relRoot/cands$tag"
      graft.operators.CommitSink.writeVerified(spark, d, c)
      graft.operators.CommitSink.writeVerified(spark, cs, k)
      (c, k)
    }
    val (c1, k1) = standing(docs, cands1, "1x")
    val (c10, k10) = standing(docsRel10, cands10, "10x")
    val t1 = timedS("release fromStanding 1x") {
      Release.fromStanding(spark, c1, k1, s"$relRoot/exp1", 16)
    }
    val t10 = timedS("release fromStanding 10x") {
      Release.fromStanding(spark, c10, k10, s"$relRoot/exp10", 16)
    }
    println(f"PHASE release scaling exponent ${math.log(t10 / t1) / math.log(10)}%8.3f (1.0 = linear)")

    // Round-6 probe: ChangelogCompaction's O(delta + touched slice)
    // claim. A 3-key delta touches ≤3 of 32 hash buckets, so applying
    // it to a 10× standing view must cost ≈ the 1× apply (the commit
    // stages only touched buckets), NOT 10× — the ratio is the
    // datapoint. Keys are chosen to exist in both views.
    val evC = graft.sources.Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
    val evC10 = (1 to 10).map(i =>
        evC.withColumn("user_id", col("user_id") * 10 + lit(i.toLong)))
      .reduce(_ unionAll _)
    val cdcRoot = java.nio.file.Files
      .createTempDirectory("graft-profile-cdc").toString
    val vCols = Seq("ts_us", "event_id")
    graft.streaming.ChangelogCompaction.applyDelta(
      evC, s"$cdcRoot/v1", "user_id", vCols, Some(graft.operators.PartitionedCommit.Layout.Hash(32)))
    graft.streaming.ChangelogCompaction.applyDelta(
      evC10, s"$cdcRoot/v10", "user_id", vCols, Some(graft.operators.PartitionedCommit.Layout.Hash(32)))
    val keys = evC.select(col("user_id")).distinct().limit(3)
      .collect().map(_.getLong(0))
    val delta1 = evC.filter(col("user_id").isin(keys: _*))
    val delta10 = delta1.withColumn("user_id", col("user_id") * 10 + lit(1L))
    val cd1 = timedS("cdc 3-key delta into 1x") {
      graft.streaming.ChangelogCompaction.applyDelta(
        delta1, s"$cdcRoot/v1", "user_id", vCols, Some(graft.operators.PartitionedCommit.Layout.Hash(32))); ()
    }
    val cd10 = timedS("cdc 3-key delta into 10x") {
      graft.streaming.ChangelogCompaction.applyDelta(
        delta10, s"$cdcRoot/v10", "user_id", vCols, Some(graft.operators.PartitionedCommit.Layout.Hash(32))); ()
    }
    println(f"PHASE cdc 10x/1x delta cost ratio ${cd10 / cd1}%8.3f (≈1.0 = O(delta), 10 = O(view))")

    // Round-7 probes: the two new corpus-scale shapes. (a) The
    // star-profit join (q179's plan: three broadcast dims + ONE
    // orderkey exchange + a |nations|×|years| agg) must stay ~linear
    // when the fact side grows 10× — a superlinear jump would mean a
    // dim stopped broadcasting. (b) The multi-rule audit (q182's
    // engine) is a single map-side-combined aggregate, so 10× rows
    // must cost ≈10× map work with no new exchange.
    val part = graft.sources.Tables(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_retailprice"))
    val sup = graft.sources.Tables(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = graft.sources.Tables(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    // q179's REAL arithmetic incl. the retail-cost term — the
    // broadcast part column must be consumed, or the probe times a
    // shape the query doesn't run
    val costMicro = (graft.queries.Q.fxUnits(col("p_retailprice"), 100)
      .cast("decimal(19,0)") *
      (graft.queries.Q.fxUnits(col("l_quantity"), 1) * 100L)
        .cast("decimal(19,0)")).cast("decimal(38,0)")
    def profit(f: org.apache.spark.sql.DataFrame) = f
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), date_format(col("o_orderdate"), "yyyy"))
      .agg(sum(graft.queries.Q.revMicro - costMicro).as("profit"))
    time("star profit 1x")(profit(li).write.mode("overwrite").format("noop").save())
    time("star profit 10x")(profit(li10).write.mode("overwrite").format("noop").save())

    import graft.operators.QualityRules.Rule
    val probe = Seq(
      Rule("qty_in_range",
        graft.queries.Q.fxUnits(col("l_quantity"), 1).between(1, 50)),
      Rule("price_positive",
        graft.queries.Q.fxUnits(col("l_extendedprice"), 100) > 0),
      Rule("flag_known", col("l_returnflag").isin("A", "N", "R")))
    def ruleAudit(f: org.apache.spark.sql.DataFrame) =
      graft.operators.QualityRules.audit(f, probe)
    time("rule audit 1x")(ruleAudit(li).write.mode("overwrite").format("noop").save())
    time("rule audit 10x")(ruleAudit(li10).write.mode("overwrite").format("noop").save())

    // Round-8 probe: DocumentPipeline's end-to-end delta cost (the r7
    // verdict's ask — the CDC probe's shape applied to the TEXT
    // pipeline). The SAME small delta batch upserts into a 1× vs a 10×
    // standing corpus (both partition-grain, 32 buckets): the writes
    // are bucket-scoped O(batch) and the mine joins the delta's
    // shingles against the standing index with the delta side
    // broadcast, so the only standing-sized term is the pruned index
    // SCAN — the ratio quantifies how far the composed path is from
    // the O(delta) ideal at this scale. Corpora are id-shifted
    // replicas (the release-probe discipline); delta keys exist in
    // both, so both runs pay the same replaced-doc retirement work.
    val dpRoot = java.nio.file.Files
      .createTempDirectory("graft-profile-dp").toString
    def dpPaths(tag: String) =
      (s"$dpRoot/corpus$tag", s"$dpRoot/shingles$tag", s"$dpRoot/cands$tag")
    val docsDp10 = (1 to 10).map(i => shift(docs, "doc_id", i))
      .reduce(_ unionAll _)
    val (dc1, ds1, dk1) = dpPaths("1x")
    val (dc10, ds10, dk10) = dpPaths("10x")
    timedS("docpipe standing build 1x") {
      graft.streaming.DocumentPipeline.upsertBatch(
        docs, dc1, ds1, dk1, layout = Some(graft.operators.PartitionedCommit.Layout.Hash(32))); ()
    }
    timedS("docpipe standing build 10x") {
      graft.streaming.DocumentPipeline.upsertBatch(
        docsDp10, dc10, ds10, dk10, layout = Some(graft.operators.PartitionedCommit.Layout.Hash(32))); ()
    }
    // the delta: 20 existing docs re-delivered with edited text (the
    // replace path — retire + re-shingle + re-mine), same ids per run
    val deltaDocs = docs.orderBy(col("doc_id")).limit(20)
      .withColumn("text", concat(col("text"), lit(" delta edit")))
    val deltaDocs10 = shift(deltaDocs, "doc_id", 1)
    val dp1 = timedS("docpipe 20-doc delta into 1x") {
      graft.streaming.DocumentPipeline.upsertBatch(
        deltaDocs, dc1, ds1, dk1, layout = Some(graft.operators.PartitionedCommit.Layout.Hash(32))); ()
    }
    val dp10 = timedS("docpipe 20-doc delta into 10x") {
      graft.streaming.DocumentPipeline.upsertBatch(
        deltaDocs10, dc10, ds10, dk10, layout = Some(graft.operators.PartitionedCommit.Layout.Hash(32))); ()
    }
    println(f"PHASE docpipe 10x/1x delta cost ratio ${dp10 / dp1}%8.3f (≈1.0 = O(delta), 10 = O(corpus))")

    // Round-8 probe: the two-pass global cumsum (q193's budget
    // selection / q90's packing spine, [[graft.queries.Q.globalCumBefore]])
    // must scale LINEARLY in the corpus — its only non-narrow pieces
    // are one range exchange and a ≤P-row collect, so the 10× ratio
    // should sit near 10 (linear), never near 100 (an accidental
    // quadratic would mean the offsets join degenerated). Probed on
    // the q193 shape: score → rank-order cumsum → budget flags.
    val scored1 = docs
      .withColumn("n_tok",
        size(filter(split(col("text"), " "), t => length(t) > 0))
          .cast("long"))
      .filter(col("n_tok") > 0)
      .select(col("doc_id"), col("n_tok"),
        (col("n_tok") % 97).cast("double").as("score"))
    val scored10 = (1 to 10).map(i => shift(scored1, "doc_id", i))
      .reduce(_ unionAll _)
    def cumProbe(f: org.apache.spark.sql.DataFrame): Unit = {
      val (cum, total) = graft.queries.Q.globalCumBefore(
        f, Seq(col("score").desc, col("doc_id")), "n_tok")
      val budget = total / 2
      cum.filter(col("cum_before") + col("n_tok") <= budget)
        .write.mode("overwrite").format("noop").save()
    }
    val cb1 = timedS("global cumsum 1x")(cumProbe(scored1))
    val cb10 = timedS("global cumsum 10x")(cumProbe(scored10))
    println(f"PHASE global cumsum 10x/1x ratio ${cb10 / cb1}%8.3f (≈10 = linear)")

    // Round-8 probe: the q219 attribution join (the round's only new
    // corpus×slice join). Its intermediate is Θ(Σ_u purchases_u ×
    // in-window touches_u) — linear when the corpus grows by USERS
    // (per-user density constant: the honest growth model for a
    // bigger corpus), quadratic only when one user's DENSITY grows,
    // which is semantic (every purchase must see its window's
    // touches) and bounded by the 7-day window, with AQE skew
    // splitting the hot user's partition. The probe pins the first
    // claim: 10× users at constant density should sit near 10×.
    val ev1 = graft.sources.Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val ev10 = (1 to 10)
      .map(i => shift(shift(ev1, "user_id", i), "event_id", i))
      .reduce(_ unionAll _)
    def attrProbe(ev: org.apache.spark.sql.DataFrame): Unit = {
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"), col("user_id"),
          col("us").as("cus"))
      val touch = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type"), col("us"))
      val pct = conv.join(touch, Seq("user_id"))
        .filter(col("us") < col("cus") &&
          col("us") >= col("cus") - lit(604800000000L))
        .groupBy(col("conv_id"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("t_cnt"))
      pct.join(pct.groupBy(col("conv_id"))
          .agg(sum(col("t_cnt")).as("n_touch")), Seq("conv_id"))
        .groupBy(col("event_type"))
        .agg(sum(expr("(1000000 * t_cnt) div n_touch")).as("credit_e6"))
        .write.mode("overwrite").format("noop").save()
    }
    val at1 = timedS("attribution 1x users")(attrProbe(ev1))
    val at10 = timedS("attribution 10x users")(attrProbe(ev10))
    println(f"PHASE attribution 10x/1x ratio ${at10 / at1}%8.3f (≈10 = linear in users)")

    // Round-9 probe: the q219 touch CAP against the pathological cell
    // the user axis can't produce — ONE user whose touch density
    // explodes. Replicate one user's touches 300× and purchases 10×
    // (time-shifted by microseconds, so every replica stays
    // in-window) so that user's purchases×touches join cell
    // dominates; the capped form flattens it (join fanout ≤ cap per
    // purchase) while the uncapped form pays the full quadratic cell.
    // Worst-case bound, measured: uncapped Θ(P_hot × T_hot) vs
    // capped Θ(P_hot × cap + T_hot log T_hot) per hot user.
    val hotUser = ev1.filter(col("event_type") =!= "purchase")
      .groupBy(col("user_id")).count()
      .orderBy(col("count").desc, col("user_id")).limit(1)
      .collect()(0).getLong(0)
    val hotTouches = ev1
      .filter(col("user_id") === hotUser &&
        col("event_type") =!= "purchase")
    val hotPurch = ev1
      .filter(col("user_id") === hotUser &&
        col("event_type") === "purchase")
    def reps(f: org.apache.spark.sql.DataFrame, n: Int) =
      (1 to n).map(i => f
        .withColumn("event_id", col("event_id") + lit(i.toLong * 1e12.toLong))
        .withColumn("us", col("us") + lit(i.toLong)))
      .reduce(_ unionAll _)
    val evHot = ev1.unionAll(reps(hotTouches, 300))
      .unionAll(reps(hotPurch, 10))
    // uncapped = the ORIGINAL windowless join (what shipped before
    // the cap), so the ratio prices exactly what the cap buys; the
    // capped side drives the REAL q219 implementation
    // (Analytics4.linearAttributionFrom), not a probe-local copy, so
    // a logic change there is automatically what this ratio measures
    val hotUncapped = timedS("attribution hot-user uncapped")(
      attrProbe(evHot))
    val hotCapped = timedS("attribution hot-user cap=500")(
      graft.queries.Analytics4.linearAttributionFrom(evHot, 500)
        .write.mode("overwrite").format("noop").save())
    println(f"PHASE attribution hot-user uncapped/capped ratio " +
      f"${hotUncapped / hotCapped}%8.3f (>1 = cap bounds the quadratic cell)")

    spark.stop()
  }
}
