package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Add, And, BitwiseAnd,
  BitwiseOr, BitwiseXor, Expression, GreaterThan, GreaterThanOrEqual, In,
  InSet, IsNotNull, LessThan, LessThanOrEqual, Literal, MultiCommutativeOp,
  Multiply, Or}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** The bench's canonical plan fingerprint — ONE definition shared by
  * [[graft.Bench]] (the judged BENCH_DETAIL `plans` map) and the
  * [[graft.PlanHash]] dev tool, so a hash printed while debugging is
  * the hash the record carries.
  *
  * Cross-round timing deltas are attributed by hash equality ("same
  * hash + wide spread = load noise; changed hash = a real plan
  * change"), so the fingerprint must be identical across JVMs,
  * sessions, and index-store states (disabled / cold / warm) whenever
  * the QUERY is the same code. Each normalization below removes one
  * measured source of false inequality (found by the r8 cold-vs-warm
  * and store-vs-disabled sweeps); none of the removed tokens carries
  * plan information — a genuine plan change alters operator
  * structure, not addresses, null-check placement, or conjunct order.
  *
  *  1. Cached AND durable base subtrees collapse to schema-only
  *     leaves: an index-backed query's optimized plan embeds the
  *     base's lineage (in-session: the full corpus build inside an
  *     InMemoryRelation; store-enabled: a parquet scan of the stored
  *     index), so the same code hashed differently across store
  *     states. The store tier the timings came from is stamped
  *     separately (`index_store` in BENCH_DETAIL).
  *  2. Null-check artifacts are dropped (IsNotNull conjuncts, and
  *     Filter nodes made empty by that): a store-read base carries
  *     parquet's all-nullable schema while the same frame built
  *     in-session keeps non-null expression types, so the optimizer
  *     keeps/elides different `isnotnull` guards around IDENTICAL
  *     query logic (measured: the q64/q70/q77… store-vs-disabled
  *     flips were null-check placement plus #3/#4 below). The hash is
  *     therefore blind to null-check-only plan edits — accepted:
  *     those are optimizer-inferred, not authored semantics.
  *  3. Comparison direction is normalized (a > b ⇒ b < a): the
  *     builder emits whichever orientation its code path produced,
  *     and the two base lineages produce opposite orientations of
  *     the same predicate.
  *  4. EVERY commutative operator's operand order is re-imposed by the
  *     NORMALIZED rendering, bottom-up: canonicalization orders
  *     commutative operands by expression hashCode, which a broadcast
  *     handle or plan-embedded object identity perturbs (measured:
  *     q154's cold-vs-warm flip was only `bloom_might_contain`'s
  *     position) — and, the r10 root-cause of the rare per-JVM
  *     decimal-chain flip (q108/q137/q214/q216, ~1 in 15 JVMs since
  *     r8): a canonicalized subtree containing a `MultiCommutativeOp`
  *     carries that node's `Class[_]` member, whose `hashCode` is
  *     IDENTITY-based and therefore per-JVM, so the hashCode sort of a
  *     PLAIN BINARY commutative parent (`ln(x) * 1e6` vs
  *     `1e6 * ln(x)`) flipped with the JVM's identity-hash draw
  *     (captured live: two divergent r10 plan dumps differ in exactly
  *     that operand order). Hence the pass covers binary
  *     Multiply/Add/bitwise and Or-disjuncts, not just
  *     `multicommutativeop` operands and And-conjuncts, and runs
  *     transformUp so a parent's sort key renders already-normalized
  *     children.
  *  5. String-level scrubs: opaque literals print their array object
  *     identity (`[J@1a2b3c` — centroid/LUT/survivor literals differ
  *     by JVM ADDRESS even when bit-identical); broadcast handles
  *     print their session-sequence id (`Broadcast(12)`); typed-API
  *     nodes (MapPartitions — the q91 Misra–Gries pass) print their
  *     function object as a JVM hidden-class token
  *     (`$$Lambda$2041/0x00007f…`) whose number tracks CLASS-LOAD
  *     ORDER, which the store state shifts — or as a plain
  *     object-identity token (`$$Lambda@7f62ce`) whose hex tracks RUN
  *     ORDER (the r9 OrderHash repro of the r8 control's q91 flip).
  *  6. IN-literal lists collapse to an order-insensitive
  *     count+content-hash token (`inlist#n=…#h=…`): collected-artifact
  *     lists render in collection order and `InSet` prints Set
  *     iteration order; content sensitivity is preserved, ordering is
  *     erased ([[PlanFingerprintSpec]] pins both directions).
  *
  * NOTE the converse duty this puts on PLAN-EMBEDDED VALUES: any
  * literal built from a `collect()` (Misra–Gries survivors, learned
  * centroids, hot-term sets) must be collected in a canonical ORDER,
  * or the same logical artifact hashes differently per session — the
  * deterministic-artifact rule extended to plan literals.
  */
object PlanFingerprint {

  private def strNorm(s: String): String = s
    // ONLY JVM array-identity tokens ([J@1a2b3c, [[F@…, [Lfoo.Bar;@…)
    // — a bare `@hex` scrub would also rewrite user string literals
    // ("a@dead.com" and "a@beef.com" both → "a@x.com"), making two
    // genuinely different plans hash identical and breaking the
    // changed-literal sensitivity the spec pins (r8 review finding)
    .replaceAll("\\[+(?:[BCDFIJSZ]|L[\\w.$]+;)@[0-9a-fA-F]+", "[@x")
    .replaceAll("Broadcast\\(\\d+\\)", "Broadcast(#)")
    // lambda identity in BOTH renderings: the hidden-class token
    // ($$Lambda$2041/0x7f…, class-load-order sensitive) and the plain
    // object-identity form ($$Lambda@7f62cea — what Spark 4.1 prints
    // for a typed-API MapPartitions function object, RUN-ORDER
    // sensitive: the r8 control's q91 flip was exactly this token)
    // the two suffixes also COMBINE ($$Lambda$8328/0x7f…@44a3bd —
    // hidden class then identity), so eat one or both
    .replaceAll(
      "\\$\\$Lambda(\\$\\d+)?(/0x[0-9a-fA-F]+|@[0-9a-fA-F]+){1,2}",
      "\\$\\$Lambda")

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case o => Seq(o)
  }

  private def splitDisjuncts(e: Expression): Seq[Expression] = e match {
    case Or(l, r) => splitDisjuncts(l) ++ splitDisjuncts(r)
    case o => Seq(o)
  }

  /** Canonical rendering of an IN literal list: element count plus an
    * order-insensitive content hash (elements sorted by normalized
    * rendering before hashing).
    */
  private def inToken(rendered: Seq[String]): String = {
    val sorted = rendered.sorted
    f"inlist#n=${sorted.length}#h=${
      scala.util.hashing.MurmurHash3.orderedHash(sorted)}%08x"
  }

  /** The normalized canonicalized plan string the hash covers. */
  def normalizedPlan(df: DataFrame): String = {
    val storeRoot = graft.sources.IndexStore.root(df.sparkSession)
      .map(r => new org.apache.hadoop.fs.Path(r).toUri.getPath)
    // 1. base-subtree collapse (nullability widened so the two leaf
    // forms — built frame vs parquet round-trip — print identically)
    val collapsed = df.queryExecution.optimizedPlan.transform {
      case r: InMemoryRelation =>
        LocalRelation(r.output.map(_.withNullability(true)))
      case lr: LogicalRelation if storeRoot.exists(root =>
          lr.relation match {
            case h: HadoopFsRelation =>
              h.location.rootPaths.nonEmpty &&
                h.location.rootPaths.forall { p =>
                  // path-component boundary: /data/idx must not claim
                  // /data/idx_backup's scans (r8 review finding)
                  val pp = p.toUri.getPath
                  pp == root || pp.startsWith(root + "/")
                }
            case _ => false
          }) =>
        LocalRelation(lr.output.map(_.withNullability(true)))
    }
    // 1b. widen nullability on EVERY attribute reference, not just the
    // leaf definitions: canonicalization orients a comparison by its
    // operands' hashCodes, and an AttributeReference's semantic hash
    // includes nullability — so `size(s) > 0` canonicalized to
    // `0 < size(s)` against the non-null in-session base but stayed
    // `size(s) > 0` against the nullable parquet round-trip (measured:
    // the last q64/q70 store-vs-disabled flips were ONLY this). The
    // fingerprint is nullability-blind by design (see #2).
    val nullWide = collapsed.transformAllExpressions {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        a.withNullability(true)
    }
    // 2. null-check artifacts out
    val noNullChecks = nullWide.transform {
      case f: Filter =>
        val kept = splitConjuncts(f.condition)
          .filterNot(_.isInstanceOf[IsNotNull])
        if (kept.isEmpty) f.child else Filter(kept.reduce(And), f.child)
    }
    // 3. one comparison orientation
    val dirNorm = noNullChecks.transformAllExpressions {
      case GreaterThan(l, r) => LessThan(r, l)
      case GreaterThanOrEqual(l, r) => LessThanOrEqual(r, l)
    }
    // 4. canonicalize (exprIds normalized), then impose a
    // rendering-order on commutative conjuncts — the canonical
    // hashCode order is session-dependent exactly when a conjunct
    // embeds a broadcast/object handle (stringified only — never
    // executed)
    // orientation must be re-unified AFTER canonicalization too:
    // Canonicalize re-orients each comparison by its operands'
    // hashCodes, which still differ across base lineages in ways the
    // widening above cannot fully erase — the POST-canonical flip
    // makes the final orientation unconditional. Run it as its OWN
    // pass so the conjunct sort below keys on already-oriented
    // renderings (transformDown sorts a node before its children are
    // rewritten).
    val oriented = dirNorm.canonicalized.transformAllExpressions {
      case GreaterThan(l, r) => LessThan(r, l)
      case GreaterThanOrEqual(l, r) => LessThanOrEqual(r, l)
    }
    // 4b. IN-literal lists collapse to a count+content-hash token,
    // ORDER-INSENSITIVELY: a collected-artifact list (hot terms,
    // survivors) renders in collection order, and InSet prints its
    // Set's iteration order — neither carries plan semantics. The
    // token keeps full content SENSITIVITY (any changed/added
    // element moves the hash) while erasing ordering; the literal
    // is a fingerprint-only placeholder, never executed. Run as its
    // OWN pass BEFORE the conjunct sort (the #4 orientation rule
    // again): transformDown sorts an And before rewriting its
    // children, so a sort keyed on the PRE-collapse rendering would
    // still order conjuncts by the run-order-sensitive list.
    val inNorm = oriented.transformAllExpressions {
      case In(v, list) if list.nonEmpty &&
          list.forall(_.isInstanceOf[Literal]) =>
        In(v, Seq(Literal(inToken(list.map(e => strNorm(e.toString))))))
      case InSet(v, hset) =>
        In(v, Seq(Literal(
          inToken(hset.iterator.map(x => strNorm(String.valueOf(x))).toSeq))))
    }
    // 4c. deterministic operand order for EVERY commutative operator,
    // BOTTOM-UP: a parent's sort key is its children's rendering, so
    // children must be normalized first or the key itself carries the
    // per-JVM order being erased (the r10 decimal-chain root cause —
    // see scaladoc #4; binary Multiply/Add/bitwise and Or are covered
    // because canonicalization hashCode-sorts THEIR operands too).
    val canon = inNorm.transformUp {
      case p => p.transformExpressionsUp {
        case m: MultiCommutativeOp =>
          m.withNewChildren(
            m.operands.sortBy(e => strNorm(e.toString)).toIndexedSeq)
        case a @ And(_, _) =>
          splitConjuncts(a).sortBy(e => strNorm(e.toString)).reduce(And)
        case o @ Or(_, _) =>
          splitDisjuncts(o).sortBy(e => strNorm(e.toString)).reduce(Or)
        case b @ (_: Multiply | _: Add | _: BitwiseAnd | _: BitwiseOr |
            _: BitwiseXor) if b.children.size == 2 =>
          b.withNewChildren(
            b.children.sortBy(e => strNorm(e.toString)).toIndexedSeq)
      }
    }
    strNorm(canon.toString)
  }

  /** 8-hex-digit fingerprint of [[normalizedPlan]]. */
  def hash(df: DataFrame): String =
    f"${scala.util.hashing.MurmurHash3.stringHash(normalizedPlan(df))}%08x"
}
