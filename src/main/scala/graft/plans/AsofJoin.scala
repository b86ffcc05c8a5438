package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project, Statistics}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types._

/** As-of join as a first-class operator: logical node + strategy +
  * physical sorted-merge exec, injected via `extraStrategies` /
  * `GraftExtensions` — the whole-operator rung of the extension ladder
  * (custom `Expression`s, a `Rule[LogicalPlan]` ([[RangeJoinRule]]) and a
  * `TypedImperativeAggregate` cover the other rungs).
  *
  * Semantics (backward as-of, DuckDB `ASOF LEFT JOIN` /
  * pandas `merge_asof`): for every left row, attach the single latest
  * right row with equal keys and `right.time <= left.time`; right columns
  * are NULL when no such row exists. NULL keys/times never match.
  *
  * Why a custom physical operator: the composed built-in form
  * (`q_asof_join`: tag + union + running `last(ignoreNulls)` window) is
  * linear but materializes a union of both sides through one window, and
  * any naive theta-join formulation (`t2 <= t1` + per-key max) is
  * quadratic per key. This exec asks Catalyst for exactly what the
  * algorithm needs — `ClusteredDistribution` on the keys for BOTH
  * children (EnsureRequirements co-partitions them, AQE still free to
  * coalesce), children sorted by (keys, time) — and then streams ONE
  * forward merge pass per partition: O(1) state per row (the current
  * best-match), zero buffering of either side, no row-count blowup.
  * At 100 TB that is one key-hash shuffle of each side and nothing else —
  * the same cost shape as a plain sort-merge equi-join.
  */
object AsofJoin {

  /** Left as-of join. `leftOn`/`rightOn` = positionally-paired equality
    * key columns, `leftTime`/`rightTime` = the ordering columns. Output =
    * left columns ++ right columns (right side made nullable); the two
    * sides MUST have disjoint column names (validated — the output keeps
    * names as-is, so a shared name would make every downstream name-based
    * reference ambiguous).
    *
    * Each paired key column and the two time columns must have the SAME
    * data type (validated — the merge's comparators are built once from
    * the left types and applied to both sides, so a silent LONG-vs-INT
    * pair would compare garbage instead of failing).
    *
    * `broadcastRight = true` picks the broadcast physical form: the whole
    * right side ships to every executor and each left partition resolves
    * matches by binary search — ZERO movement of the left side (the
    * BroadcastHashJoin-vs-SortMergeJoin choice, for as-of). Use it when
    * the right side is dimension-sized; the default sorted merge is the
    * both-sides-huge plan. Explicit rather than stats-driven so plan
    * shapes stay deterministic across data scales.
    *
    * `direction` is the full pandas `merge_asof` surface:
    *  - `"backward"` (default): latest right row with `rTime <= lTime`;
    *  - `"forward"`: earliest right row with `rTime >= lTime` — same
    *    plans, same cost, the merge just sorts/compares time descending;
    *  - `"nearest"`: whichever of the two is closer in time, ties to the
    *    backward side (the pandas rule). The merge already holds both
    *    candidates — the last row passed and the row under the pointer —
    *    so nearest costs the same one pass; it requires a numeric,
    *    date or timestamp time column (distance needs magnitude, not
    *    just order).
    */
  def asof(left: DataFrame, right: DataFrame,
           leftOn: Seq[String], rightOn: Seq[String],
           leftTime: String, rightTime: String,
           broadcastRight: Boolean = false,
           direction: String = "backward"): DataFrame = {
    require(leftOn.nonEmpty, "as-of join needs at least one equality key")
    require(leftOn.length == rightOn.length,
      "as-of join: leftOn and rightOn must pair up")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"as-of join: unknown direction '$direction'")
    val spark = left.sparkSession
    install(spark)
    val lp = left.queryExecution.analyzed
    // fresh exprIds on the right so self-joins (both sides derived from
    // the same scan — the common events-table case) resolve unambiguously
    val rp = Project(
      right.queryExecution.analyzed.output.map(a => Alias(a, a.name)()),
      right.queryExecution.analyzed)
    // the session's name-resolution rule (case-insensitive by default),
    // not bare string equality — `df("TS")` and this API must agree
    val resolver = left.sparkSession.sessionState.conf.resolver
    val dup = lp.output.map(_.name)
      .filter(ln => rp.output.exists(ra => resolver(ra.name, ln)))
    require(dup.isEmpty,
      s"as-of join: both sides carry column(s) ${dup.mkString(", ")} — " +
        "rename one side; output keeps names as-is, so shared names would " +
        "be ambiguous downstream")
    def res(out: Seq[Attribute], n: String, side: String): Attribute = {
      val hits = out.filter(a => resolver(a.name, n))
      if (hits.isEmpty) throw new IllegalArgumentException(
        s"as-of join: no column '$n' on the $side side " +
          s"(have ${out.map(_.name).mkString(", ")})")
      if (hits.length > 1) throw new IllegalArgumentException(
        s"as-of join: ambiguous column '$n' on the $side side")
      hits.head
    }
    def samePair(what: String, l: Attribute, r: Attribute): Unit = {
      require(l.dataType == r.dataType,
        s"as-of join: $what pair '${l.name}'/'${r.name}' has mismatched " +
          s"types ${l.dataType.simpleString} vs ${r.dataType.simpleString} — " +
          "the merge compares both sides with one comparator; cast first")
      require(RowOrdering.isOrderable(l.dataType),
        s"as-of join: $what type ${l.dataType.simpleString} is not orderable")
    }
    val lk = leftOn.map(res(lp.output, _, "left"))
    val rk = rightOn.map(res(rp.output, _, "right"))
    lk.zip(rk).foreach { case (l, r) => samePair("key", l, r) }
    val lt = res(lp.output, leftTime, "left")
    val rt = res(rp.output, rightTime, "right")
    samePair("time", lt, rt)
    if (direction == "nearest") require(MergeCtx.hasMagnitude(lt.dataType),
      s"as-of join: direction=nearest needs a numeric/date/timestamp time " +
        s"column, not ${lt.dataType.simpleString}")
    PlanBridge.ofRows(spark,
      AsofJoinPlan(lp, rp, lk, rk, lt, rt, broadcastRight, direction))
  }

  /** Typed as-of: `Dataset[L]` enriched to `Dataset[(L, Option[R])]` —
    * `None` where no right row qualifies. Case classes may freely share
    * field names across `L` and `R` (the untyped API's disjoint-name rule
    * is satisfied internally by prefixing the right side), and the result
    * round-trips through the usual product encoders: the right row rides
    * a nullable struct, which Spark decodes as `Option[R]`.
    */
  def asofTyped[L, R](left: Dataset[L], right: Dataset[R],
      leftOn: Seq[String], rightOn: Seq[String],
      leftTime: String, rightTime: String,
      broadcastRight: Boolean = false,
      direction: String = "backward")(
      implicit lEnc: Encoder[L], rEnc: Encoder[R],
      outEnc: Encoder[(L, Option[R])]): Dataset[(L, Option[R])] = {
    import org.apache.spark.sql.functions.{col, struct, when}
    val P = "__asof_r_"
    val rdf = right.toDF(right.columns.map(P + _): _*)
    val j = asof(left.toDF(), rdf,
      leftOn, rightOn.map(P + _), leftTime, P + rightTime,
      broadcastRight, direction)
    val lCols = left.columns.toSeq
    val rTimeCol = P + rightTime
    j.select(
        struct(lCols.map(col): _*).as("_1"),
        // the right TIME column is non-null exactly when the row matched
        // (validated non-null on the way in, NULL-extended otherwise)
        when(col(rTimeCol).isNotNull,
          struct(right.columns.toSeq.map(c => col(P + c).as(c)): _*))
          .as("_2"))
      .as[(L, Option[R])]
  }

  /** Tolerance-bounded backward as-of (pandas `merge_asof(tolerance=…)`):
    * the match must satisfy `leftTime - tolerance <= rightTime <= leftTime`.
    * Correct as a post-join NULL-out — backward as-of already picked the
    * LATEST `rightTime <= leftTime` row, so if that one is older than the
    * tolerance window no other row can be inside it. `tolerance` is a
    * Column so it is type-generic: `lit(500L)` for numeric times,
    * `expr("INTERVAL 10 MINUTES")` for timestamps. Costs one extra
    * projection over the chosen physical form; nothing re-shuffles.
    */
  def asofWithin(left: DataFrame, right: DataFrame,
                 leftOn: Seq[String], rightOn: Seq[String],
                 leftTime: String, rightTime: String,
                 tolerance: org.apache.spark.sql.Column,
                 broadcastRight: Boolean = false,
                 direction: String = "backward"): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val j = asof(left, right, leftOn, rightOn, leftTime, rightTime,
      broadcastRight, direction)
    val tooOld = col(rightTime) < col(leftTime) - tolerance
    val tooNew = col(rightTime) > col(leftTime) + tolerance
    val stale = col(rightTime).isNotNull && (direction match {
      case "forward" => tooNew
      case "nearest" => tooOld || tooNew
      case _ => tooOld
    })
    val rightNames = right.columns.toSet
    j.select(j.columns.map { c =>
      if (rightNames.contains(c))
        when(stale, lit(null)).otherwise(col(c)).as(c)
      else col(c)
    }.toSeq: _*)
  }

  /** Skew-routed as-of: the sorted-merge form hashes each key to ONE
    * partition, so a mega-key (one user holding a large share of the
    * rows) becomes a straggler task — the classic skew failure the merge
    * shares with every sort-merge join, and one AQE's skew handling does
    * NOT cover for custom operators. This wrapper routes around it with
    * the operator's own primitives:
    *
    *  - hot keys (left-side row count > `hotThreshold`) take the
    *    BROADCAST form — their left rows stay exactly where they are, in
    *    however many partitions they already occupy, each task binary-
    *    searching the broadcast right subset; no single task owns the key;
    *  - every other key takes the normal co-partitioned merge;
    *  - the two legs union (append, no shuffle).
    *
    * Requirement: the hot keys' RIGHT-side rows must fit in a broadcast
    * (usually true — skew is typically a left/fact phenomenon). If a key
    * is hot on BOTH sides, the remaining move is time-range slicing with
    * boundary replication, which this library documents but does not
    * automate.
    *
    * The hot-key set is computed with one partial-aggregated count — never
    * collected to the driver; it rides a broadcast semi/anti join.
    */
  def asofSkewRouted(left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTime: String, rightTime: String,
      hotThreshold: Long,
      direction: String = "backward"): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit}
    val hot = left.groupBy(leftOn.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > hotThreshold)
      .select(leftOn.map(col): _*)
    val hotR = hot.toDF(rightOn: _*)
    val hotLeft = left.join(broadcast(hot), leftOn, "left_semi")
    val coldLeft = left.join(broadcast(hot), leftOn, "left_anti")
    // right rows of hot keys can only match hot left rows, and vice versa
    val hotRight = right.join(broadcast(hotR), rightOn, "left_semi")
    val coldRight = right.join(broadcast(hotR), rightOn, "left_anti")
    asof(hotLeft, hotRight, leftOn, rightOn, leftTime, rightTime,
        broadcastRight = true, direction = direction)
      .unionByName(asof(coldLeft, coldRight, leftOn, rightOn,
        leftTime, rightTime, direction = direction))
  }

  /** Time-sliced backward as-of for keys hot on BOTH sides — the case
    * [[asofSkewRouted]] can't broadcast. Every row gets a time-bucket
    * column (`floor(time / sliceWidth)`), and the merge runs on the
    * EXTENDED key (keys…, bucket), so a mega-key spreads across as many
    * partitions as it has buckets instead of owning one straggler task.
    *
    * Correctness needs exactly one extra ingredient: a left row early in
    * bucket b may match a right row from an EARLIER bucket. So for every
    * (key, bucket) on either side, the latest right row from any earlier
    * bucket (the "carry-in") is replicated into the bucket — computed as
    * one per-(key, bucket) argmax window (each partition bounded by the
    * slice width) and one per-key running `last(ignoreNulls)` over the
    * bucket axis (rows per key = #buckets, the caller's knob). In-bucket
    * candidates always beat the carry-in when eligible (their times are
    * at-or-after the bucket start), so the sliced merge is row-identical
    * to the plain operator.
    *
    * Cost: one extra window pass over the right side + ≤ 1 carried row
    * per (key, bucket) per needed side. All three directions: forward is
    * the mirror (the EARLIEST later-bucket row carried backward), nearest
    * carries both sides. Time must be numeric/timestamp (`sliceWidth` in
    * the natural unit: seconds for timestamps, the raw unit for numerics).
    */
  def asofTimeSliced(left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTime: String, rightTime: String,
      sliceWidth: Double,
      direction: String = "backward"): DataFrame = {
    import org.apache.spark.sql.functions.{col, first, floor, last, lit, row_number, struct}
    require(sliceWidth > 0, "as-of time slicing needs a positive width")
    val B = "__asof_bucket"
    val BR = "__asof_bucket_r"
    def bucketOf(df: DataFrame, tc: String) = {
      // TIMESTAMP_NTZ has no direct double cast — hop through the session
      // zone (epoch seconds) like every other timestamp
      val asDouble = df.schema(tc).dataType match {
        case TimestampNTZType => col(tc).cast("timestamp").cast("double")
        case _ => col(tc).cast("double")
      }
      floor(asDouble / lit(sliceWidth)).cast("long")
    }
    val lb = left.withColumn(B, bucketOf(left, leftTime))
    val rb = right.withColumn(BR, bucketOf(right, rightTime))

    val rKeyCols = rightOn.map(col)
    val W = org.apache.spark.sql.expressions.Window

    /** Per-(key, bucket) extremal right row (latest for the backward
      * carry, earliest for the forward carry) — each window partition
      * holds one slice, bounded by the caller's width.
      */
    def perBucket(latest: Boolean) = {
      val wSlice = W.partitionBy((rKeyCols :+ col(BR)): _*)
        .orderBy(if (latest) col(rightTime).desc else col(rightTime).asc)
      rb.withColumn("__rn", row_number().over(wSlice)).filter(col("__rn") === 1)
        .select((rKeyCols :+ col(BR) :+
          struct(right.columns.map(col): _*).as("__row")): _*)
    }

    // bucket axis = every (key, bucket) either side touches; the whole
    // right row rides ONE struct so its columns never mix across rows
    // under ignoreNulls
    val axis = lb.select((leftOn.map(col) :+ col(B).as(BR)): _*).toDF(rightOn :+ BR: _*)
      .unionByName(rb.select((rKeyCols :+ col(BR)): _*))
      .distinct()

    /** Carry the extremal row across the bucket axis: backward = latest
      * row of any EARLIER bucket; forward = earliest row of any LATER
      * bucket (the mirror frame).
      */
    def carried(backward: Boolean) = {
      val frame = W.partitionBy(rKeyCols: _*).orderBy(BR)
      val (wCarry, agg) =
        if (backward)
          (frame.rowsBetween(W.unboundedPreceding, -1),
            last(col("__row"), ignoreNulls = true))
        else
          (frame.rowsBetween(1, W.unboundedFollowing),
            first(col("__row"), ignoreNulls = true))
      axis.join(perBucket(latest = backward), rightOn :+ BR, "left")
        .withColumn("__carry", agg.over(wCarry))
        .filter(col("__carry").isNotNull)
        // unpack the whole carried row (keys included — same key as the
        // axis row by construction) onto its DESTINATION bucket
        .select(col(BR) +: right.columns.map(c => col(s"__carry.$c").as(c)): _*)
    }

    val carries = direction match {
      case "forward" => Seq(carried(backward = false))
      case "nearest" => Seq(carried(backward = true), carried(backward = false))
      case _ => Seq(carried(backward = true))
    }
    val slicedRight = carries.foldLeft(
        rb.select((right.columns :+ BR).map(col): _*))(
      (acc, c) => acc.unionByName(c.select((right.columns :+ BR).map(col): _*)))
    asof(lb, slicedRight, leftOn :+ B, rightOn :+ BR, leftTime, rightTime,
        direction = direction)
      .drop(B, BR)
  }

  /** Idempotent strategy + pruning-rule injection into a live session (the
    * programmatic twin of `spark.sql.extensions=graft.functions.GraftExtensions`).
    *
    * Caveat on the programmatic path: `extraOptimizations` run in the
    * optimizer's late "User Provided Optimizers" batch — AFTER DataSource
    * V2 scan pushdown — so for DSv2 tables the inserted child Projects
    * don't reach the v2 scan (v1/parquet file sources are still pruned at
    * PHYSICAL planning via FileSourceStrategy's projection collapse). For
    * DSv2 inputs configure `GraftExtensions`, whose `injectOptimizerRule`
    * places the rule in the main operator-optimization batch.
    */
  def install(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(AsofJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsofJoinStrategy
    if (!em.extraOptimizations.contains(AsofJoinPruneRule))
      em.extraOptimizations = em.extraOptimizations :+ AsofJoinPruneRule
  }

  /** Per-partition merge context shared by both physical forms: probe-row
    * projections, comparators, null checks, and the NULL-extended output
    * projection. Built INSIDE each task (projections are not thread-safe
    * or serializable); the constructor args all are.
    */
  private[plans] object MergeCtx {
    /** Time types whose values carry a magnitude (needed by nearest). */
    def hasMagnitude(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
           FloatType | DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
  }

  private[plans] final class MergeCtx(
      lKeys: Seq[Expression], rKeys: Seq[Expression],
      lTime: Expression, rTime: Expression,
      lOut: Seq[Attribute], rOut: Seq[Attribute], outAttrs: Seq[Attribute],
      direction: String) {
    private val forward = direction == "forward"
    private val keyTypes: Seq[DataType] = lKeys.map(_.dataType)
    private val ktTypes: Seq[DataType] = keyTypes :+ lTime.dataType
    // (keys…, time) probe rows for ordering-based comparison — the same
    // discipline SortMergeJoinExec uses for its key comparisons
    val lktProj: UnsafeProjection = UnsafeProjection.create(lKeys :+ lTime, lOut)
    val rktProj: UnsafeProjection = UnsafeProjection.create(rKeys :+ rTime, rOut)
    val keyOrd: Ordering[InternalRow] =
      RowOrdering.createNaturalAscendingOrdering(keyTypes)
    // the merge direction lives in the time dimension's sort: ascending =
    // backward/nearest (latest <= is the anchor), descending = forward
    // (earliest >=); the comparator MUST mirror requiredChildOrdering
    // exactly or the pointer monotonicity argument breaks
    val ktOrd: Ordering[InternalRow] = new InterpretedOrdering(
      ktTypes.zipWithIndex.map { case (dt, i) =>
        SortOrder(BoundReference(i, dt, nullable = true),
          if (forward && i == ktTypes.length - 1) Descending else Ascending)
      })

    /** Time value as a double for nearest's distance compare (exact for
      * epoch-micro timestamps — well under 2^53). Probe layout: keys at
      * 0..n-1, time at n.
      */
    private val tIdx = ktTypes.length - 1
    def timeVal(row: InternalRow): Double = ktTypes(tIdx) match {
      case LongType | TimestampType | TimestampNTZType => row.getLong(tIdx).toDouble
      case IntegerType | DateType => row.getInt(tIdx).toDouble
      case DoubleType => row.getDouble(tIdx)
      case FloatType => row.getFloat(tIdx).toDouble
      case ShortType => row.getShort(tIdx).toDouble
      case ByteType => row.getByte(tIdx).toDouble
      case other => throw new IllegalStateException(
        s"nearest over non-magnitude time type $other")
    }

    /** Nearest pick between the backward candidate (prev) and the forward
      * candidate (next), both already key-matched: closer wins, ties go
      * backward (the pandas rule). Either may be null.
      */
    def pickNearest(lKt: InternalRow, prevKt: InternalRow,
        nextKt: InternalRow): Int = { // -1 = prev, 1 = next, 0 = none
      if (prevKt == null && nextKt == null) 0
      else if (nextKt == null) -1
      else if (prevKt == null) 1
      else {
        val lt = timeVal(lKt)
        if (math.abs(lt - timeVal(prevKt)) <= math.abs(timeVal(nextKt) - lt)) -1
        else 1
      }
    }
    private val nKt = ktTypes.length
    def anyNull(row: InternalRow): Boolean = {
      var i = 0
      while (i < nKt) { if (row.isNullAt(i)) return true; i += 1 }
      false
    }
    val joined = new JoinedRow
    val nullRight = new GenericInternalRow(rOut.length)
    // bind against the NULLABLE view of the right side: unmatched left
    // rows feed an all-null right row, and a projection bound to a
    // non-nullable input schema would elide the null checks and read
    // garbage zeros instead of emitting NULL
    val outProj: UnsafeProjection = UnsafeProjection.create(outAttrs,
      lOut ++ rOut.map(_.withNullability(true)))
  }
}

/** Optimizer citizenship for the custom node. Catalyst's own
  * `ColumnPruning`/`PushDownPredicates` stop at operators they don't know,
  * so `select(few)` over an as-of join of wide tables would otherwise scan
  * every column of both inputs — the exact 100 TB failure mode the brief's
  * "push down and prune" rule names. Column pruning narrows each child to
  * (columns the parent uses) ∪ (join keys) ∪ (time column); filter
  * pushdown moves left-side-only deterministic conjuncts below the node.
  * The inserted child Projects/Filters reach v1 file scans at physical
  * planning (FileSourceStrategy collapses project+filter chains onto the
  * scan); on the `install()` path this rule runs in the late user batch,
  * AFTER DSv2 pushdown — see `AsofJoin.install` for the DSv2 caveat.
  */
object AsofJoinPruneRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Narrow both children of `aj` to `need`; None if nothing narrows. */
  private def pruned(aj: AsofJoinPlan, need: AttributeSet): Option[AsofJoinPlan] = {
    val full = need ++
      AttributeSet((aj.leftKeys ++ aj.rightKeys).flatMap(_.references)) ++
      aj.leftTime.references ++ aj.rightTime.references
    def prune(child: LogicalPlan): LogicalPlan = {
      val keep = child.output.filter(full.contains)
      if (keep.length == child.output.length) child else Project(keep, child)
    }
    val (nl, nr) = (prune(aj.left), prune(aj.right))
    if ((nl eq aj.left) && (nr eq aj.right)) None
    else Some(aj.copy(left = nl, right = nr))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, aj: AsofJoinPlan) =>
      pruned(aj, p.references).map(n => p.copy(child = n)).getOrElse(p)

    // same prune with an unpushable (right-side) Filter pinned between the
    // Project and the node — the filter's references ride along
    case p @ Project(_, f @ Filter(cond, aj: AsofJoinPlan)) =>
      pruned(aj, p.references ++ cond.references)
        .map(n => p.copy(child = f.copy(child = n))).getOrElse(p)

    // Filter pushdown: a predicate on left-side columns commutes with the
    // join (each left row's match is independent of the other left rows),
    // so it pushes below — onto the scan, shrinking the shuffle. Right-side
    // predicates DON'T push: the right side is NULL-extending (exactly the
    // left-outer-join rule), and pushing one would change WHICH right row
    // is "the latest" instead of filtering joined output. Only the
    // DETERMINISTIC PREFIX of the conjunction is eligible (the same
    // `span` rule as Catalyst's PushPredicateThroughNonJoin): hoisting a
    // conjunct past a nondeterministic one would change which rows the
    // nondeterministic expression evaluates over.
    case f @ Filter(cond, aj: AsofJoinPlan) =>
      val (candidates, rest) =
        splitConjunctivePredicates(cond).span(_.deterministic)
      val (pushable, kept) =
        candidates.partition(_.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
        (kept ++ rest).reduceOption(And)
          .map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Logical as-of join node. The analyzer resolves and type-checks it like
  * any binary node; [[AsofJoinPruneRule]] gives the optimizer column
  * pruning THROUGH it and left-side filter pushdown BELOW it, so callers
  * don't need to pre-project or pre-filter.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    broadcastRight: Boolean = false,
    direction: String = "backward") extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Honest size estimate. The default visitor sizes an unknown binary
    * node as the PRODUCT of its children (two 1 GB inputs → an exabyte
    * estimate), which poisons every downstream broadcast decision over
    * the join's output. An as-of join emits EXACTLY one row per left
    * row, widened by the right columns — size accordingly.
    */
  override def stats: Statistics = {
    val lw = left.output.map(_.dataType.defaultSize).sum.max(1)
    val rw = right.output.map(_.dataType.defaultSize).sum
    Statistics(
      sizeInBytes = left.stats.sizeInBytes * (lw + rw) / lw,
      rowCount = left.stats.rowCount)
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] to [[AsofJoinExec]] or
  * [[AsofJoinBroadcastExec]]; everything else falls through to the
  * built-in strategies.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, bcast, dir) =>
      if (bcast)
        AsofJoinBroadcastExec(lk, rk, lt, rt, planLater(l), planLater(r), dir) :: Nil
      else AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r), dir) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge backward as-of join.
  *
  * Required layout (EnsureRequirements materializes it): both children
  * hash-clustered on their keys and sorted ascending by (keys…, time).
  * Each partition then merges in one forward pass: the right pointer
  * advances while `(rKeys, rTime) <=lex (lKeys, lTime)`, remembering the
  * last key-matching row it passed — which, by the sort order, is exactly
  * the latest `rTime <= lTime` row for the current left row. Per-row state
  * is ONE buffered right row; neither side is ever collected.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan,
    direction: String = "backward") extends BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // time sorts ascending for backward/nearest as-of, descending for
  // forward — the same merge then anchors on "latest <=" or "earliest >="
  private def timeDir = if (direction == "forward") Descending else Ascending
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, timeDir))

  // the merge consumes the left side in order and emits in the same order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val outAttrs = output

    val dir = direction
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val ctx = new AsofJoin.MergeCtx(lKeys, rKeys, lTime, rTime, lOut, rOut,
        outAttrs, dir)
      val nearest = dir == "nearest"
      import ctx._

      new Iterator[InternalRow] {
        private var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var rKt: UnsafeRow = if (rRow != null) rktProj(rRow) else null
        private var matchRow: InternalRow = _ // copy of best right row so far
        private var matchKt: UnsafeRow = _ // its (keys…, time) probe, copied

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKt = lktProj(lRow)
          outRows += 1
          if (anyNull(lKt)) {
            // NULL key or time never matches; the pointer stays put
            outProj(joined(lRow, nullRight))
          } else {
            // advance while right (keys…, time) <=lex left (keys…, time):
            // every key-matching row passed is a candidate, the last one
            // passed is the latest time <= lTime
            while (rRow != null && ktOrd.compare(rKt, lKt) <= 0) {
              if (!anyNull(rKt) && keyOrd.compare(rKt, lKt) == 0) {
                matchRow = rRow.copy()
                matchKt = rKt.copy()
              }
              if (rIter.hasNext) { rRow = rIter.next(); rKt = rktProj(rRow) }
              else { rRow = null; rKt = null }
            }
            val hit = matchRow != null && keyOrd.compare(matchKt, lKt) == 0
            if (!nearest) {
              if (hit) matched += 1
              outProj(joined(lRow, if (hit) matchRow else nullRight))
            } else {
              // the pointer's row IS the forward candidate: first row past
              // lKt in (keys, time asc) order = earliest time > lTime of
              // this key (an exact-equal time sits on the backward side,
              // where distance 0 wins anyway)
              val nextOk = rRow != null && !anyNull(rKt) &&
                keyOrd.compare(rKt, lKt) == 0
              pickNearest(lKt, if (hit) matchKt else null,
                  if (nextOk) rKt else null) match {
                case -1 => matched += 1; outProj(joined(lRow, matchRow))
                case 1 => matched += 1; outProj(joined(lRow, rRow))
                case _ => outProj(joined(lRow, nullRight))
              }
            }
          }
        }
      }
    }
  }
}

/** Broadcast backward as-of join: the dimension-sized right side ships
  * whole to every executor (`BroadcastDistribution(IdentityBroadcastMode)`
  * — EnsureRequirements inserts the `BroadcastExchange`); each task sorts
  * it once by (keys…, time) and resolves every left row by binary search.
  * The left side NEVER moves — no shuffle, no sort, partitioning and
  * ordering preserved — which at 100 TB is the entire cost of the merge
  * form removed, in exchange for an O(R log R) per-task sort of a small R.
  */
case class AsofJoinBroadcastExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan,
    direction: String = "backward") extends BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // the left side passes through untouched
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val outAttrs = output
    val bcRows = right.executeBroadcast[Array[InternalRow]]()

    val dir = direction
    val outRows = longMetric("numOutputRows")
    val matchedM = longMetric("numMatched")
    left.execute().mapPartitions { lIter =>
      val ctx = new AsofJoin.MergeCtx(lKeys, rKeys, lTime, rTime, lOut, rOut,
        outAttrs, dir)
      val nearest = dir == "nearest"
      import ctx._
      // sort the broadcast side once per task: probe keys copied (the
      // projection reuses its buffer), row refs shared (already distinct
      // materialized rows from the broadcast collect)
      val entries = bcRows.value.iterator
        .map(r => (rktProj(r).copy(), r))
        .filter { case (kt, _) => !anyNull(kt) }
        .toArray
      java.util.Arrays.sort(entries,
        (a: (UnsafeRow, InternalRow), b: (UnsafeRow, InternalRow)) =>
          ktOrd.compare(a._1, b._1))

      lIter.map { lRow =>
        val lKt = lktProj(lRow)
        outRows += 1
        if (anyNull(lKt) || entries.isEmpty) outProj(joined(lRow, nullRight))
        else {
          // upper bound: first entry with (keys…, time) > lKt; its
          // predecessor, if key-equal, is the latest time <= lTime
          var lo = 0; var hi = entries.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ktOrd.compare(entries(mid)._1, lKt) <= 0) lo = mid + 1
            else hi = mid
          }
          val hit = lo > 0 && keyOrd.compare(entries(lo - 1)._1, lKt) == 0
          if (!nearest) {
            if (hit) matchedM += 1
            outProj(joined(lRow, if (hit) entries(lo - 1)._2 else nullRight))
          } else {
            val nextOk = lo < entries.length &&
              keyOrd.compare(entries(lo)._1, lKt) == 0
            pickNearest(lKt, if (hit) entries(lo - 1)._1 else null,
                if (nextOk) entries(lo)._1 else null) match {
              case -1 => matchedM += 1; outProj(joined(lRow, entries(lo - 1)._2))
              case 1 => matchedM += 1; outProj(joined(lRow, entries(lo)._2))
              case _ => outProj(joined(lRow, nullRight))
            }
          }
        }
      }
    }
  }
}
