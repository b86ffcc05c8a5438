package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Optimizer rule automating the expand-to-equi rewrite for bounded
  * integer range joins — the J4 page-proximity shape (reference
  * `chunker.py:467-496`: `abs(img.page - chunk.page) <= 1`).
  *
  * A naive `a JOIN b ON abs(a.x - b.y) <= k` has no equi-condition, so
  * Spark plans a BroadcastNestedLoopJoin — an O(|a|·|b|) scale-killer
  * the moment neither side is tiny. For integers the predicate is
  * exactly `b.y ∈ {a.x-k, …, a.x+k}`, so the join is equivalent to
  * exploding the left side into its 2k+1 probe values and equi-joining
  * on the probe — a shuffled hash/sort-merge join that partitions and
  * scales like any other equi-join (`q_page_range_join` applies this
  * rewrite by hand; this rule grants it to ANY naive query).
  *
  * Guards: inner joins; `abs(x − y) <= k` (or `k >= abs(...)`) as the
  * whole condition or one conjunct; both operands sub-Long integral
  * (Long keys are excluded — widening already-Long values risks `x ± k`
  * wraparound at the extremes); `k` a non-negative foldable literal
  * with expansion `2k+1` at most `spark.graft.rangejoin.maxExpand`
  * (default 32 — past that the row-multiplication outweighs the
  * nested-loop it avoids and a dedicated range-join algorithm would be
  * the right tool). Each qualifying pair matches exactly one probe
  * value, so no duplicates are introduced.
  *
  * Install via `RangeJoinRule.install(spark)` (experimental-methods
  * path) or `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  val MaxExpandKey = "spark.graft.rangejoin.maxExpand"
  val DefaultMaxExpand = 32

  /** Operand types the rewrite accepts. LongType is deliberately OUT:
    * the probe bounds `x ± k` are computed in Long, and a Long key
    * within k of Long.MaxValue/MinValue would wrap (non-ANSI
    * arithmetic), losing matches the original abs-predicate accepts —
    * sub-Long integrals widened to Long can never overflow.
    */
  private def isSafeIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType => true
    case _ => false
  }

  /** Extract (x, y, k) from `abs(x - y) <= k` / `k >= abs(x - y)`. */
  private def absRange(e: Expression): Option[(Expression, Expression, Long)] = e match {
    case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(k: Int, IntegerType)) =>
      Some((x, y, k.toLong))
    case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(k: Long, LongType)) =>
      Some((x, y, k))
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Abs(Subtract(x, y, _), _)) =>
      Some((x, y, k.toLong))
    case GreaterThanOrEqual(Literal(k: Long, LongType), Abs(Subtract(x, y, _), _)) =>
      Some((x, y, k))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val maxExpand = SQLConf.get
      .getConfString(MaxExpandKey, DefaultMaxExpand.toString).toInt
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjuncts(cond)
        // expansion bound phrased division-side: `2k+1 <= maxExpand`
        // overflows Long for k near 2^62 and would wave a huge k through
        val hit = conjuncts.iterator.map(c => (c, absRange(c))).collectFirst {
          case (c, Some((x, y, k)))
              if k >= 0 && k <= (maxExpand - 1) / 2 &&
                isSafeIntegral(x.dataType) && isSafeIntegral(y.dataType) =>
            (c, x, y, k)
        }
        hit match {
          case Some((matched, x, y, k)) =>
            // orient: expand the side the left plan evaluates
            val oriented =
              if (x.references.subsetOf(left.outputSet) &&
                y.references.subsetOf(right.outputSet)) Some((x, y))
              else if (y.references.subsetOf(left.outputSet) &&
                x.references.subsetOf(right.outputSet)) Some((y, x))
              else None
            oriented match {
              case Some((lx, ry)) =>
                val kLit = Literal(k, LongType)
                val lxL = Cast(lx, LongType)
                val probe = AttributeReference(
                  "__graft_range_probe", LongType, nullable = false)()
                // Sequence is TimeZoneAware — it stays UNRESOLVED (and
                // fails optimizer plan validation) until a zone is set,
                // even over integral operands
                val seq = new Sequence(
                  Subtract(lxL, kLit), Add(lxL, kLit), Literal(1L, LongType))
                  .withTimeZone(SQLConf.get.sessionLocalTimeZone)
                val gen = Generate(
                  Explode(seq),
                  unrequiredChildIndex = Nil, outer = false, qualifier = None,
                  generatorOutput = Seq(probe), child = left)
                val rest = conjuncts.filterNot(_ eq matched)
                val newCond = (EqualTo(probe, Cast(ry, LongType)) +: rest)
                  .reduce(And(_, _))
                Project(j.output, Join(gen, right, Inner, Some(newCond), hint))
              case None => j
            }
          case None => j
        }
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Imperative installation into a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraOptimizations.contains(this))
      em.extraOptimizations = em.extraOptimizations :+ this
  }
}
