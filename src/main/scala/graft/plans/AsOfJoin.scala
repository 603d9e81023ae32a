package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.LongType

/** Whole-operator extension tier (SURVEY.md §7.3 ladder step (c)): the
  * as-of join as a first-class operator — custom `LogicalPlan` node,
  * planner `Strategy`, and physical `SparkPlan`.
  *
  * Semantics: for every left row, `asof_time` = the greatest right-side
  * time <= the left row's time among right rows with the same key
  * (null when none) — the "most recent fact at or before this event"
  * alignment (reference analog: rws_data_ingester pairs each spot report
  * with the most recent measurement fetch, src/rotterdam_swimming_advice.py:111-115).
  *
  * Physical shape at 100 TB: ONE hash exchange per side on the key, one
  * sort per side by (key, time), then a linear per-partition merge that
  * keeps O(1) state (current key + best time) — no window-function
  * buffering of each partition's rows and no range-join row explosion.
  * This is exactly the plan a window formulation (q09) cannot reach when
  * the right side is a different, much larger table.
  *
  * v1 contract: keys and times are non-null LONGs (ids and epoch-micros
  * in every fixture); the payload carried over is the matched time.
  */
object AsOfJoin {

  /** Column-API entry point. Registers the planner strategy on the
    * session (idempotent) and builds the logical node directly — the
    * analyzer sees it fully resolved. Pass columns OF `left`/`right`
    * (e.g. `left("user_id")`). */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val node = AsOfJoinNode(
      GraftBridge.plan(left), GraftBridge.plan(right),
      GraftBridge.expression(leftKey), GraftBridge.expression(rightKey),
      GraftBridge.expression(leftTime), GraftBridge.expression(rightTime))
    GraftBridge.dataFrame(spark, node)
  }
}

/** Logical node: output = left columns + nullable `asof_time` long.
  * `asofTime` is a constructor parameter (not a body val) so optimizer
  * copies keep the SAME exprId — a body val would mint a fresh attribute
  * on every transform and break downstream references. */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    asofTime: AttributeReference = AttributeReference("asof_time", LongType)())
  extends BinaryNode {

  require(Seq(leftKey, rightKey, leftTime, rightTime).forall(_.dataType == LongType),
    "as-of join v1 requires LONG keys and times")

  override def output: Seq[Attribute] = left.output :+ asofTime

  // asofTime is produced HERE, not consumed from a child — without this,
  // the analyzer counts it as a missing input reference
  override def producedAttributes: AttributeSet = AttributeSet(asofTime)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical node 1:1 onto the physical merge operator. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKey, n.rightKey, n.leftTime, n.rightTime,
        n.asofTime, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. EnsureRequirements satisfies the declared
  * distribution/ordering with one exchange + sort per side (co-partitioned
  * hash on the key), after which each partition pair merges linearly. */
case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    asofTime: AttributeReference,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofTime

  override def producedAttributes: AttributeSet = AttributeSet(asofTime)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // left rows stream through in their sorted order, asof_time appended
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val (lk, lt, rk, rt) = (leftKey, leftTime, rightKey, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val timeRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      // one-row lookahead into the right side
      var pValid = false
      var pKey = 0L
      var pTime = 0L
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          val kt = rProj(rIter.next())
          pKey = kt.getLong(0); pTime = kt.getLong(1); pValid = true
        } else pValid = false
      advanceRight()
      // O(1) merge state: the best (latest <= left time) right time for
      // the current left key
      var curKey = 0L
      var haveCur = false
      var best = 0L
      var haveBest = false
      lIter.map { lRow =>
        val kt = lProj(lRow)
        val lKeyV = kt.getLong(0)
        val lTimeV = kt.getLong(1)
        if (!haveCur || lKeyV != curKey) {
          curKey = lKeyV; haveCur = true; haveBest = false
        }
        while (pValid && (pKey < lKeyV || (pKey == lKeyV && pTime <= lTimeV))) {
          if (pKey == lKeyV) { best = pTime; haveBest = true }
          advanceRight()
        }
        if (haveBest) timeRow.setLong(0, best) else timeRow.setNullAt(0)
        resultProj(joined(lRow, timeRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
