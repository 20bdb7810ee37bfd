package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF join — the canonical operator Spark's built-ins genuinely
  * cannot express as ONE efficient operator (builder brief §custom
  * operators): for every left row, the single right row with the same
  * key and the greatest `rightTs <= leftTs` (inner form: unmatched left
  * rows drop).
  *
  * The composable restatement (JoinOps.asofWindow: union → window
  * `last(ignoreNulls)` → filter) is correct but shuffles and sorts the
  * UNION of both inputs through one window operator and carries every
  * left row's null-padded right columns through the exchange. This
  * operator is the (c)-tier implementation from the brief's preference
  * ladder — logical node + strategy + physical exec:
  *
  *   - each side shuffles ONCE on its own join key (co-partitioned
  *     ClusteredDistribution, exactly like SortMergeJoin — at 100 TB
  *     both sides can also be bucketed on the key, which makes the
  *     join exchange-free, see ScaleSpec);
  *   - within a partition both sides stream in (key, ts) order and the
  *     merge keeps O(1) state: the current candidate right row. No
  *     per-key buffering of the right side, no window frames, no
  *     null-padding through the shuffle;
  *   - ties (`rightTs == leftTs`) match (inclusive bound), mirroring
  *     DuckDB's `ASOF JOIN ... ON r.ts <= l.ts`, which is the oracle.
  *
  * Null semantics follow equi-join convention: null keys and null
  * timestamps never match (both sides skip such rows).
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression)
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length, "key lists must zip")
  // cross-side type agreement must fail loudly at construction: the exec
  // hashes and reads BOTH sides with the LEFT types, so e.g. an int key
  // joined to a long key would silently partition the sides apart and
  // compare garbage instead of erroring
  import org.apache.spark.sql.types.DataType.equalsStructurally
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(equalsStructurally(l.dataType, r.dataType, ignoreNullability = true),
      s"asof key type mismatch: ${l.dataType.simpleString} vs ${r.dataType.simpleString}")
  }
  require(equalsStructurally(leftTs.dataType, rightTs.dataType, ignoreNullability = true),
    s"asof ts type mismatch: ${leftTs.dataType.simpleString} vs ${rightTs.dataType.simpleString}")

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {

  /** DataFrame-level entry: `asof(l, r, Seq(l("k")), Seq(r("k")),
    * l("ts"), r("ts"))`. Installs [[AsofJoinStrategy]] on the session
    * (idempotently) and wraps the logical node back into a DataFrame.
    * Columns must be resolved against their own side (use `df("c")`). */
  def asof(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTs: Column, rightTs: Column): DataFrame = {
    val spark = left.sparkSession
    installStrategy(spark)
    GraftSqlBridge.ofRows(spark, AsofJoin(
      GraftSqlBridge.logicalPlan(left), GraftSqlBridge.logicalPlan(right),
      leftKeys.map(GraftSqlBridge.expression),
      rightKeys.map(GraftSqlBridge.expression),
      GraftSqlBridge.expression(leftTs), GraftSqlBridge.expression(rightTs)))
  }

  /** Idempotently install [[AsofJoinStrategy]] on a LIVE session (the
    * `spark.sql.extensions` path covers build-time sessions). */
  def installStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
}

/** Plans [[AsofJoin]] to [[AsofJoinExec]]. Registered via
  * `GraftExtensions` (build-time) or `spark.experimental.extraStrategies`
  * (live session — what [[AsofJoin.asof]] does). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lts, rts) =>
      AsofJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join. Requires both children clustered on their
  * keys and sorted by (keys, ts); EnsureRequirements inserts the
  * exchanges/sorts (or elides them when the child already satisfies
  * the requirement — e.g. bucketed tables). */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lts = leftTs
    val rts = rightTs
    val tsType = leftTs.dataType
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter0, rIter0) =>
      val lKeyProj = UnsafeProjection.create(lk, leftOut)
      val rKeyProj = UnsafeProjection.create(rk, rightOut)
      val lTsProj = UnsafeProjection.create(Seq(lts), leftOut)
      val rTsProj = UnsafeProjection.create(Seq(rts), rightOut)
      val keyOrd: Ordering[InternalRow] = {
        val fieldOrds = keyTypes.map(dt =>
          PhysicalDataType.ordering(dt).asInstanceOf[Ordering[Any]])
        (a: InternalRow, b: InternalRow) => {
          var i = 0
          var cmp = 0
          while (cmp == 0 && i < keyTypes.length) {
            cmp = fieldOrds(i).compare(a.get(i, keyTypes(i)), b.get(i, keyTypes(i)))
            i += 1
          }
          cmp
        }
      }
      val tsOrd = PhysicalDataType.ordering(tsType).asInstanceOf[Ordering[Any]]
      val resultProj = UnsafeProjection.create(leftOut ++ rightOut, leftOut ++ rightOut)
      val joined = new JoinedRow

      val lIter = lIter0.buffered
      val rIter = rIter0.buffered
      // O(1) merge state: the best-so-far right row for the key the
      // right cursor is currently inside
      var candidate: InternalRow = null
      var candidateKey: InternalRow = null

      new Iterator[InternalRow] {
        private var out: InternalRow = _

        private def advanceRightFor(lKey: InternalRow, lTsVal: Any): Unit = {
          var continue = true
          while (continue && rIter.hasNext) {
            val r = rIter.head
            val rKey = rKeyProj(r)
            if (rKey.anyNull) { rIter.next() } // null keys never match
            else {
              val kc = keyOrd.compare(rKey, lKey)
              if (kc < 0) {
                // right is behind the left key: its rows can never match
                // a current-or-later left row — discard
                rIter.next()
                if (candidateKey != null && keyOrd.compare(candidateKey, lKey) < 0) {
                  candidate = null; candidateKey = null
                }
              } else if (kc > 0) {
                continue = false // right ahead: stop
              } else {
                val rTsRow = rTsProj(r)
                if (rTsRow.isNullAt(0)) { rIter.next() } // null ts never matches
                else if (tsOrd.compare(rTsRow.get(0, tsType), lTsVal) <= 0) {
                  candidate = r.copy()
                  candidateKey = rKey.copy()
                  rIter.next()
                } else continue = false // right row is in the future
              }
            }
          }
        }

        private def findNext(): Boolean = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTsRow = lTsProj(l)
            if (!lKey.anyNull && !lTsRow.isNullAt(0)) {
              val lTsVal = lTsRow.get(0, tsType)
              advanceRightFor(lKey, lTsVal)
              if (candidate != null && keyOrd.compare(candidateKey, lKey) == 0) {
                out = resultProj(joined(l, candidate))
                return true
              }
            }
          }
          false
        }

        override def hasNext: Boolean = out != null || findNext()
        override def next(): InternalRow = {
          if (out == null && !findNext()) throw new NoSuchElementException
          val r = out; out = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
