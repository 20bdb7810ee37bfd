package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, Predicate, Unevaluable}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL-text surface for the as-of operator: `asof_le(l_ts, r_ts)` in an
  * INNER join's ON clause marks the join as an as-of merge, and
  * [[AsofSqlRewrite]] rewrites the analyzed `Join` into the
  * [[AsofJoin]] logical node, which [[AsofJoinStrategy]] then plans to
  * the sorted-merge exec. End to end:
  *
  * {{{
  *   SELECT ... FROM clicks l JOIN purchases r
  *   ON l.user_id = r.user_id AND asof_le(l.ts, r.ts)
  * }}}
  *
  * is planned exactly like `AsofJoin.asof(...)` — one shuffle per side,
  * O(1) merge state — with the inclusive `r.ts <= l.ts` bound the
  * DataFrame operator and the DuckDB `ASOF JOIN` oracle share.
  *
  * The marker is [[Unevaluable]] on purpose: as-of picks ONE right row
  * per left row (the latest at-or-before), while a plain inequality
  * join would match ALL earlier right rows — so silently "falling back"
  * to evaluating the marker as `<=` would return different rows. If the
  * rewrite cannot fire (marker used under an outer join, disjunctively,
  * or with both arguments on one side), planning fails loudly instead.
  */
case class AsofLE(left: Expression, right: Expression)
  extends Predicate with Unevaluable {
  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = false
  override def prettyName: String = "asof_le"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsofLE =
    copy(left = newChildren(0), right = newChildren(1))
}

/** Analyzer rule (injected via `GraftExtensions`'
  * `injectResolutionRule`): `Join(Inner, equi-keys ∧ asof_le)` →
  * [[AsofJoin]]. On a LIVE session — where resolution rules cannot be
  * added post-build — apply [[AsofSqlRewrite.force]] to the analyzed
  * plan instead (what `SqlSurfaceOps.sqlAsof` does). */
object AsofSqlRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp { case j: Join => rewrite(j) }

  /** Same rewrite outside the analyzer (live-session path; analyzed
    * subtrees are skipped by `resolveOperatorsUp`, so `apply` would
    * no-op on an already-analyzed plan). */
  def force(plan: LogicalPlan): LogicalPlan =
    plan.transformUp { case j: Join => rewrite(j) }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      splitConj(a) ++ splitConj(b)
    case other => Seq(other)
  }

  private def rewrite(j: Join): LogicalPlan = j match {
    case Join(l, r, Inner, Some(cond), _)
        if j.resolved && cond.exists(_.isInstanceOf[AsofLE]) =>
      val conjuncts = splitConj(cond)
      val (markers, rest) = conjuncts.partition(_.isInstanceOf[AsofLE])
      // key columns may appear left=right or right=left in the SQL text;
      // normalize to (leftKey, rightKey). The marker itself is
      // DIRECTIONAL — asof_le(probeTs, buildTs) — because "latest right
      // at-or-before left" is not symmetric.
      val equis = rest.map {
        case EqualTo(a, b)
            if a.references.subsetOf(l.outputSet) &&
               b.references.subsetOf(r.outputSet) => Some((a, b))
        case EqualTo(a, b)
            if b.references.subsetOf(l.outputSet) &&
               a.references.subsetOf(r.outputSet) => Some((b, a))
        case _ => None
      }
      markers match {
        case Seq(AsofLE(lts, rts))
            if lts.references.subsetOf(l.outputSet) &&
               rts.references.subsetOf(r.outputSet) &&
               equis.nonEmpty && equis.forall(_.isDefined) =>
          val (lk, rk) = equis.flatten.unzip
          AsofJoin(l, r, lk, rk, lts, rts)
        case _ => j // leave as-is; Unevaluable marker fails planning loudly
      }
    case _ => j
  }
}
