package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Materialized-view ROLLUP REWRITE — the optimizer half of the IVM
  * story. The lake_ivm_* keys maintain per-group (cnt, sum, min, max)
  * summaries incrementally; this module makes the optimizer USE them:
  * an aggregate a user writes against the raw base table is answered
  * from the summary when it is provably derivable, turning an
  * O(base-table) scan into an O(groups) scan with zero query changes.
  * At 100 TB this is the difference between re-reading the corpus for
  * every dashboard query and reading a few thousand summary rows.
  *
  * The rewrite is the classic partial-aggregate rollup (the
  * Calcite/"aggregate navigation" pattern): a query grouping by a
  * SUBSET of the MV's group columns re-aggregates the partials —
  * COUNT(*) → SUM(cnt), SUM(x) → SUM(sum_x), MIN(x) → MIN(min_x),
  * MAX(x) → MAX(max_x). These four are the rollup-safe algebra;
  * anything else (DISTINCT aggregates, AVG — which the user can spell
  * as SUM/COUNT and have both legs rewritten — filters between the
  * aggregate and the scan, expressions over group columns) leaves the
  * plan UNTOUCHED: the rule's failure mode is "no speedup", never
  * "wrong answer".
  *
  * Matching is by PHYSICAL IDENTITY, not by name: the plan under the
  * aggregate must be the base table's file relation (its
  * HadoopFsRelation root paths equal the registered base's), optionally
  * under attribute-only Projects (column pruning's residue, plus
  * rename-only Projects whose aliases the matcher resolves back to
  * file columns). Post-analysis attribute binding is preserved by
  * re-aliasing every rewritten output to the ORIGINAL exprId, so
  * operators above the aggregate (HAVING, ORDER BY) never notice the
  * substitution.
  *
  * Freshness is the registrant's contract, exactly as with every MV
  * system: register a summary you maintain (the IVM path), and the
  * rewrite serves it. MvRewriteSpec gates both directions — the
  * rewrite FIRES on derivable aggregates (the optimized plan scans
  * the MV files) and DECLINES on filtered/non-derivable shapes.
  */
object Mv {

  /** A registered summary: `mvPlan` is the analyzed read of the MV
    * table; `mvAttrs` its output by name (cnt, sum_<c>, min_<c>,
    * max_<c>, and the group columns under their base names). */
  case class MvDef(name: String, basePaths: Set[String],
                   groupCols: Set[String], aggCols: Set[String],
                   mvPlan: LogicalPlan, mvAttrs: Map[String, Attribute])

  private val defs =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  private[engine] def registered: Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    defs.values.asScala.toSeq
  }

  private def rootPathsOf(plan: LogicalPlan): Set[String] = plan.collect {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
      case _ => Seq.empty
    }
  }.flatten.toSet

  /** Materialize (once, content-addressed by the caller's root) and
    * register the summary of `base` grouped by `groupCols` carrying
    * rollup partials for each of `aggCols`, then arm the rewrite rule
    * on this session. Idempotent per (session, name). */
  def register(spark: SparkSession, name: String, base: DataFrame,
               groupCols: Seq[String], aggCols: Seq[String],
               root: String): Unit = {
    if (LakeTable.latestVersion(spark, root).isEmpty) {
      val partials = count(lit(1)).as("cnt") +:
        aggCols.flatMap(c => Seq(sum(col(c)).as(s"sum_$c"),
                                 min(col(c)).as(s"min_$c"),
                                 max(col(c)).as(s"max_$c")))
      LakeTable.append(
        base.groupBy(groupCols.map(col): _*)
          .agg(partials.head, partials.tail: _*), root)
    }
    val mvDf = LakeTable.read(spark, root)
    val plan = mvDf.queryExecution.analyzed
    defs.put(name, MvDef(name,
      rootPathsOf(base.queryExecution.analyzed),
      groupCols.toSet, aggCols.toSet, plan,
      plan.output.map(a => a.name -> a).toMap))
    if (!spark.experimental.extraOptimizations.exists(
          _.isInstanceOf[MvRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new MvRewrite
  }

  /** Drop every registered MV (test isolation). */
  def clear(): Unit = defs.clear()

  /** The rewrite rule. Runs in the user-provided optimizer batch —
    * after column pruning, so the plan under an aggregate is the file
    * relation under attribute-only Projects. */
  final class MvRewrite extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (defs.isEmpty) plan
      else plan.transformUp {
        case agg @ Aggregate(ges, aes, child, _) =>
          tryRewrite(ges, aes, child).getOrElse(agg)
      }

    /** Unwrap attribute-only Projects down to the base relation,
      * returning (matched MvDef, exprId → file-column name). A
      * Project item that is anything but an AttributeReference or an
      * Alias of one aborts the match. */
    private def baseMatch(child: LogicalPlan)
        : Option[(MvDef, Map[ExprId, String])] = child match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val paths = fs.location.rootPaths.map(_.toString).toSet
          registered.find(_.basePaths == paths).map { d =>
            (d, lr.output.map(a => a.exprId -> a.name).toMap)
          }
        case _ => None
      }
      case Project(items, inner) =>
        baseMatch(inner).flatMap { case (d, under) =>
          val mapped = items.map {
            case a: AttributeReference =>
              under.get(a.exprId).map(a.exprId -> _)
            case al @ Alias(a: AttributeReference, _) =>
              under.get(a.exprId).map(al.exprId -> _)
            case _ => None
          }
          if (mapped.forall(_.isDefined))
            Some((d, mapped.flatten.toMap))
          else None
        }
      case _ => None
    }

    private def tryRewrite(ges: Seq[Expression], aes: Seq[NamedExpression],
                           child: LogicalPlan): Option[LogicalPlan] = {
      val (mv, names) = baseMatch(child) match {
        case Some(x) => x
        case None => return None
      }
      // every grouping expression must be a base column the MV groups by
      val groupNames: Map[ExprId, String] = ges.map {
        case a: AttributeReference =>
          names.get(a.exprId).filter(mv.groupCols.contains) match {
            case Some(n) => a.exprId -> n
            case None => return None
          }
        case _ => return None
      }.toMap
      def mvAttr(n: String): Attribute = mv.mvAttrs(n)
      val newAes: Seq[NamedExpression] = aes.map {
        case a: AttributeReference if groupNames.contains(a.exprId) =>
          Alias(mvAttr(groupNames(a.exprId)), a.name)(exprId = a.exprId)
        case al @ Alias(ae: AggregateExpression, name)
            if !ae.isDistinct && ae.filter.isEmpty =>
          val rolled: Expression = ae.aggregateFunction match {
            case c: Count if c.children == Seq(Literal(1)) =>
              Sum(mvAttr("cnt")).toAggregateExpression()
            case s: Sum => s.child match {
              case a: AttributeReference
                  if names.get(a.exprId).exists(mv.aggCols.contains) =>
                Sum(mvAttr(s"sum_${names(a.exprId)}"))
                  .toAggregateExpression()
              case _ => return None
            }
            case m: Min => m.child match {
              case a: AttributeReference
                  if names.get(a.exprId).exists(mv.aggCols.contains) =>
                Min(mvAttr(s"min_${names(a.exprId)}"))
                  .toAggregateExpression()
              case _ => return None
            }
            case m: Max => m.child match {
              case a: AttributeReference
                  if names.get(a.exprId).exists(mv.aggCols.contains) =>
                Max(mvAttr(s"max_${names(a.exprId)}"))
                  .toAggregateExpression()
              case _ => return None
            }
            case _ => return None
          }
          // types must agree exactly, or attribute binding above the
          // aggregate would silently change — decline instead
          if (rolled.dataType != al.dataType) return None
          Alias(rolled, name)(exprId = al.exprId)
        case _ => return None
      }
      val newGes = groupNames.values.toSeq.distinct.map(mvAttr)
      Some(Aggregate(newGes, newAes, mv.mvPlan))
    }
  }
}
