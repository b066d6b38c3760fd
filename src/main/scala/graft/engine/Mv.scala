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
    * max_<c>, hll_<c>, and the group columns under their base
    * names). `root` is the MV's lake table (refresh rewrites it). */
  case class MvDef(name: String, basePaths: Set[String],
                   baseFiles: Set[String],
                   groupCols: Seq[String], aggCols: Seq[String],
                   hllCols: Seq[String],
                   exprTexts: Seq[(String, String)],
                   exprNorms: Seq[(String, Expression)],
                   root: String,
                   mvPlan: LogicalPlan, mvAttrs: Map[String, Attribute]) {
    def isGroupCol(n: String): Boolean = groupCols.contains(n)
    /** Plain group cols + derived-expression aliases — the summary's
      * group-key column names. */
    def groupKeyNames: Seq[String] = groupCols ++ exprTexts.map(_._1)
    def groupKeyCols: Seq[org.apache.spark.sql.Column] =
      groupCols.map(col) ++
        exprTexts.map { case (a, t) => expr(t).as(a) }
  }

  /** Structural identity of an expression over the base, independent
    * of attribute exprIds: every column reference is renamed to a
    * deterministic id derived from its FILE-COLUMN name, then the
    * tree is canonicalized. Two expressions (the registered group
    * expression and a query's grouping expression) normalize equal
    * iff they are the same computation over the same base columns —
    * spelling-exact for function/literal choices, which is the
    * documented contract (register `date_trunc('DAY', ts)`, query
    * `date_trunc('DAY', ts)`). None if any reference maps outside
    * `names` (not derivable from this base). The deterministic id is
    * a 64-bit FNV-1a of the column name — a 32-bit hashCode could
    * collide two different columns into a FALSE match, and this
    * comparison gates a rewrite that must never be wrong. */
  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h & Long.MaxValue
  }

  private[engine] def normalize(e: Expression,
      names: Map[ExprId, String]): Option[Expression] = {
    if (!e.references.forall(a => names.contains(a.exprId))) return None
    Some(e.transformUp {
      case a: AttributeReference =>
        a.withExprId(ExprId(fnv64(names(a.exprId))))
    }.canonicalized)
  }

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

  private def inputFilesOf(plan: LogicalPlan): Set[String] = plan.collect {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.inputFiles.toSeq
      case _ => Seq.empty
    }
  }.flatten.toSet

  private def partialCols(groupCols: Seq[String], aggCols: Seq[String],
                          hllCols: Seq[String]): Seq[org.apache.spark.sql.Column] =
    count(lit(1)).as("cnt") +:
      (aggCols.flatMap(c => Seq(sum(col(c)).as(s"sum_$c"),
                                min(col(c)).as(s"min_$c"),
                                max(col(c)).as(s"max_$c"),
                                count(col(c)).as(s"cntn_$c"))) ++
       hllCols.map(c => expr(s"hll_sketch($c)").as(s"hll_$c")))

  /** Materialize (once, content-addressed by the caller's root) and
    * register the summary of `base` grouped by `groupCols` carrying
    * rollup partials for each of `aggCols` (and order-independent HLL
    * sketch partials for each of `hllCols` — byte-identical under any
    * re-grouping, so sketch rollup is EXACT over sketch values, the
    * §2.3 dividend), then arm the rewrite rule on this session.
    * Idempotent per (session, name). */
  def register(spark: SparkSession, name: String, base: DataFrame,
               groupCols: Seq[String], aggCols: Seq[String],
               root: String, hllCols: Seq[String] = Nil,
               groupExprs: Seq[(String, String)] = Nil): Unit = {
    Hll.register(spark)
    val groupKeys = groupCols.map(col) ++
      groupExprs.map { case (a, t) => expr(t).as(a) }
    if (LakeTable.latestVersion(spark, root).isEmpty) {
      val partials = partialCols(groupCols, aggCols, hllCols)
      LakeTable.append(
        base.groupBy(groupKeys: _*)
          .agg(partials.head, partials.tail: _*), root)
    }
    // normal forms of the derived group expressions, computed through
    // the SAME analyze+optimize pipeline a query's grouping expression
    // goes through, so the matcher compares like with like
    val exprNorms: Seq[(String, Expression)] =
      if (groupExprs.isEmpty) Nil
      else {
        val opt = base.select(
            groupExprs.map { case (a, t) => expr(t).as(a) }: _*)
          .queryExecution.optimizedPlan
        val relNames = opt.collect { case lr: LogicalRelation =>
          lr.output.map(a => a.exprId -> a.name) }.flatten.toMap
        val norms = opt match {
          case Project(items, _) => items.collect {
            case al @ Alias(c, a) => normalize(c, relNames).map(a -> _)
          }.flatten
          case _ => Seq.empty
        }
        require(norms.size == groupExprs.size,
          s"Mv.register: could not derive normal forms for all group " +
            s"expressions of '$name' (got ${norms.size} of " +
            s"${groupExprs.size})")
        norms
      }
    val mvDf = LakeTable.read(spark, root)
    val plan = mvDf.queryExecution.analyzed
    val analyzedBase = base.queryExecution.analyzed
    defs.put(name, MvDef(name,
      rootPathsOf(analyzedBase), inputFilesOf(analyzedBase),
      groupCols, aggCols, hllCols, groupExprs, exprNorms, root, plan,
      plan.output.map(a => a.name -> a).toMap))
    if (!spark.experimental.extraOptimizations.exists(
          _.isInstanceOf[MvRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new MvRewrite
  }

  /** Incremental refresh for an APPEND-ONLY base: fold `delta`'s
    * partials into the summary (cnt/sum additive, min/max monotone
    * under inserts, HLL unions — all exact for inserts; a base that
    * deletes or updates rows needs a full re-register, which is why
    * this takes the delta explicitly instead of diffing) and commit
    * the folded summary as ONE new MV version, then re-register
    * against `newBase` (whose file set has grown — the lake read's
    * current snapshot). A query planned before the refresh keeps the
    * old MV plan; one planned after sees the new version — the same
    * snapshot semantics every lake read has.
    *
    * `txn`: (appId, batchId) for exactly-once maintenance from a
    * streaming drain — a re-delivered microbatch's fold is a no-op
    * (the MV commit carries the token, [[LakeTable.rewriteTxn]]),
    * while the re-registration against `newBase` still happens so the
    * serving file set tracks the base. Without the token, a replayed
    * delta would double-count — exactly the foreachBatch failure
    * mode txn tokens exist for. */
  def refresh(spark: SparkSession, name: String, newBase: DataFrame,
              delta: DataFrame,
              txn: Option[(String, Long)] = None): Unit = {
    val d = Option(defs.get(name)).getOrElse(
      sys.error(s"Mv.refresh: no registered MV named '$name'"))
    if (txn.exists { case (app, b) =>
          LakeTable.lastTxn(spark, d.root, app).exists(_ >= b) }) {
      // replayed delivery: the fold is already in the MV — only track
      // the (possibly grown) base file set
      register(spark, name, newBase, d.groupCols, d.aggCols, d.root,
               d.hllCols, d.exprTexts)
      return
    }
    Hll.register(spark)
    val partials = partialCols(d.groupCols, d.aggCols, d.hllCols)
    val deltaSum = delta.groupBy(d.groupKeyCols: _*)
      .agg(partials.head, partials.tail: _*)
    val folds = sum(col("cnt")).as("cnt") +:
      (d.aggCols.flatMap(c => Seq(sum(col(s"sum_$c")).as(s"sum_$c"),
                                  min(col(s"min_$c")).as(s"min_$c"),
                                  max(col(s"max_$c")).as(s"max_$c"),
                                  sum(col(s"cntn_$c")).as(s"cntn_$c"))) ++
       d.hllCols.map(c => expr(s"hll_merge(hll_$c)").as(s"hll_$c")))
    val folded = LakeTable.read(spark, d.root).unionByName(deltaSum)
      .groupBy(d.groupKeyNames.map(col): _*)
      .agg(folds.head, folds.tail: _*)
    txn match {
      case Some((app, b)) => LakeTable.rewriteTxn(folded, d.root, app, b)
      case None => LakeTable.rewrite(folded, d.root)
    }
    register(spark, name, newBase, d.groupCols, d.aggCols, d.root,
             d.hllCols, d.exprTexts)
  }

  /** Full recompute against the current base — the repair for any
    * base change [[refresh]]'s inserts-only fold cannot express
    * (deletes, updates, rewrites): re-aggregate from scratch, commit
    * as one new MV version, re-register against the new file set. */
  def rebuild(spark: SparkSession, name: String,
              newBase: DataFrame): Unit = {
    val d = Option(defs.get(name)).getOrElse(
      sys.error(s"Mv.rebuild: no registered MV named '$name'"))
    Hll.register(spark)
    val partials = partialCols(d.groupCols, d.aggCols, d.hllCols)
    LakeTable.rewrite(
      newBase.groupBy(d.groupKeyCols: _*)
        .agg(partials.head, partials.tail: _*), d.root)
    register(spark, name, newBase, d.groupCols, d.aggCols, d.root,
             d.hllCols, d.exprTexts)
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

    /** Unwrap Projects and Filters down to the base relation,
      * returning (matched MvDefs, exprId → file-column name, exprId →
      * aliased expression, collected filter conditions). Plain and
      * renamed columns land in the name map; a Project item computing
      * an EXPRESSION (the optimizer's PullOutGroupingExpressions
      * hoists complex grouping keys into exactly such aliases) lands
      * in the alias-definition map, for [[attempt]] to inline and
      * normalize against registered group expressions. Nothing is
      * rejected here — an unresolvable reference simply fails its
      * lookup later, declining the rewrite. Filters pass through with
      * their condition collected; servability is [[attempt]]'s
      * decision. */
    private def baseMatch(child: LogicalPlan)
        : Option[(Seq[MvDef], Map[ExprId, String],
                  Map[ExprId, Expression], Seq[Expression])] =
      child match {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            val paths = fs.location.rootPaths.map(_.toString).toSet
            // staleness guard: the FILE SET must equal registration's,
            // not just the root paths — files appended to the same
            // directory after registration make the MV stale, and the
            // correct failure mode is "no rewrite", never "old answer"
            lazy val files = fs.location.inputFiles.toSet
            val ds = registered.filter(d =>
              d.basePaths == paths && d.baseFiles == files)
            if (ds.isEmpty) None
            else Some((ds, lr.output.map(a => a.exprId -> a.name).toMap,
                       Map.empty, Seq.empty))
          case _ => None
        }
        case Project(items, inner) =>
          baseMatch(inner).map { case (d, under, adefs, fs) =>
            var names2 = under
            var adefs2 = adefs
            items.foreach {
              case _: AttributeReference => () // id already resolved below
              case al @ Alias(a: AttributeReference, _) =>
                under.get(a.exprId) match {
                  case Some(n) => names2 += al.exprId -> n
                  case None => adefs.get(a.exprId)
                    .foreach(e => adefs2 += al.exprId -> e)
                }
              case al @ Alias(c, _) => adefs2 += al.exprId -> c
              case _ => ()
            }
            (d, names2, adefs2, fs)
          }
        case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, inner) =>
          baseMatch(inner).map { case (d, under, adefs, fs) =>
            (d, under, adefs, fs :+ cond)
          }
        case _ => None
      }

    /** Several MVs may summarize the same base (different partials) —
      * the first candidate whose algebra covers the query wins. */
    private def tryRewrite(ges: Seq[Expression], aes: Seq[NamedExpression],
                           child: LogicalPlan): Option[LogicalPlan] = {
      val (candidates, names, adefs, filters) = baseMatch(child) match {
        case Some(x) => x
        case None => return None
      }
      candidates.iterator
        .flatMap(attempt(_, names, adefs, filters, ges, aes))
        .buffered.headOption
    }

    /** Roll ONE aggregate call onto `mv`'s partials, or None if its
      * algebra cannot (DISTINCT, FILTER clauses, non-column inputs,
      * unregistered functions). */
    private def rollup(mv: MvDef, names: Map[ExprId, String],
                       ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      // .get, not .apply: an MV registered from a summary built before
      // a partial-schema extension simply lacks the column — decline,
      // never throw from inside the optimizer
      def partial(child: Expression, cols: Seq[String],
                  prefix: String): Option[Attribute] = child match {
        case a: AttributeReference =>
          names.get(a.exprId).filter(cols.contains)
            .flatMap(n => mv.mvAttrs.get(s"$prefix$n"))
        case _ => None
      }
      ae.aggregateFunction match {
        case c: Count if c.children == Seq(Literal(1)) =>
          mv.mvAttrs.get("cnt").map(Sum(_).toAggregateExpression())
        // null-aware count(col): rolls on its own partial (count
        // skips nulls, so SUM of per-group null-aware counts is the
        // null-aware count of the union)
        case c: Count if c.children.size == 1 =>
          partial(c.children.head, mv.aggCols, "cntn_")
            .map(Sum(_).toAggregateExpression())
        case s: Sum =>
          partial(s.child, mv.aggCols, "sum_")
            .map(Sum(_).toAggregateExpression())
        case m: Min =>
          partial(m.child, mv.aggCols, "min_")
            .map(Min(_).toAggregateExpression())
        case m: Max =>
          partial(m.child, mv.aggCols, "max_")
            .map(Max(_).toAggregateExpression())
        // HLL sketch rollup: register-max union is associative and
        // commutative, so merging per-group partials is BYTE-IDENTICAL
        // to sketching the raw rows (the order-independence the sketch
        // family is built on) — exact over sketch values, never a new
        // approximation. NOTE: Spark 4's aggregate._ wildcard also
        // exports a datasketches HllSketchAgg — qualify the engine's.
        case h: graft.engine.HllSketchAgg =>
          partial(h.child, mv.hllCols, "hll_")
            .map(graft.engine.HllMergeAgg(_).toAggregateExpression())
        case _ => None
      }
    }

    private def attempt(mv: MvDef, names: Map[ExprId, String],
                        adefs: Map[ExprId, Expression],
                        filters: Seq[Expression], ges: Seq[Expression],
                        aes: Seq[NamedExpression]): Option[LogicalPlan] = {
      def mvAttr(n: String): Attribute = mv.mvAttrs(n)
      // expand Project-aliased expressions (PullOutGroupingExpressions'
      // _groupingexpression attrs and friends) back to base columns
      def inline(e: Expression): Expression = e.transformUp {
        case a: AttributeReference if adefs.contains(a.exprId) =>
          inline(adefs(a.exprId))
      }
      // a registered DERIVED group expression matching `e` wholly
      // (normal-form equality after inlining — same computation over
      // the same base columns), or None
      def exprGroupAttr(e: Expression): Option[Attribute] =
        if (mv.exprNorms.isEmpty) None
        else normalize(inline(e), names).flatMap { n =>
          mv.exprNorms.collectFirst { case (a, ne) if ne == n => a }
            .flatMap(mv.mvAttrs.get)
        }
      // a grouping reference — plain group column, or (possibly
      // alias-hidden) derived group expression — as its MV attribute
      def groupRef(e: Expression): Option[Attribute] = e match {
        case a: AttributeReference
            if names.get(a.exprId).exists(mv.groupCols.contains) =>
          mv.mvAttrs.get(names(a.exprId))
        case other => exprGroupAttr(other)
      }
      val groupAttrs: Seq[Attribute] =
        ges.map(g => groupRef(g).getOrElse(return None))
      // filters are servable iff every referenced column is an MV
      // group column — the partials already aggregate WITHIN a group,
      // so a group-column predicate selects whole groups; a predicate
      // on any other column would need pre-aggregation rows (decline)
      val remappedFilter: Option[Expression] = {
        val servable = filters.forall(_.references.forall(a =>
          names.get(a.exprId).exists(mv.isGroupCol)))
        if (!servable) return None
        filters.reduceOption(And).map(_.transform {
          case a: AttributeReference => mvAttr(names(a.exprId))
        })
      }
      val newAes: Seq[NamedExpression] = aes.map {
        case a: AttributeReference if groupRef(a).isDefined =>
          Alias(groupRef(a).get, a.name)(exprId = a.exprId)
        case al @ Alias(body, name) =>
          // roll every EMBEDDED aggregate call (hll_estimate(
          // hll_sketch(x)), sum(x)/count(*) arithmetic, …) and keep
          // the surrounding scalar expression; grouping refs — plain
          // attrs AND whole derived group expressions — remap to MV
          // group attrs. transformDown, so a derived expression is
          // matched WHOLE before its internal column refs could be
          // rewritten out from under it.
          var ok = true
          var sawRollable = false
          val rolledBody = body.transformDown {
            case ae: AggregateExpression =>
              rollup(mv, names, ae) match {
                case Some(x) => sawRollable = true; x
                case None => ok = false; ae
              }
            case e if groupRef(e).isDefined =>
              sawRollable = true; groupRef(e).get
          }
          if (!ok || !sawRollable) return None
          // every surviving reference must resolve against the MV plan
          // (a non-group, non-aggregated base attr would dangle)
          if (!rolledBody.references.subsetOf(
                AttributeSet(mv.mvPlan.output))) return None
          // types must agree exactly, or attribute binding above the
          // aggregate would silently change — decline instead
          if (rolledBody.dataType != al.dataType) return None
          Alias(rolledBody, name)(exprId = al.exprId)
        case _ => return None
      }
      val newGes: Seq[Expression] = groupAttrs.distinct
      val newChild = remappedFilter match {
        case Some(f) =>
          org.apache.spark.sql.catalyst.plans.logical.Filter(f, mv.mvPlan)
        case None => mv.mvPlan
      }
      Some(Aggregate(newGes, newAes, newChild))
    }
  }
}
