package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

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
  * as SUM/COUNT and have both legs rewritten — predicates on
  * non-group columns, expressions over group columns) leaves the
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
  * FILTERS match by CONTAINMENT (v2 — the "same rollup, one extra
  * WHERE" dashboard case): the registered base's own filter conjuncts
  * (normalized, optimizer-inferred isnotnulls included — register and
  * query sides run the same analyze+optimize pipeline, so the
  * inferred sets line up) must be a SUBSET of the query's, and every
  * EXTRA query conjunct must reference only MV group columns (a
  * group-column predicate selects whole groups; over inner joins a
  * conjunct commutes to the top, so positionless set comparison is
  * sound). Extras are re-applied over the summary. Anything else —
  * an extra conjunct on an aggregated column, a base conjunct the
  * query lacks — declines.
  *
  * Freshness has TWO guards. (1) Per-query: the aggregate child's
  * file set must equal registration's — files appended after
  * registration decline the rewrite rather than serve an old answer.
  * (2) Per-registration: the MV root carries the fingerprint of the
  * base file set its summary was materialized from
  * (`_graft_log/mv_basefp`), and [[register]]'s skip-path verifies it
  * — re-registering after the base changed REBUILDS the summary
  * instead of stamping a stale one fresh (the r16 ADVICE #1 trap).
  *
  * Registrations are SESSION-SCOPED (a weak map keyed by the
  * registering [[SparkSession]]): a second session registering the
  * same MV name cannot clobber the first's, and the rewrite rule only
  * consults the active session's registrations. [[clear]] drops every
  * session's (test isolation).
  *
  * MvRewriteSpec gates both directions — the rewrite FIRES on
  * derivable aggregates (the optimized plan scans the MV files) and
  * DECLINES on non-derivable shapes.
  */
object Mv {

  /** A registered summary: `mvPlan` is the analyzed read of the MV
    * table; `mvAttrs` its output by name (cnt, sum_<c>, min_<c>,
    * max_<c>, hll_<c>, and the group columns under their base
    * names). `root` is the MV's lake table (refresh rewrites it).
    * `baseFilterNorms` are the registered base's own filter conjuncts
    * in normal form — a query must carry all of them (containment)
    * before the summary can serve it. */
  case class MvDef(name: String, basePaths: Set[String],
                   baseFiles: Set[String],
                   groupCols: Seq[String], aggCols: Seq[String],
                   hllCols: Seq[String],
                   exprTexts: Seq[(String, String)],
                   exprNorms: Seq[(String, Expression)],
                   root: String,
                   mvPlan: LogicalPlan, mvAttrs: Map[String, Attribute],
                   baseNormal: Option[String] = None,
                   baseFilterConjs: Seq[(String, Expression)] = Nil,
                   subsetForms: Map[String, Set[String]] = Map.empty) {
    def baseFilterNorms: Set[String] = baseFilterConjs.map(_._1).toSet
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
    * iff they are the same computation over the same base columns.
    * None if any reference maps outside `names` (not derivable from
    * this base). The deterministic id is a 64-bit FNV-1a of the
    * column name — a 32-bit hashCode could collide two different
    * columns into a FALSE match, and this comparison gates a rewrite
    * that must never be wrong. */
  private[engine] def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h & Long.MaxValue
  }

  /** date_trunc field synonyms Spark documents as identical — folded
    * so `'dd'`, `'DD'`, `'day'` and `'DAY'` normalize equal. */
  private def canonField(f: String): String = f.toUpperCase match {
    case "DD" => "DAY"
    case "YYYY" | "YY" => "YEAR"
    case "MON" | "MM" => "MONTH"
    case other => other
  }

  /** Semantic-equivalence classes (r16 verdict #3), applied to BOTH
    * sides of every comparison — value-preserving by Spark's own
    * semantics, so normalizing them equal can never serve a wrong
    * answer: date_trunc field synonyms fold to one spelling;
    * truncate-to-day under a date cast is the date cast (the day
    * bucket IS the date); and the analyzer's ntz→timestamp widening
    * under a date cast collapses (both casts carry the same session
    * timezone, so the date of the wall time is the date either way).
    * Recursive (not transformUp) because a collapse can EXPOSE the
    * next one: Cast(trunc(DAY, Cast(ntz→ts)), date) needs two. */
  private def canonTree(e: Expression): Expression =
    e.mapChildren(canonTree) match {
      case TruncTimestamp(Literal(f: UTF8String, StringType), ts, tz) =>
        TruncTimestamp(Literal(canonField(f.toString)), ts, tz)
      case Cast(TruncTimestamp(Literal(f: UTF8String, StringType), ts, _),
                DateType, tz, ev) if canonField(f.toString) == "DAY" =>
        canonTree(Cast(ts, DateType, tz, ev))
      case Cast(Cast(x, TimestampType, _, _), DateType, tz, ev)
          if x.dataType == TimestampNTZType =>
        canonTree(Cast(x, DateType, tz, ev))
      case other => other
    }

  private[engine] def normalize(e: Expression,
      names: Map[ExprId, String]): Option[Expression] = {
    if (!e.references.forall(a => names.contains(a.exprId))) return None
    Some(canonTree(e.transformUp {
      case a: AttributeReference =>
        a.withExprId(ExprId(fnv64(names(a.exprId))))
    }).canonicalized)
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case o => Seq(o)
  }

  private def splitDisj(e: Expression): Seq[Expression] = e match {
    case Or(l, r) => splitDisj(l) ++ splitDisj(r)
    case o => Seq(o)
  }

  /** Does normalized query conjunct `qe` IMPLY normalized base
    * conjunct `be`? Dispatches on qe's shape:
    *
    *   - DISJUNCTION (r18 verdict #2 — dashboards emit ORs and
    *     IN-lists constantly): (b1 OR b2 OR …) ⇒ be iff EVERY branch
    *     implies be — sound by plain logic, no interval reasoning
    *     needed. A branch is itself a conjunction; it implies be if
    *     ANY of its conjuncts does (a conjunction is an intersection,
    *     so one implying conjunct suffices), or contains be verbatim.
    *     Recursion handles nested shapes like ((p OR q) AND r) OR s
    *     and terminates because every step strictly shrinks the tree.
    *   - everything else: the single-conjunct [[impliesAtom]] below.
    *
    * Anything outside the decidable shapes answers false — the
    * failure mode is "no speedup". */
  private def implies(qe: Expression, be: Expression): Boolean = qe match {
    case Or(_, _) => splitDisj(qe).forall(b =>
      splitConj(b).exists(c => c == be || implies(c, be)))
    case _ => impliesAtom(qe, be)
  }

  /** Single-conjunct implication, two decidable shapes: (1) both are
    * comparisons of the SAME column (name-derived id) against a
    * literal of the SAME type and qe's interval is contained in be's
    * — what lets an MV built over a filtered slice (x < 1000) serve a
    * query over a sub-slice (x < 500); (2) be is an IN-list on the
    * column and qe pins the column to a SUBSET of it by exact SET
    * membership (= or a narrower IN) — hull reasoning is wrong there
    * (an interval inside the hull can cross the IN's gaps), set
    * containment is exact. */
  private def impliesAtom(qe: Expression, be: Expression): Boolean = {
    // base IN-list: exact set containment (never intervals — gaps)
    be match {
      case In(a: AttributeReference, blits)
          if blits.nonEmpty && blits.forall {
            case Literal(v, _) => v != null
            case _ => false
          } =>
        val bset = blits.collect { case Literal(v, t) => (v, t) }.toSet
        return qe match {
          case EqualTo(x: AttributeReference, Literal(v, t))
              if x.exprId == a.exprId => bset.contains((v, t))
          case EqualTo(Literal(v, t), x: AttributeReference)
              if x.exprId == a.exprId => bset.contains((v, t))
          case In(x: AttributeReference, qlits)
              if x.exprId == a.exprId && qlits.forall {
                case Literal(v, _) => v != null
                case _ => false
              } =>
            qlits.collect { case Literal(v, t) => (v, t) }
              .forall(bset.contains)
          case _ => false
        }
      case _ => ()
    }
    // (column id, type, lo bound, hi bound); bounds carry inclusivity
    type Iv = (Long, org.apache.spark.sql.types.DataType,
               Option[(Any, Boolean)], Option[(Any, Boolean)])
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    sealed trait Op
    case object LT extends Op; case object LE extends Op
    case object GT extends Op; case object GE extends Op
    case object EQ extends Op
    def zid(tz: Option[String],
            dt: org.apache.spark.sql.types.DataType): java.time.ZoneId =
      // NTZ↔DATE conversion is zone-free: UTC makes daysToMicros the
      // plain days*86400e6 wall-clock mapping NTZ values live in
      if (dt == TimestampNTZType) java.time.ZoneOffset.UTC
      else DateTimeUtils.getZoneId(tz.getOrElse(
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    def mkIv(a: AttributeReference,
             t: org.apache.spark.sql.types.DataType,
             lo: Option[(Any, Boolean)],
             hi: Option[(Any, Boolean)]): Iv = (a.exprId.id, t, lo, hi)
    // one comparison `colSide op literal`, with colSide either the
    // bare column (same-type interval) or a MONOTONE TEMPORAL CAST of
    // it, which normalizes onto the column's NATIVE domain at the
    // literal's midnight boundaries (r17 verdict #4 — the two
    // cross-spelling pairs dashboards actually write; Spark's
    // UnwrapCastInBinaryComparison usually pre-normalizes these to
    // same-type comparisons before this code sees them — the cast
    // arms below are the fallback for sessions that exclude that
    // rule, and the DISCRETE closure in closeBounds is what makes the
    // unwrapped strict spellings match):
    //   CAST(ts AS DATE) cmp d   ⟺  ts  cmp' [midnight(d), midnight(d+1))
    //   CAST(d AS TIMESTAMP) cmp T ⟺ d cmp' day-bucket of T (exactness
    //   of T at a midnight decides the boundary's inclusivity)
    // Both rest on daysToMicros/microsToDays being the exact day
    // partition of the timeline in the cast's zone.
    def cmpIv(colE: Expression, litE: Expression, op: Op): Option[Iv] =
      (colE, litE) match {
        case (a: AttributeReference, Literal(v, t)) if v != null =>
          Some(op match {
            case LT => mkIv(a, t, None, Some((v, false)))
            case LE => mkIv(a, t, None, Some((v, true)))
            case GT => mkIv(a, t, Some((v, false)), None)
            case GE => mkIv(a, t, Some((v, true)), None)
            case EQ => mkIv(a, t, Some((v, true)), Some((v, true)))
          })
        case (Cast(a: AttributeReference, DateType, tz, _),
              Literal(d: Int, DateType))
            if a.dataType == TimestampType ||
               a.dataType == TimestampNTZType =>
          val z = zid(tz, a.dataType)
          val m0 = DateTimeUtils.daysToMicros(d, z)
          val m1 = DateTimeUtils.daysToMicros(d + 1, z)
          Some(op match {
            case GE => mkIv(a, a.dataType, Some((m0, true)), None)
            case GT => mkIv(a, a.dataType, Some((m1, true)), None)
            case LE => mkIv(a, a.dataType, None, Some((m1, false)))
            case LT => mkIv(a, a.dataType, None, Some((m0, false)))
            case EQ => mkIv(a, a.dataType, Some((m0, true)),
                            Some((m1, false)))
          })
        case (Cast(a: AttributeReference, ct, tz, _), Literal(m: Long, lt))
            if a.dataType == DateType && ct == lt &&
               (ct == TimestampType || ct == TimestampNTZType) =>
          val z = zid(tz, ct)
          val f = DateTimeUtils.microsToDays(m, z)
          val exact = DateTimeUtils.daysToMicros(f, z) == m
          op match {
            case GE => Some(mkIv(a, DateType,
                         Some((if (exact) f else f + 1, true)), None))
            case GT => Some(mkIv(a, DateType, Some((f + 1, true)), None))
            case LE => Some(mkIv(a, DateType, None, Some((f, true))))
            case LT => Some(mkIv(a, DateType, None, Some((f, !exact))))
            case EQ => if (exact) Some(mkIv(a, DateType,
                         Some((f, true)), Some((f, true))))
                       else None // no day's midnight equals m
          }
        case _ => None
      }
    // DISCRETE domains (integral values, date days, timestamp micros)
    // admit the exact open→closed normalization x > v ⟺ x ≥ v+1,
    // x < v ⟺ x ≤ v−1. Spark's own UnwrapCastInBinaryComparison
    // rewrites `CAST(d AS TS) >= T` to the STRICT `d > floor(T)` —
    // without this closure that spelling could never match a base
    // slice spelled inclusively. Domain extremes stay strict (no
    // successor), which is merely conservative.
    def closeBounds(iv: Iv): Iv = {
      val (id, t, lo, hi) = iv
      import org.apache.spark.sql.types._
      val discrete = t match {
        case DateType | TimestampType | TimestampNTZType => true
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      if (!discrete) iv
      else {
        def step(v: Any, up: Boolean): Option[Any] = v match {
          case i: Int =>
            if (up) { if (i != Int.MaxValue) Some(i + 1) else None }
            else { if (i != Int.MinValue) Some(i - 1) else None }
          case l: Long =>
            if (up) { if (l != Long.MaxValue) Some(l + 1) else None }
            else { if (l != Long.MinValue) Some(l - 1) else None }
          case b: Byte =>
            if (up) { if (b != Byte.MaxValue) Some((b + 1).toByte) else None }
            else { if (b != Byte.MinValue) Some((b - 1).toByte) else None }
          case s: Short =>
            if (up) { if (s != Short.MaxValue) Some((s + 1).toShort) else None }
            else { if (s != Short.MinValue) Some((s - 1).toShort) else None }
          case _ => None
        }
        val lo2 = lo match {
          case Some((v, false)) =>
            step(v, up = true).map(w => (w, true)).orElse(lo)
          case other => other
        }
        val hi2 = hi match {
          case Some((v, false)) =>
            step(v, up = false).map(w => (w, true)).orElse(hi)
          case other => other
        }
        (id, t, lo2, hi2)
      }
    }
    // `allowIn` is QUERY-side only: an IN's [min, max] HULL contains
    // its true-set, so hull ⊆ base-interval proves implication — but
    // the reverse (base = IN, query interval inside the hull) would
    // ignore the hull's GAPS and serve rows the summary lacks
    def iv0(e: Expression, allowIn: Boolean): Option[Iv] = (e match {
      case LessThan(l, r) => cmpIv(l, r, LT).orElse(cmpIv(r, l, GT))
      case LessThanOrEqual(l, r) => cmpIv(l, r, LE).orElse(cmpIv(r, l, GE))
      case GreaterThan(l, r) => cmpIv(l, r, GT).orElse(cmpIv(r, l, LT))
      case GreaterThanOrEqual(l, r) =>
        cmpIv(l, r, GE).orElse(cmpIv(r, l, LE))
      case EqualTo(l, r) => cmpIv(l, r, EQ).orElse(cmpIv(r, l, EQ))
      case In(a: AttributeReference, lits)
          if allowIn && lits.nonEmpty && lits.forall {
            case Literal(v, _) => v != null
            case _ => false
          } && lits.map(_.dataType).distinct.size == 1 =>
        val t = lits.head.dataType
        val ord = org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(t).asInstanceOf[Ordering[Any]]
        val vs = lits.map { case Literal(v, _) => v }
        Some((a.exprId.id, t, Some((vs.min(ord), true)),
              Some((vs.max(ord), true))))
      case _ => None
    }).map(closeBounds)
    // a base ISNOTNULL is implied by ANY null-rejecting comparison on
    // the same column (every interval shape above evaluates to false
    // on null input), covering the optimizer's inferred-isnotnull
    // asymmetry between a range-filtered base and an IN-filtered query
    be match {
      case IsNotNull(a: AttributeReference) =>
        return iv0(qe, allowIn = true).exists(_._1 == a.exprId.id)
      case _ => ()
    }
    (iv0(qe, allowIn = true), iv0(be, allowIn = false)) match {
      case (Some((qa, qt, qlo, qhi)), Some((ba, bt, blo, bhi)))
          if qa == ba && qt == bt =>
        val ord = org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(qt).asInstanceOf[Ordering[Any]]
        // every base bound must be covered by a query bound at least
        // as tight (equal points need compatible inclusivity)
        val loOk = blo.forall { case (bv, bIncl) =>
          qlo.exists { case (qv, qIncl) =>
            val c = ord.compare(qv, bv)
            c > 0 || (c == 0 && (bIncl || !qIncl))
          }
        }
        val hiOk = bhi.forall { case (bv, bIncl) =>
          qhi.exists { case (qv, qIncl) =>
            val c = ord.compare(qv, bv)
            c < 0 || (c == 0 && (bIncl || !qIncl))
          }
        }
        loOk && hiOk
      case _ => false
    }
  }

  /** Every base conjunct covered by the query's set — verbatim (normal
    * form membership) or by single-column range implication. */
  private def coveredBy(base: Seq[(String, Expression)],
                        q: Seq[(String, Expression)]): Boolean = {
    lazy val qn = q.map(_._1).toSet
    base.forall { case (bs, be) =>
      qn.contains(bs) || q.exists { case (_, qe) => implies(qe, be) }
    }
  }

  /** Deterministic rendering of a plan under an aggregate — the
    * star-schema matcher's SKELETON plus the plan's filter conjuncts.
    * Projects are TRANSPARENT (attribute/alias substitutions are
    * inlined into every enclosing expression), so the form is
    * invariant under column pruning; relations render as the FNV of
    * their sorted input-file list (staleness guard included by
    * construction); an inner-join TREE renders FLAT — sorted leaf
    * forms + sorted join-condition norms — so the form is invariant
    * under join ORDER and ASSOCIATION too (inner joins commute);
    * Filter nodes are transparent and their conjuncts are returned
    * SEPARATELY as (normal form, original expression) pairs — over
    * inner joins a conjunct commutes to the top of the tree, so
    * containment is decided on the SET of conjuncts, not their
    * position. Declines (None) on: non-inner joins, subqueries, a
    * filter conjunct that will not normalize, any node outside
    * {Project, Filter, Join, LogicalRelation}, or duplicate column
    * names across the joined relations (bare-name identity is what
    * lets groupCols/aggCols lookups stay unchanged). */
  /** One filter conjunct of a rendered plan: canonical string, the
    * normalized expression behind it (range implication compares
    * these), and the ORIGINAL expression (extras re-apply this over
    * the summary, remapped to MV attributes). */
  private[engine] case class Conj(norm: String, normExpr: Expression,
                                  orig: Expression)

  private[engine] def planNormal(p: LogicalPlan)
      : Option[(String, Map[ExprId, String], Seq[Conj])] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    import org.apache.spark.sql.catalyst.plans.InnerLike
    // A join subtree renders FLAT — the sorted multiset of its leaf
    // forms plus the sorted set of its join-condition norms — because
    // inner joins commute and associate: leaf multiset + conjunction
    // of conditions fully determine the result, so `customer ⋈
    // orders` matches an MV registered as `orders ⋈ customer`, and a
    // reduced subset form matches however the query re-associates
    // what remains (r18 join-order canonicalization).
    sealed trait Form
    case class Leaf(s: String) extends Form
    case class Flat(legs: Seq[String], conds: Seq[String]) extends Form
    def show(f: Form): String = f match {
      case Leaf(s) => s
      case Flat(legs, conds) =>
        s"J(inner,[${conds.sorted.mkString(";")}]," +
          s"[${legs.sorted.mkString(",")}])"
    }
    def render(p: LogicalPlan)
        : Option[(Form, Map[ExprId, String], Map[ExprId, Expression],
                  Seq[Conj])] =
      p match {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            val fileFnv =
              fnv64(fs.location.inputFiles.sorted.mkString("\u0000"))
            Some((Leaf(s"R($fileFnv)"),
                  lr.output.map(a => a.exprId -> a.name).toMap,
                  Map.empty, Seq.empty))
          case _ => None
        }
        case Project(items, inner) =>
          render(inner).map { case (f, names, ad, cs) =>
            var names2 = names
            var ad2 = ad
            items.foreach {
              case _: AttributeReference => ()
              case al @ Alias(a: AttributeReference, _) =>
                names.get(a.exprId) match {
                  case Some(n) => names2 += al.exprId -> n
                  case None =>
                    ad.get(a.exprId).foreach(e => ad2 += al.exprId -> e)
                }
              case al @ Alias(c, _) => ad2 += al.exprId -> c
              case _ => ()
            }
            (f, names2, ad2, cs) // Projects are transparent in the form
          }
        case Filter(cond, inner) =>
          render(inner).flatMap { case (f, names, ad, cs) =>
            val normed = splitConj(cond).map(c =>
              exprNorm(c, names, ad).map(n => Conj(n.toString, n, c)))
            if (normed.exists(_.isEmpty)) None
            else Some((f, names, ad, cs ++ normed.flatten))
          }
        case j: Join if j.joinType.isInstanceOf[InnerLike] =>
          for {
            (lf, ln, lad, lcs) <- render(j.left)
            (rf, rn, rad, rcs) <- render(j.right)
            // bare-name identity requires global uniqueness
            if ln.values.toSet.intersect(rn.values.toSet).isEmpty
            names = ln ++ rn
            ad = lad ++ rad
            cns <- j.condition match {
              case Some(c) => exprNormal(c, names, ad).map(Seq(_))
              case None => Some(Seq.empty[String])
            }
          } yield {
            def legsOf(f: Form): Seq[String] = f match {
              case Leaf(s) => Seq(s)
              case Flat(legs, _) => legs
            }
            def condsOf(f: Form): Seq[String] = f match {
              case Leaf(_) => Seq.empty
              case Flat(_, conds) => conds
            }
            (Flat(legsOf(lf) ++ legsOf(rf),
                  condsOf(lf) ++ condsOf(rf) ++ cns),
             names, ad, lcs ++ rcs)
          }
        // LEFT OUTER joins render NESTED, never flat (r18 verdict #7):
        // outer joins neither commute nor associate with the inner
        // legs around them, so the LJ node is an opaque LEAF — an
        // exact-structure match is required wherever it appears (an
        // inner flat above treats the whole LJ string as one leg
        // identity, which IS sound: inner joins over the LJ's result
        // commute fine). Conjunct POSITION matters across an outer
        // join: a filter on right-side columns below the join decides
        // null-extension, the same filter above decides row survival —
        // so right-subtree conjuncts are BAKED into the leg's form
        // (exact-match only, v1) while left-side conjuncts, which
        // commute through a left join (σ_L(A ⟕ B) = σ_L(A) ⟕ B),
        // continue into the global containment set. Both register and
        // query plans pass the same optimizer (EliminateOuterJoin
        // turns null-rejecting-above filters into inner joins before
        // this code sees either), so placements compare like with
        // like. Subset-drop serving never crosses an outer leg:
        // sideLeg admits InnerLike joins only.
        case j: Join
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftOuter =>
          for {
            (lf, ln, lad, lcs) <- render(j.left)
            (rf, rn, rad, rcs) <- render(j.right)
            if ln.values.toSet.intersect(rn.values.toSet).isEmpty
            names = ln ++ rn
            ad = lad ++ rad
            cns <- j.condition match {
              case Some(c) => exprNormal(c, names, ad).map(Seq(_))
              case None => Some(Seq.empty[String])
            }
          } yield {
            val rShown =
              s"F([${rcs.map(_.norm).sorted.mkString(";")}],${show(rf)})"
            (Leaf(s"LJ([${cns.sorted.mkString(";")}]," +
                  s"${show(lf)},$rShown)"),
             names, ad, lcs)
          }
        case _ => None
      }
    render(p).map { case (f, names, _, cs) => (show(f), names, cs) }
  }

  /** Normal form of `e` with Project aliases inlined and column refs
    * renamed to name-derived identity. */
  private def exprNorm(e: Expression, names: Map[ExprId, String],
                       adefs: Map[ExprId, Expression]): Option[Expression] = {
    def inline(x: Expression): Expression = x.transformUp {
      case a: AttributeReference if adefs.contains(a.exprId) =>
        inline(adefs(a.exprId))
    }
    normalize(inline(e), names)
  }

  /** Canonical string of [[exprNorm]]. */
  private def exprNormal(e: Expression, names: Map[ExprId, String],
                         adefs: Map[ExprId, Expression]): Option[String] =
    exprNorm(e, names, adefs).map(_.toString)

  // ------------------------------------------------------------------
  // Join-SUBSET serving (r17 verdict #1): a query that joins a STRICT
  // SUBSET of a registered star MV's tables is still served when every
  // dropped dimension is provably multiplicity-preserving — the inner
  // equi join on it neither drops nor duplicates fact-side rows, so
  // the summary's partials are partials of the reduced join too. The
  // proof obligations, all decided at REGISTER time:
  //
  //   shape  — the dim side is a bare parquet leaf (attribute-only
  //            Projects at most; the only filters tolerated anywhere
  //            on the dim's columns are the optimizer's inferred
  //            `isnotnull(join key)`, vacuous under an equi join),
  //            the join condition is a conjunction of equalities
  //            between dim and fact attributes, and the dim's columns
  //            serve ONLY this join (no other Filter references them,
  //            no OTHER join condition does — a snowflake arm hanging
  //            off the dim pins it);
  //   data   — the dim is UNIQUE on the join key tuple (each fact row
  //            matches at most once) and every fact-side key tuple
  //            MATCHES (no fact row is dropped; a NULL key fails the
  //            anti-join too, since NULL never equi-matches). Checked
  //            by two small Spark jobs against the UNFILTERED leaf
  //            file sets (stricter than the joined sides — sound),
  //            memoized per (files, keys): file sets are immutable,
  //            and the forms that embed them decline automatically
  //            when the files change.
  //
  // Dims whose columns feed the MV's group keys need no special case:
  // the query (which lacks the dim) can never reference them, and the
  // rollup algebra re-aggregates over the finer grouping exactly.
  // Every verified subset of droppable legs contributes the normal
  // form of the reduced plan, paired with the base filter conjuncts
  // the drop makes VACUOUS — the inferred `isnotnull` on the join
  // keys (the dim is gone; the fact keys are verified all-matching,
  // hence non-null) — which coverage then does not require of the
  // query. [[MvRewrite.tryRewrite]] matches a query's form against
  // the full form OR any subset form. Failure mode throughout: "no
  // speedup", never "wrong answer".
  // ------------------------------------------------------------------

  private val fkVerified =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  // dim-uniqueness verdicts: "dimFp:pkNames" → unique-on-key
  private val fkUniq =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  // coverage verdicts at FILE grain (r18 verdict #8): "dimFp:pkNames:
  // fkNames" → the set of fact-file identity hashes whose every fk
  // tuple is verified to match dim(dimFp). "All keys in file F match
  // this frozen dim" is a PER-FILE fact, so any relation whose file
  // set ⊆ the verified set passes coverage with zero scanning, and a
  // grown fact re-verifies only its NEW files — file removal can only
  // shrink coverage obligations, never break them.
  private val fkFiles = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.Set[String]]()

  /** Count of FK-verification LEGS that ran ≥1 Spark job (test hook:
    * the sidecar-skip assertion watches this not move). */
  private[graft] val fkVerifyRuns =
    new java.util.concurrent.atomic.AtomicLong()

  /** Cumulative count of fact FILES scanned by coverage jobs (test
    * hook: the incremental case asserts an append re-verification
    * scans only the delta). */
  private[graft] val fkVerifyFactFiles =
    new java.util.concurrent.atomic.AtomicLong()

  /** Test hook: drop the in-process FK memo (the sidecar persists). */
  private[graft] def clearFkMemo(): Unit = {
    fkVerified.clear(); fkUniq.clear(); fkFiles.clear()
  }

  // two independent 64-bit FNVs (salted second pass) — per-file
  // verdicts must never alias across files, and 128 bits puts a
  // collision beyond reach where 64 alone would merely make it rare
  private def fileHash128(id: String): String =
    java.lang.Long.toHexString(fnv64(id)) + "-" +
      java.lang.Long.toHexString(fnv64("graft-fk#" + id))

  // ------------------------------------------------------------------
  // FK-verification sidecar: verdicts persist beside the MV's commit
  // log (`_graft_log/mv_fkverified`, one "fingerprint<TAB>0|1" line
  // per verified leg — the name pattern LakeTable.versions ignores),
  // so a FRESH session re-registering an unchanged MV skips the
  // verification jobs entirely. Sound because a verdict is a pure
  // function of its fingerprint (immutable file sets + key names);
  // last-writer-wins on the file is fine — any two writers of the
  // same key wrote the same verdict.
  // ------------------------------------------------------------------

  private def fkSidecarPath(root: String): Path =
    new Path(root, "_graft_log/mv_fkverified")

  /** Sidecar line grammar (append-only, order-free):
    *   `<fingerprint>\t<0|1>`            — exact (dim, fact) verdict
    *   `u\t<dimFp:pk>\t<0|1>`            — dim uniqueness on key
    *   `f\t<dimFp:pk:fk>\t<fileHash128>` — one verified fact FILE
    * Unknown shapes are skipped (forward compatibility both ways). */
  private def loadFkSidecar(spark: SparkSession, root: String): Unit = {
    val f = hfs(spark, root)
    val p = fkSidecarPath(root)
    try {
      if (f.exists(p)) {
        val in = f.open(p)
        val text = try new String(in.readAllBytes(), "UTF-8")
                   finally in.close()
        text.linesIterator.foreach { line =>
          line.split('\t') match {
            case Array("u", k, v) =>
              fkUniq.putIfAbsent(k, java.lang.Boolean.valueOf(v == "1"))
            case Array("f", k, h) =>
              fkFiles.computeIfAbsent(k, _ =>
                java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
                .add(h)
            case Array(k, v) =>
              fkVerified.putIfAbsent(k, java.lang.Boolean.valueOf(v == "1"))
            case _ => ()
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () } // cache only
  }

  private def saveFkSidecar(spark: SparkSession, root: String,
                            fresh: Seq[String]): Unit = {
    if (fresh.isEmpty) return
    try {
      val f = hfs(spark, root)
      val p = fkSidecarPath(root)
      val existing =
        if (!f.exists(p)) ""
        else {
          val in = f.open(p)
          try new String(in.readAllBytes(), "UTF-8") finally in.close()
        }
      val have = existing.linesIterator.toSet
      val add = fresh.distinct.filterNot(have)
      if (add.nonEmpty) {
        f.mkdirs(p.getParent)
        // write-to-temp + rename: two sessions registering different
        // star MVs on the same root race this read-modify-write, and a
        // plain overwrite could interleave a PARTIAL file under the
        // loser's read — last-writer-wins on whole files is the worst
        // case now (the loser's verdicts are re-derived next register;
        // a cache may lose entries, never serve torn ones)
        val tmp = new Path(p.getParent,
          s"${p.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
        val out = f.create(tmp, true)
        try out.write((existing + add.sorted.map(_ + "\n").mkString)
          .getBytes("UTF-8"))
        finally out.close()
        if (!f.rename(tmp, p)) { // HDFS rename won't replace: delete+retry
          f.delete(p, false)
          if (!f.rename(tmp, p)) f.delete(tmp, false)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () } // cache only
  }

  private def subsetFormsOf(spark: SparkSession,
                            optBase: LogicalPlan,
                            fresh: scala.collection.mutable.Buffer[String])
      : Map[String, Set[String]] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    import org.apache.spark.sql.catalyst.plans.InnerLike
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

    // relation under attribute-only Projects and Filters, with the
    // filters' conjuncts collected for the key-only-isnotnull guard
    def leafAndFilters(p: LogicalPlan)
        : Option[(LogicalRelation, Seq[Expression])] = p match {
      case lr: LogicalRelation => Some((lr, Seq.empty))
      case Project(items, inner) if items.forall {
            case _: AttributeReference => true
            case Alias(_: AttributeReference, _) => true
            case _ => false
          } => leafAndFilters(inner)
      case Filter(c, inner) =>
        leafAndFilters(inner).map { case (lr, fs) =>
          (lr, fs ++ splitConj(c))
        }
      case _ => None
    }
    // (paths for reading, PER-FILE identity strings, set fingerprint):
    // identities fold in LENGTH and MTIME — an in-place overwrite at
    // the same paths must invalidate persisted verdicts (the sidecar
    // outlives the files' contents; paths alone would trust a stale
    // verdict). Per-file identities are what the incremental coverage
    // path keys its verified-file set by.
    def parquetFiles(lr: LogicalRelation)
        : Option[(Seq[(String, String)], Long)] =
      lr.relation match {
        case fsr: HadoopFsRelation
            if fsr.fileFormat.isInstanceOf[ParquetFileFormat] =>
          fsr.location match {
            case pa: org.apache.spark.sql.execution.datasources
                       .PartitioningAwareFileIndex =>
              // (path, identity) pairs — identity strings sorted
              // exactly as before so set fingerprints stay stable
              // against sidecars written by earlier rounds
              val pairs = pa.allFiles().map { f =>
                (f.getPath.toString,
                 s"${f.getPath}:${f.getLen}:${f.getModificationTime}")
              }.sortBy(_._2)
              Some((pairs.toSeq, fnv64(pairs.map(_._2).mkString(","))))
            case _ => None // no per-file identity → no verdict to trust
          }
        case _ => None
      }
    val joins = optBase.collect { case j: Join => j }
    val filterConjs = optBase.collect { case f: Filter => f.condition }
      .flatMap(splitConj)
    val leafNames: Map[ExprId, String] = optBase.collect {
      case lr: LogicalRelation => lr.output.map(a => a.exprId -> a.name)
    }.flatten.toMap

    case class Leg(join: Join, fact: LogicalPlan, dim: LogicalRelation,
                   dimSide: LogicalPlan, pk: Seq[Attribute],
                   fk: Seq[Attribute])

    def sideLeg(j: Join, dimSide: LogicalPlan,
                factSide: LogicalPlan): Option[Leg] =
      for {
        (dim, dimFilters) <-
          if (j.joinType.isInstanceOf[InnerLike]) leafAndFilters(dimSide)
          else None
        cond <- j.condition
        pairs <- {
          val cs = splitConj(cond).map {
            case EqualTo(a: AttributeReference, b: AttributeReference)
                if dimSide.outputSet.contains(a) &&
                   factSide.outputSet.contains(b) => Some((a, b))
            case EqualTo(a: AttributeReference, b: AttributeReference)
                if dimSide.outputSet.contains(b) &&
                   factSide.outputSet.contains(a) => Some((b, a))
            case _ => None
          }
          if (cs.nonEmpty && cs.forall(_.isDefined)) Some(cs.flatten)
          else None
        }
        pkSet = AttributeSet(pairs.map(_._1))
        // the join keys must be the LEAF's own attributes (a
        // rename-Project between leaf and join would make the
        // verification jobs select a name the files do not have —
        // decline the leg instead of crashing out of register)
        if pairs.forall { case (pk, _) => dim.outputSet.contains(pk) }
        // every filter conjunct touching the dim — inside its subtree
        // or anywhere else, against the LEAF's attrs as well as the
        // post-Project ones (a filter on a projected-away dim column
        // still drops fact rows) — must be an inferred isnotnull ON A
        // JOIN KEY (vacuous under the equi join)
        dimAttrs = dim.outputSet ++ dimSide.outputSet
        if (dimFilters ++ filterConjs).forall(c =>
             c.references.intersect(dimAttrs).isEmpty || (c match {
               case IsNotNull(a: AttributeReference) => pkSet.contains(a)
               case _ => false
             }))
        if joins.forall(j2 => (j2 eq j) || j2.condition.forall(
             _.references.intersect(dimAttrs).isEmpty))
      } yield Leg(j, factSide, dim, dimSide,
                  pairs.map(_._1), pairs.map(_._2))

    def verified(leg: Leg): Boolean = {
      val factLeaf = leg.fact.collectFirst {
        case lr: LogicalRelation
            if leg.fk.forall(lr.outputSet.contains) => lr
      }
      (for {
        fl <- factLeaf
        (dimPairs, dimFp) <- parquetFiles(leg.dim)
        (factPairs, factFp) <- parquetFiles(fl)
      } yield {
        val pkNames = leg.pk.map(_.name)
        val fkNames = leg.fk.map(_.name)
        // identity fingerprints (path+len+mtime), never raw lists
        val key = dimFp + ":" + factFp + ":" +
          pkNames.mkString(",") + ":" + fkNames.mkString(",")
        Option(fkVerified.get(key)).map(_.booleanValue()).getOrElse {
          // any failure (transient job error, foreign schema) means
          // "not verified NOW": decline the leg without recording a
          // verdict anywhere — a false from an outage must not stick
          try {
            // INCREMENTAL verification (r18 verdict #8): uniqueness is
            // a pure function of the frozen dim file set, and coverage
            // decomposes per fact FILE — so an APPEND-grown fact
            // re-verifies only its new files against an unchanged dim,
            // and a shrunk one re-verifies nothing at all
            val uniqKey = s"$dimFp:${pkNames.mkString(",")}"
            val fileKey = s"$uniqKey:${fkNames.mkString(",")}"
            val known = Option(fkFiles.get(fileKey))
            val delta = factPairs.map { case (p, id) =>
              (p, fileHash128(id))
            }.filterNot { case (_, h) => known.exists(_.contains(h)) }
            if (!fkUniq.containsKey(uniqKey) || delta.nonEmpty)
              fkVerifyRuns.incrementAndGet()
            lazy val dimKeys = spark.read
              .parquet(dimPairs.map(_._1): _*)
              .select(pkNames.map(col): _*)
            val unique =
              Option(fkUniq.get(uniqKey)).map(_.booleanValue()).getOrElse {
                val u = dimKeys.groupBy(pkNames.map(col): _*)
                  .agg(count(lit(1)).as("__n"))
                  .filter(col("__n") > 1).isEmpty
                fkUniq.put(uniqKey, u)
                fresh += s"u\t$uniqKey\t${if (u) "1" else "0"}"
                u
              }
            val ok = unique && (delta.isEmpty || {
              fkVerifyFactFiles.addAndGet(delta.size)
              val factKeys = spark.read.parquet(delta.map(_._1): _*)
                .select(fkNames.map(col): _*)
              val covered = factKeys.join(dimKeys,
                fkNames.zip(pkNames)
                  .map { case (f, p) => factKeys(f) === dimKeys(p) }
                  .reduce(_ && _),
                "left_anti").isEmpty
              if (covered) {
                val set = fkFiles.computeIfAbsent(fileKey, _ =>
                  java.util.concurrent.ConcurrentHashMap
                    .newKeySet[String]())
                delta.foreach { case (_, h) =>
                  set.add(h); fresh += s"f\t$fileKey\t$h"
                }
              }
              covered
            })
            fkVerified.put(key, ok)
            fresh += s"$key\t${if (ok) "1" else "0"}"
            ok
          } catch { case scala.util.control.NonFatal(_) => false }
        }
      }).getOrElse(false)
    }

    val legs = joins.flatMap(j =>
      sideLeg(j, j.right, j.left).orElse(sideLeg(j, j.left, j.right)))
      .take(4) // cap BEFORE verification: register-time work is at
               // most 4 job pairs, and ≤15 reduced forms downstream
      .filter(verified)
    if (legs.isEmpty) return Map.empty
    (1 until (1 << legs.size)).flatMap { mask =>
      val drop = legs.zipWithIndex.collect {
        case (l, i) if (mask & (1 << i)) != 0 => l
      }
      // transformDown so an outer drop exposes inner join nodes
      // unchanged (reference identity preserved for their own drop)
      val reduced = optBase.transformDown {
        case j: Join if drop.exists(_.join eq j) =>
          drop.find(_.join eq j).get.fact
      }
      // base conjuncts the drop makes vacuous: isnotnull on the dim's
      // keys (gone) and on the fact keys (verified all-matching ⇒
      // non-null) — coverage must not require them of the query
      val excl = drop.flatMap(l => (l.pk ++ l.fk).flatMap(a =>
        normalize(IsNotNull(a), leafNames).map(_.toString))).toSet
      planNormal(reduced).map(_._1 -> excl)
    }.toMap
  }

  // session-scoped registrations: keyed by the registering
  // SparkSession, name-keyed within it. NOTE on lifetime: although the
  // outer map is weak-keyed, an MvDef's analyzed plans reference their
  // session, so a registration PINS its SparkSession until [[clear]] /
  // [[clear(spark)]] — registering MVs from many short-lived sessions
  // without clearing accumulates; an MV registration is an explicit,
  // long-lived serving declaration, not per-query state.
  private val defsBySession =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, MvDef]]()

  private def defsFor(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, MvDef] =
    defsBySession.synchronized {
      defsBySession.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, MvDef]())
    }

  private[engine] def registered(spark: SparkSession): Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    defsFor(spark).values.asScala.toSeq
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

  // ------------------------------------------------------------------
  // Base-fingerprint sidecar: which base FILE SET the materialized
  // summary was computed from. Lives beside the MV's commit log
  // (`_graft_log/mv_basefp`; LakeTable.versions ignores names outside
  // \d{10}.json) and is (re)written AFTER every materialize/fold/
  // rebuild, so a crash between the two leaves a missing or stale
  // fingerprint and the next register REBUILDS — the failure mode is
  // extra work, never a stale summary served as fresh.
  // ------------------------------------------------------------------

  private def baseFp(analyzedBase: LogicalPlan): String =
    fnv64(inputFilesOf(analyzedBase).toSeq.sorted.mkString("\u0000")).toString

  private def fpPath(root: String): Path =
    new Path(root, "_graft_log/mv_basefp")

  private def hfs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeBaseFp(spark: SparkSession, root: String,
                          fp: String): Unit = {
    val f = hfs(spark, root)
    val p = fpPath(root)
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write(fp.getBytes("UTF-8")) finally out.close()
  }

  private def readBaseFp(spark: SparkSession,
                         root: String): Option[String] = {
    val f = hfs(spark, root)
    val p = fpPath(root)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

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
    * Idempotent per (session, name) — and SAFE against a changed
    * base: the skip-path verifies the persisted base-file
    * fingerprint and REBUILDS the summary on mismatch (or when the
    * root predates fingerprinting) instead of stamping it fresh. */
  def register(spark: SparkSession, name: String, base: DataFrame,
               groupCols: Seq[String], aggCols: Seq[String],
               root: String, hllCols: Seq[String] = Nil,
               groupExprs: Seq[(String, String)] = Nil): Unit = {
    Hll.register(spark)
    val groupKeys = groupCols.map(col) ++
      groupExprs.map { case (a, t) => expr(t).as(a) }
    val analyzedBase = base.queryExecution.analyzed
    val fp = baseFp(analyzedBase)
    def summary = {
      val partials = partialCols(groupCols, aggCols, hllCols)
      base.groupBy(groupKeys: _*).agg(partials.head, partials.tail: _*)
    }
    LakeTable.latestVersion(spark, root) match {
      case None =>
        LakeTable.append(summary, root)
        writeBaseFp(spark, root, fp)
      case Some(_) if !readBaseFp(spark, root).contains(fp) =>
        // the existing materialization was computed from a DIFFERENT
        // base file set (or predates fingerprinting): rebuild rather
        // than serve a stale summary as fresh (r16 ADVICE #1)
        LakeTable.rewrite(summary, root)
        writeBaseFp(spark, root, fp)
      case _ => () // fingerprint matches: the summary is current
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
    // star-schema bases (v1: inner equi joins) match by whole-subtree
    // normal form instead of single-relation identity; either way the
    // base's OWN filter conjuncts are recorded so the rewrite can
    // require them of every query (containment) — without this, an MV
    // registered over a FILTERED base would serve unfiltered queries
    val optBase = base.queryExecution.optimizedPlan
    val isJoin = optBase.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isDefined
    val hasFilter = optBase.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isDefined
    val (baseNormal, baseFilterConjs) =
      if (!isJoin && !hasFilter) (None, Seq.empty[(String, Expression)])
      else {
        if (isJoin) require(groupExprs.isEmpty,
          "Mv.register: derived group expressions over a JOINED base " +
            "are not supported (v1)")
        val (form, _, conjs) = planNormal(optBase).getOrElse(sys.error(
          s"Mv.register: the base of '$name' is outside the matchable " +
            "shape (inner equi joins / filters / projects over file " +
            "relations with globally unique column names)"))
        (if (isJoin) Some(form) else None,
         conjs.map(c => (c.norm, c.normExpr)))
      }
    val subsetForms =
      if (!isJoin) Map.empty[String, Set[String]]
      else {
        // persisted verdicts let a fresh session skip the jobs
        loadFkSidecar(spark, root)
        val fresh = scala.collection.mutable.Buffer[String]()
        val forms = subsetFormsOf(spark, optBase, fresh)
        saveFkSidecar(spark, root, fresh.toSeq)
        forms
      }
    defsFor(spark).put(name, MvDef(name,
      rootPathsOf(analyzedBase), inputFilesOf(analyzedBase),
      groupCols, aggCols, hllCols, groupExprs, exprNorms, root, plan,
      plan.output.map(a => a.name -> a).toMap, baseNormal,
      baseFilterConjs, subsetForms))
    if (!spark.experimental.extraOptimizations.exists(
          _.isInstanceOf[MvRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new MvRewrite
  }

  /** The lake root the named MV currently serves from on this
    * session, if registered — lets a caller detect that a LATER
    * registration (e.g. another LakeSql session on the same
    * SparkSession) took the name over before mutating it. */
  private[engine] def rootOf(spark: SparkSession,
                             name: String): Option[String] =
    Option(defsFor(spark).get(name)).map(_.root)

  private def lookup(spark: SparkSession, name: String,
                     op: String): MvDef =
    Option(defsFor(spark).get(name)).getOrElse(
      sys.error(s"Mv.$op: no registered MV named '$name' in this session"))

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
    val d = lookup(spark, name, "refresh")
    val newFp = baseFp(newBase.queryExecution.analyzed)
    if (txn.exists { case (app, b) =>
          LakeTable.lastTxn(spark, d.root, app).exists(_ >= b) }) {
      // replayed delivery: the fold is already in the MV and the FIRST
      // delivery stamped the fingerprint it folded FOR. Deliberately
      // do NOT re-stamp here: if the base has grown since (the replay
      // arrives with a newer newBase), stamping would mark the old
      // fold fresh for the grown file set — register()'s mismatch
      // path must instead REBUILD. An identical-base replay matches
      // the first delivery's stamp and skips, as intended.
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
    // the folded summary now corresponds to newBase's file set — stamp
    // it so register's skip-path verification passes (fold-then-stamp
    // order: a crash between the two rebuilds, never serves stale)
    writeBaseFp(spark, d.root, newFp)
    register(spark, name, newBase, d.groupCols, d.aggCols, d.root,
             d.hllCols, d.exprTexts)
  }

  /** Full recompute against the current base — the repair for any
    * base change [[refresh]]'s inserts-only fold cannot express
    * (deletes, updates, rewrites): re-aggregate from scratch, commit
    * as one new MV version, re-register against the new file set. */
  def rebuild(spark: SparkSession, name: String,
              newBase: DataFrame): Unit = {
    val d = lookup(spark, name, "rebuild")
    Hll.register(spark)
    val partials = partialCols(d.groupCols, d.aggCols, d.hllCols)
    LakeTable.rewrite(
      newBase.groupBy(d.groupKeyCols: _*)
        .agg(partials.head, partials.tail: _*), d.root)
    writeBaseFp(spark, d.root, baseFp(newBase.queryExecution.analyzed))
    register(spark, name, newBase, d.groupCols, d.aggCols, d.root,
             d.hllCols, d.exprTexts)
  }

  /** Drop every session's registered MVs (test isolation). */
  def clear(): Unit = defsBySession.synchronized {
    import scala.jdk.CollectionConverters._
    defsBySession.values.asScala.foreach(_.clear())
  }

  /** Drop ONE session's registrations (serving stops; the
    * materialized artifacts stay on disk for re-registration) — the
    * lifecycle call for drivers that create short-lived sessions. */
  def clear(spark: SparkSession): Unit = defsFor(spark).clear()

  /** The rewrite rule. Runs in the user-provided optimizer batch —
    * after column pruning, so the plan under an aggregate is the file
    * relation under attribute-only Projects. Consults only the ACTIVE
    * session's registrations. */
  final class MvRewrite extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan =
      SparkSession.getActiveSession match {
        case None => plan
        case Some(s) =>
          val ds = registered(s)
          if (ds.isEmpty) plan
          else plan.transformUp {
            case agg @ Aggregate(ges, aes, child, _) =>
              tryRewrite(ds, ges, aes, child).getOrElse(agg)
          }
      }

    /** Unwrap Projects and Filters down to the base relation,
      * returning (matched MvDefs, exprId → file-column name, exprId →
      * aliased expression, collected filter conjuncts). Plain and
      * renamed columns land in the name map; a Project item computing
      * an EXPRESSION (the optimizer's PullOutGroupingExpressions
      * hoists complex grouping keys into exactly such aliases) lands
      * in the alias-definition map, for [[attempt]] to inline and
      * normalize against registered group expressions. Nothing is
      * rejected here — an unresolvable reference simply fails its
      * lookup later, declining the rewrite. Filters pass through with
      * their conjuncts collected; servability is [[tryRewrite]]'s
      * containment decision plus [[attempt]]'s group-column check. */
    private def baseMatch(ds: Seq[MvDef], child: LogicalPlan)
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
            val matched = ds.filter(d =>
              d.basePaths == paths && d.baseFiles == files)
            if (matched.isEmpty) None
            else Some((matched,
                       lr.output.map(a => a.exprId -> a.name).toMap,
                       Map.empty, Seq.empty))
          case _ => None
        }
        case Project(items, inner) =>
          baseMatch(ds, inner).map { case (d, under, adefs, fs) =>
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
          baseMatch(ds, inner).map { case (d, under, adefs, fs) =>
            (d, under, adefs, fs ++ splitConj(cond))
          }
        case _ => None
      }

    /** Several MVs may summarize the same base (different partials) —
      * the first candidate whose algebra covers the query wins. Both
      * paths decide filters by CONTAINMENT: the MV base's own
      * conjuncts must all appear in the query (by normal form), and
      * only the query's EXTRA conjuncts are passed to [[attempt]] to
      * re-apply over the summary (servable only on group columns). */
    private def tryRewrite(ds: Seq[MvDef], ges: Seq[Expression],
                           aes: Seq[NamedExpression],
                           child: LogicalPlan): Option[LogicalPlan] = {
      val direct = baseMatch(ds, child) match {
        case Some((candidates, names, adefs, filters)) =>
          lazy val normed = filters.map(c =>
            (exprNorm(c, names, adefs), c))
          lazy val qPairs = normed.collect {
            case (Some(n), _) => (n.toString, n) }
          candidates.iterator.flatMap { d =>
            if (d.baseFilterConjs.isEmpty)
              attempt(d, names, adefs, filters, ges, aes)
            else if (!coveredBy(d.baseFilterConjs, qPairs)) None
            else attempt(d, names, adefs,
              normed.filterNot(_._1.exists(n =>
                  d.baseFilterNorms.contains(n.toString)))
                .map(_._2),
              ges, aes)
          }.buffered.headOption
        case None => None
      }
      // star-schema bases: the skeleton (joins + relations) must BE
      // the registered join shape — or a verified SUBSET form of it
      // (FK-non-filtering dims dropped, r17 verdict #1) — modulo
      // pruning projects and filter placement; filter conjuncts match
      // by containment (verbatim or range-implied), so the
      // dashboard's "same rollup, one extra WHERE on a group column"
      // is served (r16 verdict #1). A direct single-relation match
      // that could not serve FALLS THROUGH here (an unrelated MV over
      // the same base files must not shadow a subset serve).
      direct.orElse {
        val joined = ds.filter(_.baseNormal.isDefined)
        if (joined.isEmpty) None
        else planNormal(child).flatMap { case (form, names, qconjs) =>
          val qPairs = qconjs.map(c => (c.norm, c.normExpr))
          // full-form match requires every base conjunct; a subset
          // form waives exactly the conjuncts its drop made vacuous
          def servable(d: MvDef): Boolean =
            if (d.baseNormal.contains(form))
              coveredBy(d.baseFilterConjs, qPairs)
            else d.subsetForms.get(form).exists(excl =>
              coveredBy(d.baseFilterConjs.filterNot(c =>
                excl.contains(c._1)), qPairs))
          joined.filter(servable)
            .iterator.flatMap { d =>
              val extras = qconjs
                .filterNot(c => d.baseFilterNorms.contains(c.norm))
                .distinctBy(_.norm).map(_.orig)
              attempt(d, names, Map.empty, extras, ges, aes)
            }.buffered.headOption
        }
      }
    }

    /** Roll ONE aggregate call onto `mv`'s partials, or None if its
      * algebra cannot (DISTINCT, FILTER clauses, non-column inputs,
      * unregistered functions). */
    private def rollup(mv: MvDef, names: Map[ExprId, String],
                       ae: AggregateExpression): Option[Expression] = {
      // a rollup PRODUCT from this same pass: Average expands to a
      // Divide of two fresh aggregates whose children transformDown
      // then revisits — already over MV attributes, pass through
      // (query-side aggregates always reference BASE attrs, so this
      // cannot misfire on user input)
      if (ae.references.nonEmpty &&
          ae.references.subsetOf(AttributeSet(mv.mvPlan.output)))
        return Some(ae)
      if (ae.filter.nonEmpty) return None
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
      // the summary's GROUP-KEY attribute behind a plain base-column
      // reference, if that column is one of the MV's group columns
      def groupAttr(e: Expression): Option[Attribute] = e match {
        case a: AttributeReference =>
          names.get(a.exprId).filter(mv.isGroupCol)
            .flatMap(mv.mvAttrs.get)
        case _ => None
      }
      // Aggregates OVER GROUP COLUMNS evaluate EXACTLY on the summary
      // itself — it holds exactly one row per group combination, so a
      // DISTINCT count over group columns re-counts summary rows
      // (each distinct combination appears once; per-combination
      // duplicates in the raw rows were the point of grouping).
      // count(DISTINCT dimension attrs) is the flagship dashboard
      // distinct, previously a blanket decline.
      if (ae.isDistinct) {
        return ae.aggregateFunction match {
          case c: Count if c.children.nonEmpty &&
              c.children.forall(groupAttr(_).isDefined) =>
            Some(Count(c.children.map(groupAttr(_).get))
              .toAggregateExpression(isDistinct = true))
          case _ => None
        }
      }
      ae.aggregateFunction match {
        case c: Count if c.children == Seq(Literal(1)) =>
          mv.mvAttrs.get("cnt").map(Sum(_).toAggregateExpression())
        // null-aware count(col): rolls on its own partial (count
        // skips nulls, so SUM of per-group null-aware counts is the
        // null-aware count of the union) — or, for a GROUP column,
        // weighs each summary row's combination by its cnt partial
        // (a NULL group value contributes nothing, matching count's
        // null skip; every group has cnt ≥ 1 by construction)
        case c: Count if c.children.size == 1 =>
          partial(c.children.head, mv.aggCols, "cntn_")
            .map(Sum(_).toAggregateExpression())
            .orElse(for {
              g <- groupAttr(c.children.head)
              cnt <- mv.mvAttrs.get("cnt")
            } yield Sum(If(IsNull(g), Literal(0L), cnt))
              .toAggregateExpression())
        case s: Sum =>
          partial(s.child, mv.aggCols, "sum_")
            .map { p =>
              val rolled = Sum(p).toAggregateExpression()
              // DECIMAL sums are exact and order-free, but re-summing
              // the (p+10, s) partials widens the type to (p+20, s) —
              // cast back onto the direct aggregate's own type (value-
              // identity whenever the direct sum doesn't overflow, and
              // the cast restores its session-mode overflow contract).
              // Without this the type-equality guard in attempt()
              // declined every decimal-sum query (r19).
              if (s.child.dataType
                    .isInstanceOf[org.apache.spark.sql.types.DecimalType])
                Cast(rolled, s.dataType)
              else rolled
            }
            // SUM of an INTEGRAL group column: each summary row's key
            // value, weighted by its cnt partial — g*cnt ≡ adding g
            // cnt times even under non-ANSI wraparound (both reduce
            // mod 2^64), and a NULL key contributes NULL so an
            // all-null group sums to NULL exactly like the direct
            // aggregate (0-substitution would return 0 there)
            .orElse {
              val integral = s.child.dataType match {
                case org.apache.spark.sql.types.ByteType |
                     org.apache.spark.sql.types.ShortType |
                     org.apache.spark.sql.types.IntegerType |
                     org.apache.spark.sql.types.LongType => true
                case _ => false
              }
              // ANSI note (r18 ADVICE #5, resolved by contract pin
              // rather than a gate): Multiply/Sum below are built with
              // the SESSION's eval mode, so under ansi.enabled the
              // served spelling RAISES on any product/sum overflow —
              // every case where the direct sum is GUARANTEED to raise
              // (same-sign total past 2^63) overflows here too, so no
              // silent-wrong value exists in either mode (legacy: both
              // wrap mod 2^64; ANSI: both raise). Mixed-sign
              // intermediate overflow raising is order-dependent in
              // the direct spelling ITSELF (partial sums follow
              // partitioning), and the served spelling sits inside
              // that same nondeterminism envelope. MvRewriteSpec pins
              // the both-raise contract.
              if (!integral) None
              else for {
                g <- groupAttr(s.child)
                cnt <- mv.mvAttrs.get("cnt")
              } yield Sum(If(IsNull(g),
                  Literal(null, org.apache.spark.sql.types.LongType),
                  Multiply(Cast(g, org.apache.spark.sql.types.LongType),
                           cnt)))
                .toAggregateExpression()
            }
        case m: Min =>
          partial(m.child, mv.aggCols, "min_")
            .map(Min(_).toAggregateExpression())
            // MIN/MAX of a GROUP column read the summary keys direct
            .orElse(groupAttr(m.child).map(Min(_).toAggregateExpression()))
        case m: Max =>
          partial(m.child, mv.aggCols, "max_")
            .map(Max(_).toAggregateExpression())
            .orElse(groupAttr(m.child).map(Max(_).toAggregateExpression()))
        // AVG over an INTEGRAL column (r17 verdict #7): served as the
        // division of the two rolled legs — the per-group long sums
        // (exact) summed as doubles, over the summed non-null counts.
        // EXACT — bit-equal to the direct aggregate — while every
        // running sum stays under 2^53 (integral values are exact
        // doubles there, and exact additions commute); beyond that
        // BOTH spellings are approximations and may round differently
        // (the rollup's, summing fewer larger exact terms, is at
        // least as accurate) — the documented edge of the serving
        // contract, same reason FRACTIONAL AVG declines outright:
        // double addition is order-sensitive and the partials' order
        // differs from the raw rows'. The division replicates
        // Average's legacy divide (NULL for an all-null group), so
        // null semantics above the aggregate are unchanged.
        // ANSI note (r18 ADVICE #5): no error-contract divergence
        // exists here — Spark's Average over integral inputs sums as
        // DOUBLE (verified: avg of two Long.MaxValue rows under
        // ansi.enabled returns 6.1e18, no raise), so the direct
        // spelling never raises either; the only edge is the >2^53
        // rounding one documented below, shared by both spellings.
        case av: Average
            if Seq(org.apache.spark.sql.types.ByteType,
                   org.apache.spark.sql.types.ShortType,
                   org.apache.spark.sql.types.IntegerType,
                   org.apache.spark.sql.types.LongType)
              .contains(av.child.dataType) =>
          for {
            s <- partial(av.child, mv.aggCols, "sum_")
            c <- partial(av.child, mv.aggCols, "cntn_")
          } yield Divide(
            Sum(Cast(s, org.apache.spark.sql.types.DoubleType))
              .toAggregateExpression(),
            Cast(Sum(c).toAggregateExpression(),
                 org.apache.spark.sql.types.DoubleType),
            EvalMode.LEGACY)
        // AVG over a DECIMAL column (r18 verdict #3): decimal addition
        // is EXACT and order-free (Spark sums decimals exactly, ANSI
        // or not), so Σ(per-group decimal sum partials) equals the
        // direct sum bit-for-bit — unlike the fractional-double
        // decline, there is no rounding order to preserve. The
        // evaluation replicates Average's own: re-cast the rolled
        // total onto Average's internal sum type Decimal(p+10, s)
        // (identity on the value — the partials' values all fit it by
        // the same bound the direct sum honors; the cast also restores
        // the direct spelling's overflow CONTRACT, session-mode null/
        // raise, which the wider rolled type would otherwise defer),
        // then the same legacy Divide by the count at LongDecimal
        // (legacy: an all-null group must yield NULL, not a
        // divide-by-zero error), cast to the query aggregate's OWN
        // result type. Dividing from the (p+10, s) operand — not the
        // rolled (p+20, s) — matters: the division's intermediate
        // scale derives from operand precision, and a wider operand
        // would round the quotient at a different digit before the
        // final cast (a double-rounding divergence at the 10^-scale
        // boundary). MvRewriteSpec pins byte-equality on boundary
        // quotients.
        case av: Average
            if av.child.dataType
              .isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
          val dt = av.child.dataType
            .asInstanceOf[org.apache.spark.sql.types.DecimalType]
          // DecimalType.bounded(p+10, s) spelled inline (bounded is
          // private[sql]); scale never exceeds 38 here since dt is a
          // valid decimal type
          val sumT = org.apache.spark.sql.types.DecimalType(
            math.min(dt.precision + 10, 38), dt.scale)
          for {
            s <- partial(av.child, mv.aggCols, "sum_")
            c <- partial(av.child, mv.aggCols, "cntn_")
          } yield Cast(
            Divide(Cast(Sum(s).toAggregateExpression(), sumT),
                   Cast(Sum(c).toAggregateExpression(),
                        org.apache.spark.sql.types.DecimalType(20, 0)),
                   EvalMode.LEGACY),
            av.dataType)
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
      // the MV attribute whose registered group expression normalizes
      // equal to candidate `cand`
      def lookupNorm(cand: Expression): Option[Attribute] =
        normalize(cand, names).flatMap { n =>
          mv.exprNorms.collectFirst { case (a, ne) if ne == n => a }
            .flatMap(mv.mvAttrs.get)
        }
      // Value-preserving SPELLING bridges (r16 verdict #3): a query
      // bucketing in TIMESTAMP against an MV that stored the DATE
      // spelling (or vice versa) is served through a compensating
      // cast over the stored key. Sound because a day-aligned
      // truncation and its date image are 1:1 in a fixed session
      // timezone (the engine pins UTC, where local midnight always
      // exists and round-trips).
      val dayAligned = Set("DAY", "WEEK", "MONTH", "QUARTER", "YEAR")
      def truncField(e: Expression): Option[String] = e match {
        case TruncTimestamp(Literal(f: UTF8String, StringType), _, _) =>
          Some(canonField(f.toString))
        case _ => None
      }
      def bridge(ie: Expression): Option[Expression] = {
        val tz = Some(conf.sessionLocalTimeZone)
        // the analyzer's spelling of date_trunc('DAY', c): over an
        // ntz column it widens the child to session-zoned timestamp
        def dayTruncOf(c: Expression): Expression = c.dataType match {
          case TimestampType =>
            TruncTimestamp(Literal("DAY"), c, tz)
          case _ =>
            TruncTimestamp(Literal("DAY"), Cast(c, TimestampType, tz), tz)
        }
        ie match {
          // query in timestamp buckets; MV stored the date image
          case t if truncField(t).exists(dayAligned.contains) =>
            lookupNorm(Cast(t, DateType, tz))
              .map(a => Cast(a, TimestampType, tz))
          // query casts a day-aligned bucket to date; MV stored the
          // timestamp spelling
          case Cast(c, DateType, _, _)
              if truncField(c).exists(dayAligned.contains) =>
            lookupNorm(c).map(a => Cast(a, DateType, tz))
          // query takes the plain date of a timestamp (zoned or ntz);
          // MV stored date_trunc('DAY') of it (same date per row)
          case Cast(c, DateType, _, _)
              if c.dataType == TimestampType ||
                 c.dataType == TimestampNTZType =>
            lookupNorm(dayTruncOf(c)).map(a => Cast(a, DateType, tz))
          case _ => None
        }
      }
      // a registered DERIVED group expression matching `e` wholly
      // (normal-form equality after inlining — same computation over
      // the same base columns), directly or through a bridge, or None
      def exprGroupRef(e: Expression): Option[Expression] =
        if (mv.exprNorms.isEmpty) None
        else {
          val ie = inline(e)
          lookupNorm(ie).orElse(bridge(ie))
        }
      // a grouping reference — plain group column, or (possibly
      // alias-hidden) derived group expression — as its MV-plan
      // spelling; the result's type must equal the query's (a bridge
      // that changed the type would corrupt binding above the agg).
      // Memoized: the guard-then-use call sites below would otherwise
      // run inline+normalize+canonicalize twice per matched node on
      // the optimizer hot path.
      val grCache = scala.collection.mutable.HashMap[Expression,
        Option[Expression]]()
      def groupRef(e: Expression): Option[Expression] =
        grCache.getOrElseUpdate(e, (e match {
          case a: AttributeReference
              if names.get(a.exprId).exists(mv.groupCols.contains) =>
            mv.mvAttrs.get(names(a.exprId))
          case other => exprGroupRef(other)
        }).filter(_.dataType == e.dataType))
      val groupAttrs: Seq[Expression] =
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
