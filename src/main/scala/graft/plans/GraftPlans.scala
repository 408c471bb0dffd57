package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LocalRelation, LogicalPlan, Project, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.LakeTable

/** SQL-transparent lake scans: a custom Catalyst leaf [[GraftTableScan]] +
  * an optimizer [[Rule]] that plans it — the (c) tier of the build contract
  * (custom LogicalPlan + Rule, registered through session hooks) used where
  * it genuinely buys something: SQL users (`spark.sql("... WHERE conv_id
  * BETWEEN ...")` over a registered view) get MANIFEST-LEVEL pruning
  * without ever calling the programmatic `LakeTable.scan(convRange)` API.
  *
  * How it plans: the leaf is opaque to every built-in rule, so predicates
  * naturally come to rest in a Filter directly above it. [[PruneGraftScans]]
  * extracts conv_id/turn_idx range conjuncts from that Filter, asks the
  * table's snapshot metadata for the overlapping files (manifests whose
  * persisted range misses the predicate are never opened), and rewrites the
  * leaf into a plain parquet relation over ONLY those files — attribute ids
  * preserved via an aliasing Project, the original Filter retained above,
  * so Spark's FileSourceStrategy still pushes the residual predicate into
  * the Parquet row-group reader. Planning work is metadata-only: the same
  * two-level prune a `scan()` call does, now driven by the optimizer.
  */
final case class GraftTableScan(
    root: String,
    snapshotId: Option[Long],
    output: Seq[Attribute]) extends LeafNode {

  override def computeStats(): Statistics = Statistics(sizeInBytes = BigInt(1) << 30)
}

object GraftPlans {

  /** The table as a DataFrame whose scan is PLANNED BY THE OPTIMIZER —
    * filters applied later (by DataFrame ops or SQL over a temp view) prune
    * at the metadata level. Requires [[install]] once per session.
    */
  def scan(spark: SparkSession, table: LakeTable,
           snapshotId: Option[Long] = None): DataFrame = {
    val snap = snapshotId.map(table.snapshot).orElse(table.currentSnapshot)
      .getOrElse(throw new IllegalStateException("no snapshot to scan"))
    val attrs = snap.schema.toStruct.map(f =>
      AttributeReference(f.name, f.dataType, nullable = true)())
    Bridge.ofRows(spark, GraftTableScan(table.root, Some(snap.id), attrs))
  }

  /** Register the planning rule on an existing session (idempotent). Also
    * installable at session build time via
    * `.config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")`.
    */
  def install(spark: SparkSession): Unit = {
    val has = spark.experimental.extraOptimizations.exists(_.isInstanceOf[PruneGraftScans])
    if (!has)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new PruneGraftScans(spark)
  }
}

/** `spark.sql.extensions` entry point: injects the scan-planning rule into
  * every session built with this class configured.
  */
class GraftSparkExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(session => new PruneGraftScans(session))
}

/** Rewrites [[GraftTableScan]] leaves into pruned parquet relations, using
  * range conjuncts found directly above them.
  */
class PruneGraftScans(spark: SparkSession) extends Rule[LogicalPlan] {

  // transformDown, NOT transformUp: the bare-leaf fallback must only fire
  // when no enclosing Filter claimed the leaf first (up-order would rewrite
  // the leaf unpruned before the Filter case could see it).
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case Filter(cond, g: GraftTableScan) =>
      Filter(cond, pruned(g, cond))
    case Filter(cond, p @ Project(projList, g: GraftTableScan))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      // column pruning may slide a plain Project between filter and leaf
      Filter(cond, p.copy(child = pruned(g, cond)))
    case g: GraftTableScan => rewrite(g)
  }

  private def pruned(g: GraftTableScan, cond: Expression): LogicalPlan = {
    val (cLo, cHi) = rangeOf(cond, "conv_id", stringDomain = true)
    val (tLo, tHi) = rangeOf(cond, "turn_idx", stringDomain = false)
    rewrite(g,
      Bounds(cLo.map(_.toString), cHi.map(_.toString)),
      Bounds(tLo.map(_.asInstanceOf[Int]), tHi.map(_.asInstanceOf[Int])))
  }

  /** Conservative range extraction: only top-level AND conjuncts of
    * =, >=, <=, >, <, BETWEEN comparing the BARE named column (no Cast —
    * a coerced comparison evaluates in a different ordering domain than
    * the string/int manifest stats, so pruning on it would be WRONG, e.g.
    * turn_idx vs a BIGINT beyond Int range, or conv_id vs a number) against
    * a literal of the column's own stats type (String for conv_id, integral
    * within Int range for turn_idx). Anything else simply stays residual
    * (correct, just unpruned).
    */
  private def rangeOf(cond: Expression, name: String,
                      stringDomain: Boolean): (Option[Any], Option[Any]) = {
    def lit(e: Expression): Option[Any] = e match {
      case Literal(v: UTF8String, StringType) if stringDomain => Some(v.toString)
      case Literal(v: Int, _) if !stringDomain => Some(v)
      case Literal(v: Long, _) if !stringDomain &&
        v >= Int.MinValue && v <= Int.MaxValue => Some(v.toInt)
      case Literal(v: Short, _) if !stringDomain => Some(v.toInt)
      case _ => None
    }
    def isCol(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == name
      case _ => false
    }
    var lo: Option[Any] = None
    var hi: Option[Any] = None
    def bound(l: Option[Any] = None, h: Option[Any] = None): Unit = {
      l.foreach(v => lo = Some(lo.fold(v)(cur => maxOf(cur, v))))
      h.foreach(v => hi = Some(hi.fold(v)(cur => minOf(cur, v))))
    }
    def walk(e: Expression): Unit = e match {
      case And(a, b) => walk(a); walk(b)
      case EqualTo(c, v) if isCol(c) => lit(v).foreach(x => bound(Some(x), Some(x)))
      case EqualTo(v, c) if isCol(c) => lit(v).foreach(x => bound(Some(x), Some(x)))
      case GreaterThanOrEqual(c, v) if isCol(c) => bound(l = lit(v))
      case GreaterThan(c, v) if isCol(c) => bound(l = lit(v))
      case LessThanOrEqual(c, v) if isCol(c) => bound(h = lit(v))
      case LessThan(c, v) if isCol(c) => bound(h = lit(v))
      case GreaterThanOrEqual(v, c) if isCol(c) => bound(h = lit(v))
      case GreaterThan(v, c) if isCol(c) => bound(h = lit(v))
      case LessThanOrEqual(v, c) if isCol(c) => bound(l = lit(v))
      case LessThan(v, c) if isCol(c) => bound(l = lit(v))
      case _ => ()
    }
    walk(cond)
    (lo, hi) // one-sided bounds prune too (e.g. conv_id >= 'u999990')
  }

  private def maxOf(a: Any, b: Any): Any = (a, b) match {
    case (x: String, y: String) => if (x >= y) x else y
    case (x, y) => if (toLong(x) >= toLong(y)) x else y
  }
  private def minOf(a: Any, b: Any): Any = (a, b) match {
    case (x: String, y: String) => if (x <= y) x else y
    case (x, y) => if (toLong(x) <= toLong(y)) x else y
  }
  private def toLong(v: Any): Long = v match {
    case i: Int => i.toLong; case l: Long => l; case o => o.toString.toLong
  }

  /** Possibly one-sided bounds; a missing side never prunes. */
  private case class Bounds[T](lo: Option[T], hi: Option[T]) {
    def overlaps(mn: Option[T], mx: Option[T])(implicit ord: Ordering[T]): Boolean =
      (mn, mx) match {
        case (Some(a), Some(b)) =>
          lo.forall(l => ord.gteq(b, l)) && hi.forall(h => ord.lteq(a, h))
        case _ => true // missing stats: always scanned (safe)
      }
  }

  private def rewrite(g: GraftTableScan,
                      convR: Bounds[String] = Bounds(None, None),
                      turnR: Bounds[Int] = Bounds(None, None)): LogicalPlan = {
    val table = LakeTable.load(spark, g.root)
    val snap = g.snapshotId.map(table.snapshot)
      .getOrElse(table.currentSnapshot.get)
    val overlapping = snap.manifests.filter { r =>
      convR.overlaps(r.minConv, r.maxConv) && turnR.overlaps(r.minTurn, r.maxTurn)
    }
    val selected = overlapping.flatMap(r => table.manifest(r.path).entries)
      .filter { f =>
        convR.overlaps(f.minConv, f.maxConv) && turnR.overlaps(f.minTurn, f.maxTurn)
      }
    val st = snap.schema.toStruct
    val rel: LogicalPlan =
      if (selected.isEmpty) LocalRelation(g.output)
      else {
        val base = Bridge.planOf(
          spark.read.schema(st).parquet(selected.map(f => table.absData(f.path)): _*))
        // preserve the leaf's attribute ids for everything referencing them
        Project(base.output.zip(g.output).map { case (n, o) =>
          Alias(n, o.name)(exprId = o.exprId)
        }, base)
      }
    rel
  }
}
