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
    output: Seq[Attribute],
    sizeInBytes: Long = 0L,
    rowCount: Long = -1L) extends LeafNode {

  /** Real statistics from the snapshot's persisted manifest byte/row sums
    * (filled by [[GraftPlans.scan]] — O(1) metadata, no manifest opens), so
    * joins against the lake view size it correctly: a small table
    * broadcasts, a huge one never does. Parquet bytes under-state the
    * in-memory row size, so the (compressed, columnar) size is scaled by
    * the session's compression factor the way LogicalRelation does for
    * file relations. Snapshots from before byte sums were persisted report
    * 0 — fall back to a deliberately LARGE size (1 GiB): the safe failure
    * mode is a missed broadcast, never an OOM'd one.
    */
  override def computeStats(): Statistics = {
    if (sizeInBytes <= 0L) Statistics(sizeInBytes = BigInt(1) << 30)
    else {
      val factor = conf.fileCompressionFactor
      Statistics(
        sizeInBytes = BigInt(math.max(1L, (sizeInBytes * factor).toLong)),
        rowCount = if (rowCount >= 0) Some(BigInt(rowCount)) else None)
    }
  }
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
    // Byte sums are trusted ONLY when every non-empty manifest reports
    // them: a mixed table (legacy pre-bytes manifests carried verbatim by
    // commitDelta + one post-upgrade manifest) would otherwise report just
    // the new slice — a massive UNDERSTATEMENT whose failure mode is a
    // wrongly-broadcast huge table. All-or-nothing keeps the fallback
    // (1 GiB, never broadcast) until a manifest rewrite refreshes stats.
    val allHaveBytes = snap.manifests.forall(r => r.entryCount == 0 || r.bytes > 0)
    // An explicitly pinned snapshot id stays pinned (VERSION AS OF); a
    // None stays None IN THE LEAF so the planning rule re-resolves the
    // CURRENT snapshot at every query — a registered "live" view must not
    // freeze at registration time.
    Bridge.ofRows(spark, GraftTableScan(table.root, snapshotId, attrs,
      sizeInBytes = if (allHaveBytes) snap.manifests.map(_.bytes).sum else 0L,
      rowCount = snap.manifests.map(_.rows).sum))
  }

  /** The table's committed snapshot history as a DataFrame, newest first —
    * the reference's created_at-ordered metadata listing
    * (file_repository.py:112-118) lifted to a queryable relation. Driver-side
    * metadata only (O(snapshots)); orphan snap files of crashed commits are
    * excluded, exactly as [[graft.lake.LakeTable.committedSnapshots]] reads.
    */
  def snapshots(spark: SparkSession, table: LakeTable): DataFrame = {
    import spark.implicits._
    table.committedSnapshots.sortBy(-_.id).map { s =>
      (s.id, s.parentId, s.sequence, new java.sql.Timestamp(s.timestampMs),
        s.operation, s.manifests.map(_.entryCount).sum,
        s.manifests.map(_.rows).sum, s.manifests.map(_.bytes).sum)
    }.toDF("snapshot_id", "parent_id", "sequence", "committed_at", "operation",
      "n_files", "n_rows", "n_bytes")
  }

  /** Register the SQL surface for a lake table: `<name>` is a LIVE view —
    * the scan leaf carries no pinned snapshot id, so [[PruneGraftScans]]
    * re-resolves the CURRENT snapshot at every query and later commits are
    * visible without re-registration (pin explicitly with [[registerAsOf]]).
    * `<name>_snapshots` lists the committed history AS OF REGISTRATION
    * (it is a materialized metadata listing; re-run registerTable to
    * refresh) — a SQL user picks a version from it and opens it with
    * [[registerAsOf]].
    */
  def registerTable(spark: SparkSession, table: LakeTable, name: String): Unit = {
    install(spark)
    scan(spark, table).createOrReplaceTempView(name)
    snapshots(spark, table).createOrReplaceTempView(s"${name}_snapshots")
  }

  /** SQL time travel: register view `name` pinned at `snapshotId`
    * (VERSION AS OF) or at the newest snapshot committed at-or-before
    * `asOfTsMs` (TIMESTAMP AS OF). The pinned view stays metadata-pruned
    * like any scan; maintenance committing newer snapshots never disturbs
    * it (immutable files + versioned metadata).
    */
  def registerAsOf(spark: SparkSession, table: LakeTable, name: String,
                   snapshotId: Option[Long] = None,
                   asOfTsMs: Option[Long] = None): Unit = {
    install(spark)
    val sid = snapshotId.orElse(asOfTsMs.map(ts =>
      table.snapshotAsOf(ts).getOrElse(throw new IllegalArgumentException(
        s"no committed snapshot at or before $ts in ${table.root}")).id))
    scan(spark, table, sid).createOrReplaceTempView(name)
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

/** Possibly one-sided bounds; a missing side never prunes. */
private[plans] final case class Bounds[T](lo: Option[T], hi: Option[T]) {
  def overlaps(mn: Option[T], mx: Option[T])(implicit ord: Ordering[T]): Boolean =
    (mn, mx) match {
      case (Some(a), Some(b)) =>
        lo.forall(l => ord.gteq(b, l)) && hi.forall(h => ord.lteq(a, h))
      case _ => true // missing stats: always scanned (safe)
    }
  def isAll: Boolean = lo.isEmpty && hi.isEmpty
  def intersect(o: Bounds[T])(implicit ord: Ordering[T]): Option[Bounds[T]] = {
    val nlo = (lo.toSeq ++ o.lo.toSeq).reduceOption(ord.max(_, _))
    val nhi = (hi.toSeq ++ o.hi.toSeq).reduceOption(ord.min(_, _))
    (nlo, nhi) match {
      case (Some(a), Some(b)) if ord.gt(a, b) => None // statically empty
      case _ => Some(Bounds(nlo, nhi))
    }
  }
}

/** One (conv range x turn range) box of the interval DNF. */
private[plans] final case class Conj(conv: Bounds[String], turn: Bounds[Int]) {
  def isAll: Boolean = conv.isAll && turn.isAll
  def intersect(o: Conj): Option[Conj] =
    for { c <- conv.intersect(o.conv); t <- turn.intersect(o.turn) } yield Conj(c, t)
}
private[plans] object Conj {
  val all: Conj = Conj(Bounds(None, None), Bounds(None, None))
}

/** Rewrites [[GraftTableScan]] leaves into pruned parquet relations, using
  * range/IN/OR predicates found directly above them.
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

  private def pruned(g: GraftTableScan, cond: Expression): LogicalPlan =
    rewrite(g, extract(cond))

  /** Conservative INTERVAL-DNF extraction: the predicate becomes a union of
    * (conv range x turn range) boxes; a file is scanned iff its stats
    * overlap ANY box. Handles AND (box intersection, cross-product),
    * OR (box union), =, >=, <=, >, <, BETWEEN, IN / InSet — always
    * comparing the BARE named column (no Cast — a coerced comparison
    * evaluates in a different ordering domain than the string/int manifest
    * stats, so pruning on it would be WRONG, e.g. turn_idx vs a BIGINT
    * beyond Int range, or conv_id vs a number) against literals of the
    * column's own stats type. Anything unrecognized degrades to the
    * EVERYTHING box at exactly that subtree — an unknown OR arm keeps the
    * whole disjunction unpruned (correct), an unknown AND arm just stays
    * residual. Box counts are capped (64): a pathological predicate falls
    * back to a full (correct, unpruned) scan rather than exploding the
    * planner.
    */
  private[plans] def extract(cond: Expression): Seq[Conj] = {
    val MaxBoxes = 64
    def convLit(e: Expression): Option[String] = e match {
      case Literal(v: UTF8String, StringType) => Some(v.toString)
      case _ => None
    }
    def turnLit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case Literal(v: Long, _) if v >= Int.MinValue && v <= Int.MaxValue => Some(v.toInt)
      case Literal(v: Short, _) => Some(v.toInt)
      case _ => None
    }
    def isCol(e: Expression, name: String): Boolean = e match {
      case a: AttributeReference => a.name == name
      case _ => false
    }
    def conv(lo: Option[String], hi: Option[String]) =
      Seq(Conj(Bounds(lo, hi), Bounds[Int](None, None)))
    def turn(lo: Option[Int], hi: Option[Int]) =
      Seq(Conj(Bounds[String](None, None), Bounds(lo, hi)))
    val all = Seq(Conj.all)

    def go(e: Expression): Seq[Conj] = e match {
      case And(a, b) =>
        val (da, db) = (go(a), go(b))
        if (da.size.toLong * db.size > MaxBoxes) all
        else for { x <- da; y <- db; m <- x.intersect(y) } yield m
      case Or(a, b) =>
        val u = go(a) ++ go(b)
        if (u.size > MaxBoxes || u.exists(_.isAll)) all else u

      case In(c, vs) if isCol(c, "conv_id") =>
        val pts = vs.map(convLit)
        if (pts.forall(_.isDefined) && pts.size <= MaxBoxes)
          pts.flatten.flatMap(v => conv(Some(v), Some(v))) else all
      case In(c, vs) if isCol(c, "turn_idx") =>
        val pts = vs.map(turnLit)
        if (pts.forall(_.isDefined) && pts.size <= MaxBoxes)
          pts.flatten.flatMap(v => turn(Some(v), Some(v))) else all
      case InSet(c, hs) if isCol(c, "conv_id") && hs.size <= MaxBoxes =>
        val pts = hs.toSeq.map {
          case v: UTF8String => Some(v.toString)
          case v: String => Some(v)
          case _ => None
        }
        if (pts.forall(_.isDefined))
          pts.flatten.sorted.flatMap(v => conv(Some(v), Some(v))) else all
      case InSet(c, hs) if isCol(c, "turn_idx") && hs.size <= MaxBoxes =>
        val pts = hs.toSeq.map {
          case v: Int => Some(v)
          case v: Long if v >= Int.MinValue && v <= Int.MaxValue => Some(v.toInt)
          case _ => None
        }
        if (pts.forall(_.isDefined))
          pts.flatten.sorted.flatMap(v => turn(Some(v), Some(v))) else all

      case EqualTo(c, v) if isCol(c, "conv_id") =>
        convLit(v).map(x => conv(Some(x), Some(x))).getOrElse(all)
      case EqualTo(v, c) if isCol(c, "conv_id") =>
        convLit(v).map(x => conv(Some(x), Some(x))).getOrElse(all)
      case EqualTo(c, v) if isCol(c, "turn_idx") =>
        turnLit(v).map(x => turn(Some(x), Some(x))).getOrElse(all)
      case EqualTo(v, c) if isCol(c, "turn_idx") =>
        turnLit(v).map(x => turn(Some(x), Some(x))).getOrElse(all)

      case GreaterThanOrEqual(c, v) if isCol(c, "conv_id") => conv(convLit(v), None)
      case GreaterThan(c, v) if isCol(c, "conv_id") => conv(convLit(v), None)
      case LessThanOrEqual(c, v) if isCol(c, "conv_id") => conv(None, convLit(v))
      case LessThan(c, v) if isCol(c, "conv_id") => conv(None, convLit(v))
      case GreaterThanOrEqual(v, c) if isCol(c, "conv_id") => conv(None, convLit(v))
      case GreaterThan(v, c) if isCol(c, "conv_id") => conv(None, convLit(v))
      case LessThanOrEqual(v, c) if isCol(c, "conv_id") => conv(convLit(v), None)
      case LessThan(v, c) if isCol(c, "conv_id") => conv(convLit(v), None)

      case GreaterThanOrEqual(c, v) if isCol(c, "turn_idx") => turn(turnLit(v), None)
      case GreaterThan(c, v) if isCol(c, "turn_idx") => turn(turnLit(v), None)
      case LessThanOrEqual(c, v) if isCol(c, "turn_idx") => turn(None, turnLit(v))
      case LessThan(c, v) if isCol(c, "turn_idx") => turn(None, turnLit(v))
      case GreaterThanOrEqual(v, c) if isCol(c, "turn_idx") => turn(None, turnLit(v))
      case GreaterThan(v, c) if isCol(c, "turn_idx") => turn(None, turnLit(v))
      case LessThanOrEqual(v, c) if isCol(c, "turn_idx") => turn(turnLit(v), None)
      case LessThan(v, c) if isCol(c, "turn_idx") => turn(turnLit(v), None)

      case _ => all
    }
    go(cond)
  }

  private def rewrite(g: GraftTableScan,
                      conjs: Seq[Conj] = Seq(Conj.all)): LogicalPlan = {
    val table = LakeTable.load(spark, g.root)
    val snap = g.snapshotId.map(table.snapshot)
      .getOrElse(table.currentSnapshot.get)
    // a file/manifest is scanned iff ANY box overlaps its stats; an EMPTY
    // box list (statically unsatisfiable predicate) scans nothing
    val overlapping = snap.manifests.filter { r =>
      conjs.exists(c => c.conv.overlaps(r.minConv, r.maxConv) &&
        c.turn.overlaps(r.minTurn, r.maxTurn))
    }
    val selected = overlapping.flatMap(r => table.manifest(r.path).entries)
      .filter { f =>
        conjs.exists(c => c.conv.overlaps(f.minConv, f.maxConv) &&
          c.turn.overlaps(f.minTurn, f.maxTurn))
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
