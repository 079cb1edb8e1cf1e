package graft.lake

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualNullSafe, EqualTo, Expression, In, InSet,
  Literal, Or}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.StringType

/** Automatic bucket pruning (SURVEY §2.1 S5, the engine's analog of the
  * reference's config-driven page pruning,
  * processors/DocumentProcessor.java:220-253): a literal `conv_id` equality
  * or IN predicate over a GraftLake scan keeps only the files of the buckets
  * those keys hash to — `table.read().where($"conv_id" === "x")` then lists
  * and opens 1/numBuckets of the table, with no bespoke lookup API.
  *
  * Spark-first shape: a `Rule[LogicalPlan]` in the optimizer's user batch.
  * By that point Catalyst has already pushed the filter through the MOR
  * union and (because conv_id is the window partition key) below the
  * arbitration Window, so the rule only has to match the primitive
  * `Filter(conv_id ∈ lits, scan)` — both the clean and dirty branches prune
  * independently, and arbitration semantics are untouched (dropping other
  * conversations' files cannot change a per-conversation winner).
  *
  * A scan is recognized as a GraftLake table structurally: every file lives
  * under `<root>/data/<epoch>/b=<bucket>/` with a `<root>/snapshots/`
  * directory beside it; the bucket count comes from the latest snapshot
  * (the writer's layout contract), so the rule and the writer can never
  * disagree. The Filter itself stays in place — rows of other conversations
  * sharing the bucket must still be filtered out.
  *
  * Registered automatically by [[LakeTable]] via
  * `spark.experimental.extraOptimizations` (idempotent), or through
  * `spark.sql.extensions=graft.lake.GraftLakeExtensions`.
  */
object BucketPrune extends Rule[LogicalPlan] {

  /** file path → (tableRoot, bucket), if it matches the GraftLake layout
    * (split-format compaction adds an optional __dead= routing dir). */
  private val layout = ".*/data/[^/]+/b=(\\d+)(?:/__dead=(?:true|false))?/[^/]+$".r

  private def parse(file: String): Option[(String, Int)] = file match {
    case layout(b) =>
      val p = new org.apache.hadoop.fs.Path(file).toUri.getPath
      val root = p.substring(0, p.lastIndexOf("/data/"))
      Some(root -> b.toInt)
    case _ => None
  }

  /** Per-root bucket-count cache, VALIDATED against the latest snapshot
    * file's IDENTITY (name + inode + mtime) on every apply: a LIVE table's
    * layout is immutable (LakeTable.checkBuckets), but nothing stops a test
    * or an ops runbook from deleting and recreating a table at the same path
    * with a different bucket count in one session — a count cached
    * unconditionally would then prune with the stale layout and silently
    * drop the rows of every key whose new bucket differs. The name alone is
    * not enough either: a recreated table's first snapshot is ALSO
    * v0000000001.json — the inode distinguishes the new file. One
    * `Files.list` + one attrs stat per optimization is noise next to the
    * scan it prunes; the snapshot JSON is only re-parsed when the latest
    * snapshot actually changed.
    */
  private val nbCache =
    new java.util.concurrent.ConcurrentHashMap[String, (AnyRef, Option[Int])]()

  private def snapIdentity(snap: java.nio.file.Path): AnyRef = {
    val a = Files.readAttributes(snap,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    (snap.getFileName.toString, Option(a.fileKey), a.lastModifiedTime, a.size)
  }

  /** Bucket count from the table's latest snapshot (None ⇒ not a lake). */
  private def numBucketsOf(root: String): Option[Int] = {
    val snapDir = Paths.get(root, "snapshots")
    if (!Files.isDirectory(snapDir)) return None
    val latest = scala.util.Using.resource(Files.list(snapDir)) { s =>
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .maxByOption(_.substring(1).stripSuffix(".json").toLong)
    }
    latest.flatMap { name =>
      val id = snapIdentity(snapDir.resolve(name))
      val cached = nbCache.get(root)
      if (cached != null && cached._1 == id) cached._2
      else {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(Files.readString(snapDir.resolve(name)))
        val nb = Option(node.get("numBuckets")).map(_.asInt)
        nbCache.put(root, (id, nb))
        nb
      }
    }
  }

  /** Literal conv_id keys demanded by the predicate: the intersection of all
    * top-level conjuncts that constrain conv_id, where a conjunct may be an
    * equality, an IN list, or a DISJUNCTION of such (SQL generators emit
    * `conv_id='a' OR conv_id='b'` where a human writes IN — the keys of a
    * disjunction of equalities are just the union). A conjunct mixing in any
    * non-conv_id-literal arm yields None for that conjunct ⇒ it contributes
    * no pruning (others still can).
    */
  private def requiredKeys(cond: Expression): Option[Set[String]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    def keysOf(e: Expression): Option[Set[String]] = e match {
      case Or(l, r) =>
        for { a <- keysOf(l); b <- keysOf(r) } yield a union b
      case EqualTo(a: AttributeReference, Literal(v, StringType))
        if a.name == "conv_id" && v != null => Some(Set(v.toString))
      case EqualTo(Literal(v, StringType), a: AttributeReference)
        if a.name == "conv_id" && v != null => Some(Set(v.toString))
      case In(a: AttributeReference, vs)
        if a.name == "conv_id" && vs.nonEmpty && vs.forall {
          case Literal(v, StringType) => v != null
          case _                      => false
        } => Some(vs.map { case Literal(v, _) => v.toString }.toSet)
      case InSet(a: AttributeReference, vs)
        if a.name == "conv_id" && a.dataType == StringType && !vs.contains(null) =>
        Some(vs.map(_.toString))
      case _ => None
    }
    conjuncts(cond).flatMap(keysOf) match {
      case Nil  => None
      case sets => Some(sets.reduce(_ intersect _))
    }
  }

  /** The relation with its file index pruned to `keys`' buckets, or None
    * when nothing prunes (not a lake layout, unknown bucket count, or
    * already pruned — the None keeps fixed-point batches convergent). */
  private def pruneRelationTo(l: LogicalRelation, rel: HadoopFsRelation,
                              keys: Set[String]): Option[LogicalRelation] = {
    val files = rel.location.inputFiles
    val ps = files.map(parse)
    if (ps.isEmpty || !ps.forall(_.isDefined)) return None
    val parsed = ps.map(_.get)
    val roots = parsed.map(_._1).distinct
    val nbs = roots.map(r => r -> numBucketsOf(r)).toMap
    if (!nbs.values.forall(_.isDefined)) return None
    val buckets =
      roots.map(r => r -> keys.map(LakeTable.bucketOf(_, nbs(r).get))).toMap
    val pruned = files.zip(parsed).collect {
      case (file, (root, b)) if buckets(root).contains(b) => file
    }
    if (pruned.length >= files.length) None // convergent: second pass no-ops
    else {
      val paths = pruned.toIndexedSeq.map(new org.apache.hadoop.fs.Path(_))
      val index = new InMemoryFileIndex(rel.sparkSession, paths,
        Map.empty, Some(rel.dataSchema))
      Some(l.copy(relation = rel.copy(location = index)(rel.sparkSession)))
    }
  }

  /** Marks the MOR arbitration joins [[LakeTable.arbitrateDirty]] plans:
    * an anti/semi join whose condition null-safe-equates `conv_id` to one
    * of the engine's internal aliases. Scoped to those exact names so the
    * cross-join propagation below can never misfire on a user's own join
    * (where pruning one side by the other side's keys would be unsound —
    * e.g. a self-join comparing different conversations). */
  private def isArbitrationBridge(cond: Expression): Boolean = cond.exists {
    case EqualNullSafe(a: AttributeReference, b: AttributeReference) =>
      Set(a.name, b.name).contains("conv_id") &&
        (Set(a.name, b.name) - "conv_id")
          .subsetOf(Set("__d_conv_id", "__b_conv_id"))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, l @ LogicalRelation(rel: HadoopFsRelation, _, _, _, _)) =>
      (for {
        keys <- requiredKeys(cond)
        nl <- pruneRelationTo(l, rel, keys)
      } yield f.copy(child = nl)).getOrElse(f)

    // The MOR arbitration joins: by the time this batch runs, Catalyst has
    // pushed the user's conv_id filter into the join's LEFT (streamed)
    // subtree, but the BROADCAST side — the delta key/lsn aggregate, the
    // winners window, the beaten-key scan — gets nothing pushed across an
    // anti/semi join. The bridge condition equates conv_id across the two
    // sides, and keys are bucket-routed, so a right-side file in a bucket
    // none of the demanded keys hash to can never influence a surviving
    // row: prune every lake relation in the right subtree to those
    // buckets. Keyed point reads on a DIRTY table then stay one-bucket
    // reads, exactly as they were under the pre-broadcast window shape.
    case j @ Join(left, right, jt, Some(cond), _)
        if (jt == LeftAnti || jt == LeftSemi) && isArbitrationBridge(cond) =>
      val keys = left.collect { case Filter(c, _) => requiredKeys(c) }
        .flatten.reduceOption(_ union _)
      keys match {
        case None => j
        case Some(ks) =>
          val newRight = right transform {
            case l @ LogicalRelation(rel: HadoopFsRelation, _, _, _, _) =>
              pruneRelationTo(l, rel, ks).getOrElse(l)
          }
          if (newRight fastEquals right) j else j.copy(right = newRight)
      }
  }
}

/** `spark.sql.extensions=graft.lake.GraftLakeExtensions` — injects
  * [[BucketPrune]] for sessions configured up front. (Tables opened through
  * [[LakeTable]] self-register the rule either way.)
  */
class GraftLakeExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => BucketPrune)
}
