package graft.lake

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualTo, Expression, In, InSet, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
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

  /** file path → (tableRoot, bucket), if it matches the GraftLake layout. */
  private val layout = ".*/data/[^/]+/b=(\\d+)/[^/]+$".r

  private def parse(file: String): Option[(String, Int)] = file match {
    case layout(b) =>
      val p = new org.apache.hadoop.fs.Path(file).toUri.getPath
      val root = p.substring(0, p.lastIndexOf("/data/"))
      Some(root -> b.toInt)
    case _ => None
  }

  /** Per-root bucket-count cache: one snapshot read per TABLE, not per query
    * optimization. Safe because a table's bucket layout is immutable —
    * changing it requires rebucket() into a NEW path (enforced by
    * LakeTable.checkBuckets).
    */
  private val nbCache = new java.util.concurrent.ConcurrentHashMap[String, Option[Int]]()

  /** Bucket count from the table's latest snapshot (None ⇒ not a lake). */
  private def numBucketsOf(root: String): Option[Int] =
    nbCache.computeIfAbsent(root, readNumBuckets)

  private def readNumBuckets(root: String): Option[Int] = {
    val snapDir = Paths.get(root, "snapshots")
    if (!Files.isDirectory(snapDir)) return None
    val latest = scala.util.Using.resource(Files.list(snapDir)) { s =>
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .maxByOption(_.substring(1).stripSuffix(".json").toLong)
    }
    latest.flatMap { name =>
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readString(snapDir.resolve(name)))
      Option(node.get("numBuckets")).map(_.asInt)
    }
  }

  /** Literal conv_id keys demanded by the predicate: the intersection of all
    * top-level `conv_id = lit` / `conv_id IN (lits)` conjuncts (an OR arm or
    * non-literal comparison yields None ⇒ no pruning).
    */
  private def requiredKeys(cond: Expression): Option[Set[String]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    def keysOf(e: Expression): Option[Set[String]] = e match {
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, l @ LogicalRelation(rel: HadoopFsRelation, _, _, _, _)) =>
      val rewritten = for {
        keys <- requiredKeys(cond)
        files = rel.location.inputFiles
        parsed <- {
          val ps = files.map(parse)
          if (ps.nonEmpty && ps.forall(_.isDefined)) Some(ps.map(_.get)) else None
        }
        roots = parsed.map(_._1).distinct
        buckets <- {
          val nbs = roots.map(r => r -> numBucketsOf(r)).toMap
          if (nbs.values.forall(_.isDefined))
            Some(roots.map(r =>
              r -> keys.map(LakeTable.bucketOf(_, nbs(r).get))).toMap)
          else None
        }
        pruned = files.zip(parsed).collect {
          case (file, (root, b)) if buckets(root).contains(b) => file
        }
        if pruned.length < files.length // convergent: second pass is a no-op
      } yield {
        val paths = pruned.toIndexedSeq.map(new org.apache.hadoop.fs.Path(_))
        val index = new InMemoryFileIndex(rel.sparkSession, paths,
          Map.empty, Some(rel.dataSchema))
        f.copy(child = l.copy(relation = rel.copy(location = index)(rel.sparkSession)))
      }
      rewritten.getOrElse(f)
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
