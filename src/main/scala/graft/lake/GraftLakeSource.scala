package graft.lake

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{
  BaseRelation, DataSourceRegister, EqualTo, Filter, In, PrunedFilteredScan,
  RelationProvider}
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graftlake").load(path)` — the standard Spark source
  * surface over a GraftLake table, so SQL users need no Scala API at all:
  *
  * {{{
  *   CREATE TEMPORARY VIEW conv USING graftlake OPTIONS (path '/lake/t');
  *   SELECT * FROM conv WHERE conv_id = 'c3';   -- bucket-pruned
  * }}}
  *
  * Options: `path` (required); `asOfVersion` (time travel to a retained
  * snapshot); `changesSince` (incremental change feed after a version —
  * rows carry op/_lsn/_commit_version instead of live state).
  *
  * Implementation: a v1 `PrunedFilteredScan` relation delegating to the
  * engine's own read paths — literal conv_id equality/IN filters route
  * through the bucket-pruned lookup (readConvs), everything else through
  * the merge-on-read plan; Spark re-applies all filters above, so routing
  * is purely a pruning decision and can never change results. Column
  * pruning happens before `.rdd`, so the parquet scans read only the
  * requested columns.
  */
final class GraftLakeSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graftlake"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graftlake requires a 'path' option"))
    new GraftLakeRelation(sqlContext, path,
      parameters.get("asOfVersion").map(_.toLong),
      parameters.get("changesSince").map(_.toLong))
  }
}

final class GraftLakeRelation(override val sqlContext: SQLContext,
                              path: String,
                              asOfVersion: Option[Long],
                              changesSince: Option[Long])
    extends BaseRelation with PrunedFilteredScan {

  require(asOfVersion.isEmpty || changesSince.isEmpty,
    "asOfVersion and changesSince are mutually exclusive")

  // lazy VAL, not def: one relation instance pins one snapshot resolution —
  // a commit landing between schema() and buildScan() must not make the
  // returned rows disagree with the declared schema within one query.
  private lazy val table = LakeTable.open(sqlContext.sparkSession, path)

  override def schema: StructType = {
    val t = table
    (asOfVersion, changesSince) match {
      // time travel must expose the TARGET snapshot's schema — an older
      // version predating an additive evolution has fewer columns
      case (Some(v), _) => t.readAsOf(v).schema
      case (_, Some(v)) => t.changesSince(v).schema
      case _ => t.currentSnapshot.map(_.schema).getOrElse(StructType(Nil))
    }
  }

  /** conv_id keys a literal equality/IN conjunct demands, if any. */
  private def convKeys(filters: Array[Filter]): Option[Seq[String]] =
    filters.collectFirst {
      case EqualTo("conv_id", v: String) => Seq(v)
      case In("conv_id", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        vs.toSeq.map(_.asInstanceOf[String])
    }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val t = table
    val base = (asOfVersion, changesSince) match {
      case (Some(v), _) => t.readAsOf(v)
      case (_, Some(v)) => t.changesSince(v)
      case _ =>
        convKeys(filters) match {
          case Some(keys) => t.readConvs(keys) // bucket-pruned lookup
          case None       => t.read()
        }
    }
    // empty requiredColumns = COUNT(*) shape: zero-column rows, right count
    base.select(requiredColumns.map(col).toIndexedSeq: _*).rdd
  }
}
