package graft.lake

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{
  BaseRelation, CreatableRelationProvider, DataSourceRegister, EqualTo,
  Filter, In, InsertableRelation, Or, PrunedFilteredScan, RelationProvider}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graftlake").load(path)` — the standard Spark source
  * surface over a GraftLake table, so SQL users need no Scala API at all:
  *
  * {{{
  *   -- read (temp view routes through the v1 relation; INSERT works on it)
  *   CREATE TEMPORARY VIEW conv USING graftlake OPTIONS (path '/lake/t');
  *   SELECT * FROM conv WHERE conv_id = 'c3';   -- bucket-pruned
  *   INSERT INTO conv SELECT ...;               -- lands a merged epoch
  * }}}
  *
  * Options: `path` (required); `asOfVersion` (time travel to a retained
  * snapshot); `changesSince` (incremental change feed after a version —
  * rows carry op/_lsn/_commit_version instead of live state).
  *
  * One class registers BOTH source generations, mirroring Spark's own file
  * sources: the [[TableProvider]] (DSv2) surface serves
  * `format("graftlake")` reads — columnar batch scans over compacted
  * buckets, V1-bridged arbitration otherwise ([[GraftLakeV2Table]]) — and
  * `mode("append").save()` writes; the v1 [[RelationProvider]] remains for
  * `CREATE TEMPORARY VIEW ... USING` (a v1-only SQL path) and as the
  * engine-delegating fallback.
  */
final class GraftLakeSource extends RelationProvider with DataSourceRegister
    with CreatableRelationProvider with TableProvider {
  override def shortName(): String = "graftlake"

  // STREAMING READS REQUIRE `startingVersion` (documented break vs the
  // retired v1 source, which defaulted it to 0): a graftlake stream IS the
  // table's CHANGE FEED, whose schema (op, payload, _lsn, _commit_version)
  // differs from the batch table's, and one Table instance cannot honestly
  // advertise both schemas — so MICRO_BATCH_READ is only published in
  // change-feed mode. A `readStream` without the option fails at analysis
  // with Spark's "does not support streamed reading" naming this format.
  // Implementing the v1 StreamSourceProvider hook to prettify that message
  // is NOT an option: Spark's ResolveDataSource prefers it over the
  // TableProvider branch for EVERY streaming load, which would steal the
  // working change-feed path too (verified against 4.1's resolution order).

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graftlake requires a 'path' option"))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    new GraftLakeRelation(sqlContext, pathOf(parameters),
      parameters.get("asOfVersion").map(_.toLong),
      parameters.get("changesSince").map(_.toLong))

  /** v1 write path (`df.write.format("graftlake")` when v2 is bypassed):
    * Append = upsert epoch; Overwrite = ONE atomic generation-swap epoch
    * (tombstone the live state + land the new rows — merge-on-read, history
    * kept, never a directory swap).
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val t = LakeTable.open(sqlContext.sparkSession, pathOf(parameters))
    mode match {
      case SaveMode.Append    => t.appendAsUpserts(data)
      case SaveMode.Overwrite => t.overwriteWith(data)
      case other => throw new IllegalArgumentException(
        s"graftlake supports SaveMode.Append (upsert epoch) and " +
          s"SaveMode.Overwrite (atomic generation swap), got $other")
    }
    createRelation(sqlContext, parameters)
  }

  // ---- DSv2 (TableProvider) ------------------------------------------------

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    v2Table(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    v2Table(new CaseInsensitiveStringMap(properties))

  /** `startingVersion` marks CHANGE-FEED mode (it is `changesSince` under
    * its streaming-conventional name): the table then advertises
    * MICRO_BATCH_READ and `spark.readStream.format("graftlake")
    * .option("path", t).option("startingVersion", 0)` tails the commit log
    * through the DSv2 [[GraftLakeMicroBatchStream]]. The same option on a
    * batch read returns the bounded feed — one mode, two cardinalities.
    */
  private def v2Table(options: CaseInsensitiveStringMap): GraftLakeV2Table = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graftlake requires a 'path' option"))
    val changesSince = Option(options.get("changesSince")).map(_.toLong)
      .orElse(Option(options.get("startingVersion")).map(_.toLong))
    // asOfTimestamp (epoch millis) resolves to a version HERE, once — the
    // non-catalog twin of SQL TIMESTAMP AS OF
    val asOf = Option(options.get("asOfVersion")).map(_.toLong)
      .orElse(Option(options.get("asOfTimestamp")).map(ts =>
        LakeTable.open(SparkSession.active, path).versionAsOfTimestamp(ts.toLong)))
    new GraftLakeV2Table(SparkSession.active, path, asOf, changesSince,
      Option(options.get("maxVersionsPerTrigger")).map(_.toLong),
      // change-feed projection: Spark never column-prunes STREAMING v2
      // relations (V2ScanRelationPushDown skips them), so a consumer
      // selecting 2 of 40 payload columns would read all 40 — the `select`
      // option narrows the feed's schema at the source instead.
      Option(options.get("select"))
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq))
  }
}

final class GraftLakeRelation(override val sqlContext: SQLContext,
                              path: String,
                              asOfVersion: Option[Long],
                              changesSince: Option[Long])
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  require(asOfVersion.isEmpty || changesSince.isEmpty,
    "asOfVersion and changesSince are mutually exclusive")

  // lazy VAL, not def: one relation instance pins one snapshot resolution —
  // a commit landing between schema() and buildScan() must not make the
  // returned rows disagree with the declared schema within one query.
  private lazy val table = LakeTable.open(sqlContext.sparkSession, path)

  override def schema: StructType = {
    // loud on a typo'd path: a read must never come back as a schemaless
    // empty frame (the v1 append path creates the table BEFORE building
    // its relation, so writes to fresh paths still work)
    LakeTable.requireTableAt(path)
    val t = table
    (asOfVersion, changesSince) match {
      // time travel must expose the TARGET snapshot's schema — an older
      // version predating an additive evolution has fewer columns
      case (Some(v), _) => t.readAsOf(v).schema
      case (_, Some(v)) => t.changesSince(v).schema
      case _ => t.currentSnapshot.map(_.schema).getOrElse(StructType(Nil))
    }
  }

  /** conv_id keys a literal equality/IN/OR-of-equality conjunct demands. */
  private def convKeys(filters: Array[Filter]): Option[Seq[String]] = {
    def keysOf(f: Filter): Option[Seq[String]] = f match {
      case EqualTo("conv_id", v: String) => Some(Seq(v))
      case In("conv_id", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        Some(vs.toSeq.map(_.asInstanceOf[String]))
      case Or(l, r) => for { a <- keysOf(l); b <- keysOf(r) } yield a ++ b
      case _ => None
    }
    filters.flatMap(keysOf(_)).headOption
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val t = table
    // Version pinned PER SCAN, not per relation: a relation lives as long
    // as its temp view, and pinning there would freeze every later query
    // at the view's first-scan version; pinning here keeps each query
    // consistent within itself (the scan reads the version it resolved,
    // whenever the RDD materializes) while later queries see later commits.
    val pinnedVersion = t.latestVersion
    val base = (asOfVersion, changesSince) match {
      case (Some(v), _) =>
        convKeys(filters) match {
          case Some(keys) => t.readConvsAsOf(v, keys) // pruned time travel
          case None       => t.readAsOf(v)
        }
      case (_, Some(since)) =>
        // version-bounded at the relation's pin: commits after resolution
        // belong to the next incremental read
        pinnedVersion.fold(t.changesSince(since))(v => t.changesBetween(since, v))
      case _ =>
        (convKeys(filters), pinnedVersion) match {
          case (Some(keys), Some(v)) => t.readConvsAsOf(v, keys) // pruned + pinned
          case (Some(keys), None)    => t.readConvs(keys)
          case (None, Some(v))       => t.readAsOf(v)
          case (None, None)          => t.read()
        }
    }
    // empty requiredColumns = COUNT(*) shape: zero-column rows, right count
    base.select(requiredColumns.map(col).toIndexedSeq: _*).rdd
  }

  /** `INSERT INTO <view USING graftlake>`: append-only upsert epoch through
    * the same idempotent merge as the streaming sink. `INSERT OVERWRITE`
    * lands as one atomic generation-swap epoch.
    */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    require(asOfVersion.isEmpty && changesSince.isEmpty,
      "cannot write through a time-travel or change-feed relation")
    if (overwrite) table.overwriteWith(data)
    else table.appendAsUpserts(data)
  }
}
