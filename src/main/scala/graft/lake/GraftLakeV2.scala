package graft.lake

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.{
  Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns,
  V1Scan}
import org.apache.spark.sql.connector.write.{
  LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{
  BaseRelation, EqualTo, Filter, In, InsertableRelation, Or, TableScan}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 surface of a GraftLake table (SURVEY §2.1 — the SQL-user
  * contract, the engine's analog of the reference's options.json published
  * surface, /root/reference/options.json:1-253).
  *
  * Read strategy, chosen PER SCAN from the pinned snapshot:
  *
  *  - **Columnar fast path**: when every selected bucket is compacted
  *    (no deltas) with split-format bases (tombstones in separate files —
  *    [[LakeTable.BucketState.pureBase]]), the scan IS Spark's own
  *    vectorized parquet batch scan over exactly the pruned live files:
  *    whole-stage codegen, columnar batches, no per-row `Row` boundary.
  *    Pushed literal conv_id equality/IN/OR-of-equality predicates prune the
  *    FILE LIST to the matching buckets before the index is built. This is
  *    the steady state at scale — maintenance compacts, then analytics scan.
  *
  *  - **Arbitration fallback**: buckets carrying deltas need merge-on-read
  *    arbitration (a per-key window — a query plan, not a file scan), so the
  *    scan bridges to the engine's read plan through the public
  *    [[org.apache.spark.sql.connector.read.V1Scan]] API. Correct always,
  *    row-based only while a bucket is between ingest and compaction.
  *
  * Write: `INSERT INTO` / `df.write.format("graftlake").mode("append")`
  * lands as an idempotent epoch through [[LakeTable.appendAsUpserts]] (a
  * `V1Write` — the merge is itself a Spark job, so the v1 bridge is the
  * faithful contract, not a compromise).
  */
/** v1 `Filter` → `Column` for the predicates SQL `DELETE FROM` pushes.
  * Total over the published Filter algebra minus subquery-ish shapes; an
  * untranslatable filter makes `canDeleteWhere` answer false (loud plan-time
  * refusal, never a partial delete).
  */
private[lake] object FilterToColumn {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, not}
  import org.apache.spark.sql.sources._

  def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case StringContains(a, v)     => Some(col(a).contains(v))
    case And(l, r) => for { a <- translate(l); b <- translate(r) } yield a && b
    case Or(l, r)  => for { a <- translate(l); b <- translate(r) } yield a || b
    case Not(c)    => translate(c).map(not)
    case _: AlwaysTrue  => Some(lit(true))
    case _: AlwaysFalse => Some(lit(false))
    case _ => None
  }

  def translateAll(fs: Array[Filter]): Option[Column] = {
    val cols = fs.map(translate)
    if (cols.exists(_.isEmpty)) None
    else Some(cols.flatten.foldLeft(lit(true))(_ && _))
  }
}

final class GraftLakeV2Table(spark: SparkSession, path: String,
                             asOfVersion: Option[Long],
                             changesSince: Option[Long],
                             maxVersionsPerTrigger: Option[Long] = None,
                             /** change-feed column projection (the `select`
                               * option): streaming relations see no Catalyst
                               * column pruning, so the narrowing happens in
                               * the declared feed schema itself. */
                             selectCols: Option[Seq[String]] = None,
                             /** true when loaded through [[GraftCatalog]]:
                               * only then can a declared write distribution
                               * name the catalog's `bucket` function —
                               * path-based relations have no FunctionCatalog
                               * to resolve the transform against, and a
                               * distribution they cannot resolve would fail
                               * the whole write at analysis. */
                             viaCatalog: Boolean = false)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** SQL `MERGE INTO` / `UPDATE` / subquery-`DELETE` (delta-based row-level
    * operations — [[GraftRowLevelOperation]]). Predicate-only DELETEs still
    * take the cheaper metadata path: Spark's
    * OptimizeMetadataOnlyDeleteFromTable converts back to [[deleteWhere]]
    * whenever [[canDeleteWhere]] accepts the filters.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(asOfVersion.isEmpty && changesSince.isEmpty,
      "cannot MERGE/UPDATE/DELETE through a time-travel or change-feed relation")
    () => new GraftRowLevelOperation(spark, path, info.command())
  }

  /** SQL `DELETE FROM t WHERE …` — a tombstone MERGE of the matching live
    * rows (fresh lsn above all prior state), O(matched keys), never a
    * rewrite; `TRUNCATE TABLE` arrives here as AlwaysTrue. CDC semantics
    * preserved end-to-end: the deletes flow through the change feed, time
    * travel still serves the pre-delete versions, compaction+GC reclaim.
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    asOfVersion.isEmpty && changesSince.isEmpty &&
      FilterToColumn.translateAll(filters).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(asOfVersion.isEmpty && changesSince.isEmpty,
      "cannot DELETE through a time-travel or change-feed relation")
    val cond = FilterToColumn.translateAll(filters).getOrElse(
      throw new UnsupportedOperationException(
        s"unsupported DELETE predicate(s): ${filters.mkString(", ")}"))
    LakeTable.open(spark, path).deleteWhere(cond)
  }

  require(asOfVersion.isEmpty || changesSince.isEmpty,
    "asOfVersion and changesSince are mutually exclusive")

  override def name(): String = s"graftlake:$path"

  // Schema pins the TARGET snapshot at table resolution (lazy val: one
  // resolution per Table instance, however often Spark asks): time travel
  // across additive evolution must expose the older, narrower schema.
  // The merge keys are declared NON-NULL (they are the row id, and the
  // engine's bucket router admits no null key) — which is also what Spark's
  // row-level-operation analysis requires of rowId attributes.
  private lazy val resolvedSchema: StructType = {
    val t = LakeTable.open(spark, path)
    (asOfVersion, changesSince) match {
      case (Some(v), _) => GraftLakeV2Table.keysNonNull(t.snapshotAt(v).schema)
      case (_, Some(_)) =>
        val snap = t.currentSnapshot.getOrElse(throw new IllegalArgumentException(
          s"cannot read/stream changes of $path: no snapshot yet (create " +
            "the table or merge once first — the feed's schema is the table's)"))
        val full = StructType(t.fileSchemaOf(snap.schema).fields :+
          StructField("_commit_version", LongType))
        selectCols match {
          case None => full
          case Some(cols) =>
            val missing = cols.filterNot(full.fieldNames.contains)
            require(missing.isEmpty,
              s"select option names column(s) ${missing.mkString(", ")} not in " +
                s"the change feed of $path (${full.fieldNames.mkString(", ")})")
            // projection is a SET (file-schema order kept): the parquet
            // readers then materialize only these columns per batch
            StructType(full.fields.filter(f => cols.contains(f.name)))
        }
      case _ => t.currentSnapshot.map(s => GraftLakeV2Table.keysNonNull(s.schema))
        .getOrElse(StructType(Nil))
    }
  }

  override def schema(): StructType = resolvedSchema

  /** DESCRIBE-visible facts: layout + current version, from metadata only. */
  override def properties(): java.util.Map[String, String] = {
    val t = LakeTable.open(spark, path)
    val m = new java.util.HashMap[String, String]()
    m.put("format", "graftlake")
    m.put("path", path)
    t.currentSnapshot.foreach { s =>
      m.put("numBuckets", s.numBuckets.toString)
      m.put("currentVersion", s.version.toString)
      m.put("mergeKey", "conv_id, turn_idx")
    }
    m
  }

  override def capabilities(): java.util.Set[TableCapability] =
    // MICRO_BATCH_READ is advertised on every non-time-travel relation, but
    // streaming a graftlake table MEANS streaming its change feed, and the
    // feed's schema (payload + _change meta columns) differs from the batch
    // table's — so schema() can only resolve the change shape when the
    // startingVersion/changesSince option marks the intent. Without the
    // option, the capability still admits the plan so the STREAM START fails
    // with the actionable "pass startingVersion" message (toMicroBatchStream)
    // instead of Spark's generic capability error at analysis. Defaulting
    // silently to startingVersion=0 is NOT possible: the same Table instance
    // would then have to answer schema() with two different shapes.
    // TRUNCATE = `INSERT OVERWRITE` admission (TableCapabilityCheck); the
    // engine applies it as ONE atomic generation-swap epoch, never a
    // directory truncation. Time-travel/change-feed writes are still
    // rejected at newWriteBuilder.
    if (changesSince.isDefined)
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ, TableCapability.V1_BATCH_WRITE,
        TableCapability.TRUNCATE)
    else if (asOfVersion.isEmpty && LakeTable.existsAt(path))
      // STREAMING_WRITE only for an EXISTING table: the sink appends epochs
      // to a declared schema — creating tables is the batch/DDL surface's
      // job, and advertising the capability on a fresh path would defer the
      // failure from analysis to mid-stream.
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ,
        TableCapability.V1_BATCH_WRITE, TableCapability.STREAMING_WRITE,
        TableCapability.TRUNCATE)
    else if (asOfVersion.isEmpty)
      // fresh path: streaming reads reach requireTableAt's loud error
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)
    else
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // READS of a snapshot-less path fail loudly here (writes may still
    // CREATE a table at a fresh path, so the constructor cannot check).
    LakeTable.requireTableAt(path)
    new GraftLakeScanBuilder(spark, path, asOfVersion, changesSince, schema(),
      maxVersionsPerTrigger)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOfVersion.isEmpty && changesSince.isEmpty,
      "cannot write through a time-travel or change-feed relation")
    // STREAMING writes pre-shuffle each micro-batch by the table's own
    // `bucket(n, conv_id)` so all rows of one bucket land in ONE task:
    // O(touched buckets) delta files per epoch instead of O(tasks ×
    // buckets) — at cluster scale the difference between a bounded
    // manifest and a file explosion compaction has to mop up. Costs one
    // O(batch) hash shuffle per trigger, the trade [[LakeTable.merge]]
    // makes explicitly. Spark consults the distribution on the WRITE for
    // batch AppendData AND micro-batch alike (V2Writes.prepareQuery), so
    // the declaration must be streaming-scoped: batch INSERTs route into
    // appendAsUpserts/merge, which repartition themselves — a declared
    // distribution there would just add a redundant exchange. A streaming
    // write is recognized by its `checkpointLocation` option (always
    // present for an exactly-once sink); the `clusterWrite` option
    // overrides either way. Catalog-backed relations only: a path-based
    // relation has no FunctionCatalog to resolve the bucket transform
    // against, and an unresolvable distribution fails the write at
    // analysis — those keep per-task writers (correct, just more files;
    // route high-fan-in streams through the catalog).
    val clusterByBucket = viaCatalog &&
      Option(info.options.get("clusterWrite")).map(_.toBoolean)
        .getOrElse(info.options.containsKey("checkpointLocation"))
    new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      // `INSERT OVERWRITE` arrives as truncate()+append on ONE builder; the
      // engine applies both halves as ONE atomic generation-swap epoch
      // (LakeTable.overwriteWith) — the flag survives into build() because
      // Spark's V1 fallback writers do not re-signal overwrite at insert().
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new V1Write
          with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          if (clusterByBucket)
            org.apache.spark.sql.connector.distributions.Distributions.clustered(
              Array(org.apache.spark.sql.connector.expressions.Expressions
                .bucket(LakeTable.open(spark, path).tableNumBuckets, "conv_id")))
          else
            org.apache.spark.sql.connector.distributions.Distributions.unspecified()
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          Array.empty
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val t = LakeTable.open(spark, path)
              if (replace || overwrite) t.overwriteWith(data)
              else t.appendAsUpserts(data)
            }
          }
        /** `writeStream.format("graftlake")`: every micro-batch is one
          * idempotent merge epoch, written executor-side
          * ([[GraftStreamingWrite]]). Catalog-backed streams additionally
          * pre-shuffle by bucket (see `clusterByBucket` above).
          */
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new GraftStreamingWrite(LakeTable.open(spark, path), info)
      }
    }
  }
}

object GraftLakeV2Table {
  /** Merge-key columns declared non-nullable (the rowId contract). */
  private[lake] def keysNonNull(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      if (f.name == "conv_id" || f.name == "turn_idx") f.copy(nullable = false)
      else f))
}

final class GraftLakeScanBuilder(spark: SparkSession, path: String,
                                 asOfVersion: Option[Long],
                                 changesSince: Option[Long],
                                 fullSchema: StructType,
                                 maxVersionsPerTrigger: Option[Long] = None)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private val lake = LakeTable.open(spark, path)
  // Pin ONE snapshot for the whole scan build: planning decisions (file
  // list, columnar eligibility) and execution must agree.
  private val snapOpt = asOfVersion match {
    case Some(v) => Some(lake.snapshotAt(v))
    case None    => lake.currentSnapshot
  }

  private var required: StructType = fullSchema
  private var convKeys: Option[Seq[String]] = None
  private var handled: Array[Filter] = Array.empty
  private var allFilters: Array[Filter] = Array.empty

  /** conv_id keys demanded by one pushed conjunct: equality, IN, or a
    * disjunction of such (the OR shape SQL generators emit instead of IN).
    */
  private def keysOf(f: Filter): Option[Seq[String]] = f match {
    case EqualTo("conv_id", v: String) => Some(Seq(v))
    case In("conv_id", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
      Some(vs.toSeq.map(_.asInstanceOf[String]))
    case Or(l, r) => for { a <- keysOf(l); b <- keysOf(r) } yield a ++ b
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    batchPushdownSeen = true
    val keyed = filters.flatMap(f => keysOf(f).map(f -> _))
    convKeys = keyed.headOption.map(_._2)
    handled = keyed.map(_._1)
    allFilters = filters
    // Everything is returned as residual: bucket pruning is a file-list
    // decision — other conversations share the bucket, so Spark must still
    // evaluate the predicate above the scan.
    filters
  }

  override def pushedFilters(): Array[Filter] = handled

  private var aggPushed = false

  /** Set iff Spark's batch pushdown visited this builder. Streaming plans
    * never run V2ScanRelationPushDown, so a build() without a prior
    * pruneColumns call is a STREAMING build — routed to the V1Scan whose
    * toMicroBatchStream carries the real stream (change-feed mode) or the
    * actionable "pass startingVersion" error (batch-mode table). A batch
    * caller that somehow skipped pushdown still gets correct rows from the
    * V1 path, just without the columnar shortcut.
    */
  private var batchPushdownSeen = false

  override def pruneColumns(requiredSchema: StructType): Unit = {
    batchPushdownSeen = true
    required = requiredSchema
    // After a complete aggregation push the delegate's output schema is the
    // aggregate's, computed internally — re-pruning would clobber it.
    if (!aggPushed) innerOpt.foreach(_.pruneColumns(requiredSchema))
  }

  // ---- columnar delegation (built once, shared by agg pushdown + build) ----

  /** Lazily-built delegate over the pruned live files, present iff every
    * selected bucket is compacted + tombstone-split (then the file rows ARE
    * the table rows — the precondition for any footer-level shortcut).
    */
  private lazy val innerFiles: Option[Seq[String]] = (changesSince, snapOpt) match {
    case (None, Some(s)) =>
      val states = convKeys match {
        case Some(keys) =>
          keys.map(k => LakeTable.bucketOf(k, s.numBuckets)).distinct
            .map(b => s.buckets.getOrElse(b, lake.emptyBucketState))
        case None => s.buckets.values.toSeq
      }
      val columnarOk = states.forall(st =>
        st.deltas.isEmpty && (st.base.isEmpty || st.pureBase))
      if (columnarOk) Some(states.flatMap(_.base)) else None
    case _ => None
  }

  private lazy val innerOpt: Option[ParquetScanBuilder] = innerFiles match {
    case Some(rels) =>
      {
        val files = rels.map(f => new HPath(s"$path/$f"))
        val index = new InMemoryFileIndex(spark, files, Map.empty, Some(fullSchema))
        // Subclass purely to reach the protected filter slot: parquet then
        // does row-group/page-stat pruning with the pushed predicates (it
        // skips what it can prove, Spark re-evaluates the rest above — the
        // filters are residuals either way, so this is pure gain) and the
        // scan's explain metadata shows PushedFilters.
        val inner = new ParquetScanBuilder(spark, index, fullSchema, fullSchema,
            CaseInsensitiveStringMap.empty()) {
          def withDataFilters(fs: Array[Filter]): this.type = {
            pushedDataFilters = fs; this
          }
        }
        inner.withDataFilters(allFilters)
        inner.pruneColumns(required)
        Some(inner)
      }
    case _ => None
  }

  /** Footer-served aggregates demand MORE than columnar eligibility: after
    * additive schema evolution, a clean base written earlier simply lacks
    * the new column in its footer — a pushed MIN/MAX over it would fail or
    * answer from a partial file set. Proven from the manifest alone: every
    * selected base file's recorded footer column count must equal the
    * current file schema's width (op + payload + _lsn; files missing stats
    * or written before the count was recorded are never trusted). The
    * ordinary columnar SCAN path needs no such gate — the vectorized reader
    * fills absent columns with nulls.
    */
  private lazy val allFilesSchemaComplete: Boolean = (innerFiles, snapOpt) match {
    case (Some(rels), Some(s)) =>
      val expected = lake.fileSchemaOf(s.schema).fields.length
      rels.forall(f => s.fileStats.get(f).flatMap(_.nCols).contains(expected))
    case _ => false
  }

  /** Filterless COUNT(*)/MIN/MAX over a compacted table never touch row
    * data: forwarded to the parquet delegate, they are answered from the
    * footers Spark already trusts for its own file source — a metadata
    * operation at any table size. The delegate refuses whenever pushed data
    * filters exist or a column's stats can't serve the aggregate, and
    * Spark's own rule only attempts the push when no residual Filter sits
    * between the Aggregate and the scan, so dirty tables and filtered
    * aggregates keep the full plan. Additionally gated on every selected
    * file provably carrying the FULL current schema (see
    * [[allFilesSchemaComplete]]).
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    allFilesSchemaComplete && innerOpt.exists(_.supportCompletePushDown(agg))

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    batchPushdownSeen = true
    aggPushed = allFilesSchemaComplete && innerOpt.exists(_.pushAggregation(agg))
    aggPushed
  }

  override def build(): Scan = innerOpt match {
    case Some(inner) if batchPushdownSeen =>
      // The whole selected file set is compacted + tombstone-split: the scan
      // IS Spark's vectorized parquet batch scan — codegen fuses it with the
      // query above, column pruning reaches the reader (op/_lsn never read).
      if (!aggPushed) inner.pruneColumns(required)
      inner.build()
    case _ => v1Scan()
  }

  /** Merge-on-read arbitration cannot be a bare file scan — bridge to the
    * engine's read plan via the public V1Scan API. Column pruning still
    * applies (the projection reaches the inner parquet scans); filters are
    * re-applied by Spark above.
    *
    * SNAPSHOT PINNED: execution reads the version the BUILDER planned
    * against, never "whatever is current when the RDD materializes" — a
    * commit landing between planning and execution must not change what one
    * query reads (and a self-join whose two sides resolve columnar-vs-
    * fallback must see ONE version). Retention contract: the pinned
    * snapshot must survive vacuum until the scan runs, the same window
    * every in-flight read already requires.
    */
  private def v1Scan(): Scan = {
    val requiredCols = required
    val mode = (asOfVersion, changesSince)
    val keys = convKeys
    val lakePath = path
    val pinnedVersion = snapOpt.map(_.version) // plan-time snapshot
    val scanSpark = spark
    val scanFullSchema = fullSchema
    val maxVersions = maxVersionsPerTrigger
    new V1Scan {
      override def readSchema(): StructType = requiredCols

      /** In change-feed mode the same scan serves `readStream`: a DSv2
        * [[org.apache.spark.sql.connector.read.streaming.MicroBatchStream]]
        * whose offsets are table versions (no Spark-internal v1 Source
        * surface). Streaming plans see no column pruning, so the stream's
        * schema is the full change schema this builder resolved.
        */
      override def toMicroBatchStream(checkpointLocation: String)
          : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
        val since = changesSince.getOrElse(throw new UnsupportedOperationException(
          "streaming a graftlake table means streaming its CHANGE FEED — " +
            "pass .option(\"startingVersion\", v) (0 = everything retained)"))
        new GraftLakeMicroBatchStream(scanSpark, lakePath, since,
          scanFullSchema, maxVersions)
      }
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T = {
        val rel = new BaseRelation with TableScan {
          override def sqlContext: SQLContext = context
          override def schema: StructType = requiredCols
          override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
            val t = LakeTable.open(context.sparkSession, lakePath)
            val base = mode match {
              case (Some(v), _) => keys match {
                case Some(ks) => t.readConvsAsOf(v, ks) // pruned time travel
                case None     => t.readAsOf(v)
              }
              case (_, Some(since)) =>
                // version-BOUNDED: commits after planning belong to the
                // next incremental read, not this one
                pinnedVersion.fold(t.changesSince(since))(
                  v => t.changesBetween(since, v))
              case _ => (keys, pinnedVersion) match {
                case (Some(ks), Some(v)) => t.readConvsAsOf(v, ks) // pruned + pinned
                case (Some(ks), None)    => t.readConvs(ks)
                case (None, Some(v))     => t.readAsOf(v)
                case (None, None)        => t.read()
              }
            }
            base.select(requiredCols.fieldNames.toIndexedSeq.map(col): _*).rdd
          }
        }
        rel.asInstanceOf[T]
      }
    }
  }
}
