package graft.lake

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{
  NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{
  Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog,
  TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A Spark `TableCatalog` over a directory of GraftLake tables — the last
  * piece of the SQL-only story: DDL and DML with no paths in queries.
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.lake.GraftCatalog
  *   spark.sql.catalog.graft.root = /lakes
  *
  *   CREATE NAMESPACE graft.prod;
  *   CREATE TABLE graft.prod.turns (conv_id STRING, turn_idx INT, ...)
  *     USING graftlake PARTITIONED BY (bucket(64, conv_id));
  *   INSERT INTO graft.prod.turns SELECT ...;        -- idempotent epoch
  *   SELECT * FROM graft.prod.turns WHERE conv_id='x';  -- pruned/columnar
  *   SELECT * FROM graft.prod.turns VERSION AS OF 3;    -- SQL time travel
  * }}}
  *
  * Layout: `<root>/<namespace…>/<table>/` is one [[LakeTable]] directory.
  * A directory is a table iff it has a `snapshots/` child — `CREATE TABLE`
  * commits an EMPTY version-1 snapshot carrying the declared schema, so the
  * schema exists before the first row and evolves additively afterwards
  * like any other merge. The bucket layout comes from
  * `PARTITIONED BY (bucket(n, conv_id))` (the engine's one physical knob);
  * default 64.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = _
  private var root: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Paths.get(Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.root=<dir>")))
    Files.createDirectories(root)
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def dirOf(ident: Identifier): Path =
    ident.namespace.foldLeft(root)(_ resolve _).resolve(ident.name)
  private def isTable(dir: Path): Boolean = Files.isDirectory(dir.resolve("snapshots"))

  // ---- tables ---------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(root)(_ resolve _)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    scala.util.Using.resource(Files.list(dir)) { s =>
      s.iterator().asScala
        .filter(p => isTable(p))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
    }
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    new GraftLakeV2Table(spark, dir.toString, None, None, viaCatalog = true)
  }

  /** `SELECT … FROM graft.ns.t VERSION AS OF v` — SQL time travel straight
    * onto the retained snapshot (loud when vacuumed, like `readAsOf`).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    // loud, typed failure on a non-numeric version string (a bare .toLong
    // would NPE/NumberFormat the SQL error path)
    val v = version.trim.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"VERSION AS OF for a graftlake table must be a numeric snapshot " +
        s"version; got '$version'"))
    new GraftLakeV2Table(spark, dir.toString, Some(v), None, viaCatalog = true)
  }

  /** `SELECT … FROM graft.ns.t TIMESTAMP AS OF '…'` — Spark hands the
    * literal as MICROseconds since epoch; resolved to the latest retained
    * snapshot committed at or before it (loud when vacuumed past it or when
    * the table predates commit-time recording).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val t = LakeTable.open(spark, dir.toString)
    val v = t.versionAsOfTimestamp(Math.floorDiv(timestampMicros, 1000L))
    new GraftLakeV2Table(spark, dir.toString, Some(v), None, viaCatalog = true)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    val dir = dirOf(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    require(Seq("conv_id", "turn_idx").forall(schema.fieldNames.contains),
      "a graftlake table needs the merge key columns (conv_id, turn_idx)")
    val reserved = Seq("op", "lsn", "commit_ts").filter(schema.fieldNames.contains)
    require(reserved.isEmpty,
      s"column name(s) ${reserved.mkString(", ")} are reserved for the CDC " +
        "envelope (op/lsn/commit_ts) and cannot be payload columns")
    // bucket(n, conv_id) is the one physical knob; anything else is not a
    // layout this engine has (and silently accepting it would lie).
    val numBuckets = partitions.toSeq match {
      case Seq() => Option(properties.get("buckets")).map(_.toInt).getOrElse(64)
      case Seq(t) if t.name == "bucket" &&
          t.references.map(_.describe).toSeq == Seq("conv_id") =>
        t.arguments.head.describe.toInt
      case other => throw new IllegalArgumentException(
        s"graftlake supports only PARTITIONED BY (bucket(n, conv_id)); got " +
          other.map(_.describe).mkString(", "))
    }
    Files.createDirectories(dir.getParent)
    val t = new LakeTable(spark, dir.toString, numBuckets)
    // Commit an EMPTY v1 carrying the declared schema: the table exists (and
    // describes itself) before the first row; later merges evolve additively.
    val envelope = StructType(
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType) +:
      org.apache.spark.sql.types.StructField("lsn",
        org.apache.spark.sql.types.LongType) +:
      org.apache.spark.sql.types.StructField("commit_ts",
        org.apache.spark.sql.types.TimestampType) +:
      schema.fields)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], envelope)
    t.merge(empty, "create-table", 0L)
    new GraftLakeV2Table(spark, dir.toString, None, None, viaCatalog = true)
  }

  /** `ALTER TABLE … ADD COLUMN(S)` — additive only, realized as an empty
    * merge carrying the widened schema ([[LakeTable.evolveSchema]]): a
    * SQL-only user can pre-declare a column before any row carries it.
    * Every non-additive change (drop/rename/retype/position) fails loudly —
    * the merge-on-read format reads old files through the unified schema,
    * which only addition preserves.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val adds = changes.map {
      case a: TableChange.AddColumn if a.fieldNames.length == 1 =>
        org.apache.spark.sql.types.StructField(
          a.fieldNames.head, a.dataType, nullable = true)
      case a: TableChange.AddColumn => throw new UnsupportedOperationException(
        s"graftlake has no nested columns to add into: ${a.fieldNames.mkString(".")}")
      case other => throw new UnsupportedOperationException(
        s"graftlake supports only additive ALTER TABLE ADD COLUMN(S); got $other")
    }
    LakeTable.open(spark, dir.toString).evolveSchema(adds)
    new GraftLakeV2Table(spark, dir.toString, None, None, viaCatalog = true)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTable(dir)) return false
    deleteTreeTolerant(dir)
    true
  }

  /** Failure-tolerant recursive delete — the vacuum lesson: a concurrent
    * writer's task-commit creates and renames files (e.g. under
    * `_temporary`) faster than a plain `Files.walk` can stat them, so
    * entries vanishing mid-walk are the NORMAL case when dropping a table a
    * live write is still touching, never an error. Visit failures are
    * skipped; delete races are swallowed; a second pass catches dirs whose
    * children appeared after their postVisit.
    */
  private def deleteTreeTolerant(dir: Path): Unit = {
    import java.nio.file.FileVisitResult.CONTINUE
    def pass(): Unit = Files.walkFileTree(dir, new java.nio.file.SimpleFileVisitor[Path] {
      override def visitFile(p: Path,
          a: java.nio.file.attribute.BasicFileAttributes): java.nio.file.FileVisitResult = {
        try Files.deleteIfExists(p)
        catch { case _: java.io.IOException => () }
        CONTINUE
      }
      override def visitFileFailed(p: Path,
          e: java.io.IOException): java.nio.file.FileVisitResult = CONTINUE
      override def postVisitDirectory(p: Path,
          e: java.io.IOException): java.nio.file.FileVisitResult = {
        try Files.deleteIfExists(p)
        catch { case _: java.io.IOException => () }
        CONTINUE
      }
    })
    pass()
    if (Files.exists(dir)) pass() // late-landing children from a dying write
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = dirOf(oldIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    val to = dirOf(newIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(to.getParent)
    Files.move(from, to)
  }

  // ---- maintenance procedures (SQL CALL surface) ----------------------------
  //
  //   CALL gcat.system.compact(table => 'prod.turns');
  //   CALL gcat.system.compact(table => 'prod.turns', gc_below_lsn => 500);
  //   CALL gcat.system.vacuum(table => 'prod.turns', keep => 3, grace_ms => 600000);
  //   CALL gcat.system.history(table => 'prod.turns');
  //   CALL gcat.system.rollback(table => 'prod.turns', version => 7);
  //
  // The ops half of the SQL-only story: a deployment that creates, loads and
  // queries lakes through pure SQL can run its compaction/retention/restore
  // jobs and read per-version lineage the same way — no Scala API, no paths.

  import org.apache.spark.sql.connector.catalog.procedures.{
    BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.connector.read.{LocalScan, Scan}
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

  private def tableForProc(qualified: String): LakeTable = {
    val parts = qualified.split('.')
    require(parts.length >= 1 && parts.forall(_.nonEmpty),
      s"procedure table argument must be 'namespace.table'; got '$qualified'")
    val dir = parts.foldLeft(root)(_ resolve _)
    if (!isTable(dir)) throw new NoSuchTableException(
      Identifier.of(parts.init, parts.last))
    LakeTable.open(spark, dir.toString)
  }

  private def resultScan(schema: StructType, resultRows: InternalRow*): java.util.Iterator[Scan] =
    java.util.List.of[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = resultRows.toArray
    }).iterator()

  private object CompactProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "fold delta files into per-bucket bases; optionally GC tombstones " +
        "below an lsn horizon (stats-pruned: provably-clean buckets skip)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("namespace.table under this catalog").build(),
      ProcedureParameter.in("gc_below_lsn", LongType).defaultValue("NULL")
        .comment("also drop tombstones with lsn below this no-straggler horizon")
        .build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = tableForProc(input.getString(0))
      val horizon = if (input.isNullAt(1)) None else Some(input.getLong(1))
      t.compactAll(horizon)
      resultScan(StructType(Seq(
        org.apache.spark.sql.types.StructField("version", LongType))),
        InternalRow(t.latestVersion.getOrElse(-1L)))
    }
  }

  private object VacuumProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "delete snapshots beyond the retention window and every data file / " +
        "manifest none of the kept snapshots references (writer-safe: " +
        "in-flight versions and young files/dirs under grace_ms survive)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("namespace.table under this catalog").build(),
      ProcedureParameter.in("keep", IntegerType).defaultValue("2")
        .comment("trailing snapshots whose files stay present").build(),
      ProcedureParameter.in("grace_ms", LongType).defaultValue("0")
        .comment("protect files/dirs younger than this (cover the longest " +
          "concurrent op)").build(),
      ProcedureParameter.in("retain_age_ms", LongType).defaultValue("-1")
        .comment("also keep every snapshot committed within this many ms " +
          "of now (-1 = count-only retention)").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = tableForProc(input.getString(0))
      val (snaps, files) = t.vacuum(input.getInt(1), input.getLong(2),
        Some(input.getLong(3)).filter(_ >= 0L))
      resultScan(StructType(Seq(
        org.apache.spark.sql.types.StructField("snapshots_deleted", IntegerType),
        org.apache.spark.sql.types.StructField("data_files_deleted", IntegerType))),
        InternalRow(snaps, files))
    }
  }

  private object HistoryProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "history"
    override def description(): String =
      "per-version lineage, newest first: epochs, event/delete counts, " +
        "watermark, schema width, bucket/file counts, commit time"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("namespace.table under this catalog").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      // all-numeric schema: Row values pass straight into InternalRows
      val df = tableForProc(input.getString(0)).history()
      resultScan(df.schema,
        df.collect().toIndexedSeq.map(r => InternalRow.fromSeq(r.toSeq)): _*)
    }
  }

  private object RollbackProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "rollback"
    override def description(): String =
      "restore the live state to an earlier version AS A NEW COMMIT: the " +
        "reversal flows through the change feed (downstream mirrors " +
        "converge), history and time travel keep every generation"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("namespace.table under this catalog").build(),
      ProcedureParameter.in("version", LongType)
        .comment("retained snapshot version to restore").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = tableForProc(input.getString(0))
      val r = t.rollbackTo(input.getLong(1))
      resultScan(StructType(Seq(
        org.apache.spark.sql.types.StructField("restored_version", LongType),
        org.apache.spark.sql.types.StructField("new_version", LongType),
        org.apache.spark.sql.types.StructField("upserts", LongType),
        org.apache.spark.sql.types.StructField("deletes", LongType))),
        InternalRow(input.getLong(1), r.version, r.upserts, r.deletes))
    }
  }

  override def loadProcedure(ident: Identifier): UnboundProcedure =
    (ident.namespace.toSeq, ident.name.toLowerCase) match {
      case (Seq("system"), "compact")  => CompactProcedure
      case (Seq("system"), "vacuum")   => VacuumProcedure
      case (Seq("system"), "history")  => HistoryProcedure
      case (Seq("system"), "rollback") => RollbackProcedure
      case _ => throw new UnsupportedOperationException(
        s"unknown procedure ${ident.namespace.mkString(".")}.${ident.name} — " +
          "graftlake provides system.compact, system.vacuum, system.history " +
          "and system.rollback")
    }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.toSeq == Seq("system"))
      Array(Identifier.of(Array("system"), "compact"),
        Identifier.of(Array("system"), "vacuum"),
        Identifier.of(Array("system"), "history"),
        Identifier.of(Array("system"), "rollback"))
    else Array.empty

  // ---- functions (SQL surface of the physical layout) -----------------------
  //
  //   SELECT gcat.system.bucket(64, conv_id) FROM ...;
  //
  // The writer's exact bucket expression (`pmod(xxhash64(conv_id), n)`)
  // exposed to SQL: lets a SQL-only user audit routing, pre-aggregate per
  // physical bucket, or build salted co-partitioned joins against the lake's
  // layout — and it is the function a clustered DSv2 write distribution
  // would name. Parity with LakeTable.bucketOf is pinned by a test.

  import org.apache.spark.sql.connector.catalog.functions.{
    BoundFunction, ScalarFunction, UnboundFunction}

  private object BucketFunction extends UnboundFunction
      with ScalarFunction[java.lang.Integer] {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets INT, conv_id STRING): the lake's physical bucket " +
        "of a key — pmod(xxhash64(conv_id, seed=42), numBuckets)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        inputType.fields(1).dataType == StringType,
        s"bucket expects (INT numBuckets, STRING conv_id); got $inputType")
      this
    }
    override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
      Array(IntegerType, StringType)
    override def resultType(): org.apache.spark.sql.types.DataType = IntegerType
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Integer =
      if (input.isNullAt(1) || input.isNullAt(0)) null
      else Int.box(LakeTable.bucketOf(input.getString(1), input.getInt(0)))
  }

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    (ident.namespace.toSeq, ident.name.toLowerCase) match {
      // Seq(): Spark's write-distribution resolution looks transforms up
      // unqualified (Identifier.of(Array.empty, "bucket")) — the lookup
      // behind RequiresDistributionAndOrdering's bucket clustering.
      case (Seq("system") | Seq(), "bucket") => BucketFunction
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.toSeq == Seq("system"))
      Array(Identifier.of(Array("system"), "bucket"))
    else Array.empty

  // ---- namespaces -----------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    scala.util.Using.resource(Files.list(root)) { s =>
      s.iterator().asScala
        .filter(p => Files.isDirectory(p) && !isTable(p))
        .map(p => Array(p.getFileName.toString))
        .toArray
    }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = namespace.foldLeft(root)(_ resolve _)
    if (!Files.isDirectory(dir) || isTable(dir))
      throw new NoSuchNamespaceException(namespace)
    scala.util.Using.resource(Files.list(dir)) { s =>
      s.iterator().asScala
        .filter(p => Files.isDirectory(p) && !isTable(p))
        .map(p => namespace :+ p.getFileName.toString)
        .toArray
    }
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val dir = namespace.foldLeft(root)(_ resolve _)
    Files.isDirectory(dir) && !isTable(dir)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit =
    Files.createDirectories(namespace.foldLeft(root)(_ resolve _))

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graftlake namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val dir = namespace.foldLeft(root)(_ resolve _)
    if (!Files.isDirectory(dir)) return false
    val empty = scala.util.Using.resource(Files.list(dir))(!_.iterator().hasNext)
    if (!empty && !cascade)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    deleteTreeTolerant(dir)
    true
  }
}
