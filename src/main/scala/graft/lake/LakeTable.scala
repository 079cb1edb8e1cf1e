package graft.lake

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Raised when two writers race to publish the same snapshot version: the
  * loser's merge is NOT applied (its data files are unreferenced orphans,
  * reclaimed by [[LakeTable.vacuum]]); it should re-read the table and retry.
  */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

/** GraftLake — a from-scratch, snapshot-based, hash-bucketed parquet table
  * format with single-writer ACID semantics and **merge-on-read** deltas,
  * built because this sandbox ships no Iceberg/Delta runtime. It supplies the
  * sink properties the north rule demands:
  *
  *  - **Atomic commits**: a commit is one JSON snapshot file made visible by
  *    an atomic rename; readers resolve `max(version)`. A crash mid-write
  *    leaves orphan data files, never a torn table.
  *  - **Idempotent epochs**: every merge carries (namespace, batchId); the
  *    snapshot records committed epochs, so a foreachBatch retry re-applies
  *    as a metadata no-op.
  *  - **Merge-on-read, O(batch) writes**: a merge arbitrates the batch
  *    internally (one aggregation) and appends the winners — including 'D'
  *    tombstones — as per-bucket DELTA files. The table is never rewritten on
  *    ingest; at 10^10 events a batch costs its own size, not the table's.
  *    Readers arbitrate base ∪ deltas by max lsn per (conv_id, turn_idx).
  *  - **Bounded read amplification**: when a bucket accumulates more than
  *    `maxDeltasPerBucket` delta files, it is compacted inline (base+deltas
  *    arbitrated → new base), amortizing rewrite cost across batches.
  *  - **Additive schema evolution**: unknown batch columns extend the table
  *    schema; old files read through the unified schema (missing ⇒ null), so
  *    a `tool` column can appear mid-stream with zero rewrites.
  *  - **Lineage**: each snapshot embeds per-commit metrics (events, upserts,
  *    deletes, high-water mark, running totals).
  *
  * Layout:
  * {{{
  *   table/
  *     snapshots/v0000000012.json       // atomic-renamed; readers take max
  *     data/e0000000012-4f1a9c2b/b=17/part-*.parquet  // delta OR compacted base
  * }}}
  *
  * Data files persist `op` ('U' rows and 'D' tombstones) and `_lsn` (the
  * writer's lsn) alongside the payload. Tombstones survive compaction so a
  * straggler event with a lower lsn can never resurrect a deleted row; they
  * are only physically droppable once older than the watermark horizon.
  */
final class LakeTable(val spark: SparkSession, val path: String,
                      val numBuckets: Int = 64,
                      val maxDeltasPerBucket: Int = 4,
                      /** Salt width for the delta-write shuffle: a hot
                        * conversation maps to ONE bucket, which without
                        * salting serializes that bucket's write into one
                        * task. Salting by `pmod(xxhash64(lsn), salt)` spreads
                        * it across `salt` writer tasks; `partitionBy(b)`
                        * still lands files in the right bucket dir. */
                      val writeSalt: Int = 4,
                      /** Parquet codec for all table writes. zstd: ~30%
                        * smaller files than snappy at similar read cost —
                        * at 100 TB the scan is I/O-bound, so bytes saved are
                        * time saved; the write pays a little more CPU. */
                      val compression: String = "zstd",
                      /** Manifest-list length bound: commits append ONE
                        * O(changed)-sized manifest; when the list would
                        * exceed this, the commit writes a single merged
                        * manifest of the full state instead. Amortized
                        * commit metadata = O(changed + table/maxManifests)
                        * — the knob trading snapshot-resolution fan-out
                        * against merge-rewrite frequency. */
                      val maxManifests: Int = 32) {

  private val mapper = new ObjectMapper()
  private val snapDir = Paths.get(path, "snapshots")
  private val changesDir = Paths.get(path, "changes")
  private val manifestsDir = Paths.get(path, "manifests")
  private val keyCols = Seq("conv_id", "turn_idx")

  // NO directory creation here: constructing a LakeTable is also how every
  // READ surface opens a path, and a typo'd read must fail loudly (or come
  // back empty) without littering empty snapshots/changes/data trees. The
  // write paths (writeSnapshot / writeChangeManifest / the parquet job's own
  // output committer) create what they need, exactly when a table is born.

  // Automatic bucket pruning for literal conv_id filters on read() — session
  // -wide and idempotent (the rule is an object; register once).
  if (!spark.experimental.extraOptimizations.contains(BucketPrune))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BucketPrune

  /** Session for the lake's OWN writes: a clone of the caller's session
    * (same SparkContext, copied conf/UDFs/rules) with
    * `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS` — Spark's
    * default INT96 encoding is deprecated AND carries no column statistics,
    * which would blind the manifest's per-file ts ranges (file skipping).
    * Scoped to a clone because the parquet writer reads this key from the
    * SESSION conf, clobbering any writer-level option
    * (ParquetUtils.prepareWrite), and mutating the shared session would
    * silently change the timestamp encoding of every unrelated parquet
    * write in the user's session merely because a lake table was opened.
    * Lazy: read-only opens never pay the clone.
    */
  private lazy val writeSession: SparkSession = LakeTable.microsWriteSession(spark)

  /** Re-root a frame into [[writeSession]] so its WRITE action plans under
    * the scoped conf. Must happen before `.observe` (an Observation's
    * listener registers on the frame's session — the one the action runs in).
    *
    * The clone's conf is frozen at creation, so the user's LATER runtime
    * conf changes (AQE toggles, shuffle sizing) would silently stop
    * reaching lake writes — every write first mirrors the user session's
    * modifiable conf into the clone, keeping only the timestamp encoding
    * pinned. Driver-side map copy; noise next to a write job.
    */
  private def forWrite(df: DataFrame): DataFrame = {
    val target = writeSession.conf
    val userConf = spark.conf.getAll
    userConf.foreach { case (k, v) =>
      if (k != "spark.sql.parquet.outputTimestampType" &&
          spark.conf.isModifiable(k) && !target.getOption(k).contains(v))
        target.set(k, v)
    }
    // Mirror UNSETS too: a key the user cleared (reverting to default) must
    // not keep its stale explicit value in the clone, or lake writes would
    // run forever under a setting the user no longer has.
    target.getAll.keys.foreach { k =>
      if (k != "spark.sql.parquet.outputTimestampType" &&
          !userConf.contains(k) && target.isModifiable(k))
        target.unset(k)
    }
    org.apache.spark.sql.graftbridge.reroot(df, writeSession)
  }

  // ---- snapshot model ------------------------------------------------------

  /** One bucket's file state.
    *
    * `tombs`: compaction since the split-format writes surviving 'D'
    * tombstones into SEPARATE files from live rows — `Some(files)` marks the
    * split (base files are then PURE live rows, so a live read skips
    * tombstone bytes entirely and a columnar engine can scan bases with no
    * row filter at all); `None` marks a legacy base that may interleave
    * tombstones (read conservatively).
    */
  final case class BucketState(base: Seq[String], deltas: Seq[String],
                               tombs: Option[Seq[String]] = None) {
    def allFiles: Seq[String] = base ++ tombs.getOrElse(Nil) ++ deltas
    /** Base rows are provably tombstone-free (split-format compaction). */
    def pureBase: Boolean = tombs.isDefined
  }

  /** Per-file column ranges, read once from the parquet FOOTER at commit time
    * and persisted in the snapshot — so range queries and maintenance prune
    * FILES from the manifest alone, without opening a single footer at read
    * time (at 100 TB that is the difference between a metadata operation and
    * a scan). `ts` ranges are event-time micros; None when the file has no
    * non-null ts.
    */
  final case class FileStat(minLsn: Long, maxLsn: Long,
                            minTs: Option[Long], maxTs: Option[Long],
                            /** op-column footer range proves no 'D' row —
                              * lets periodic tombstone-GC passes skip whole
                              * buckets by metadata; false = unknown
                              * (conservative). */
                            noTombs: Boolean = false,
                            /** Column count of the file's own parquet
                              * schema: after additive evolution, a base
                              * written earlier lacks the new columns — any
                              * footer-level shortcut (aggregate pushdown)
                              * must prove every file carries the FULL
                              * current schema first. None = unknown
                              * (legacy stats; never trusted as complete). */
                            nCols: Option[Int] = None,
                            /** File length in bytes (commit-time metadata):
                              * lets read-side file indexes skip per-file
                              * stat calls — on an object store that is one
                              * round-trip per file per query. None = legacy
                              * stats (stat on demand). */
                            bytes: Option[Long] = None)

  final case class Snapshot(
      version: Long,
      schema: StructType,
      buckets: Map[Int, BucketState],
      committedEpochs: Map[String, Long],
      highWaterMicros: Long,
      metrics: Map[String, Long],
      numBuckets: Int,
      /** CHANGE MANIFEST: the delta files this commit itself added (None for
        * legacy snapshots written before the field existed). [[changesSince]]
        * reads this instead of diffing bucket states — bucket state is NOT a
        * change log: an inline compaction inside the same commit folds the
        * fresh deltas straight into a new base, which would make them
        * invisible to a state diff and silently drop the commit's rows from
        * the change feed.
        */
      changeFiles: Option[Seq[String]] = None,
      /** Footer stats for every file referenced by `buckets` or
        * `changeFiles` (best-effort: a file absent here is never skipped). */
      fileStats: Map[String, FileStat] = Map.empty,
      /** MANIFEST LIST (ordered): the immutable per-commit manifest files
        * under `manifests/` that together carry `buckets` + `fileStats`.
        * Each commit appends ONE manifest holding only the buckets it
        * CHANGED (later entries supersede earlier per bucket), so the
        * snapshot JSON itself stays O(1) and commit metadata is O(changed)
        * — never O(table files) rewritten per epoch (the shape that caps
        * ingest at high bucket/file counts). Empty for legacy snapshots,
        * whose buckets/fileStats are inlined.
        */
      manifestList: Seq[String] = Nil,
      /** Wall-clock commit time (millis) recorded by the CAS winner — the
        * resolution axis for `TIMESTAMP AS OF` time travel. 0 for legacy
        * snapshots (excluded from timestamp resolution, loud if targeted).
        */
      commitTimeMs: Long = 0L
  )

  private def snapPath(v: Long): Path = snapDir.resolve(f"v$v%010d.json")

  private def listDir(dir: Path): Seq[String] =
    // Files.list holds a directory fd until closed — a long-running ingest
    // calls this every epoch, so leak-free listing is load-bearing.
    scala.util.Using.resource(Files.list(dir)) { s =>
      s.iterator().asScala.map(_.getFileName.toString).toVector
    }

  def latestVersion: Option[Long] = {
    if (!Files.isDirectory(snapDir)) return None
    val vs = listDir(snapDir)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.substring(1, n.length - 5).toLong)
    if (vs.isEmpty) None else Some(vs.max)
  }

  def currentSnapshot: Option[Snapshot] = latestVersion.map(readSnapshot)

  /** Retained snapshot by version (DSv2 time travel). Loud when vacuumed. */
  private[graft] def snapshotAt(v: Long): Snapshot = {
    require(Files.exists(snapPath(v)),
      s"snapshot v$v does not exist at $path (never written, or vacuumed)")
    readSnapshot(v)
  }

  private[lake] def fileSchemaOf(payload: StructType): StructType = fileSchema(payload)

  private[lake] def emptyBucketState: BucketState = BucketState(Nil, Nil, None)

  /** Bucket count the TABLE was created with (from the latest snapshot) —
    * the writer expression and point-lookup pruning must use this, never a
    * mismatched constructor argument (silent mis-bucketing otherwise).
    */
  def tableNumBuckets: Int = currentSnapshot.map(_.numBuckets).getOrElse(numBuckets)

  private def checkBuckets(s: Snapshot): Unit =
    require(s.numBuckets == numBuckets,
      s"table at $path was created with numBuckets=${s.numBuckets}, opened " +
        s"with $numBuckets — rebucket() to migrate, never mix bucket layouts")

  private def parseStats(node: com.fasterxml.jackson.databind.JsonNode): Map[String, FileStat] =
    node.fields().asScala.map { e =>
      val n = e.getValue
      e.getKey -> FileStat(
        n.get("minLsn").asLong, n.get("maxLsn").asLong,
        Option(n.get("minTs")).map(_.asLong), Option(n.get("maxTs")).map(_.asLong),
        Option(n.get("noTombs")).exists(_.asBoolean),
        Option(n.get("nCols")).map(_.asInt),
        Option(n.get("bytes")).map(_.asLong))
    }.toMap

  /** Per-instance parsed-snapshot cache. A published snapshot file is
    * IMMUTABLE (hard-link CAS, never rewritten), so its content is cacheable
    * — but the PATH is not its identity: a dropped-and-recreated table
    * reuses v0000000001.json (the BucketPrune lesson), so the key carries
    * the file's inode + mtime + size. Hot paths (a streaming merge loop, a
    * polling mirror) then resolve the current snapshot with one stat call
    * instead of a JSON parse + manifest fold per poll.
    */
  private val snapCache =
    new java.util.LinkedHashMap[String, Snapshot](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Snapshot]): Boolean = size() > 8
    }

  private def readSnapshot(v: Long): Snapshot = {
    val key =
      try {
        val a = Files.readAttributes(snapPath(v),
          classOf[java.nio.file.attribute.BasicFileAttributes])
        s"$v:${a.fileKey}:${a.lastModifiedTime.toMillis}:${a.size}"
      } catch { case _: java.io.IOException => null }
    if (key != null) snapCache.synchronized {
      val c = snapCache.get(key)
      if (c != null) return c
    }
    val s = parseSnapshot(v)
    if (key != null) snapCache.synchronized { snapCache.put(key, s) }
    s
  }

  private def parseSnapshot(v: Long): Snapshot = {
    val root = mapper.readTree(Files.readString(snapPath(v)))
    val schema = DataType.fromJson(root.get("schema").asText).asInstanceOf[StructType]
    val epochs = root.get("committedEpochs").fields().asScala
      .map(e => e.getKey -> e.getValue.asLong).toMap
    val metrics = root.get("metrics").fields().asScala
      .map(e => e.getKey -> e.getValue.asLong).toMap
    val nb = Option(root.get("numBuckets")).map(_.asInt).getOrElse(numBuckets)
    // Snapshot-format compatibility: tables written before the micros rename
    // carry `highWaterMillis` — fall back (×1000) instead of NPE-ing the open.
    val hw = Option(root.get("highWaterMicros")).map(_.asLong)
      .orElse(Option(root.get("highWaterMillis")).map(_.asLong * 1000L))
      .getOrElse(0L)
    val changeFiles = Option(root.get("changeFiles"))
      .map(_.elements().asScala.map(_.asText).toSeq)
    val manifestList = Option(root.get("manifestList"))
      .map(_.elements().asScala.map(_.asText).toSeq)
    val (buckets, fileStats) = manifestList match {
      case Some(names) =>
        // Reconstruct from the ordered manifest list: later manifests
        // supersede earlier ones PER BUCKET (each carries a changed
        // bucket's full state + its files' stats). Manifests are immutable
        // — parsed once per JVM through the shared cache — so resolution
        // costs O(list) cache hits, not O(table) JSON parsing.
        var acc = Map.empty[Int, (BucketState, Map[String, FileStat])]
        names.foreach { n => acc = acc ++ readManifest(n) }
        (acc.map { case (b, (st, _)) => b -> st },
          acc.values.iterator.flatMap(_._2).toMap)
      case None => // legacy inline snapshot
        val b = root.get("buckets").fields().asScala.map { e =>
          val base = e.getValue.get("base").elements().asScala.map(_.asText).toSeq
          val deltas = e.getValue.get("deltas").elements().asScala.map(_.asText).toSeq
          val tombs = Option(e.getValue.get("tombs"))
            .map(_.elements().asScala.map(_.asText).toSeq)
          e.getKey.toInt -> BucketState(base, deltas, tombs)
        }.toMap
        val fs = Option(root.get("fileStats")).map(parseStats)
          .getOrElse(Map.empty[String, FileStat])
        (b, fs)
    }
    Snapshot(root.get("version").asLong, schema, buckets, epochs, hw, metrics, nb,
      changeFiles, fileStats, manifestList.getOrElse(Nil),
      Option(root.get("commitTimeMs")).map(_.asLong).getOrElse(0L))
  }

  /** Publish a snapshot with compare-and-swap semantics: the tmp file is
    * HARD-LINKED to the final name, which on POSIX is atomic AND fails with
    * `FileAlreadyExistsException` if the target exists — unlike rename(),
    * which silently replaces it. Two writers racing to commit the same
    * version therefore get one winner and one loud
    * [[CommitConflictException]] (the loser re-reads the new snapshot and
    * retries its merge), never a silently clobbered commit whose data files
    * become unreferenced orphans. Package-private for the race test.
    */
  private def putStat(o: com.fasterxml.jackson.databind.node.ObjectNode,
                      st: FileStat): Unit = {
    o.put("minLsn", st.minLsn); o.put("maxLsn", st.maxLsn)
    st.minTs.foreach(o.put("minTs", _)); st.maxTs.foreach(o.put("maxTs", _))
    if (st.noTombs) o.put("noTombs", true)
    st.nCols.foreach(n => o.put("nCols", n))
    st.bytes.foreach(o.put("bytes", _))
  }

  private[graft] def writeSnapshot(s: Snapshot): Unit = {
    val node = mapper.createObjectNode()
    node.put("version", s.version)
    node.put("schema", s.schema.json)
    if (s.manifestList.nonEmpty || s.buckets.isEmpty) {
      // Manifest-list format: the snapshot JSON carries POINTERS, so its
      // size is O(list + epochs), independent of table file count. The
      // summary counters keep history() a flat-JSON read.
      val ml = node.putArray("manifestList"); s.manifestList.foreach(ml.add)
      node.put("nFiles", s.buckets.values.map(_.allFiles.size).sum)
      node.put("nBuckets", s.buckets.size)
    } else {
      // Inline (legacy) format — kept for direct writeSnapshot callers that
      // publish a hand-built snapshot without manifests (race tests, and as
      // the emulation path proving old tables still open).
      val bn = node.putObject("buckets")
      s.buckets.foreach { case (b, st) =>
        val o = bn.putObject(b.toString)
        val ba = o.putArray("base"); st.base.foreach(ba.add)
        val da = o.putArray("deltas"); st.deltas.foreach(da.add)
        st.tombs.foreach { ts => val ta = o.putArray("tombs"); ts.foreach(ta.add) }
      }
      if (s.fileStats.nonEmpty) {
        val fn = node.putObject("fileStats")
        s.fileStats.foreach { case (f, st) => putStat(fn.putObject(f), st) }
      }
    }
    val en = node.putObject("committedEpochs")
    s.committedEpochs.foreach { case (k, v) => en.put(k, v) }
    if (s.commitTimeMs > 0L) node.put("commitTimeMs", s.commitTimeMs)
    node.put("highWaterMicros", s.highWaterMicros)
    node.put("numBuckets", s.numBuckets)
    val mn = node.putObject("metrics")
    s.metrics.foreach { case (k, v) => mn.put(k, v) }
    s.changeFiles.foreach { cf =>
      val ca = node.putArray("changeFiles"); cf.foreach(ca.add)
    }
    Files.createDirectories(snapDir) // write path owns directory creation
    // tmp name carries a nonce so two racing writers never collide on it
    val tmp = snapDir.resolve(s".v${s.version}-${java.util.UUID.randomUUID()}.tmp")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node))
    try Files.createLink(snapPath(s.version), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(
          s"snapshot v${s.version} already committed by a concurrent writer " +
            s"at $path — re-read the table and retry the merge")
    } finally Files.deleteIfExists(tmp)
  }

  // ---- read path -----------------------------------------------------------

  private def bucketExpr = pmod(xxhash64(col("conv_id")), lit(numBuckets)).cast("int")

  /** Data-file schema = op + payload + _lsn. */
  private def fileSchema(payload: StructType): StructType =
    StructType(StructField("op", org.apache.spark.sql.types.StringType) +:
      payload.fields :+ StructField("_lsn", LongType))

  private def scanFiles(files: Seq[String], schema: StructType): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      // Explicit schema: files written before an additive evolution lack the
      // new columns; Spark's parquet reader fills them with nulls.
      //
      // The paths handed to the reader are explicit FILES from the manifest
      // (no directory discovery), so above
      // `spark.sql.sources.parallelPartitionDiscovery.threshold` (default 32)
      // Spark would launch a whole distributed LISTING JOB just to stat
      // them — one job per relation, several relations per read plan. A
      // driver-side stat of O(snapshot files) paths through the built-in
      // listing thread pool is cheaper at every scale that fits a driver
      // (the same reason manifest-backed table formats skip listing jobs);
      // raise the threshold for the duration of relation resolution.
      val key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
      val old = spark.conf.getOption(key)
      spark.conf.set(key, "8192")
      try spark.read.schema(schema).parquet(files.map(f => s"$path/$f"): _*)
      finally old match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }

  /** Arbitrate rows by key: max _lsn wins. Used by both the read
    * path (base ∪ deltas) and compaction. Input must carry op and _lsn.
    *
    * Implemented as a window row_number rather than `max_by(struct, struct)`:
    * a struct aggregation buffer forces ObjectHashAggregateExec, which
    * sort-falls-back after 128 groups per partition and spills — measured
    * ~20× slower at millions of keys. The window is one shuffle + an
    * in-memory per-partition sort, the sort-merge shape that scales.
    * Ties on _lsn occur only between byte-identical rows (re-applied
    * epochs, or a delta row meeting its own compacted copy), so any winner
    * is the same row — no secondary tie-break dimension is needed.
    */
  private def arbitrate(rows: DataFrame, payload: StructType): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_lsn").desc)
    rows
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select((Seq("conv_id", "turn_idx", "op", "_lsn") ++
        payload.fieldNames.filterNot(keyCols.contains)).map(col).toIndexedSeq: _*)
  }

  /** Arbitrated state (op + payload + _lsn) of DIRTY buckets without
    * shuffling a single base byte — the shape that decides whether a
    * steady-ingest table is readable at 100 TB. The window form
    * ([[arbitrate]] over base ∪ deltas) shuffles and sorts EVERY base row
    * of every dirty bucket per read; under continuous ingest most buckets
    * carry some delta, so a live read of a 10 TB table with 1 GB of fresh
    * deltas shuffles ~10 TB. Deltas, by construction (compaction keeps
    * them bounded), are the small side — so arbitration is reshaped around
    * broadcasting THEM:
    *
    *  1. winners   = window over delta rows only (shuffle O(deltas)), and
    *     delta max-lsn per key as a broadcastable aggregate;
    *  2. base side = full-width base scan LEFT ANTI broadcast(delta
    *     key+lsn) on null-safe keys with `delta_lsn >= base_lsn` in the
    *     condition: a base row survives unless a delta carries its key at
    *     an equal-or-higher lsn. The COMPARISON matters — lsns arbitrate,
    *     not commit order, so a late-committed lower-lsn delta must lose
    *     to the compacted row. Base stays in whole-stage codegen straight
    *     off the parquet scan — no exchange. (A single full_outer join
    *     would fold everything in, but Spark plans full-outer broadcast
    *     joins as sort-merge — verified — silently reintroducing the base
    *     shuffle; and emitting winner columns from a left_outer would
    *     re-plan the winners window once per reference.)
    *  3. delta side = ALL winner rows except those beaten by a strictly
    *     higher-lsn base row. Beaten keys come off a key+lsn-only base
    *     scan (parquet pruning: three columns, a few % of the bytes) LEFT
    *     SEMI broadcast(delta key+lsn) with `base_lsn > delta_lsn` — an
    *     O(|winners|)-row output — then a tiny broadcast anti join drops
    *     them from winners. Again no exchange against base.
    *
    * Two base scans (one full-width, one three-column) buy zero base-side
    * shuffle; on an object store the second scan's pruned read is noise
    * next to the exchange it replaces. Ties on `_lsn` keep the delta row —
    * by the engine's invariant (see [[arbitrate]]) ties are byte-identical
    * rows, so either choice is the same row.
    *
    * Falls back to the window form when the manifest cannot PROVE the
    * deltas are broadcastable: any delta file without commit-time byte
    * stats (legacy), or total delta bytes over
    * `spark.graft.mor.deltaBroadcastBytes` (default 32 MB of parquet —
    * roughly 100–150 MB in-memory). The fallback is the proven
    * one-shuffle sort shape, never an OOM-prone forced broadcast.
    */
  private def arbitrateDirty(s: Snapshot, dirty: Seq[BucketState],
                             fSchema: StructType): DataFrame = {
    val payload = s.schema
    val outCols = (Seq("conv_id", "turn_idx", "op", "_lsn") ++
      payload.fieldNames.filterNot(keyCols.contains)).toIndexedSeq
    val deltaFiles = dirty.flatMap(_.deltas)
    val baseFiles = dirty.flatMap(b => b.base ++ b.tombs.getOrElse(Nil))
    val deltaBytes = deltaFiles.foldLeft(Option(0L)) { (acc, f) =>
      for { a <- acc; st <- s.fileStats.get(f); b <- st.bytes } yield a + b
    }
    val threshold = spark.conf
      .get("spark.graft.mor.deltaBroadcastBytes", (32L * 1024 * 1024).toString)
      .toLong
    if (!deltaBytes.exists(_ <= threshold))
      return arbitrate(scanFiles(dirty.flatMap(_.allFiles), fSchema), payload)
    val winners = arbitrate(scanFiles(deltaFiles, fSchema), payload)
    if (baseFiles.isEmpty) return winners // never-compacted buckets
    // delta max-lsn per key as an AGGREGATE, not a second window: it is
    // referenced twice below, and a partial-aggregated groupBy over the
    // small delta side re-plans cheaply where a window would not
    val wKeyLsn = scanFiles(deltaFiles, fSchema)
      .groupBy(keyCols.map(col): _*).agg(max(col("_lsn")).as("__d__lsn"))
      .select((keyCols.map(c => col(c).as(s"__d_$c")) :+ col("__d__lsn")): _*)
    // null-safe: the window groups null keys together, the joins must too
    val keyMatch = keyCols.map(k => col(k) <=> col(s"__d_$k")).reduce(_ && _)
    // base rows survive unless a delta carries the key at an >= lsn
    // (ties are byte-identical rows — either side is the same row)
    val part1 = scanFiles(baseFiles, fSchema).select(outCols.map(col): _*)
      .join(broadcast(wKeyLsn),
        keyMatch && col("__d__lsn") >= col("_lsn"), "left_anti")
    // winners lose only to a base row with a strictly higher lsn; find
    // those keys off a key+lsn-only base scan (parquet-pruned to 3 cols)
    val beaten = scanFiles(baseFiles, fSchema)
      .select((keyCols :+ "_lsn").map(col): _*)
      .join(broadcast(wKeyLsn),
        keyMatch && col("_lsn") > col("__d__lsn"), "left_semi")
      .select(keyCols.map(c => col(c).as(s"__b_$c")): _*)
    val beatMatch = keyCols.map(k => col(k) <=> col(s"__b_$k")).reduce(_ && _)
    val winnersOut = winners.join(broadcast(beaten), beatMatch, "left_anti")
    part1.unionByName(winnersOut)
  }

  /** Current live state (payload columns only). */
  def read(): DataFrame = readWithLsn().drop("_lsn")

  /** TIME TRAVEL: the live state as of snapshot `version` — same
    * merge-on-read plan, older manifest. Valid while the snapshot (and the
    * files it references) survive [[vacuum]]'s retention window; a vacuumed
    * version fails loudly on open, never returns partial state.
    */
  def readAsOf(version: Long): DataFrame = {
    require(Files.exists(snapPath(version)),
      s"snapshot v$version does not exist at $path (never written, or " +
        "vacuumed past the retention window)")
    readState(readSnapshot(version)).where(col("op") =!= "D").drop("op", "_lsn")
  }

  /** Per-instance (version → commitTimeMs) cache backing `TIMESTAMP AS OF`
    * resolution. A published snapshot's commit time is immutable, but the
    * PATH is not its identity (drop-and-recreate reuses v0000000001.json),
    * so entries key on the file's attributes like [[snapCache]]. Unbounded
    * is fine: 16 bytes per retained version.
    */
  private val commitTimeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()
  /** Flat-JSON parses performed by timestamp resolution — observable so a
    * test can pin the O(log V) bound. */
  private[graft] var commitTimeParses: Long = 0L

  private def commitTimeOf(v: Long): Long = {
    val key =
      try {
        val a = Files.readAttributes(snapPath(v),
          classOf[java.nio.file.attribute.BasicFileAttributes])
        s"$v:${a.fileKey}:${a.lastModifiedTime.toMillis}:${a.size}"
      } catch { case _: java.io.IOException => null }
    if (key == null) return parseCommitTime(v)
    val cached = commitTimeCache.get(key)
    if (cached != 0L || commitTimeCache.containsKey(key)) cached
    else {
      val t = parseCommitTime(v)
      commitTimeCache.put(key, t)
      t
    }
  }

  private def parseCommitTime(v: Long): Long = {
    commitTimeParses += 1
    val root = mapper.readTree(Files.readString(snapPath(v)))
    Option(root.get("commitTimeMs")).map(_.asLong).getOrElse(0L)
  }

  /** Resolve `TIMESTAMP AS OF`: the latest RETAINED snapshot whose
    * wall-clock commit time is ≤ `tsMillis`. Flat-JSON reads only (no
    * manifest reconstruction), and only O(log V) of them: commit times are
    * written MONOTONE in version ([[nextCommitTimeMs]]; legacy snapshots
    * without one read as 0, which sorts below every real time), so a
    * binary search over the sorted version listing finds the boundary —
    * resolution cost is independent of retained-history length. Loud when
    * nothing retained qualifies — either the time predates the retained
    * history (vacuumed) or targets a legacy snapshot without a recorded
    * commit time; silently serving a different version would lie.
    */
  def versionAsOfTimestamp(tsMillis: Long): Long = {
    require(Files.isDirectory(snapDir),
      s"no graftlake table at $path — nothing to time-travel into")
    val versions = listDir(snapDir)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.substring(1, n.length - 5).toLong).sorted.toIndexedSeq
    // rightmost version with 0 < commitTime <= tsMillis
    var lo = 0
    var hi = versions.length - 1
    var hit = -1L
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val t = commitTimeOf(versions(mid))
      if (t > 0L && t <= tsMillis) { hit = versions(mid); lo = mid + 1 }
      else if (t > tsMillis) hi = mid - 1
      else lo = mid + 1 // legacy t=0 sorts below every real time: go right
    }
    if (hit < 0L) throw new IllegalArgumentException(
      s"no retained snapshot at $path committed at or before " +
        s"timestamp $tsMillis (earliest retained: " +
        s"${versions.iterator.map(v => v -> commitTimeOf(v))
          .collectFirst { case (v, t) if t > 0 => s"v$v@$t" }
          .getOrElse("none with a commit time")}) — " +
        "history vacuumed, or the table predates commit-time recording")
    hit
  }

  /** Live state as of the last commit at/before wall-clock `tsMillis`. */
  def readAsOfTimestamp(tsMillis: Long): DataFrame =
    readAsOf(versionAsOfTimestamp(tsMillis))

  /** Merge-on-read, PER BUCKET: only buckets that actually carry deltas pay
    * the arbitration window; delta-free buckets stream through the compacted
    * fast path (bases hold one row per key already) and the two branches
    * union. One hot bucket with one delta therefore costs that bucket's
    * shuffle+sort — never a full-table re-arbitration.
    */
  def readWithLsn(): DataFrame = currentSnapshot match {
    case None => spark.emptyDataFrame
    case Some(s) => readState(s).where(col("op") =!= "D").drop("op")
  }

  /** Arbitrated state (op + payload + _lsn) of an arbitrary snapshot. */
  private def readState(s: Snapshot): DataFrame = {
    checkBuckets(s)
    val schema = fileSchema(s.schema)
    val (dirty, clean) = s.buckets.values.toSeq.partition(_.deltas.nonEmpty)
    val outCols = (Seq("conv_id", "turn_idx", "op", "_lsn") ++
      s.schema.fieldNames.filterNot(keyCols.contains)).map(col).toIndexedSeq
    val cleanPart = scanFiles(clean.flatMap(_.base), schema).select(outCols: _*)
    val dirtyPart =
      if (dirty.isEmpty) None
      else Some(arbitrateDirty(s, dirty, schema))
    dirtyPart.fold(cleanPart)(cleanPart.unionByName(_))
  }

  /** Live state restricted to rows with event time `ts` in
    * `[loTsMicros, hiTsMicros]`, with manifest-stat FILE skipping: clean
    * buckets scan only base files whose footer ts range intersects (exact —
    * a compacted base holds one row per key, so a skipped file's rows could
    * never be resurrected by rows elsewhere). Dirty buckets are scanned in
    * full before arbitration: dropping one of their files could promote a
    * stale revision of a key whose true winner lives in the skipped file, so
    * correctness forbids pruning there — the steady state (compacted, mostly
    * clean) is where the skipping pays.
    */
  def readTimeRange(loTsMicros: Long, hiTsMicros: Long): DataFrame = currentSnapshot match {
    case None => spark.emptyDataFrame
    case Some(s) =>
      checkBuckets(s)
      require(s.schema.fieldNames.contains("ts"),
        s"readTimeRange needs a 'ts' column; table at $path has none")
      val schema = fileSchema(s.schema)
      val (dirty, clean) = s.buckets.values.toSeq.partition(_.deltas.nonEmpty)
      val outCols = (Seq("conv_id", "turn_idx", "op", "_lsn") ++
        s.schema.fieldNames.filterNot(keyCols.contains)).map(col).toIndexedSeq
      val cleanFiles = clean.flatMap(_.base).filter { f =>
        s.fileStats.get(f) match {
          case Some(st) => st.minTs.forall(_ <= hiTsMicros) && st.maxTs.forall(_ >= loTsMicros)
          case None     => true
        }
      }
      val cleanPart = scanFiles(cleanFiles, schema).select(outCols: _*)
      val dirtyPart =
        if (dirty.isEmpty) None
        else Some(arbitrateDirty(s, dirty, schema))
      dirtyPart.fold(cleanPart)(cleanPart.unionByName(_))
        .where(col("op") =!= "D" &&
          unix_micros(col("ts")).between(loTsMicros, hiTsMicros))
        .drop("op", "_lsn")
  }

  /** INCREMENTAL READ (change-data-feed): the raw change rows committed
    * after snapshot `sinceVersion`, with op / payload / `_lsn` /
    * `_commit_version`. An incremental consumer holding state as of v
    * applies these through the same last-writer-wins arbitration and lands
    * on the current state — no full-table rescan (cost = the new deltas,
    * not the table; the CDC contract downstream pipelines consume).
    *
    * Works from the snapshot history: commit w's NEW delta files are those
    * whose epoch directory encodes version w (compaction rewrites carry no
    * new changes and contribute nothing). Valid while snapshots back to
    * `sinceVersion+1` survive the retention window — a vacuumed history
    * fails loudly rather than silently skipping commits.
    */
  def changesSince(sinceVersion: Long): DataFrame =
    changesWhere(sinceVersion, None, None)

  /** Change rows of commits in `(sinceVersion, untilVersion]` — the
    * version-bounded batch the streaming change-feed source replays
    * deterministically (same bounds ⇒ same rows, however many commits land
    * later; the checkpoint-recovery contract).
    */
  def changesBetween(sinceVersion: Long, untilVersion: Long): DataFrame =
    changesWhere(sinceVersion, Some(untilVersion), None)

  /** [[changesSince]] restricted to change rows whose event time `ts` lies in
    * `[loTsMicros, hiTsMicros]` — the "what changed yesterday" CDC query.
    * Files whose footer-stat ts range does not intersect are pruned from the
    * MANIFEST (no footer is opened at read time); skipping raw change files
    * is exact because the change feed is unarbitrated — every row stands
    * alone, so dropping a disjoint file can never change another row.
    */
  def changesInRange(loTsMicros: Long, hiTsMicros: Long,
                     sinceVersion: Long = 0L): DataFrame =
    changesWhere(sinceVersion, None, Some((loTsMicros, hiTsMicros)))

  private def changesWhere(sinceVersion: Long,
                           untilVersion: Option[Long],
                           tsRange: Option[(Long, Long)]): DataFrame = currentSnapshot match {
    case None => spark.emptyDataFrame
    case Some(cur) =>
      checkBuckets(cur)
      require(tsRange.isEmpty || cur.schema.fieldNames.contains("ts"),
        s"changesInRange needs a 'ts' column; table at $path has none")
      val schema = fileSchema(cur.schema)
      val hi = math.min(cur.version, untilVersion.getOrElse(cur.version))
      // Driver-side metadata walk: one sidecar JSON per commit. The PLAN is
      // a single parquet scan over the union of every commit's change files —
      // a consumer catching up over 10^4 commits costs 10^4 manifest reads
      // (metadata), never a 10^4-arm union plan (the analyzer blowup the
      // per-commit-scan shape hit at depth).
      val statsAcc = scala.collection.mutable.Map.empty[String, FileStat]
      val byVersion: Seq[(Long, Seq[String])] = ((sinceVersion + 1) to hi).map { w =>
        val (files, stats) = changeFilesWithStats(w)
        statsAcc ++= stats
        w -> (tsRange match {
          case None => files
          case Some((lo, hi)) => files.filter { f =>
            stats.get(f) match {
              case Some(st) => st.minTs.forall(_ <= hi) && st.maxTs.forall(_ >= lo)
              case None     => true // no stats ⇒ never skip
            }
          }
        })
      }.filter(_._2.nonEmpty)
      val out =
        if (byVersion.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(schema.fields :+ StructField("_commit_version", LongType)))
        else {
          // ONE parquet relation; `_commit_version` is a PARTITION column of
          // an explicit-listing file index (a per-file constant attached by
          // the scan — no per-row path parsing), and version predicates
          // partition-prune whole commits out of the file list.
          val index = new VersionedChangeFileIndex(spark, path, byVersion,
            rel => statsAcc.get(rel).flatMap(_.bytes))
          val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
            index, index.partitionSchema, schema, None,
            new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
            Map.empty[String, String])(
            spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
          org.apache.spark.sql.graftbridge.ofRows(spark,
            org.apache.spark.sql.execution.datasources.LogicalRelation(relation))
        }
      tsRange.fold(out) { case (lo, hi) =>
        out.where(col("ts").isNotNull &&
          unix_micros(col("ts")).between(lo, hi))
      }
  }

  // ---- per-commit change-manifest SIDECAR -----------------------------------
  //
  // The snapshot JSON is O(table files) — bucket lists + fileStats — so a
  // change-feed consumer catching up over V commits would pay O(V × files)
  // of driver JSON parsing if it had to open every snapshot. The winner of
  // each commit therefore also writes changes/c<version>.json holding ONLY
  // that commit's change files (+ their stats): catch-up cost becomes
  // O(V × changed), the scalable shape. The snapshot's changeFiles field
  // stays the source of truth — a crash between snapshot publish and sidecar
  // write just falls back to parsing that snapshot.

  private def changePath(v: Long): Path = changesDir.resolve(f"c$v%010d.json")

  /** Commit `w`'s change files + their stats: the O(commit)-sized sidecar
    * first; the snapshot JSON only when the sidecar is missing (crash
    * window, legacy). Loud when the history has been vacuumed past `w` —
    * an incremental consumer must never silently skip commits. Shared by
    * the batch change feed and the streaming MicroBatchStream.
    */
  private[lake] def changeFilesWithStats(w: Long): (Seq[String], Map[String, FileStat]) = {
    require(Files.exists(snapPath(w)),
      s"snapshot v$w missing at $path — history vacuumed past this " +
        "incremental read's window")
    readChangeManifest(w).getOrElse {
      val s = readSnapshot(w)
      val fs = s.changeFiles.getOrElse {
        // legacy snapshot without a change manifest: fall back to the
        // state diff (correct only when commit w did not inline-compact
        // its own deltas — all post-manifest tables record changeFiles)
        s.buckets.values.flatMap(_.deltas)
          .filter(f => dirVersionOf(f).contains(w)).toSeq
      }
      (fs, s.fileStats)
    }
  }

  private def writeChangeManifest(version: Long, files: Seq[String],
                                  stats: Map[String, FileStat]): Unit = {
    val node = mapper.createObjectNode()
    node.put("version", version)
    val fa = node.putArray("files"); files.foreach(fa.add)
    val sn = node.putObject("stats")
    files.flatMap(f => stats.get(f).map(f -> _)).foreach { case (f, st) =>
      putStat(sn.putObject(f), st)
    }
    // plain write is fine: only the CAS winner for `version` calls this
    Files.createDirectories(changesDir)
    Files.writeString(changePath(version), mapper.writeValueAsString(node))
  }

  private def readChangeManifest(v: Long): Option[(Seq[String], Map[String, FileStat])] = {
    if (!Files.exists(changePath(v))) return None
    val node = mapper.readTree(Files.readString(changePath(v)))
    val files = node.get("files").elements().asScala.map(_.asText).toSeq
    Some((files, parseStats(node.get("stats"))))
  }

  // ---- per-commit BUCKET MANIFESTS (the snapshot's file inventory) ----------
  //
  // manifests/m<version>-<nonce>.json — immutable; holds the full new state
  // (base/deltas/tombs + per-file stats) of ONLY the buckets that commit
  // changed. The snapshot's manifestList orders them; reconstruction folds
  // the list with later-wins-per-bucket. Commit metadata therefore costs
  // O(changed buckets), and every ~maxManifests commits one merged manifest
  // (full state) resets the list — amortized O(table/maxManifests), the
  // Iceberg manifest-list shape. CAS losers' manifests are orphans under
  // the same version-guard vacuum rule as data files.

  private def writeManifest(version: Long,
                            entries: Map[Int, BucketState],
                            stats: Map[String, FileStat]): String = {
    val rel = f"manifests/m$version%010d-${nonce()}.json"
    val node = mapper.createObjectNode()
    node.put("version", version)
    val bn = node.putObject("buckets")
    entries.foreach { case (b, st) =>
      val o = bn.putObject(b.toString)
      val ba = o.putArray("base"); st.base.foreach(ba.add)
      val da = o.putArray("deltas"); st.deltas.foreach(da.add)
      st.tombs.foreach { ts => val ta = o.putArray("tombs"); ts.foreach(ta.add) }
      val sn = o.putObject("stats")
      st.allFiles.flatMap(f => stats.get(f).map(f -> _))
        .foreach { case (f, fs) => putStat(sn.putObject(f), fs) }
    }
    Files.createDirectories(manifestsDir)
    Files.writeString(Paths.get(path, rel),
      mapper.writeValueAsString(node))
    rel
  }

  private def readManifest(rel: String): Map[Int, (BucketState, Map[String, FileStat])] = {
    val node = LakeTable.manifestNode(mapper, s"$path/$rel")
    node.get("buckets").fields().asScala.map { e =>
      val o = e.getValue
      val base = o.get("base").elements().asScala.map(_.asText).toSeq
      val deltas = o.get("deltas").elements().asScala.map(_.asText).toSeq
      val tombs = Option(o.get("tombs")).map(_.elements().asScala.map(_.asText).toSeq)
      val stats = Option(o.get("stats")).map(parseStats).getOrElse(Map.empty[String, FileStat])
      e.getKey.toInt -> (BucketState(base, deltas, tombs), stats)
    }.toMap
  }

  /** Write this commit's manifest(s) and return the new manifest list.
    * Normally appends ONE manifest covering `changed`; writes a single
    * MERGED manifest of the whole table instead when the list would exceed
    * [[maxManifests]] or when upgrading a legacy inline snapshot (whose
    * buckets no manifest covers yet).
    */
  private def writeManifests(version: Long,
                             finalBuckets: Map[Int, BucketState],
                             stats: Map[String, FileStat],
                             changed: Seq[Int],
                             prev: Option[Snapshot]): Seq[String] = {
    val prevList = prev.map(_.manifestList).getOrElse(Nil)
    val legacyUpgrade = prevList.isEmpty && prev.exists(_.buckets.nonEmpty)
    val mergeAll = legacyUpgrade || prevList.size + 1 > maxManifests
    if (mergeAll)
      Seq(writeManifest(version, finalBuckets, stats))
    else if (changed.isEmpty) prevList
    else {
      val entries = changed.distinct.sorted
        .flatMap(b => finalBuckets.get(b).map(b -> _)).toMap
      prevList :+ writeManifest(version, entries, stats)
    }
  }

  /** Version encoded in a data file's epoch dir — the version of the commit
    * that (if it succeeded) published the file. Both merge-delta dirs
    * (data/e<ver>-<nonce>/…) and compaction dirs (data/e<ver>-c-<nonce>/…)
    * encode it.
    */
  private def dirVersionOf(file: String): Option[Long] = {
    val dir = file.split('/')(1)
    val parts = dir.split('-')
    if (parts.isEmpty || !parts(0).startsWith("e")) None
    else parts(0).drop(1).toLongOption
  }

  /** Footer column ranges of freshly-written files, read ONCE at commit time
    * (driver-side; the footer is a few KB — one open per new file per epoch,
    * metadata-cost not scan-cost). Best-effort: a file whose stats cannot be
    * read is simply absent from the map and never skipped.
    */
  private def readFileStats(relFiles: Seq[String]): Map[String, FileStat] = {
    val hconf = spark.sessionState.newHadoopConf()
    // Bounded-parallel footer reads: an epoch writes O(buckets × salt) small
    // files and the open+parse is I/O-latency-bound — serially this is a
    // visible constant driver cost per commit (and a fixed cost is exactly
    // what erodes scaling efficiency); 8 shared daemon threads collapse it
    // to ~the latency of one footer, without a pool churn per commit.
    relFiles.map { rel =>
      LakeTable.footerPool.submit(
        new java.util.concurrent.Callable[Option[(String, FileStat)]] {
          override def call(): Option[(String, FileStat)] = statOne(rel, hconf)
        })
    }.flatMap(_.get()).toMap
  }

  private def statOne(rel: String,
                      hconf: org.apache.hadoop.conf.Configuration): Option[(String, FileStat)] = {
      try {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"$path/$rel"), hconf)
        scala.util.Using.resource(org.apache.parquet.hadoop.ParquetFileReader.open(in)) { r =>
          val blocks = r.getFooter.getBlocks.asScala.toSeq
          def colRange(name: String): Option[(Long, Long)] = {
            val cols = blocks.flatMap(_.getColumns.asScala)
              .filter(_.getPath.toDotString == name)
            val stats = cols.map(_.getStatistics)
              .filter(s => s != null && s.hasNonNullValue)
            if (stats.isEmpty || stats.size != cols.size) None
            else Some((
              stats.map(_.genericGetMin.asInstanceOf[Number].longValue).min,
              stats.map(_.genericGetMax.asInstanceOf[Number].longValue).max))
          }
          // op column: min/max over {'D','U'} — a min above "D" proves the
          // file holds no tombstone (GC-skippable by metadata alone).
          def noTombs: Boolean = {
            val cols = blocks.flatMap(_.getColumns.asScala)
              .filter(_.getPath.toDotString == "op")
            val stats = cols.map(_.getStatistics)
              .filter(s => s != null && s.hasNonNullValue)
            stats.nonEmpty && stats.size == cols.size && stats.forall { s =>
              new String(s.getMinBytes, java.nio.charset.StandardCharsets.UTF_8) != "D"
            }
          }
          colRange("_lsn").map { case (lmin, lmax) =>
            val ts = colRange("ts")
            val nCols = r.getFooter.getFileMetaData.getSchema.getFieldCount
            rel -> FileStat(lmin, lmax, ts.map(_._1), ts.map(_._2), noTombs,
              Some(nCols), Some(in.getLength))
          }
        }
      } catch { case _: Exception => None }
  }

  // ---- merge (the sink) ----------------------------------------------------

  final case class MergeResult(
      applied: Boolean, version: Long, events: Long, upserts: Long,
      deletes: Long, touchedBuckets: Int, compactedBuckets: Int,
      highWaterMicros: Long)

  /** Idempotent MERGE of a change batch, keyed (conv_id, turn_idx).
    *
    * Semantics == `MERGE INTO t USING batch ON key WHEN MATCHED AND op='D'
    * THEN DELETE / WHEN MATCHED AND s.lsn >= t._lsn THEN UPDATE / WHEN NOT
    * MATCHED THEN INSERT`, realized as delta append + read-side arbitration.
    * O(batch) write cost; compaction amortizes read amplification.
    *
    * Concurrency: optimistic. A concurrent committer of the same version
    * raises [[CommitConflictException]] (snapshot publish is compare-and-
    * swap); the caller retries the merge, which re-reads the new snapshot.
    * The failed attempt's data files are unreferenced orphans — vacuum
    * reclaims them.
    */
  def merge(batch: DataFrame, epochNs: String, epochId: Long): MergeResult = {
    val prev = currentSnapshot
    prev.foreach(checkBuckets)
    val alreadyCommitted =
      prev.exists(_.committedEpochs.get(epochNs).exists(_ >= epochId))
    if (alreadyCommitted) {
      val s = prev.get
      MergeResult(applied = false, s.version, 0, 0, 0, 0, 0, s.highWaterMicros)
    } else mergeUncommitted(batch, epochNs, epochId, prev)
  }

  /** [[merge]] with bounded optimistic retries: on a lost commit race the
    * merge re-reads the winner's snapshot and re-applies (the epoch manifest
    * still dedups a batch that actually committed). The loop is the whole
    * multi-writer protocol — writers need no lock service, just this.
    */
  def mergeWithRetry(batch: DataFrame, epochNs: String, epochId: Long,
                     maxRetries: Int = 5): MergeResult = {
    var attempt = 0
    while (true) {
      try return merge(batch, epochNs, epochId)
      catch {
        case e: CommitConflictException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** SQL-surface append (`INSERT INTO` / `df.write.format("graftlake")`):
    * plain payload rows become upserts. Missing CDC envelope columns are
    * synthesized — op='U', commit_ts=now, and PER-ROW lsns above the
    * snapshot's `max_lsn`: within each key the batch's rows are numbered in
    * a deterministic sort over the orderable payload columns, so two rows
    * with the same key in one INSERT resolve to a deterministic winner (the
    * last in sort order) instead of tying. A CDC feed with real per-row
    * lsns should use [[merge]] directly.
    *
    * Epoch id self-allocates per attempt inside the retry loop, so a lost
    * commit race re-reads both the winner's max_lsn and the next epoch id.
    * Returns only an APPLIED result (or throws): this call allocates a
    * fresh id past every committed one, so `merge` answering
    * `applied=false` can only mean a concurrent writer burned the id with a
    * DIFFERENT batch — acknowledging that as success would silently drop
    * this writer's rows. There is no crash-replay contract to preserve here
    * (the id was never handed to the caller), so the loser re-reads the
    * snapshot and retries under a fresh (epochId, lsn) allocation.
    */
  def appendAsUpserts(data: DataFrame, maxRetries: Int = 5): MergeResult = {
    val ns = "sql-append"
    var attempt = 0
    while (true) {
      val prev = currentSnapshot
      val epochId = prev.flatMap(_.committedEpochs.get(ns)).getOrElse(-1L) + 1
      val lsnBase = prev.flatMap(_.metrics.get("max_lsn")).getOrElse(0L)
      val nowMicros = System.currentTimeMillis() * 1000L
      val batch = synthesizeEnvelope(data, lsnBase, nowMicros)
      val merged =
        try Some(merge(batch, ns, epochId))
        catch { case _: CommitConflictException => None }
      merged match {
        case Some(r) if r.applied => return r
        case _ => // lost the CAS, or a racer burned this attempt's epoch id
          attempt += 1
          if (attempt > maxRetries) throw new CommitConflictException(
            s"appendAsUpserts at $path lost the commit race $attempt times " +
              "(concurrent writers kept burning the self-allocated epoch id)")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Synthesize the CDC envelope on a plain payload batch — op='U',
    * commit_ts=now, and PER-ROW lsns `lsnBase + row_number` within each
    * key, ordered over the orderable payload columns (nulls first; ties
    * are byte-identical rows, so any winner is the same row). Partitioned
    * by key — the numbering shuffle distributes, never a single-task
    * global window. Columns already present pass through untouched.
    *
    * DETERMINISM CONTRACT: the same-key winner is deterministic over the
    * ORDERABLE projection of the payload. Two same-key rows
    * distinguishable ONLY by a non-orderable column (map, or a struct
    * containing one) would tie nondeterministically — rejected loudly when
    * NO payload column is orderable (the fully undefined case); a mixed
    * schema where orderable columns tie is documented as
    * arbitrary-but-single-winner.
    */
  private def synthesizeEnvelope(data: DataFrame, lsnBase: Long,
                                 nowMicros: Long): DataFrame = {
    var batch = data
    if (!batch.columns.contains("op")) batch = batch.withColumn("op", lit("U"))
    if (!batch.columns.contains("lsn")) {
      val payloadFields = batch.schema.fields.toSeq
        .filterNot(f => keyCols.contains(f.name) || f.name == "op")
      val orderCols = payloadFields
        .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(f.dataType))
        .map(f => col(f.name).asc_nulls_first)
      require(orderCols.nonEmpty || payloadFields.isEmpty,
        s"synthesized write at $path: no payload column of " +
          s"(${payloadFields.map(_.name).mkString(", ")}) is orderable, so " +
          "same-key rows in one batch would resolve to a nondeterministic " +
          "winner — supply an explicit 'lsn' column to order them")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy((if (orderCols.isEmpty) Seq(lit(1).asc) else orderCols): _*)
      batch = batch.withColumn("lsn", lit(lsnBase) + row_number().over(w))
    }
    if (!batch.columns.contains("commit_ts"))
      batch = batch.withColumn("commit_ts", timestamp_micros(lit(nowMicros)))
    batch
  }

  /** SQL `INSERT OVERWRITE` / `SaveMode.Overwrite`: replace the table's
    * LIVE state with `data` in ONE atomic epoch — merge-on-read, never a
    * directory swap. The batch is (a tombstone for every currently-live
    * key at `max_lsn + 1`) ∪ (the new rows at per-row lsns from
    * `max_lsn + 2`), so a key present in both old and new state is
    * deterministically re-inserted over its own tombstone — the exact lsn
    * pair the row-level UPDATE path uses. Readers at the previous version
    * keep it; `VERSION AS OF` history survives; the change feed shows the
    * swap as ordinary D/U change rows; compaction + GC fold the dead
    * generation out later. O(live keys + new rows) delta bytes.
    *
    * `data` must be a PLAIN payload frame (no op/lsn columns): an
    * overwrite defines the table's new ordering baseline itself — caller-
    * supplied lsns could interleave below the tombstones and silently lose.
    */
  def overwriteWith(data: DataFrame, maxRetries: Int = 5): MergeResult = {
    require(!data.columns.contains("op") && !data.columns.contains("lsn"),
      s"overwriteWith at $path takes a plain payload frame — op/lsn are " +
        "allocated by the overwrite itself (caller lsns could sort below " +
        "the generation tombstones and silently lose)")
    val ns = "sql-overwrite"
    var attempt = 0
    while (true) {
      val prev = currentSnapshot
      if (prev.isEmpty) return appendAsUpserts(data, maxRetries) // fresh path: a create
      val epochId = prev.flatMap(_.committedEpochs.get(ns)).getOrElse(-1L) + 1
      val lsnDelete = prev.flatMap(_.metrics.get("max_lsn")).getOrElse(0L) + 1
      val nowMicros = System.currentTimeMillis() * 1000L
      val tombstones = readState(prev.get).where(col("op") =!= "D")
        .select(keyCols.map(col): _*)
        .withColumn("op", lit("D"))
        .withColumn("lsn", lit(lsnDelete))
        .withColumn("commit_ts", timestamp_micros(lit(nowMicros)))
      val upserts = synthesizeEnvelope(data, lsnDelete, nowMicros)
      val batch = tombstones.unionByName(upserts, allowMissingColumns = true)
      val merged =
        try Some(merge(batch, ns, epochId))
        catch { case _: CommitConflictException => None }
      merged match {
        case Some(r) if r.applied => return r
        case _ => // lost the CAS, or a racer burned this attempt's epoch id
          attempt += 1
          if (attempt > maxRetries) throw new CommitConflictException(
            s"overwriteWith at $path lost the commit race $attempt times")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Pre-declare additive payload columns (the `ALTER TABLE ADD COLUMN`
    * surface): an empty merge carrying the widened schema. The new columns
    * read as null in all existing rows — exactly the semantics a widened
    * batch would have produced, but available to SQL-only users before any
    * row carries the column. Additive ONLY: duplicate names fail loudly.
    */
  def evolveSchema(newFields: Seq[StructField], maxRetries: Int = 5): Unit = {
    require(newFields.nonEmpty, "evolveSchema needs at least one new column")
    val ns = "alter-table"
    var attempt = 0
    while (true) {
      val prev = currentSnapshot.getOrElse(throw new IllegalStateException(
        s"cannot evolve schema of $path: no snapshot yet (create the table first)"))
      val dup = newFields.map(_.name).filter(prev.schema.fieldNames.contains)
      require(dup.isEmpty,
        s"column(s) ${dup.mkString(", ")} already exist at $path — " +
          "graftlake schema evolution is additive only")
      val widened = StructType(Seq(
        StructField("op", org.apache.spark.sql.types.StringType),
        StructField("lsn", LongType),
        StructField("commit_ts", org.apache.spark.sql.types.TimestampType)) ++
        prev.schema.fields ++ newFields)
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], widened)
      val epochId = prev.committedEpochs.getOrElse(ns, -1L) + 1
      val merged =
        try Some(merge(empty, ns, epochId))
        catch { case _: CommitConflictException => None }
      merged match {
        case Some(r) if r.applied => return
        case _ => // racer burned the id or won the CAS — re-read and retry
          attempt += 1
          if (attempt > maxRetries) throw new CommitConflictException(
            s"evolveSchema at $path lost the commit race $attempt times")
      }
    }
  }

  /** SQL `DELETE FROM … WHERE cond`: tombstone the LIVE rows matching
    * `cond`. CDC-native delete — an O(matched) merge of 'D' rows under a
    * fresh lsn above all prior state, never a rewrite: the tombstones win
    * last-writer-wins, compaction folds them, GC ages them out. The match
    * is evaluated against the arbitrated live state inside each retry
    * attempt, so a concurrent commit re-evaluates which rows die.
    * Returns the number of rows tombstoned.
    */
  def deleteWhere(cond: org.apache.spark.sql.Column, maxRetries: Int = 5): Long = {
    val ns = "sql-delete"
    var attempt = 0
    while (true) {
      val prev = currentSnapshot
      if (prev.isEmpty) return 0L
      val epochId = prev.flatMap(_.committedEpochs.get(ns)).getOrElse(-1L) + 1
      val lsn = prev.flatMap(_.metrics.get("max_lsn")).getOrElse(0L) + 1
      // SINGLE-PASS: the arbitrated match plan executes once. Persisting the
      // doomed key set lets the emptiness check (skip a no-op commit) and
      // the merge's delta write share one execution of the match lineage —
      // the naive isEmpty-then-merge shape re-runs the whole arbitration,
      // 2× the match cost per DELETE on a large matched set. The key set is
      // O(matched keys), the small thing by construction.
      val doomed = readState(prev.get).where(col("op") =!= "D").drop("op", "_lsn")
        .where(cond).select(keyCols.map(col): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        if (doomed.isEmpty) return 0L
        val batch = doomed
          .withColumn("op", lit("D"))
          .withColumn("lsn", lit(lsn))
          .withColumn("commit_ts",
            timestamp_micros(lit(System.currentTimeMillis() * 1000L)))
        val merged =
          try Some(merge(batch, ns, epochId))
          catch { case _: CommitConflictException => None }
        merged match {
          case Some(r) if r.applied => return r.deletes
          case _ => // lost the CAS or a racer burned the id — re-read, retry
            attempt += 1
            if (attempt > maxRetries) throw new CommitConflictException(
              s"deleteWhere at $path lost the commit race $attempt times")
        }
      } finally doomed.unpersist(blocking = false)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Restore the LIVE state to that of `version`, as a NEW commit (SQL
    * surface: `CALL system.rollback`). History is preserved — the rollback
    * is itself a versioned commit — and, unlike a metadata-only RESTORE
    * that re-points files (the mainstream-lakehouse shape, which emits no
    * change rows and silently strands change-feed consumers), the reversal
    * FLOWS THROUGH the change feed: downstream mirrors converge to the
    * rolled-back state like any other commit.
    *
    * Diff-based: only keys whose full live row differs from the target
    * version's move — re-inserts/updates as upserts, keys born after
    * `version` as tombstones. Write cost O(diff). Compare cost is bounded
    * by the CHANGE FEED, not the table: every key that can differ between
    * the two states appears in some change row of `(version, head]`, and
    * the cumulative-event delta since the mark (snapshot metrics — a
    * metadata subtraction) bounds how many there are. When that churn fits
    * `spark.graft.rollback.touchedKeysCap` (default 2M keys), both diff
    * sides are first semi-joined down to the broadcast touched-key set, so
    * the two-sided exceptAll runs over O(churn) rows and — with the
    * broadcast merge-on-read shape — the whole rollback plans without a
    * full-table exchange. Larger churn (or a legacy table without event
    * metrics) falls back to the full two-sided diff. Columns added
    * after `version` stay in the schema (evolution is additive) and read
    * null on restored rows — the value they had at `version`.
    * Map-typed payloads can't participate in set-difference; those tables
    * fall back to re-upserting every target-version row (still diffed on
    * keys for the delete side).
    */
  def rollbackTo(version: Long, maxRetries: Int = 5): MergeResult = {
    val ns = "sql-rollback"
    var attempt = 0
    while (true) {
      val prev = currentSnapshot.getOrElse(throw new IllegalStateException(
        s"cannot rollback $path: no snapshot yet"))
      require(version <= prev.version,
        s"cannot rollback $path to v$version: latest is v${prev.version}")
      if (version == prev.version)
        return MergeResult(applied = false, prev.version, 0, 0, 0, 0, 0,
          prev.highWaterMicros)
      val epochId = prev.committedEpochs.getOrElse(ns, -1L) + 1
      val lsn = prev.metrics.getOrElse("max_lsn", 0L) + 1
      val nowMicros = System.currentTimeMillis() * 1000L
      val target = readAsOf(version) // payload frame, one row per live key
      val current = readState(prev).where(col("op") =!= "D").drop("op", "_lsn")
      // widen the old state to the current (possibly evolved) schema: a row
      // that differs ONLY in a post-version column must still roll back
      val targetW = current.columns.foldLeft(target)((df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(current.schema(c).dataType)))
        .select(current.columns.map(col): _*)
      def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
        case _: org.apache.spark.sql.types.MapType => true
        case s: StructType => s.fields.exists(f => hasMap(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
        case _ => false
      }
      val setOpsOk = !hasMap(current.schema)
      // Untouched keys are identical in both states by construction — the
      // change feed names every key that could differ. Small churn ⇒
      // restrict both sides to the broadcast touched-key set before
      // diffing (see scaladoc).
      val churn = prev.metrics.get("total_events")
        .flatMap(head => snapshotAt(version).metrics.get("total_events")
          .map(head - _))
      val touchedCap = spark.conf
        .get("spark.graft.rollback.touchedKeysCap", "2000000").toLong
      val churnBounded = churn.exists(c => c >= 0 && c <= touchedCap)
      val (targetD, currentD) =
        if (churnBounded) {
          val touched = broadcast(changesBetween(version, prev.version)
            .select(keyCols.map(col): _*).distinct())
          (targetW.join(touched, keyCols, "left_semi"),
            current.join(touched, keyCols, "left_semi"))
        } else (targetW, current)
      // ONE-PASS DIFF (r7): both states are arbitrated — exactly one row per
      // key — so the two-sided exceptAll (two shuffle set-ops, each arm
      // re-executing both merge-on-read scans) is equivalent to a single
      // full-outer join on the keys with a null-safe payload-struct
      // comparison: target-side row present and different-or-missing on the
      // current side ⇒ 'U' re-upsert; current-only key ⇒ 'D' tombstone. One
      // join, one output projection, each state scanned once. The map-typed
      // fallback keeps its semantics (re-upsert every target row) by
      // emitting every joined key — structs with map fields are never
      // compared.
      val payloadCols = current.columns.filterNot(keyCols.contains).toIndexedSeq
      // keys-only schema: a constant marker field keeps the struct non-empty
      // (equal on both sides, so only missing-side rows emit)
      def rowStruct(): org.apache.spark.sql.Column =
        if (payloadCols.isEmpty) struct(lit(1).as("__one"))
        else struct(payloadCols.map(col): _*)
      val tRow = targetD.select((keyCols.map(col) :+
        rowStruct().as("__trow")).toIndexedSeq: _*)
      val cRow = currentD.select((keyCols.map(col) :+
        rowStruct().as("__crow")).toIndexedSeq: _*)
      val joined = tRow.join(cRow, keyCols, "full_outer")
      val emit =
        if (setOpsOk)
          (col("__trow").isNotNull &&
            (col("__crow").isNull || !(col("__trow") <=> col("__crow")))) ||
            col("__trow").isNull
        else lit(true)
      val batch = joined.where(emit).select(
        (keyCols.map(col) ++
          payloadCols.map(c => col(s"__trow.$c").as(c)) ++ Seq(
          when(col("__trow").isNotNull, lit("U")).otherwise(lit("D")).as("op"),
          lit(lsn).as("lsn"),
          timestamp_micros(lit(nowMicros)).as("commit_ts"))).toIndexedSeq: _*)
      val merged =
        try Some(merge(batch, ns, epochId))
        catch { case _: CommitConflictException => None }
      merged match {
        case Some(r) if r.applied => return r
        case _ => // lost the CAS or a racer burned the id — re-read, retry
          attempt += 1
          if (attempt > maxRetries) throw new CommitConflictException(
            s"rollbackTo at $path lost the commit race $attempt times")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private val profile = sys.env.get("GRAFT_PROFILE").contains("1")
  private def phased[A](name: String)(f: => A): A =
    if (!profile) f else {
      val t0 = System.nanoTime(); val r = f
      println(f"  [lake] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

  /** Salt actually applied to a delta write: the configured [[writeSalt]]
    * when the batch's optimizer size estimate reaches
    * `spark.graft.write.saltMinBytes` (default 64 MB), else 1. Estimates
    * are conservative-by-default: an unavailable or absurd estimate keeps
    * the salt ON (the safe side for skew — only a provably small batch
    * drops it).
    */
  private def effectiveSalt(batch: DataFrame): Int =
    if (writeSalt <= 1) writeSalt
    else {
      val minBytes = spark.conf
        .get("spark.graft.write.saltMinBytes", (64L * 1024 * 1024).toString)
        .toLong
      // ANALYZED-plan stats, not optimizedPlan: the latter runs a whole
      // separate Catalyst optimization of the batch subtree per merge
      // (~0.1 s driver each — measured as a per-merge regression). The
      // size-only stats visitor works on any plan; without pushdown the
      // estimate only ever grows, which errs toward keeping the salt ON.
      val est =
        try batch.queryExecution.analyzed.stats.sizeInBytes
        catch { case _: Throwable => BigInt(Long.MaxValue) }
      if (est < minBytes) 1 else writeSalt
    }

  private def mergeUncommitted(batch: DataFrame, epochNs: String, epochId: Long,
                               prev: Option[Snapshot]): MergeResult = {
    // Additive schema evolution: unified = table schema ∪ batch payload cols.
    val payloadColNames = batch.columns.filterNot(Set("op", "lsn", "commit_ts").contains)
    val batchPayloadSchema = StructType(payloadColNames.map(c => batch.schema(c)))
    val tableSchema = prev.map(_.schema).getOrElse(batchPayloadSchema)
    val unified = StructType(tableSchema.fields ++
      batchPayloadSchema.fields.filterNot(f => tableSchema.fieldNames.contains(f.name)))

    // The ENTIRE merge is one pass over the batch: align to the unified
    // schema → one shuffle keyed by bucket → partitioned parquet write, with
    // lineage stats riding along as an Observation (no separate stats job,
    // no persist, the upstream scan/stream runs exactly once).
    //
    // Delta = the RAW batch. No intra-batch arbitration here: the read path
    // and compaction already arbitrate by max lsn per key, so pre-collapsing
    // revisions would buy slightly smaller deltas at the cost of a second
    // full shuffle of the payload. Tombstones ride along as 'D' rows.
    val staged = {
      val withMissing = unified.fields.foldLeft(batch) { (df, f) =>
        if (batch.columns.contains(f.name)) df
        else df.withColumn(f.name, lit(null).cast(f.dataType))
      }
      withMissing
        .withColumn("_lsn", col("lsn"))
        .withColumn("__hw", unix_micros(col("commit_ts").cast("timestamp")))
        .select((Seq("op") ++ unified.fieldNames ++ Seq("_lsn", "__hw")).map(col).toIndexedSeq: _*)
        .withColumn("b", bucketExpr)
    }

    val version = prev.map(_.version + 1).getOrElse(1L)
    // Nonce in the data dir: two writers racing to the same version must not
    // share a delta directory either — the snapshot CAS picks the winner, and
    // the loser's files sit in their own dir as unreferenced orphans (vacuum
    // reclaims them) instead of overwriting the winner's.
    val rel = f"data/e$version%010d-${nonce()}"

    val obs = org.apache.spark.sql.Observation(s"merge-$version")
    // forWrite BEFORE observe: the Observation listens on the frame's
    // session, and the write action must run under the scoped write conf.
    val out = forWrite(staged)
      .observe(obs,
        count(lit(1)).as("n"),
        count(when(col("op") === "D", 1)).as("d"),
        max(col("__hw")).as("hw"),
        max(col("_lsn")).as("ml"))
      // Partition count comes from spark.sql.shuffle.partitions (sized to the
      // DATA, not the executor count — adding executors must not change the
      // plan, only the concurrency; AQE coalesces if the batch is small).
      //
      // SIZE-ADAPTIVE SALT (r7): the lsn salt exists to fan a hot bucket's
      // shuffle output across several writer tasks — a concern only when the
      // per-bucket batch share is large. Below `spark.graft.write.saltMinBytes`
      // (estimated from the optimizer's plan stats) the salt buys nothing and
      // costs real money at BOTH ends: the partitioned writer opens
      // (buckets × salt) parquet writers per epoch instead of (buckets), and
      // every subsequent read pays per-file open/footer/listing for ~4× the
      // files (guide §6: small files hurt twice). Unsalted small batches land
      // exactly one file per touched bucket; large batches keep the skew
      // armor unchanged.
      .repartition(col("b") +:
        (if (effectiveSalt(batch) > 1)
           Seq(pmod(xxhash64(col("_lsn")), lit(writeSalt)))
         else Nil): _*)
      .drop("__hw")
    phased("delta-write")(
      out.write.mode("overwrite").option("compression", compression)
        .partitionBy("b").parquet(s"$path/$rel"))

    // An all-filtered (empty) batch can constant-fold the CollectMetrics
    // node away — missing keys mean zero rows, not an error.
    val stats = obs.get
    val events = stats.get("n").map(_.asInstanceOf[Long]).getOrElse(0L)
    val deletes = stats.get("d").map(_.asInstanceOf[Long]).getOrElse(0L)
    val batchHigh = stats.get("hw").flatMap(Option(_)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val batchMaxLsn = stats.get("ml").flatMap(Option(_)).map(_.asInstanceOf[Long]).getOrElse(0L)

    val newFiles = listBucketFiles(rel, 0 until numBuckets)
    commitFiles(prev, epochNs, epochId, unified, newFiles,
      events, deletes, batchHigh, batchMaxLsn)
  }

  /** METADATA half of a commit, shared by [[merge]] (which just ran the
    * delta-write job) and the DSv2 row-level/streaming writers (whose
    * executor tasks already wrote the files): fold the new per-bucket delta
    * files into the previous snapshot, inline-compact over-deltaed buckets,
    * record footer stats, write the O(changed) manifest + sidecar, and
    * CAS-publish at `prev.version + 1`. Throws [[CommitConflictException]]
    * when a concurrent writer won that version — the caller decides whether
    * to retry (merge semantics) or abort (pinned-lsn row-level semantics).
    */
  private[lake] def commitFiles(prev: Option[Snapshot], epochNs: String,
                                epochId: Long, unified: StructType,
                                newFiles: Map[Int, Seq[String]],
                                events: Long, deletes: Long,
                                batchHigh: Long, batchMaxLsn: Long): MergeResult = {
    val version = prev.map(_.version + 1).getOrElse(1L)
    val carried: Map[Int, BucketState] = prev.map(_.buckets).getOrElse(Map.empty)
    val touched = newFiles.filter(_._2.nonEmpty).keys.toSeq
    val withDeltas: Map[Int, BucketState] =
      touched.foldLeft(carried) { (acc, b) =>
        val cur = acc.getOrElse(b, BucketState(Nil, Nil))
        acc + (b -> cur.copy(deltas = cur.deltas ++ newFiles(b)))
      }

    {

      // Inline compaction of buckets whose delta EPOCH count exceeds the
      // bound. Salted writes land up to `writeSalt` files per bucket per
      // epoch; counting files would cross the bound after ~2 epochs and
      // degrade the O(batch) amortization into near-every-epoch full-bucket
      // rewrites. Read amplification is governed by merge depth (= epochs),
      // so that is what the bound counts.
      val needCompact = withDeltas
        .filter { case (_, st) => deltaEpochCount(st) > maxDeltasPerBucket }
        .keys.toSeq
      val (finalBuckets, compactFiles) =
        if (needCompact.isEmpty) (withDeltas, Nil)
        else phased("compact")(compactBuckets(withDeltas, needCompact, unified, version))

      // Change manifest = the delta files THIS commit wrote — recorded even
      // when inline compaction immediately folds them into a new base, so the
      // change feed never loses a commit's rows (the files stay on disk;
      // vacuum keeps every kept snapshot's change files).
      val newDeltaFiles = touched.flatMap(newFiles(_)).sorted
      val newStats = phased("stats")(readFileStats(newDeltaFiles ++ compactFiles))
      val referenced = finalBuckets.values.flatMap(_.allFiles).toSet ++ newDeltaFiles
      val fileStats =
        (prev.map(_.fileStats).getOrElse(Map.empty) ++ newStats)
          .filter { case (f, _) => referenced.contains(f) }

      // O(changed) commit metadata: one manifest for the buckets this
      // commit touched or compacted; the snapshot carries pointers only.
      val manifestList = writeManifests(version, finalBuckets, fileStats,
        (touched ++ needCompact).distinct, prev)

      val snapshot = Snapshot(
        version = version,
        schema = unified,
        buckets = finalBuckets,
        numBuckets = numBuckets,
        committedEpochs = prev.map(_.committedEpochs).getOrElse(Map.empty) + (epochNs -> epochId),
        highWaterMicros = math.max(prev.map(_.highWaterMicros).getOrElse(0L), batchHigh),
        metrics = Map(
          "last_events" -> events, "last_upserts" -> (events - deletes),
          "last_deletes" -> deletes,
          "total_events" -> (prev.flatMap(_.metrics.get("total_events")).getOrElse(0L) + events),
          // running max lsn: lets SQL-surface appends synthesize a fresh lsn
          // above everything already merged (a metadata read, not a scan)
          "max_lsn" -> math.max(
            prev.flatMap(_.metrics.get("max_lsn")).getOrElse(0L), batchMaxLsn)),
        changeFiles = Some(newDeltaFiles),
        fileStats = fileStats,
        manifestList = manifestList,
        commitTimeMs = nextCommitTimeMs(prev)
      )
      writeSnapshot(snapshot)
      // CAS winner only (writeSnapshot would have thrown otherwise):
      // the O(commit)-sized sidecar serving deep change-feed catch-ups
      writeChangeManifest(version, newDeltaFiles, newStats)
      MergeResult(applied = true, version, events, events - deletes, deletes,
        touched.size, needCompact.size, snapshot.highWaterMicros)
    }
  }

  private def nonce(): String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Fresh epoch-dir name targeting `version` (row-level/streaming writers
    * stage their executor-written files here before the metadata commit).
    */
  private[lake] def newEpochDir(version: Long): String =
    f"data/e$version%010d-${nonce()}"

  /** Parquet [[org.apache.spark.sql.execution.datasources.OutputWriterFactory]]
    * + the prepared hadoop conf for EXECUTOR-SIDE writes of `schema` — the
    * same writer Spark's own file sink uses, prepared under the lake's
    * scoped write session so the TIMESTAMP_MICROS pin (and its column
    * statistics) hold for rows that never pass through a driver-planned
    * write job.
    */
  private[lake] def executorWriterFactory(schema: StructType)
      : (org.apache.spark.sql.execution.datasources.OutputWriterFactory,
         org.apache.hadoop.conf.Configuration) = {
    val ws = LakeTable.microsWriteSession(spark)
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      ws.sessionState.newHadoopConf())
    val factory =
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
        .prepareWrite(ws, job, Map("compression" -> compression), schema)
    (factory, job.getConfiguration)
  }

  /** Commit ALREADY-WRITTEN per-bucket files under SERIALIZABLE isolation:
    * CAS at exactly `pinned.version + 1`. Any commit that interleaved since
    * the operation pinned its snapshot fails the CAS and ABORTS the whole
    * operation (the staged files become unreferenced orphans — vacuum
    * reclaims them): the rows' lsns were allocated against the pinned
    * snapshot's max_lsn, so retrying against a moved table could tie with
    * or silently lose to the interleaved writer's rows. This is the
    * optimistic-concurrency contract every reference lakehouse applies to
    * row-level SQL (MERGE/UPDATE): conflicts surface, the user re-runs.
    */
  private[graft] def commitPinned(pinned: Snapshot, epochNs: String,
                                 bucketFiles: Map[Int, Seq[String]],
                                 events: Long, deletes: Long,
                                 batchHigh: Long, batchMaxLsn: Long): MergeResult = {
    checkBuckets(pinned)
    val epochId = pinned.committedEpochs.getOrElse(epochNs, -1L) + 1
    try commitFiles(Some(pinned), epochNs, epochId, pinned.schema, bucketFiles,
      events, deletes, batchHigh, batchMaxLsn)
    catch {
      case e: CommitConflictException => throw new CommitConflictException(
        s"row-level $epochNs at $path aborted: a concurrent writer committed " +
          s"version ${pinned.version + 1} after this operation pinned " +
          s"v${pinned.version} (${e.getMessage}) — re-run the statement " +
          "against the new table state")
    }
  }

  /** Commit timestamps are forced MONOTONE across versions: with multiple
    * writers and clock skew, raw wall clocks can regress, and `TIMESTAMP AS
    * OF` (highest version with time ≤ ts) would then resolve a state that
    * skips an earlier-stamped LATER version. max(now, prev+1) keeps the
    * (version, commitTime) order aligned — the rule every reference
    * lakehouse applies.
    */
  private def nextCommitTimeMs(prev: Option[Snapshot]): Long =
    math.max(System.currentTimeMillis(), prev.map(_.commitTimeMs + 1).getOrElse(0L))

  /** Distinct delta epochs in a bucket (file path = data/e<ver>-<nonce>/b=<b>/…). */
  private def deltaEpochCount(st: BucketState): Int =
    st.deltas.map(_.split('/')(1)).distinct.size

  private def listBucketFiles(rel: String, buckets: Seq[Int]): Map[Int, Seq[String]] =
    buckets.map { b =>
      val dir = Paths.get(path, rel, s"b=$b")
      val files =
        if (Files.exists(dir))
          listDir(dir).filter(_.endsWith(".parquet"))
            .map(n => s"$rel/b=$b/$n").sorted
        else Nil
      b -> files
    }.toMap

  /** Fold base+deltas of the given buckets into a new base (one row per key,
    * tombstones retained). Copy-on-write, but only for over-deltaed buckets.
    *
    * `dropTombstonesBelowLsn`: a winning 'D' row with `_lsn` under the
    * horizon is physically dropped. Safe iff the caller guarantees no future
    * event arrives with lsn ≤ horizon (the checkpoint/watermark guarantee) —
    * any later event for the key then carries a higher lsn and would have
    * beaten the tombstone anyway. Without GC, delete-heavy tables carry every
    * tombstone forever.
    */
  private def compactBuckets(buckets: Map[Int, BucketState], targets: Seq[Int],
                             schema: StructType, version: Long,
                             dropTombstonesBelowLsn: Option[Long] = None)
      : (Map[Int, BucketState], Seq[String]) = {
    val fSchema = fileSchema(schema)
    val files = targets.flatMap(b => buckets(b).allFiles)
    val rows = scanFiles(files, fSchema)
    val arbitrated = arbitrate(rows, schema)
    val compacted = dropTombstonesBelowLsn.fold(arbitrated)(h =>
      arbitrated.where(!(col("op") === "D" && col("_lsn") < lit(h))))
    val rel = f"data/e$version%010d-c-${nonce()}"
    // Width from shuffle.partitions (data-sized config), NEVER the executor
    // count: the physical file layout must not change when the cluster does.
    val width = spark.sessionState.conf.numShufflePartitions
    // Surviving tombstones route to SEPARATE files (partition dir __dead):
    // live reads then scan pure-live bases with zero tombstone bytes and no
    // row filter — which is also what lets the DSv2 connector hand clean
    // buckets to Spark's vectorized parquet scan as-is. `op` stays in the
    // files; __dead is only the router.
    forWrite(compacted.withColumn("b", bucketExpr)
      .withColumn("__dead", col("op") === "D")
      .repartition(math.min(targets.size, width), col("b"))
      // KEY-SORTED bases: rows land ordered by (conv_id, turn_idx) inside
      // each compacted file, so the parquet writer's row-group AND
      // column-index (page-level) min/max stats on conv_id become tight —
      // a pushed conv_id equality then prunes INSIDE the bucket, reading a
      // conversation's pages instead of the whole bucket's base (at scale:
      // KBs from a multi-GB bucket). Leading (b, __dead) also satisfies the
      // partitioned writer's required ordering, so this one in-task sort
      // replaces the sort the writer would otherwise insert itself.
      .sortWithinPartitions("b", "__dead", "conv_id", "turn_idx"))
      .write.mode("overwrite").option("compression", compression)
      .partitionBy("b", "__dead").parquet(s"$path/$rel")
    val newFiles = listSplitBucketFiles(rel, targets)
    val updated = targets.foldLeft(buckets) { (acc, b) =>
      val (live, dead) = newFiles.getOrElse(b, (Nil, Nil))
      acc + (b -> BucketState(base = live, deltas = Nil, tombs = Some(dead)))
    }
    (updated, newFiles.values.flatMap(f => f._1 ++ f._2).toSeq.sorted)
  }

  /** List a split compaction output: bucket → (live files, tombstone files)
    * from `rel/b=N/__dead=false|true/`.
    */
  private def listSplitBucketFiles(rel: String,
                                   buckets: Seq[Int]): Map[Int, (Seq[String], Seq[String])] =
    buckets.map { b =>
      def files(dead: Boolean): Seq[String] = {
        val dir = Paths.get(path, rel, s"b=$b", s"__dead=$dead")
        if (Files.exists(dir))
          listDir(dir).filter(_.endsWith(".parquet"))
            .map(n => s"$rel/b=$b/__dead=$dead/$n").sorted
        else Nil
      }
      b -> (files(false), files(true))
    }.toMap

  /** Bucket-pruned point lookup: computes the hash bucket of the key and
    * scans ONLY that bucket's files — at 4096 buckets a conversation lookup
    * reads ~1/4096 of the table. Same arbitration semantics as [[read]].
    */
  def readConv(convId: String): DataFrame = readConvs(Seq(convId))

  /** Bucket-pruned multi-key lookup: scans only the union of the keys'
    * buckets (computed driver-side with the writer's hash — parity pinned by
    * a test), arbitrating only if one of them carries deltas. An IN-list of
    * k conversations costs ≤ k/numBuckets of the table.
    */
  def readConvs(convIds: Seq[String]): DataFrame = currentSnapshot match {
    case None => spark.emptyDataFrame
    case Some(s) => readConvsState(s, convIds)
  }

  /** Bucket-pruned multi-key lookup AT a retained snapshot version — point
    * queries compose with time travel, and the DSv2 arbitration fallback
    * pins its planning snapshot through this (a commit landing between
    * planning and execution must not change what one query reads).
    */
  def readConvsAsOf(version: Long, convIds: Seq[String]): DataFrame =
    readConvsState(snapshotAt(version), convIds)

  private def readConvsState(s: Snapshot, convIds: Seq[String]): DataFrame = {
      checkBuckets(s)
      val states = convIds.map(c => LakeTable.bucketOf(c, numBuckets)).distinct
        .map(b => s.buckets.getOrElse(b, BucketState(Nil, Nil)))
      val schema = fileSchema(s.schema)
      // Same per-bucket clean/dirty split as [[readWithLsn]]: a k-key lookup
      // where one bucket carries a delta pays the arbitration window for THAT
      // bucket only, never over all k buckets' rows.
      val (dirty, clean) = states.partition(_.deltas.nonEmpty)
      val outCols = (Seq("conv_id", "turn_idx", "op", "_lsn") ++
        s.schema.fieldNames.filterNot(keyCols.contains)).map(col).toIndexedSeq
      val keyFilter = col("conv_id").isin(convIds: _*)
      val cleanPart = scanFiles(clean.flatMap(_.base), schema)
        .where(keyFilter).select(outCols: _*)
      val dirtyPart =
        if (dirty.isEmpty) None
        else Some(arbitrate(
          scanFiles(dirty.flatMap(_.allFiles), schema).where(keyFilter),
          s.schema))
      dirtyPart.fold(cleanPart)(cleanPart.unionByName(_))
        .where(col("op") =!= "D").drop("op", "_lsn")
  }

  /** Compact every bucket that has any deltas (maintenance entry point).
    * Pass `dropTombstonesBelowLsn` to also GC tombstones under the caller's
    * no-more-stragglers horizon (see [[compactBuckets]]); when set, even
    * delta-free buckets are rewritten so their tombstones age out too.
    */
  def compactAll(dropTombstonesBelowLsn: Option[Long] = None): Unit = {
    currentSnapshot.foreach { s =>
      val targets =
        dropTombstonesBelowLsn match {
          case Some(h) =>
            // GC pass, stats-pruned: a delta-free bucket whose every base
            // file provably holds either no tombstone at all (op footer range
            // excludes 'D') or only rows with lsn ≥ the horizon cannot yield
            // a single GC-able tombstone — rewriting it would be a
            // byte-identical copy. The manifest stats answer that without
            // opening one file, so a periodic GC pass over a mostly-cold
            // 100 TB table is a metadata walk, not a full rewrite. Buckets
            // with deltas, or any file missing stats, rewrite conservatively.
            s.buckets.filter { case (_, st) =>
              st.deltas.nonEmpty ||
                (st.base ++ st.tombs.getOrElse(Nil)).exists(f =>
                  s.fileStats.get(f).forall(fs => !fs.noTombs && fs.minLsn < h))
            }.keys.toSeq
          case None => s.buckets.filter(_._2.deltas.nonEmpty).keys.toSeq
        }
      if (targets.nonEmpty) {
        val version = s.version + 1
        val (finalBuckets, newFiles) = compactBuckets(s.buckets, targets,
          s.schema, version, dropTombstonesBelowLsn)
        val referenced = finalBuckets.values.flatMap(_.allFiles).toSet
        val fileStats = (s.fileStats ++ readFileStats(newFiles))
          .filter { case (f, _) => referenced.contains(f) }
        val manifestList = writeManifests(version, finalBuckets, fileStats,
          targets, Some(s))
        writeSnapshot(s.copy(version = version, buckets = finalBuckets,
          changeFiles = Some(Nil), // maintenance rewrite: no new changes
          fileStats = fileStats, manifestList = manifestList,
          commitTimeMs = nextCommitTimeMs(Some(s))))
        writeChangeManifest(version, Nil, Map.empty)
      }
    }
  }

  /** Commit history from RETAINED snapshots (newest first): version,
    * lineage metrics, watermark, schema width, file/bucket footprint — the
    * ops "what happened to this table" surface (DESCRIBE HISTORY analog).
    * Driver-side metadata; no data file is opened, and manifest-format
    * snapshots are answered from their FLAT JSON alone (summary counters
    * written at commit) — walking V versions costs V small JSON parses,
    * never V × table-files of manifest reconstruction.
    */
  def history(): DataFrame = {
    import spark.implicits._
    val rows = (if (Files.isDirectory(snapDir)) listDir(snapDir) else Nil)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.substring(1, n.length - 5).toLong).sorted.reverse
      .map { v =>
        val root = mapper.readTree(Files.readString(snapPath(v)))
        def metric(k: String): Long =
          Option(root.get("metrics")).flatMap(m => Option(m.get(k)))
            .map(_.asLong).getOrElse(0L)
        val schemaWidth = DataType.fromJson(root.get("schema").asText)
          .asInstanceOf[StructType].fields.length
        val (nBuckets, nFiles) =
          (Option(root.get("nBuckets")), Option(root.get("nFiles"))) match {
            case (Some(b), Some(f)) => (b.asLong, f.asLong) // summary (manifest format)
            case _ => // legacy inline: count from the embedded bucket map
              val s = readSnapshot(v)
              (s.buckets.size.toLong, s.buckets.values.map(_.allFiles.size).sum.toLong)
          }
        (v,
          Option(root.get("committedEpochs")).map(_.size.toLong).getOrElse(0L),
          metric("last_events"), metric("last_deletes"),
          metric("total_events"), metric("max_lsn"),
          Option(root.get("highWaterMicros")).map(_.asLong).getOrElse(0L),
          schemaWidth, nBuckets, nFiles,
          Option(root.get("changeFiles")).map(_.size.toLong).getOrElse(-1L),
          Option(root.get("commitTimeMs")).map(_.asLong).getOrElse(0L))
      }
    rows.toDF("version", "n_epochs", "last_events", "last_deletes",
      "total_events", "max_lsn", "high_water_micros", "n_columns",
      "n_buckets", "n_files", "n_change_files", "commit_time_ms")
  }

  /** SQL surface: register the merge-on-read live state as a temp view, so
    * `spark.sql("SELECT ... FROM name WHERE conv_id = 'x'")` works — and the
    * conv_id predicate still bucket-prunes via [[BucketPrune]] (the view is
    * just the [[read]] plan). Re-call after new commits to see them (the view
    * pins the snapshot it was created from — consistent-read semantics).
    */
  def asView(name: String): Unit = read().createOrReplaceTempView(name)

  /** Bucket-count migration: rewrite the live state (plus still-guarded
    * tombstones) into a NEW table at `newPath` with `newNumBuckets` — the
    * only correct way to change the bucket layout (in-place mixing would
    * break the writer/reader hash agreement). One full-table pass; at scale
    * this is the rare, planned rebalancing job, not an ingest-path cost.
    * Tombstones keep their original lsn so straggler protection carries
    * over; epochs/metrics start fresh (lineage of a new physical table).
    */
  def rebucket(newPath: String, newNumBuckets: Int): LakeTable = {
    val target = new LakeTable(spark, newPath, newNumBuckets,
      maxDeltasPerBucket, writeSalt)
    currentSnapshot match {
      case None => target
      case Some(s) =>
        checkBuckets(s)
        val rows = scanFiles(s.buckets.values.flatMap(_.allFiles).toSeq,
          fileSchema(s.schema))
        val state = arbitrate(rows, s.schema) // op + payload + _lsn, one row/key
        val batch = state
          .withColumn("lsn", col("_lsn"))
          .withColumn("commit_ts", timestamp_micros(lit(s.highWaterMicros)))
          .drop("_lsn")
        target.merge(batch, "rebucket", 0L)
        target.compactAll()
        target
    }
  }

  /** Retention GC: delete snapshots older than the last `keepSnapshots` and
    * every data file none of the kept snapshots references — compaction
    * leftovers AND orphans from crashed writes (files that never made it into
    * any snapshot). At 10^10 events superseded bases dominate table bytes
    * without this.
    *
    * RETENTION CONTRACT: a reader that resolved snapshot v may still be
    * scanning v's files after v+1 commits — `keepSnapshots` is the number of
    * trailing snapshots whose files stay physically present, i.e. the window
    * in which an in-flight read is safe from deletion. The default of 2
    * protects reads concurrent with one commit; pass 1 only when no reader
    * can be in flight (tests, single-process maintenance). Kept snapshots
    * retain their CHANGE files too (even ones compaction already folded
    * away), so `changesSince` stays readable over the kept window.
    *
    * WRITER SAFETY: a concurrent merge writes its delta dir FIRST and
    * CAS-publishes the snapshot AFTER — between those steps its files look
    * exactly like unreferenced orphans. They are not eligible: a file whose
    * epoch dir encodes a TARGET VERSION greater than the latest committed
    * snapshot belongs to an in-flight writer and is never deleted. A lost
    * racer's dir encodes the version its WINNER committed (≤ latest), so
    * true orphans still age into eligibility. `inFlightGraceMs` additionally
    * protects recently-written files by mtime (covers a writer that crashed
    * and will retry under the same target version after another writer
    * commits it); 0 disables the grace — single-writer deployments and
    * tests need no delay. In-flight READS need it too: a long-running
    * concurrent compaction (or query) whose input snapshot ages past
    * `keepSnapshots` mid-job loses its files under count-based retention
    * alone — deployments running vacuum concurrently with writers or
    * maintenance must set the grace to cover their longest op (the
    * time-based retention every production lakehouse defaults to).
    *
    * @return (snapshotsDeleted, dataFilesDeleted)
    */
  def vacuum(keepSnapshots: Int = 2, inFlightGraceMs: Long = 0L,
             retainAgeMs: Option[Long] = None): (Int, Int) = latestVersion match {
    case None => (0, 0)
    case Some(latest) =>
      // ONE listing drives everything below. Deriving the keep-set and the
      // delete-set from separate listings is a TOCTOU hole: a snapshot
      // committed between them is in the second listing but not the
      // keep-set, and "delete everything not kept" would reclaim the
      // NEWEST snapshot — the next merge then rebuilds from the stale
      // predecessor and the deleted commit's rows silently vanish from the
      // table (caught by the live merge ‖ vacuum interleaving test).
      val seenVersions = listDir(snapDir)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.substring(1, n.length - 5).toLong)
        .sorted
      // Age-based retention composes with the count floor: keep the trailing
      // `keepSnapshots` AND every version committed within `retainAgeMs` of
      // now — the "time travel works for the last N days" contract. Commit
      // times are monotone in version (nextCommitTimeMs), so the age set is
      // a suffix; legacy snapshots without a recorded time read as 0 and
      // never qualify by age (the count floor still protects them).
      val ageFloor = retainAgeMs.map(System.currentTimeMillis() - _)
      val keepVersions = (seenVersions.takeRight(math.max(1, keepSnapshots)) ++
        ageFloor.fold(Seq.empty[Long])(floor =>
          seenVersions.filter(v => commitTimeOf(v) >= floor))).toSet
      val keptSnapshots = keepVersions.map(readSnapshot)
      val referenced: Set[String] = keptSnapshots.flatMap { s =>
        s.buckets.values.flatMap(_.allFiles) ++ s.changeFiles.getOrElse(Nil)
      }
      val referencedManifests: Set[String] = keptSnapshots.flatMap(_.manifestList)
      val dataRoot = Paths.get(path, "data")
      val mtimeFloor = System.currentTimeMillis() - inFlightGraceMs
      var dataDeleted = 0
      // Failure-tolerant traversal: a concurrent writer's task-commit
      // creates and renames files (e.g. under _temporary) faster than a
      // plain Files.walk can stat them — entries vanishing mid-walk are the
      // NORMAL case for maintenance over a live table, never an error.
      val files = scala.collection.mutable.ArrayBuffer.empty[Path]
      val dirs = scala.collection.mutable.ArrayBuffer.empty[Path] // deepest-first
      if (Files.isDirectory(dataRoot))
        Files.walkFileTree(dataRoot, new java.nio.file.SimpleFileVisitor[Path] {
        import java.nio.file.FileVisitResult.CONTINUE
        override def visitFile(p: Path,
            a: java.nio.file.attribute.BasicFileAttributes): java.nio.file.FileVisitResult = {
          if (a.isRegularFile) files += p; CONTINUE
        }
        override def visitFileFailed(p: Path,
            e: java.io.IOException): java.nio.file.FileVisitResult = CONTINUE
        override def postVisitDirectory(p: Path,
            e: java.io.IOException): java.nio.file.FileVisitResult = {
          dirs += p; CONTINUE
        }
      })
      files.foreach { p =>
        val rel = Paths.get(path).relativize(p).toString.replace('\\', '/')
        val inFlight = dirVersionOf(rel).exists(_ > latest) ||
          (inFlightGraceMs > 0L && scala.util.Try(
            Files.getLastModifiedTime(p).toMillis).toOption.forall(_ > mtimeFloor))
        if (!referenced.contains(rel) && !inFlight) {
          if (Files.deleteIfExists(p)) dataDeleted += 1
        }
      }
      // prune now-empty epoch/bucket dirs (postVisit order = deepest-first).
      // An in-flight writer's epoch dir (version > latest) is momentarily
      // empty between mkdir and its first file — deleting it would fail the
      // write job, so the same version guard applies; delete races (a file
      // landing between the emptiness check and the delete) are benign for
      // a best-effort GC and are swallowed. The mtime grace applies to DIRS
      // too: a writer that LOST the version race is often still running —
      // its `_temporary` scaffolding is empty between task attempts and its
      // epoch dir encodes a version ≤ latest (the winner's), so the version
      // guard alone cannot see it; deleting the scaffolding fails the live
      // job's output committer (caught by the chaos test). Young dirs are
      // left alone; a crashed job's leftovers age past the grace and GC.
      dirs.foreach { p =>
        val rel = Paths.get(path).relativize(p).toString.replace('\\', '/')
        val inFlightDir = dirVersionOf(s"$rel/x").exists(_ > latest) ||
          (inFlightGraceMs > 0L && scala.util.Try(
            Files.getLastModifiedTime(p).toMillis).toOption.forall(_ > mtimeFloor))
        if (p != dataRoot && !inFlightDir && Files.isDirectory(p) &&
            scala.util.Try(listDir(p)).toOption.exists(_.isEmpty)) {
          try Files.delete(p)
          catch {
            case _: java.nio.file.DirectoryNotEmptyException => ()
            case _: java.nio.file.NoSuchFileException        => ()
          }
        }
      }
      // Manifests GC under the same rules as data files: a manifest not
      // referenced by any KEPT snapshot is an orphan (CAS loser, or aged
      // out of every kept manifest list) — unless its encoded version is
      // beyond the latest committed snapshot, which marks an in-flight
      // writer that will CAS right after us.
      if (Files.isDirectory(manifestsDir)) {
        listDir(manifestsDir).filter(n => n.startsWith("m") && n.endsWith(".json"))
          .foreach { n =>
            val rel = s"manifests/$n"
            val ver = n.drop(1).takeWhile(_.isDigit).toLongOption
            val inFlight = ver.forall(_ > latest)
            if (!referencedManifests.contains(rel) && !inFlight)
              Files.deleteIfExists(manifestsDir.resolve(n))
          }
      }
      // Delete-set from the SAME listing as the keep-set (see above) — a
      // version this vacuum never saw is never deleted, however late it
      // lands. Sidecars age out with their snapshots under the same rule.
      val versionsToDelete = seenVersions.filterNot(keepVersions.contains)
      versionsToDelete.foreach(v => Files.deleteIfExists(snapPath(v)))
      versionsToDelete.foreach(v => Files.deleteIfExists(changePath(v)))
      (versionsToDelete.size, dataDeleted)
  }
}

object LakeTable {
  /** Shared JVM-wide footer-read pool: commit-time stats reads are short
    * I/O-latency-bound bursts (one open+parse per new file per epoch) — a
    * fresh pool per commit paid thread-creation on every hot-loop epoch.
    * Daemon threads: the pool must never hold the JVM open.
    */
  private[lake] lazy val footerPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      // CPU-scaled (ADVICE r6): many tables committing concurrently in one
      // JVM contend on this shared pool; footer reads are latency-bound, so
      // size with the host rather than a fixed 8.
      math.max(8, Runtime.getRuntime.availableProcessors()),
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-footer-${n.getAndIncrement()}")
          t.setDaemon(true); t
        }
      })

  /** ONE micros-scoped write clone per user session (a clone registers its
    * own listener bus on the shared context — per-table clones would
    * accumulate them across hundreds of tables). Weak keys: sessions are
    * never retained past their own lifetime.
    */
  private val microsSessions =
    new java.util.WeakHashMap[SparkSession, SparkSession]()

  /** JVM-wide parsed-manifest cache (access-ordered LRU). Manifests are
    * IMMUTABLE once written (names carry a nonce; losers of the snapshot
    * CAS write differently-named orphans), so a path is a safe cache key —
    * snapshot resolution then costs O(manifestList) cache hits instead of
    * re-parsing the table's whole file inventory on every commit and read.
    *
    * Bounded by approximate BYTES, not entry count: merged manifests are
    * O(table file inventory), so 256 of them on a driver serving many large
    * tables would pin GBs of heap. Each entry is charged its serialized
    * JSON length (a sound proxy for the parsed tree); eviction keeps the
    * total under [[manifestCacheBudget]]. A manifest larger than the whole
    * budget is parsed but never retained.
    */
  private val manifestCacheBudget: Long =
    sys.env.get("GRAFT_MANIFEST_CACHE_MB").flatMap(_.toLongOption)
      .getOrElse(64L) * 1024L * 1024L

  private var manifestCacheBytes: Long = 0L
  private val manifestCache =
    new java.util.LinkedHashMap[String, (com.fasterxml.jackson.databind.JsonNode, Long)](
        64, 0.75f, true)

  private[graft] def manifestCacheStats: (Int, Long) =
    manifestCache.synchronized((manifestCache.size(), manifestCacheBytes))

  private[lake] def manifestNode(mapper: ObjectMapper,
                                 absPath: String): com.fasterxml.jackson.databind.JsonNode =
    manifestCache.synchronized {
      val cached = manifestCache.get(absPath)
      if (cached != null) cached._1
      else {
        val text = Files.readString(Paths.get(absPath))
        val n = mapper.readTree(text)
        val cost = text.length.toLong
        if (cost <= manifestCacheBudget) {
          manifestCache.put(absPath, (n, cost))
          manifestCacheBytes += cost
          val it = manifestCache.entrySet().iterator()
          while (manifestCacheBytes > manifestCacheBudget && it.hasNext) {
            manifestCacheBytes -= it.next().getValue._2
            it.remove()
          }
        }
        n
      }
    }

  private[graft] def microsWriteSession(spark: SparkSession): SparkSession =
    microsSessions.synchronized {
      var s = microsSessions.get(spark)
      if (s == null) {
        s = org.apache.spark.sql.graftbridge.cloneSession(spark)
        s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        microsSessions.put(spark, s)
      }
      s
    }

  /** True iff `path` holds a graftlake table (at least one committed
    * snapshot). The read surfaces use this to fail LOUDLY on a typo'd path
    * instead of returning a schemaless empty frame.
    */
  def existsAt(path: String): Boolean = {
    val snapDir = Paths.get(path, "snapshots")
    Files.isDirectory(snapDir) &&
      scala.util.Using.resource(Files.list(snapDir))(_.iterator().asScala.exists { p =>
        val n = p.getFileName.toString
        n.startsWith("v") && n.endsWith(".json")
      })
  }

  private[lake] def requireTableAt(path: String): Unit =
    require(existsAt(path),
      s"no graftlake table at $path (no snapshots/ directory with a " +
        "committed version) — check the path, or create the table by " +
        "writing to it first")

  /** Open an EXISTING table with the bucket count recorded in its latest
    * snapshot (the probe instance never reads data, so no layout check
    * fires). New tables are created via the constructor with an explicit
    * count.
    */
  def open(spark: SparkSession, path: String,
           maxDeltasPerBucket: Int = 4, writeSalt: Int = 4): LakeTable = {
    val probe = new LakeTable(spark, path)
    val nb = probe.currentSnapshot.map(_.numBuckets).getOrElse(64)
    new LakeTable(spark, path, nb, maxDeltasPerBucket, writeSalt)
  }

  /** Driver-side twin of the writer's bucket expression
    * `pmod(xxhash64(conv_id), numBuckets)`: Spark's `xxhash64` is XXH64 over
    * UTF-8 bytes with seed 42. Must stay in lockstep with [[LakeTable!.readConv]].
    */
  def bucketOf(convId: String, numBuckets: Int): Int = {
    val utf8 = org.apache.spark.unsafe.types.UTF8String.fromString(convId)
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      utf8, org.apache.spark.sql.types.StringType, 42L)
    (((h % numBuckets) + numBuckets) % numBuckets).toInt
  }
}
