package graft.lake

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

/** MULTI-TABLE EXACTLY-ONCE: one logical epoch atomically spans several
  * [[LakeTable]]s (a pipeline forking one WAL into, say, a `turns` lake and
  * a `metrics` lake must never expose epoch E in one and not the other).
  *
  * Protocol — two idempotent layers, no lock service:
  *
  *  1. **Per-table**: every constituent merge carries the SAME (namespace,
  *     epochId); [[LakeTable.merge]]'s committed-epoch manifest makes any
  *     replay a no-op. A crash between table A's merge and table B's leaves
  *     A committed, B not — the retry re-runs BOTH: A no-ops, B applies.
  *     Nothing is lost, nothing doubles. (Reference analog: one document
  *     atomically produces all enabled sinks,
  *     processors/DocumentProcessor.java:542-603.)
  *  2. **Cross-table visibility**: only after EVERY table committed does the
  *     coordinator CAS-publish a txn manifest pinning (table path → snapshot
  *     version). A consistent reader resolves tables through
  *     [[readPinned]] — it can never observe the epoch in one table but not
  *     another, because the pin only advances atomically (same hard-link
  *     CAS as snapshot publish; concurrent coordinators get one winner and
  *     the loser merges states and retries).
  *
  * The manifest dir is metadata-only (one small JSON per txn); vacuum the
  * constituent tables with `keepSnapshots` large enough to cover the pins
  * still being read (same retention contract as single-table reads).
  */
final class TxnLog(spark: SparkSession, val dir: String) {

  private val mapper = new ObjectMapper()
  private val root = Paths.get(dir)
  Files.createDirectories(root)

  final case class TxnState(version: Long, epochs: Map[String, Long],
                            tables: Map[String, Long])

  private def path(v: Long): Path = root.resolve(f"t$v%010d.json")

  private def listVersions: Seq[Long] =
    scala.util.Using.resource(Files.list(root)) { s =>
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("t") && n.endsWith(".json"))
        .map(n => n.substring(1, n.length - 5).toLong).toVector
    }

  def latest: Option[TxnState] = {
    val vs = listVersions
    if (vs.isEmpty) None else Some(read(vs.max))
  }

  private def read(v: Long): TxnState = {
    val node = mapper.readTree(Files.readString(path(v)))
    TxnState(
      node.get("version").asLong,
      node.get("epochs").fields().asScala.map(e => e.getKey -> e.getValue.asLong).toMap,
      node.get("tables").fields().asScala.map(e => e.getKey -> e.getValue.asLong).toMap)
  }

  private def write(s: TxnState): Unit = {
    val node = mapper.createObjectNode()
    node.put("version", s.version)
    val en = node.putObject("epochs"); s.epochs.foreach { case (k, v) => en.put(k, v) }
    val tn = node.putObject("tables"); s.tables.foreach { case (k, v) => tn.put(k, v) }
    val tmp = root.resolve(s".t${s.version}-${java.util.UUID.randomUUID()}.tmp")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node))
    try Files.createLink(path(s.version), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(
          s"txn v${s.version} already committed by a concurrent coordinator at $dir")
    } finally Files.deleteIfExists(tmp)
  }

  /** Commit `batches` to their tables as ONE epoch. Safe to re-run after any
    * crash: already-applied constituents no-op, and an already-published
    * epoch returns the existing pin without touching the tables.
    */
  def commit(batches: Seq[(LakeTable, DataFrame)], epochNs: String,
             epochId: Long, maxRetries: Int = 5): TxnState = {
    val prior = latest
    if (prior.exists(_.epochs.get(epochNs).exists(_ >= epochId))) return prior.get

    // Phase 1: land the epoch in every table (each individually idempotent).
    val pins = batches.map { case (t, df) =>
      val r = t.mergeWithRetry(df, epochNs, epochId)
      t.path -> r.version
    }.toMap

    // Phase 2: CAS-publish the atomic pin. A racing coordinator's win is a
    // conflict, not corruption — merge its state and retry on top.
    publishPins(pins, epochNs, epochId, maxRetries)
  }

  /** Phase 2 alone (package-private for the pin-monotonicity test). */
  private[graft] def publishPins(pins: Map[String, Long], epochNs: String,
                                 epochId: Long, maxRetries: Int = 5): TxnState = {
    var attempt = 0
    while (true) {
      val cur = latest
      if (cur.exists(_.epochs.get(epochNs).exists(_ >= epochId))) return cur.get
      // Merge pins per table with MAX: a coordinator publishing late (a
      // different epoch namespace advanced the same table's pin meanwhile)
      // must never overwrite a newer pin with its older snapshot version —
      // readPinned would regress to an earlier table state, breaking the
      // monotonic cross-table consistency contract. Taking the max keeps
      // every pin monotone; the late coordinator's OWN epoch is still
      // recorded (its rows are contained in the newer snapshot anyway).
      val curTables = cur.map(_.tables).getOrElse(Map.empty)
      val next = TxnState(
        version = cur.map(_.version + 1).getOrElse(1L),
        epochs = cur.map(_.epochs).getOrElse(Map.empty) + (epochNs -> epochId),
        tables = curTables ++ pins.map { case (p, v) =>
          p -> math.max(v, curTables.getOrElse(p, 0L)) })
      try { write(next); return next }
      catch {
        case e: CommitConflictException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The table's state at the txn pin — cross-table consistent with every
    * other [[readPinned]] against the same manifest version. LOUD on a
    * table absent from the pin manifest: an unpinned table means the
    * pipeline is mis-wired (reading a table this txn log never committed),
    * and an empty frame would mask that as "no data yet".
    */
  def readPinned(table: LakeTable): DataFrame = latest match {
    case Some(s) if s.tables.contains(table.path) =>
      table.readAsOf(s.tables(table.path))
    case Some(s) => throw new IllegalArgumentException(
      s"table ${table.path} has no pin in txn log $dir (pinned: " +
        s"${s.tables.keys.mkString(", ")}) — it was never committed through " +
        "this coordinator")
    case None => throw new IllegalStateException(
      s"txn log $dir has no published manifest yet — commit an epoch first")
  }
}
