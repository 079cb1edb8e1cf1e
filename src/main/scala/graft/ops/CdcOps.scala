package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch operator kernel of the CDC engine — pure `DataFrame => DataFrame`
  * stages, composable inside `foreachBatch` or standalone. Each stage is the
  * Spark-first re-expression of a reference operator (SURVEY.md §2); all are
  * whole-stage-codegen-friendly column expressions or single window passes —
  * no RDDs, no driver loops.
  */
object CdcOps {

  private val key = Seq(col("conv_id"), col("turn_idx"))

  /** F1 — drop exact duplicate events (same key + same lsn). The reference
    * sorts text chunks and drops successive equal ones
    * (processors/TextProcessor.java:114-135); here identity is explicit, so a
    * keyed `dropDuplicates` suffices (map-side partial aggregation: the
    * shuffle carries one row per (key,lsn) per partition, not the raw stream).
    */
  def dedupByKeyLsn(events: DataFrame): DataFrame =
    events.dropDuplicates("conv_id", "turn_idx", "lsn")

  /** J7 analog — last-writer-wins arbitration: keep the max-lsn event per
    * merge key. Single hash-aggregate via max_by on a struct of the payload
    * (one shuffle, partial-agg pushed map-side) rather than a sort-window —
    * at 10^10 events the window's per-partition sort is pure overhead.
    * Deterministic: lsn totally orders events within a key by construction.
    */
  def arbitrateLastWriterWins(events: DataFrame): DataFrame = {
    val payloadCols = events.columns.filterNot(Set("conv_id", "turn_idx").contains)
    val payload = struct(payloadCols.map(col).toIndexedSeq: _*)
    events
      .groupBy("conv_id", "turn_idx")
      .agg(max_by(payload, col("lsn")).as("__p"))
      .select(col("conv_id") +: col("turn_idx") +:
        payloadCols.toIndexedSeq.map(c => col(s"__p.$c").as(c)): _*)
  }

  /** Watermark enforcement for batch replay (§2.9): drop events whose
    * commit_ts is older than (high-water mark − delay). Late rows are counted
    * before the drop via observe() — mirroring the reference's warn-and-count
    * policy on invalid pages (DocumentProcessor.java:239-250) rather than a
    * silent filter. `highWater` is supplied by the caller (streaming state).
    */
  def dropLate(events: DataFrame, highWaterMicros: Long, delay: Column,
               obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    // MICROsecond precision end-to-end: timestamps are micros in parquet, so
    // a millisecond-truncated mark would sit up to 1ms below the true max —
    // any row landing in that gap is kept here but dropped by an oracle
    // computing `max(commit_ts) - delay` at full precision. One unit, no
    // mixing (same rule as q_window_lag).
    val cutoff = timestamp_micros(lit(highWaterMicros)) - delay
    val counted = obs match {
      // CAVEAT: an observed count is best-effort lineage — if the downstream
      // action's AQE plan propagates an empty relation through a later
      // exchange, the CollectMetrics subtree is elided and the count never
      // materializes. Callers needing an EXACT late count run a dedicated
      // pruned-scan count (see CdcIngestJob.startWithMetrics).
      case Some(o) =>
        events.observe(o, count(when(col("commit_ts") < cutoff, 1)).as("late_drops"))
      case None =>
        events.observe("late", count(when(col("commit_ts") < cutoff, 1)).as("late_drops"))
    }
    counted.where(col("commit_ts") >= cutoff)
  }

  /** F11 — sensitive-data sanitization: a config-driven, deterministic-order
    * chain of regexp replacements (reference default rule set:
    * utils/ContentSanitizer.java:39-263, api/FilterConfig.java:37-78).
    * foldLeft over rules = the reference's sequential rule application; each
    * rule is a codegen'd RegExpReplace, so the whole chain fuses into one
    * projection.
    */
  final case class SanitizeRule(name: String, pattern: String, replacement: String)

  /** Full default rule set — one rule per reference default class
    * (api/FilterConfig.java:39-78: email, dashed-intl phone, national ID,
    * formatted card, bare digit run, IPv4, IPv6, MAC, IMEI, URL), re-expressed
    * with `[CLASS]` replacement tokens. Rules apply SEQUENTIALLY in list
    * order — the order is part of the contract (a span matched by an earlier
    * rule is tokenized before later rules see it, which resolves overlaps
    * deterministically, the engine's analog of the reference's span-merge):
    * structured identifiers first (email/url/ipv6/mac/ipv4), then digit
    * classes narrow-to-wide (card, IMEI, digit-run), then letter-prefixed IDs
    * and phones. Every pattern is RE2-compatible (no backrefs/lookaround) so
    * an external SQL engine applying the same chain gets identical output.
    * Callers pass their own Seq to extend/replace (user-supplied rules).
    */
  val defaultSanitizeRules: Seq[SanitizeRule] = Seq(
    SanitizeRule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    SanitizeRule("url", "https?://[^\\s]+", "[URL]"),
    // MAC before IPv6: a MAC's six hex:groups are also a valid IPv6 match.
    SanitizeRule("mac", "\\b(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}\\b", "[MAC]"),
    SanitizeRule("ipv6", "\\b(?:[0-9a-fA-F]{1,4}:){2,7}[0-9a-fA-F]{1,4}\\b", "[IPV6]"),
    SanitizeRule("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "[IP]"),
    // 16 digits in 4 blocks with optional separators (reference shape) — NOT
    // a loose 13-19 digit-run, which would swallow 15-digit IMEIs.
    SanitizeRule("card", "\\b\\d{4}[ -]?\\d{4}[ -]?\\d{4}[ -]?\\d{4}\\b", "[CARD]"),
    SanitizeRule("imei", "\\b\\d{15}\\b", "[IMEI]"),
    SanitizeRule("digitrun", "\\b\\d{10,18}\\b", "[NUM]"),
    SanitizeRule("natid", "\\b[A-Z]{1,2}\\d{6,9}\\b", "[ID]"),
    SanitizeRule("intlphone", "\\+\\d+(?:-\\d+)+", "[PHONE]"),
    SanitizeRule("phone", "\\+?\\d{1,3}[ -]?\\(?\\d{2,4}\\)?[ -]?\\d{3,4}[ -]?\\d{3,4}", "[PHONE]")
  )

  def sanitize(df: DataFrame, textCol: String = "text",
               rules: Seq[SanitizeRule] = defaultSanitizeRules): DataFrame = {
    val sanitized = rules.foldLeft(col(textCol)) { (c, r) =>
      regexp_replace(c, r.pattern, r.replacement)
    }
    df.withColumn(textCol, sanitized)
  }

  /** J4 analog — boilerplate detection: the reference detects headers/footers
    * by cross-page repetition (HeaderFooterProcessor.java:158-235); for
    * transcripts a turn text repeated across ≥ minConvs distinct conversations
    * is boilerplate. Two-phase aggregate (fingerprint → distinct-conv count)
    * then a broadcast semi-join of the (small) boilerplate fingerprint set
    * back onto the stream — the big side is never shuffled twice.
    */
  def flagBoilerplate(df: DataFrame, minConvs: Int = 3): DataFrame = {
    // 128-bit fingerprint = (xxhash64, md5): at the 10^10-row design point
    // the 64-bit birthday bound (~4×10^9) makes an xxhash64 collision
    // EXPECTED — and a collision here silently marks an innocent turn as
    // boilerplate (the ingest pipeline then DROPS it). The pair pushes the
    // bound past 2^95. Grouping still shuffles hashes (40 bytes), never text.
    // Null text is excluded outright: xxhash64(null) collapses to the seed,
    // which would pool all null-text rows into one "boilerplate" fingerprint.
    val fp1 = xxhash64(col("text"))
    val fp2 = md5(col("text"))
    // EXACT distinct-conv count: the contract is a hard threshold, and HLL's
    // ~5% default error flips rows sitting at the boundary. The expand is one
    // extra partial-agg pass over (fp, conv_id) pairs — cheap next to a wrong
    // answer. No broadcast hint: the boilerplate set is corpus-dependent
    // (adversarial corpora make it huge); AQE picks broadcast when it fits.
    val boiler = df
      .where(col("text").isNotNull)
      .groupBy(fp1.as("__fp1"), fp2.as("__fp2"))
      .agg(countDistinct(col("conv_id")).as("__nc"))
      .where(col("__nc") >= minConvs)
      .select("__fp1", "__fp2")
    df.join(boiler,
        col("text").isNotNull && fp1 === boiler("__fp1") && fp2 === boiler("__fp2"),
        "left")
      .withColumn("is_boilerplate", col("__fp1").isNotNull)
      .drop("__fp1", "__fp2")
  }

  /** W1–W4 kernel — generic sessionization: a boundary predicate over
    * (lag(prev), current) rows becomes a cumulative-flag group id. This is the
    * reference's chunk→line→paragraph merge cascade
    * (TextLineProcessor.java:42-96, ParagraphProcessor.java:36-54) as one
    * window pass: boundary flag → running sum → group id.
    */
  def sessionize(df: DataFrame, orderCol: String, boundary: (Column, Column) => Column,
                 partitionCols: Seq[String] = Seq("conv_id"),
                 sessionCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val prev = lag(col(orderCol), 1).over(w)
    val flag = when(prev.isNull, 1).otherwise(boundary(prev, col(orderCol)).cast("int"))
    df.withColumn(sessionCol,
      sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** W4 — multi-pass boundary cascade folded into ONE window pass: the
    * reference's paragraph merge applies 8 boundary predicates in sequence
    * (ParagraphProcessor.java:44-53, each pass re-walking the list). For
    * ROW-LOCAL predicates (each pass reads only the adjacent original rows,
    * as all the predicates here do) every pass only ADDs boundaries, so the
    * cascade equals a single pass with the OR of all predicates — one
    * shuffle instead of eight. A predicate over pass k−1's MERGED blocks
    * (the reference's literal recursion) is not in this class; use repeated
    * [[sessionize]] passes for that shape.
    */
  def sessionizeCascade(df: DataFrame, orderCol: String,
                        boundaries: Seq[(Column, Column) => Column],
                        partitionCols: Seq[String] = Seq("conv_id"),
                        sessionCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val cur = struct(df.columns.map(col).toIndexedSeq: _*)
    val prev = lag(cur, 1).over(w)
    val flag = when(prev.isNull, 1)
      .otherwise(boundaries.map(b => b(prev, cur)).reduce(_ || _).cast("int"))
    df.withColumn(sessionCol,
      sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Gap-based session ids on a timestamp column (the common case). */
  def sessionizeByGap(df: DataFrame, tsCol: String, gapSeconds: Long,
                      partitionCols: Seq[String] = Seq("conv_id")): DataFrame =
    sessionize(df, tsCol,
      (prev, cur) => cur.cast("long") - prev.cast("long") > gapSeconds,
      partitionCols)

  /** O1/W8 — canonical ordering + replay-stable dense ids. row_number over
    * explicit keys, never monotonically_increasing_id (not stable across
    * replays/partitionings) — the reference's post-restructuring sequential id
    * pass (DocumentProcessor.java:400-405) with determinism fixed.
    * NOTE: global row_number is a single-partition sort — fine for exports and
    * tests; at 100 TB use the per-conversation variant [[turnSeq]].
    */
  def canonicalOrder(df: DataFrame): DataFrame =
    df.orderBy(key: _*)

  def withGlobalId(df: DataFrame): DataFrame =
    df.withColumn("global_id",
      row_number().over(Window.orderBy(key: _*)))

  /** Scalable per-conversation sequence number (shuffles only by conv_id). */
  def turnSeq(df: DataFrame): DataFrame =
    df.withColumn("turn_seq",
      row_number().over(Window.partitionBy("conv_id").orderBy(col("turn_idx"))))

  /** A9 — per-partition lineage metrics, computed as one conditional-count
    * aggregate per conv (reference: per-page counters,
    * hybrid/TriageProcessor.java:717-830). Streaming path publishes the same
    * expressions via Dataset.observe.
    */
  def lineageMetrics(events: DataFrame): DataFrame =
    events.groupBy("conv_id").agg(
      count(lit(1)).as("events"),
      count(when(col("op") =!= "D", 1)).as("upserts"),
      count(when(col("op") === "D", 1)).as("deletes"),
      countDistinct(col("turn_idx")).as("distinct_turns"),
      max(col("lsn")).as("max_lsn")
    )

  /** Salted repartition for hot-key skew (§2.9): spread one viral conv_id
    * across `salt` reducers before a wide stage. The merge key itself stays
    * (conv_id, turn_idx) — salting only drives the physical partitioning,
    * mirroring the reference's triage routing of pathological pages
    * (hybrid/TriageProcessor.java:648-706).
    */
  def saltedRepartition(df: DataFrame, numPartitions: Int, salt: Int): DataFrame =
    df.repartition(numPartitions,
      col("conv_id"), pmod(xxhash64(col("lsn")), lit(salt)))
}
