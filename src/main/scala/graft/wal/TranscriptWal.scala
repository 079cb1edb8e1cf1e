package graft.wal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WAL (binlog) construction.
  *
  * Two deterministic sources:
  *
  *  1. [[fromEvents]] — derives a transcript change stream from the driver's
  *     read-only `events` parquet (TESTDATA.md) with a pure column mapping, so
  *     the fully-applied final state has an exact DuckDB SQL oracle.
  *
  *  2. [[synthetic]] — distributed `spark.range`-based generator (pure
  *     functions of the row id, seed folded into every hash — no RNG state,
  *     so generation is replay-stable and scales linearly with executors).
  *     Scenario knobs mirror the reference's fixture taxonomy
  *     (/root/reference/samples/pdf — one fixture per failure mode):
  *     duplicates (TextProcessor.removeSameTextChunks analog), out-of-order
  *     (XY-Cut re-sequencing analog), deletes (null-compaction analog),
  *     Zipf-hot conversation (TriageProcessor pathological-page analog),
  *     and mid-stream `tool` column appearance (schema evolution).
  */
object TranscriptWal {

  /** Deterministic events→WAL mapping. Keep in sync with [[fromEventsOracleSql]]. */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/events.parquet").select(
      when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
      col("event_id").as("lsn"),
      // The driver parquet carries TIMESTAMP_NTZ; normalize to session-TZ
      // (UTC) TIMESTAMP so downstream epoch arithmetic works uniformly.
      col("ts").cast("timestamp").as("commit_ts"),
      concat(lit("c"), col("user_id").cast("string")).as("conv_id"),
      (col("event_id") % 50).cast("int").as("turn_idx"),
      col("event_type").as("role"),
      col("props").as("text"),
      when(col("event_type") === "purchase", lit("cart")).as("tool"),
      col("ts").cast("timestamp").as("ts")
    )
  }

  /** The same mapping as ANSI SQL over the raw `events` table (DuckDB oracle). */
  val fromEventsSql: String =
    """SELECT CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |       event_id AS lsn, ts AS commit_ts,
      |       'c' || CAST(user_id AS VARCHAR) AS conv_id,
      |       CAST(event_id % 50 AS INTEGER) AS turn_idx,
      |       event_type AS role, props AS text,
      |       CASE WHEN event_type = 'purchase' THEN 'cart' END AS tool,
      |       ts AS ts
      |FROM events""".stripMargin

  /** Distributed deterministic generator.
    *
    * @param hotConvShare  fraction of events routed to conversation "hot"
    *                      (0.0 = uniform) — skew fixture
    * @param dupFraction   fraction of events duplicated verbatim (same key+lsn)
    * @param deleteFraction fraction of D tombstones
    * @param withTool      emit the `tool` column (false = pre-evolution schema)
    * @param shuffled      emit events in a deterministic permutation of lsn
    *                      order (out-of-order fixture)
    */
  def synthetic(
      spark: SparkSession,
      nEvents: Long,
      nConvs: Int,
      seed: Long = 42L,
      hotConvShare: Double = 0.0,
      dupFraction: Double = 0.0,
      deleteFraction: Double = 0.0,
      withTool: Boolean = true,
      shuffled: Boolean = false,
      lsnOffset: Long = 0L,
      turnsPerConv: Int = 40
  ): DataFrame = {
    val base = spark.range(0, nEvents)
    // Seed-folded deterministic "randomness": xxhash64 of (seed, id, tag).
    def h(tag: String) = pmod(xxhash64(lit(seed), col("id"), lit(tag)), lit(1000000L))
    val hot = h("hot") < lit((hotConvShare * 1000000).toLong)
    val convNum = pmod(xxhash64(lit(seed), col("id"), lit("conv")), lit(nConvs.toLong))
    val df = base
      .withColumn("lsn", col("id") + lit(lsnOffset))
      .withColumn("conv_id",
        when(hot, lit("hot")).otherwise(concat(lit("c"), convNum.cast("string"))))
      .withColumn("turn_idx",
        pmod(xxhash64(lit(seed), col("id"), lit("turn")), lit(turnsPerConv.toLong)).cast("int"))
      .withColumn("op",
        when(h("del") < lit((deleteFraction * 1000000).toLong), lit("D")).otherwise(lit("U")))
      .withColumn("role",
        element_at(array(lit("user"), lit("assistant"), lit("system"), lit("tool")),
          (pmod(xxhash64(lit(seed), col("id"), lit("role")), lit(4L)) + 1).cast("int")))
      .withColumn("text",
        concat(lit("turn "), col("conv_id"), lit("/"), col("turn_idx"),
          lit(" rev "), col("lsn"),
          lit(" payload "), xxhash64(lit(seed), col("id"), lit("pay")).cast("string")))
      .withColumn("tool",
        if (withTool)
          when(col("role") === "tool",
            concat(lit("tool_"), pmod(xxhash64(col("id"), lit("tn")), lit(5L)).cast("string")))
        else lit(null).cast("string"))
      .withColumn("commit_ts",
        timestamp_seconds(lit(1704067200L) + col("lsn") * lit(2)))
      .withColumn("ts", col("commit_ts"))
      .select("op", "lsn", "commit_ts", "conv_id", "turn_idx", "role", "text", "tool", "ts")

    val withDups =
      if (dupFraction > 0.0) {
        val dups = df.where(
          pmod(xxhash64(lit(seed), col("lsn"), lit("dup")), lit(1000000L))
            < lit((dupFraction * 1000000).toLong))
        df.unionAll(dups)
      } else df

    if (shuffled)
      // Deterministic permutation: order by a hash of lsn. Replay-stable,
      // unlike rand(); exercises out-of-order arbitration.
      withDups.orderBy(xxhash64(lit(seed), col("lsn"), lit("perm")))
    else withDups
  }

  /** Final expected state of a WAL under last-writer-wins + tombstone
    * semantics, computed independently of the merge engine (window kernel
    * only) — the test oracle for replay equality (north rule).
    */
  def expectedState(wal: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id", "turn_idx").orderBy(col("lsn").desc)
    wal.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("op") =!= "D")
      .drop("__rn", "op", "lsn", "commit_ts")
  }
}
