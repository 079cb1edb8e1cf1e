package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Report sinks (SURVEY §2.1 S7–S9): the reference walks one element tree per
  * enabled format (markdown/HTML/text, DocumentProcessor.java:542-603); here
  * one ordered traversal per conversation renders a formatted document, fully
  * distributed (per-conv aggregation, no driver collect).
  *
  * The traversal kernel is shared: sort turns within a conversation by
  * turn_idx (array_sort on collected structs — intra-group order is explicit,
  * never physical row order), then fold each turn through a format-specific
  * renderer expression. Every format has a CHUNKED twin built on the same
  * renderer: no aggregation buffer (or output cell) ever holds more than
  * `turnsPerChunk` turns, so a 10^7-turn conversation cannot OOM an executor
  * in any format; chunks concatenated with the format separator reproduce the
  * unchunked document byte-for-byte (asserted per format in NewOpsSpec).
  */
object TranscriptExport {

  private val turnStruct = struct(col("turn_idx"), col("role"), col("text"), col("tool"))

  /** One row per conversation: (conv_id, doc) with turns rendered in order. */
  private def renderPerConv(state: DataFrame,
                            turnRenderer: Column => Column,
                            header: Column => Column,
                            sep: String): DataFrame =
    state
      .groupBy("conv_id")
      .agg(array_sort(collect_list(turnStruct)).as("turns")) // sorts by turn_idx (first field)
      .select(col("conv_id"),
        concat(header(col("conv_id")),
          array_join(transform(col("turns"), turnRenderer), sep)).as("doc"))

  /** Bounded-buffer twin: one row per `turnsPerChunk` consecutive turns,
    * keyed (conv_id, chunk_idx); the header is rendered into the FIRST chunk
    * so `array_join(chunks sorted by chunk_idx, sep)` == the unchunked doc.
    * Two bounded aggregations plus one window over the (small) chunk rows —
    * never a whole conversation in one buffer.
    */
  private def renderPerConvChunked(state: DataFrame,
                                   turnRenderer: Column => Column,
                                   header: Column => Column,
                                   sep: String, turnsPerChunk: Int): DataFrame = {
    require(turnsPerChunk > 0)
    val chunks = state
      .withColumn("chunk_idx", expr(s"turn_idx div $turnsPerChunk"))
      .groupBy("conv_id", "chunk_idx")
      .agg(array_sort(collect_list(turnStruct)).as("turns"))
    val w = Window.partitionBy("conv_id")
    chunks
      .withColumn("__first", min(col("chunk_idx")).over(w))
      .select(col("conv_id"), col("chunk_idx"),
        concat(
          when(col("chunk_idx") === col("__first"), header(col("conv_id")))
            .otherwise(lit("")),
          array_join(transform(col("turns"), turnRenderer), sep)).as("doc"))
  }

  // ---- format renderers (shared between whole and chunked variants) -------

  /** Markdown turn: `**role** (tool): text`, control chars escaped exactly
    * once (reference: markdown/MarkdownGenerator.java:441-450).
    */
  private val mdTurn: Column => Column = t =>
    concat(lit("**"), t.getField("role"), lit("**"),
      when(t.getField("tool").isNotNull,
        concat(lit(" ("), t.getField("tool"), lit(")"))).otherwise(lit("")),
      lit(": "),
      regexp_replace(t.getField("text"), "([*_`\\[\\]])", "\\\\$1"))
  private val mdHeader: Column => Column = c => concat(lit("## "), c, lit("\n\n"))

  /** HTML entity escape chain (& first so escapes aren't re-escaped;
    * single-char literal patterns, cross-engine exact).
    */
  private def htmlEsc(c: Column): Column = {
    val amp = regexp_replace(c, "&", "&amp;")
    val ltr = regexp_replace(amp, "<", "&lt;")
    val gtr = regexp_replace(ltr, ">", "&gt;")
    regexp_replace(gtr, "\"", "&quot;")
  }
  private val htmlTurn: Column => Column = t =>
    concat(lit("<p class=\""), t.getField("role"), lit("\">"),
      htmlEsc(t.getField("text")), lit("</p>"))
  private val htmlHeader: Column => Column = c =>
    concat(lit("<h2>"), c, lit("</h2>\n"))

  private val textTurn: Column => Column = t =>
    concat(lit("  "), t.getField("role"), lit(": "), t.getField("text"))
  private val textHeader: Column => Column = c => concat(c, lit("\n"))

  // ---- public sinks --------------------------------------------------------

  /** Markdown: `## conv` header, `**role** (tool): text` per turn. */
  def toMarkdown(state: DataFrame): DataFrame =
    renderPerConv(state, mdTurn, mdHeader, sep = "\n\n")

  def toMarkdownChunked(state: DataFrame, turnsPerChunk: Int = 1000): DataFrame =
    renderPerConvChunked(state, mdTurn, mdHeader, "\n\n", turnsPerChunk)

  /** HTML (S8 — reference html/HtmlGenerator.java walks the same tree). */
  def toHtml(state: DataFrame): DataFrame =
    renderPerConv(state, htmlTurn, htmlHeader, sep = "\n")

  def toHtmlChunked(state: DataFrame, turnsPerChunk: Int = 1000): DataFrame =
    renderPerConvChunked(state, htmlTurn, htmlHeader, "\n", turnsPerChunk)

  /** Plain text: indented `role: text` lines. */
  def toText(state: DataFrame): DataFrame =
    renderPerConv(state, textTurn, textHeader, sep = "\n")

  def toTextChunked(state: DataFrame, turnsPerChunk: Int = 1000): DataFrame =
    renderPerConvChunked(state, textTurn, textHeader, "\n", turnsPerChunk)

  /** Write one file tree per format — the reference's multi-sink single
    * traversal (same materialized state feeds every sink).
    */
  def writeAll(state: DataFrame, outDir: String): Unit = {
    val cached = state.persist()
    try {
      toMarkdown(cached).write.mode(SaveMode.Overwrite).json(s"$outDir/markdown")
      toText(cached).write.mode(SaveMode.Overwrite).json(s"$outDir/text")
    } finally cached.unpersist(blocking = false)
  }
}
