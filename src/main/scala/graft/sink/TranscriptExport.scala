package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Report sinks (SURVEY §2.1 S7–S9): the reference walks one element tree per
  * enabled format (markdown/HTML/text, DocumentProcessor.java:542-603); here
  * one ordered traversal per conversation renders a formatted document, fully
  * distributed (per-conv aggregation, no driver collect).
  *
  * The traversal kernel is shared: sort turns within a conversation by
  * turn_idx (array_sort on collected structs — intra-group order is explicit,
  * never physical row order), then fold each turn through a format-specific
  * renderer expression.
  */
object TranscriptExport {

  /** One row per conversation: (conv_id, doc) with turns rendered in order. */
  private def renderPerConv(state: DataFrame,
                            turnRenderer: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                            header: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                            sep: String): DataFrame = {
    val turn = struct(col("turn_idx"), col("role"), col("text"), col("tool"))
    state
      .groupBy("conv_id")
      .agg(array_sort(collect_list(turn)).as("turns")) // sorts by turn_idx (first field)
      .select(col("conv_id"),
        concat(header(col("conv_id")),
          array_join(transform(col("turns"), turnRenderer), sep)).as("doc"))
  }

  /** Markdown: `## conv` header, `**role** (tool): text` per turn. */
  def toMarkdown(state: DataFrame): DataFrame =
    renderPerConv(state,
      t => concat(lit("**"), t.getField("role"), lit("**"),
        when(t.getField("tool").isNotNull,
          concat(lit(" ("), t.getField("tool"), lit(")"))).otherwise(lit("")),
        lit(": "),
        // escape markdown control chars exactly once (reference:
        // markdown/MarkdownGenerator.java:441-450)
        regexp_replace(t.getField("text"), "([*_`\\[\\]])", "\\\\$1")),
      c => concat(lit("## "), c, lit("\n\n")),
      sep = "\n\n")

  /** HTML (S8 — reference html/HtmlGenerator.java walks the same tree):
    * `<h2>` per conversation, `<p class=role>` per turn, entities escaped
    * via a replace chain (&, <, >, " — & first so escapes aren't re-escaped;
    * single-char literal patterns, cross-engine exact).
    */
  def toHtml(state: DataFrame): DataFrame = {
    def esc(c: org.apache.spark.sql.Column) = {
      val amp = regexp_replace(c, "&", "&amp;")
      val ltr = regexp_replace(amp, "<", "&lt;")
      val gtr = regexp_replace(ltr, ">", "&gt;")
      regexp_replace(gtr, "\"", "&quot;")
    }
    renderPerConv(state,
      t => concat(lit("<p class=\""), t.getField("role"), lit("\">"),
        esc(t.getField("text")), lit("</p>")),
      c => concat(lit("<h2>"), c, lit("</h2>\n")),
      sep = "\n")
  }

  /** Plain text: indented `role: text` lines. */
  def toText(state: DataFrame): DataFrame =
    renderPerConv(state,
      t => concat(lit("  "), t.getField("role"), lit(": "), t.getField("text")),
      c => concat(c, lit("\n")),
      sep = "\n")

  /** Chunked text rendering for pathological conversations: one output row
    * per `turnsPerChunk` consecutive turns, so no aggregation buffer (and no
    * output cell) ever holds a whole 10^7-turn conversation. Chunks carry
    * (conv_id, chunk_idx) — a downstream writer concatenates or stores them
    * as a multi-part document. Two bounded aggregations, no driver collect.
    */
  def toTextChunked(state: DataFrame, turnsPerChunk: Int = 1000): DataFrame = {
    val turn = struct(col("turn_idx"), col("role"), col("text"), col("tool"))
    state
      .withColumn("chunk_idx", expr(s"turn_idx div $turnsPerChunk"))
      .groupBy("conv_id", "chunk_idx")
      .agg(array_sort(collect_list(turn)).as("turns"))
      .select(col("conv_id"), col("chunk_idx"),
        array_join(transform(col("turns"),
          t => concat(lit("  "), t.getField("role"), lit(": "),
            t.getField("text"))), "\n").as("doc"))
  }

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
