package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline: token
  * counting, quality scoring, language ID, fingerprinting. All pure column
  * expressions (whole-stage codegen; no UDFs), so they fuse into one
  * projection over the scan at any scale.
  */
object TextOps {

  /** Whitespace tokens (empty-safe). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= "")

  /** BPE-ish subword token estimate: word chunks + digits + punctuation each
    * count; long words count ceil(len/4) subwords — a cheap deterministic
    * stand-in for a real tokenizer's token count.
    */
  def bpeishTokenCount(text: Column): Column =
    aggregate(
      transform(tokens(text), w => ceil(length(w) / lit(4.0)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Quality score in [0,1]: penalizes too-short docs, high punctuation
    * ratio, low stopword ratio, replacement chars. Deterministic; thresholds
    * are the reference's "probability >= 0.75 accept" idiom
    * (TextLineProcessor.java:38) adapted to document quality.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = Seq("the", "a", "of", "and")): Column = {
    val nTok = tokenCount(text)
    val stopRatio = size(filter(tokens(text), w => w.isin(stopwords.map(lit): _*)))
      .cast("double") / greatest(nTok.cast("double"), lit(1.0))
    // Explicit ASCII ranges, not \p{Punct}: Java's \p{Punct} is the 32 ASCII
    // specials while RE2's nearest class \p{P} excludes the symbol chars —
    // spelling the ranges keeps every engine byte-identical.
    val punctRatio = (length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", "")))
      .cast("double") / greatest(length(text).cast("double"), lit(1.0))
    val badRatio = (length(text) - length(regexp_replace(text, "�", "")))
      .cast("double") / greatest(length(text).cast("double"), lit(1.0))
    val lenScore = least(nTok.cast("double") / lit(20.0), lit(1.0))
    round(greatest(lit(0.0),
      lenScore * (lit(1.0) - punctRatio) * (lit(1.0) - badRatio) *
        least(lit(1.0), stopRatio * lit(5.0) + lit(0.5))), 4)
  }

  /** Language ID by stopword-marker voting: score each candidate language by
    * counting its marker words; argmax with deterministic tie-break on
    * language code. N-gram-free but the same shape as fastText-style
    * heuristics; markers are configurable.
    */
  val defaultMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est"),
    "es" -> Seq("el", "los", "y", "es"),
    "zh" -> Seq("的", "是", "了", "在"))

  def langId(text: Column, markers: Map[String, Seq[String]] = defaultMarkers): Column =
    langIdFromTokens(tokens(lower(text)), markers)

  /** [[langId]] over a MATERIALIZED lowercase token-array column. Hot paths
    * should project the tokens into their own column first: inlined, the
    * per-language marker filters each re-run the regex split (same
    * CodegenFallback re-evaluation as the shingles perf contract).
    */
  def langIdFromTokens(toks: Column, markers: Map[String, Seq[String]] = defaultMarkers): Column = {
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(size(filter(toks, w => w.isin(ws.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax by (score, lang) => deterministic: highest score wins, ties
    // break to the alphabetically-last language code.
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Content fingerprint (stable hash). md5 keeps DuckDB-oracle parity;
    * xxhash64 is the cheap variant for internal shuffles.
    */
  def fingerprint(text: Column): Column = md5(text)

  /** Rolling-hash shingle fingerprints: w-token windows, each hashed — the
    * basis for n-gram Jaccard and MinHash.
    *
    * PERF CONTRACT: pass a MATERIALIZED token-array column (project
    * [[tokens]] into its own column first), never the tokenization
    * expression inline. Higher-order functions are CodegenFallback, so an
    * inline `tokens(lower(text))` argument is re-evaluated by the lambda
    * for EVERY window — an O(windows) regex-split blowup per document
    * (measured ~10× the whole stage's CPU at 3-token shingles).
    */
  def shinglesFromTokens(toks: Column, w: Int = 3): Column = {
    val n = size(toks)
    // windows i..i+w-1 via sequence+transform (no explode needed here)
    when(n >= w,
      array_distinct(transform(sequence(lit(0), n - lit(w)),
        i => xxhash64(concat_ws(" ",
          slice(toks, i + 1, lit(w)))))))
      .otherwise(array(xxhash64(concat_ws(" ", toks))))
  }

  /** [[shinglesFromTokens]] over `tokens(lower(text))` inline — convenient
    * for one-off small frames; hot paths must materialize the tokens first
    * (see the perf contract above).
    */
  def shingles(text: Column, w: Int = 3): Column =
    shinglesFromTokens(tokens(lower(text)), w)

  /** Per-document text metrics in one pass. */
  def withTextMetrics(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_tokens_bpeish", bpeishTokenCount(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fp", fingerprint(t))
  }
}
