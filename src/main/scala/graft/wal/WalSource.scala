package graft.wal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.model.Schemas

/** WAL source hardening (SURVEY §2.1 S2): the reference validates the magic
  * number and fails friendly on non-PDF input (DocumentProcessor.java:675-686).
  * The streaming analog is a corrupt-record policy on a JSON WAL feed:
  * PERMISSIVE parse into `_corrupt_record`, count the rejects via observe()
  * (warn-and-continue, DocumentProcessor.java:239-250), and pass only clean
  * events downstream.
  */
object WalSource {

  val corruptCol = "_corrupt_record"

  private def schemaWithCorrupt: StructType =
    StructType(Schemas.changeEvent.fields :+ StructField(corruptCol, StringType))

  /** Batch read of a JSON WAL directory; returns (clean, corrupt) frames.
    * A record is corrupt if it fails to parse OR misses a required field.
    */
  def readJson(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(schemaWithCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(dir)
      // required-field enforcement: op/lsn/key must be present
      .withColumn(corruptCol,
        when(col(corruptCol).isNotNull, col(corruptCol))
          .when(col("op").isNull || col("lsn").isNull ||
            col("conv_id").isNull || col("turn_idx").isNull,
            to_json(struct(col("op"), col("lsn"), col("conv_id"), col("turn_idx"))))
          .otherwise(lit(null)))
    val clean = raw.where(col(corruptCol).isNull).drop(corruptCol)
      .observe("wal_source", count(lit(1)).as("clean_records"))
    // reject log carries the raw record only — no wall-clock column, so a
    // replay of the same input produces a byte-identical reject log
    val corrupt = raw.where(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("record"))
    (clean, corrupt)
  }

  /** Streaming variant for the ingest job (same warn-and-continue policy as
    * the batch path): corrupt rows are COUNTED before the filter via a named
    * observation — it rides the streaming plan itself (not a foreachBatch
    * frame), so every batch's `corrupt_records`/`clean_records` reach
    * `StreamingQueryProgress.observedMetrics` and [[graft.stream.MetricsListener]].
    */
  def readJsonStream(spark: SparkSession, dir: String,
                     maxFilesPerTrigger: Int = 8): DataFrame = {
    val bad = col(corruptCol).isNotNull ||
      col("op").isNull || col("lsn").isNull ||
      col("conv_id").isNull || col("turn_idx").isNull
    spark.readStream
      .schema(schemaWithCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)
      .observe("wal_source_stream",
        count(when(bad, 1)).as("corrupt_records"),
        count(when(!bad, 1)).as("clean_records"))
      .where(!bad)
      .drop(corruptCol)
  }
}
