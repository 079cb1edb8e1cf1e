package graft.lake

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** A [[FileIndex]] over an EXPLICIT (version → change files) listing, with
  * `_commit_version` exposed as a PARTITION column.
  *
  * This is the batch change feed's scan shape: one parquet relation over the
  * union of every commit's change files, where each file's commit version is
  * a partition CONSTANT attached by the scan — never recovered per row from
  * the file path (the regex the streaming MicroBatchStream already retired
  * on its side). Costs nothing per row, and buys version-range predicates
  * (`_commit_version > v`) genuine partition pruning: Spark's
  * FileSourceStrategy routes them here as partitionFilters and whole commits
  * drop out of the file list before the scan plans.
  *
  * File sizes come from the commit-time footer stats when recorded
  * (metadata-only); files without recorded bytes are stat'ed once,
  * driver-side, at index build.
  */
private[lake] final class VersionedChangeFileIndex(
    spark: SparkSession,
    tablePath: String,
    filesByVersion: Seq[(Long, Seq[String])],
    knownBytes: String => Option[Long]) extends FileIndex {

  override val partitionSchema: StructType =
    StructType(Seq(StructField("_commit_version", LongType, nullable = false)))

  private val hconf = spark.sessionState.newHadoopConf()

  private val partitions: Seq[PartitionDirectory] = {
    lazy val fs = new HPath(tablePath).getFileSystem(hconf)
    filesByVersion.map { case (v, rels) =>
      val statuses = rels.map { rel =>
        val p = new HPath(s"$tablePath/$rel")
        knownBytes(rel) match {
          case Some(len) => new FileStatus(len, false, 1, 0L, 0L, p)
          case None      => fs.getFileStatus(p)
        }
      }.toArray
      PartitionDirectory(InternalRow(v), statuses)
    }
  }

  override def rootPaths: Seq[HPath] = Seq(new HPath(tablePath, "data"))

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    if (partitionFilters.isEmpty) partitions
    else {
      // Bind the version attribute to ordinal 0 of the partition row and
      // evaluate — the same interpreted-predicate pruning InMemoryFileIndex
      // applies to discovered partitions.
      val bound = Predicate.createInterpreted(
        partitionFilters.reduce(And).transform {
          case a: AttributeReference => BoundReference(0, LongType, nullable = false)
        })
      partitions.filter(p => bound.eval(p.values))
    }

  override def inputFiles: Array[String] =
    partitions.flatMap(_.files.map(_.getPath.toString)).toArray

  override def refresh(): Unit = () // the listing is explicit and immutable

  override def sizeInBytes: Long = partitions.flatMap(_.files.map(_.getLen)).sum
}
