package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable
import graft.wal.TranscriptWal

/** CLI smoke test: drives every documented `graft.Main` command with exactly
  * the flags the usage string documents (reference precedent: the CI
  * option-coverage registry, /root/reference/verification/ci-verify.py:76-90).
  * Guards against usage-string/flag drift like the round-2 `--new-buckets`
  * mismatch.
  */
class MainSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("ingest → compact → vacuum → rebucket via the documented CLI flags") {
    val work = Files.createTempDirectory("cli").toString
    val wal = TranscriptWal.synthetic(spark, 600, 10, deleteFraction = 0.1)
    wal.write.parquet(s"$work/wal")
    val expected = TranscriptWal.expectedState(wal).count()

    // --no-watermark: the synthetic WAL spans more than any realistic delay,
    // and this test asserts exact row counts (watermarking has its own tests)
    Main.main(Array("ingest", "--wal", s"$work/wal", "--table", s"$work/t",
      "--checkpoint", s"$work/cp", "--buckets", "8", "--no-watermark",
      "--sanitize", "--max-files-per-trigger", "4"))
    val t = LakeTable.open(spark, s"$work/t")
    assert(t.read().count() == expected)

    Main.main(Array("compact", "--table", s"$work/t", "--gc-below-lsn", "0"))
    assert(t.currentSnapshot.get.buckets.values.forall(_.deltas.isEmpty))

    Main.main(Array("vacuum", "--table", s"$work/t", "--keep", "1"))
    assert(t.read().count() == expected, "vacuum preserves live state")

    Main.main(Array("history", "--table", s"$work/t")) // one JSON line/commit
    assert(t.history().count() >= 1)

    // the documented rebucket flag is --buckets (not --new-buckets)
    Main.main(Array("rebucket", "--table", s"$work/t",
      "--target", s"$work/t4", "--buckets", "4"))
    val t4 = LakeTable.open(spark, s"$work/t4")
    assert(t4.currentSnapshot.get.numBuckets == 4)
    assert(t4.read().count() == expected)

    val preDelete = t4.latestVersion.get
    Main.main(Array("delete", "--table", s"$work/t4",
      "--where", "turn_idx = 0"))
    assert(t4.read().where("turn_idx = 0").count() == 0, "CLI delete tombstones")
    assert(t4.read().count() < expected && t4.read().count() > 0)

    Main.main(Array("rollback", "--table", s"$work/t4",
      "--version", preDelete.toString))
    assert(t4.read().count() == expected, "CLI rollback restores the pre-delete state")
    assert(t4.latestVersion.get > preDelete, "rollback is a NEW commit, not a rewind")

    // embedded use: the CLI must not have stopped the caller's session
    assert(!spark.sparkContext.isStopped)
  }

  test("mirror replicates a lake over the change feed, resuming exactly-once") {
    val work = Files.createTempDirectory("cli-mirror").toString
    val src = new LakeTable(spark, s"$work/src", numBuckets = 4)
    val wal = TranscriptWal.synthetic(spark, 500, 8, deleteFraction = 0.1).cache()
    src.merge(wal.where($"lsn" < 200), "t", 1)
    src.merge(wal.where($"lsn" >= 200 && $"lsn" < 400), "t", 2)
    Main.main(Array("mirror", "--source", s"$work/src", "--target", s"$work/dst",
      "--checkpoint", s"$work/cp", "--buckets", "4"))
    val dst = LakeTable.open(spark, s"$work/dst")
    def state(t: LakeTable) = t.read().select("conv_id", "turn_idx", "text")
    assert(state(dst).exceptAll(state(src)).count() == 0 &&
      state(src).exceptAll(state(dst)).count() == 0 && state(dst).count() > 0)
    // new source commit; a second mirror run resumes from the checkpoint
    src.merge(wal.where($"lsn" >= 400), "t", 3)
    Main.main(Array("mirror", "--source", s"$work/src", "--target", s"$work/dst",
      "--checkpoint", s"$work/cp", "--buckets", "4"))
    assert(state(dst).exceptAll(state(src)).count() == 0 &&
      state(src).exceptAll(state(dst)).count() == 0)
    wal.unpersist()
  }

  test("ingest --follow tails until the bounded run stops it gracefully") {
    val work = Files.createTempDirectory("cli-follow").toString
    val wal = TranscriptWal.synthetic(spark, 300, 6)
    wal.write.parquet(s"$work/wal")
    // a bounded follow run: ProcessingTime trigger, stopped after the window
    Main.main(Array("ingest", "--wal", s"$work/wal", "--table", s"$work/t",
      "--checkpoint", s"$work/cp", "--buckets", "8", "--no-watermark",
      "--follow", "200 milliseconds", "--for-seconds", "8"))
    val t = LakeTable.open(spark, s"$work/t")
    assert(t.read().count() == TranscriptWal.expectedState(wal).count())
    assert(!spark.sparkContext.isStopped)
  }

  test("ingest --format json consumes a JSON WAL feed via the CLI") {
    val work = Files.createTempDirectory("cli-json").toString
    val wal = TranscriptWal.synthetic(spark, 300, 6)
    wal.coalesce(1).write.json(s"$work/wal")
    Main.main(Array("ingest", "--wal", s"$work/wal", "--table", s"$work/t",
      "--checkpoint", s"$work/cp", "--buckets", "8", "--no-watermark",
      "--format", "json"))
    val t = LakeTable.open(spark, s"$work/t")
    assert(t.read().count() == TranscriptWal.expectedState(wal).count())
  }

  test("unknown command and missing required flags fail loudly") {
    intercept[RuntimeException] { Main.main(Array("frobnicate")) }
    intercept[RuntimeException] { Main.main(Array("compact")) } // no --table
  }
}
