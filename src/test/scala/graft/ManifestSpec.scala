package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable
import graft.wal.TranscriptWal

/** O(changed) commit metadata: per-commit bucket manifests + a pointer-only
  * snapshot JSON. Commit cost must track the CHANGE size, not the table's
  * file count; legacy inline snapshots must still open; vacuum must reclaim
  * unreferenced manifests.
  */
class ManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def oneConvBatch(conv: String, lsn: Long) =
    Seq(("U", lsn, new java.sql.Timestamp(lsn * 1000), conv, (lsn % 5).toInt,
      "user", s"text $lsn", Option.empty[String], new java.sql.Timestamp(lsn * 1000)))
      .toDF("op", "lsn", "commit_ts", "conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("commit metadata stays O(changed) over a long history on a wide table") {
    val work = Files.createTempDirectory("manifest").toString
    val t = new LakeTable(spark, work, numBuckets = 64, maxDeltasPerBucket = 1000)
    // seed: spread files across many buckets so table inventory >> one change
    t.merge(TranscriptWal.synthetic(spark, 2000, 40), "t", 0)
    val commits = 45
    val bytesPerCommit = (1 to commits).map { i =>
      t.merge(oneConvBatch(s"conv${i % 3}", 100000L + i), "t", i.toLong)
      val v = t.latestVersion.get
      val snapBytes = Files.size(Paths.get(work, "snapshots", f"v$v%010d.json"))
      val newManifests = t.currentSnapshot.get.manifestList
        .filter(_.contains(f"m$v%010d"))
      val manifestBytes = newManifests.map(m => Files.size(Paths.get(work, m))).sum
      (v, snapBytes + manifestBytes, newManifests)
    }
    // the snapshot JSON is pointers only — no inline file inventory
    val lastSnap = Files.readString(
      Paths.get(work, "snapshots", f"v${t.latestVersion.get}%010d.json"))
    assert(lastSnap.contains("manifestList") && !lastSnap.contains("\"fileStats\"")
      && !lastSnap.contains("\"buckets\""))
    // steady-state commits (not the periodic merge-all) carry bytes bounded
    // by the CHANGE, not the table: compare an early vs a late plain commit
    val plain = bytesPerCommit.filter(_._3.size <= 1)
      .filterNot { case (_, _, ms) => ms.exists(m => // merged manifests are big
        Files.size(Paths.get(work, m)) > 20000) }
    assert(plain.size > commits / 2, "most commits append one small manifest")
    val early = plain.take(5).map(_._2).max
    val late = plain.takeRight(5).map(_._2).max
    assert(late < early * 3 + 4096,
      s"metadata per commit must not grow with history: early=$early late=$late")
    // and the data still reads correctly through the reconstruction
    assert(t.read().where($"conv_id" === "conv1").count() > 0)
    assert(t.readConv("conv2").count() > 0)
  }

  test("manifest list is periodically merged and vacuum reclaims orphans") {
    val work = Files.createTempDirectory("manifest-gc").toString
    val t = new LakeTable(spark, work, numBuckets = 8,
      maxDeltasPerBucket = 1000, maxManifests = 6)
    (0 until 20).foreach(i => t.merge(oneConvBatch(s"c${i % 4}", 1000L + i), "t", i.toLong))
    val s = t.currentSnapshot.get
    assert(s.manifestList.size <= 6, "the merge-all bound holds")
    // full state survives reconstruction across merges of the list
    assert(t.read().count() == t.read().select("conv_id", "turn_idx").distinct.count())
    assert(t.read().select("conv_id").distinct.count() == 4)
    val before = Files.list(Paths.get(work, "manifests")).count()
    val (snapsDeleted, _) = t.vacuum(keepSnapshots = 2)
    assert(snapsDeleted > 0)
    val kept = t.currentSnapshot.get.manifestList.toSet ++
      t.snapshotAt(t.latestVersion.get - 1).manifestList.toSet
    val after = Files.list(Paths.get(work, "manifests")).iterator()
    val leftover = scala.jdk.CollectionConverters.IteratorHasAsScala(after)
      .asScala.map(p => s"manifests/${p.getFileName}").toSet
    assert(leftover == kept,
      s"vacuum keeps exactly the referenced manifests: leftover=$leftover kept=$kept")
    assert(before > leftover.size, "unreferenced manifests were reclaimed")
    // reads still healthy after GC
    assert(t.read().select("conv_id").distinct.count() == 4)
  }

  test("legacy inline snapshots still open; the next commit upgrades to manifests") {
    val t = new LakeTable(spark, Files.createTempDirectory("legacy").toString, 8)
    val wal = TranscriptWal.synthetic(spark, 400, 8).cache()
    t.merge(wal, "t", 1)
    val s = t.currentSnapshot.get
    // emulate a pre-manifest table: republish the same state INLINE
    t.writeSnapshot(s.copy(version = s.version + 1, manifestList = Nil))
    val t2 = LakeTable.open(spark, t.path)
    assert(t2.currentSnapshot.get.manifestList.isEmpty, "inline format read back")
    val exp = TranscriptWal.expectedState(wal).select("conv_id", "turn_idx", "text")
    val got = t2.read().select("conv_id", "turn_idx", "text")
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
    // first post-upgrade commit writes ONE merged manifest covering all
    // legacy buckets — nothing is lost to a partial manifest view
    t2.merge(oneConvBatch("c1", 9999999L), "t", 2)
    val up = t2.currentSnapshot.get
    assert(up.manifestList.size == 1, "legacy upgrade merges the full state")
    assert(t2.read().where($"text" === "text 9999999").count() == 1)
    val got2 = t2.read().select("conv_id", "turn_idx").distinct.count()
    assert(got2 == exp.select("conv_id", "turn_idx").distinct.count())
    wal.unpersist()
  }
}
