package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable
import graft.wal.TranscriptWal

/** The property the reference only claims ("deterministic output",
  * README.md:13): ANY batch partitioning and ANY event permutation of the
  * same WAL must converge to the same final table state. ScalaCheck
  * generators sampled with fixed seeds (no scalatestplus bridge in the
  * offline cache, so sampling is explicit).
  */
class ReplayPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val walDf = {
    val df = TranscriptWal.synthetic(spark, 400, 6, deleteFraction = 0.15,
      dupFraction = 0.1).cache()
    df.count()
    df
  }
  private lazy val oracle = TranscriptWal.expectedState(walDf)
    .select("conv_id", "turn_idx", "text").cache()

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def assertMatchesOracle(got: org.apache.spark.sql.DataFrame): Unit =
    assert(got.exceptAll(oracle).count() == 0 && oracle.exceptAll(got).count() == 0)

  test("any batch partitioning of the WAL yields the oracle state") {
    val cutsGen = Gen.listOfN(3, Gen.choose(0L, 400L))
    (1L to 5L).foreach { seed =>
      val cuts = sample(cutsGen, seed)
      val t = new LakeTable(spark, Files.createTempDirectory("prop").toString, 4)
      val bounds = (Long.MinValue +: cuts.sorted :+ Long.MaxValue).distinct
      bounds.sliding(2).zipWithIndex.foreach {
        case (Seq(lo, hi), i) =>
          t.merge(walDf.where($"lsn" >= lo && $"lsn" < hi), "p", i.toLong)
        case _ =>
      }
      assertMatchesOracle(t.read().select("conv_id", "turn_idx", "text"))
    }
  }

  test("any permutation of the WAL yields the oracle state") {
    (1L to 5L).foreach { seed =>
      val permSeed = sample(Gen.choose(0L, 1000000L), seed)
      val permuted = walDf.orderBy(xxhash64($"lsn", lit(permSeed)))
      val t = new LakeTable(spark, Files.createTempDirectory("perm").toString, 4)
      t.merge(permuted, "p", 0)
      assertMatchesOracle(t.read().select("conv_id", "turn_idx", "text"))
    }
  }

  test("skewed WAL (hot conversation) converges identically") {
    val skew = TranscriptWal.synthetic(spark, 1000, 10, hotConvShare = 0.4,
      deleteFraction = 0.1)
    val exp = TranscriptWal.expectedState(skew).select("conv_id", "turn_idx", "text")
    val t = new LakeTable(spark, Files.createTempDirectory("skew").toString, 4)
    t.merge(skew, "p", 0)
    val got = t.read().select("conv_id", "turn_idx", "text")
    assert(got.exceptAll(exp).count() == 0 && exp.exceptAll(got).count() == 0)
  }

  test("maintenance (compaction + tombstone GC + vacuum) never changes state") {
    val cutsGen = Gen.listOfN(2, Gen.choose(0L, 400L))
    (1L to 4L).foreach { seed =>
      val cuts = sample(cutsGen, seed)
      val t = new LakeTable(spark, Files.createTempDirectory("gc").toString, 4)
      val bounds = (Long.MinValue +: cuts.sorted :+ Long.MaxValue).distinct
      bounds.sliding(2).zipWithIndex.foreach {
        case (Seq(lo, hi), i) =>
          t.merge(walDf.where($"lsn" >= lo && $"lsn" < hi), "p", i.toLong)
          // interleave maintenance between arbitrary epochs
          if (i % 2 == 1) {
            t.compactAll(dropTombstonesBelowLsn = Some(hi))
            t.vacuum(keepSnapshots = 1)
          }
        case _ =>
      }
      t.compactAll(dropTombstonesBelowLsn = Some(Long.MaxValue))
      t.vacuum(keepSnapshots = 1)
      assertMatchesOracle(t.read().select("conv_id", "turn_idx", "text"))
    }
  }

  test("broadcast MOR ≡ window MOR for ANY batch split + partial compaction (property)") {
    // The round-6 read-path rework (deltas windowed + base broadcast-joined,
    // LakeTable.arbitrateDirty) must be observationally identical to the
    // window-over-everything shape on ANY interleaving of merges and partial
    // compactions — including out-of-order lsns, deletes, duplicate
    // revisions, and buckets in every state (clean / dirty / never
    // compacted). The fallback conf flips the implementation under the SAME
    // physical table, so any divergence is the join shape's fault alone.
    val cutsGen = Gen.listOfN(3, Gen.choose(0L, 400L))
    (1L to 5L).foreach { seed =>
      val cuts = sample(cutsGen, seed)
      val t = new LakeTable(spark, Files.createTempDirectory("bmor").toString, 4)
      val bounds = (Long.MinValue +: cuts.sorted :+ Long.MaxValue).distinct
      bounds.sliding(2).zipWithIndex.foreach {
        case (Seq(lo, hi), i) =>
          // reversed-range application: later epochs carry LOWER lsns, so
          // the broadcast pick's lsn comparison is genuinely exercised
          val (l, h) = if (i % 2 == 0) (lo, hi)
            else (bounds(bounds.length - 2 - i), bounds(bounds.length - 1 - i))
          t.merge(walDf.where($"lsn" >= l && $"lsn" < h), "p", i.toLong)
          if (i == 1) t.compactAll() // some buckets clean, later ones re-dirty
        case _ =>
      }
      val broadcastState = t.readWithLsn()
        .select("conv_id", "turn_idx", "text", "_lsn").collect().toSet
      spark.conf.set("spark.graft.mor.deltaBroadcastBytes", "0")
      try {
        val windowState = t.readWithLsn()
          .select("conv_id", "turn_idx", "text", "_lsn").collect().toSet
        assert(broadcastState == windowState,
          s"seed=$seed: broadcast and window arbitration diverged")
      } finally spark.conf.unset("spark.graft.mor.deltaBroadcastBytes")
    }
  }

  test("rollback restores ANY earlier version; touched-path ≡ full-diff (property)") {
    // Two identical tables built from the same deterministic epoch splits,
    // rolled back to the same random mark — one through the change-feed-
    // bounded touched-key path (default cap), one through the full
    // two-sided diff (cap=0). Both must land exactly on the state readAsOf
    // served at the mark BEFORE any rollback ran.
    val cutsGen = Gen.listOfN(2, Gen.choose(0L, 400L))
    (1L to 3L).foreach { seed =>
      val cuts = sample(cutsGen, seed)
      val bounds = (Long.MinValue +: cuts.sorted :+ Long.MaxValue).distinct
      def build(): LakeTable = {
        val t = new LakeTable(spark, Files.createTempDirectory("rb").toString, 4)
        bounds.sliding(2).zipWithIndex.foreach {
          case (Seq(lo, hi), i) =>
            t.merge(walDf.where($"lsn" >= lo && $"lsn" < hi), "p", i.toLong)
            if (i == 0) t.compactAll() // mark can fall on a compacted commit
          case _ =>
        }
        t
      }
      val a = build()
      val b = build()
      assert(a.latestVersion == b.latestVersion)
      val mark = 1L + (sample(Gen.choose(0L, 100L), seed + 77) %
        a.latestVersion.get)
      val expected = a.readAsOf(mark)
        .select("conv_id", "turn_idx", "text").collect().toSet
      a.rollbackTo(mark) // touched-key path (small churn, default cap)
      spark.conf.set("spark.graft.rollback.touchedKeysCap", "0")
      try b.rollbackTo(mark) // full two-sided diff
      finally spark.conf.unset("spark.graft.rollback.touchedKeysCap")
      val gotA = a.read().select("conv_id", "turn_idx", "text").collect().toSet
      val gotB = b.read().select("conv_id", "turn_idx", "text").collect().toSet
      assert(gotA == expected, s"seed=$seed mark=$mark: touched-path rollback diverged")
      assert(gotB == expected, s"seed=$seed mark=$mark: full-diff rollback diverged")
    }
  }

  test("manifest reconstruction is exact: a fresh reopen equals the writer's view (property)") {
    // The snapshot's bucket map now lives in a manifest LIST folded
    // later-wins-per-bucket through caches; this property pins that for
    // ARBITRARY interleavings of merges and maintenance, a cold reopen
    // (fresh instance, no warm caches) reconstructs byte-identical state —
    // buckets, stats and data — to the instance that wrote it.
    val cutsGen = Gen.listOfN(3, Gen.choose(0L, 400L))
    (1L to 3L).foreach { seed =>
      val cuts = sample(cutsGen, seed)
      val path = Files.createTempDirectory("manifest-prop").toString
      val t = new LakeTable(spark, path, 4, maxManifests = 3) // force merges
      val bounds = (Long.MinValue +: cuts.sorted :+ Long.MaxValue).distinct
      bounds.sliding(2).zipWithIndex.foreach {
        case (Seq(lo, hi), i) =>
          t.merge(walDf.where($"lsn" >= lo && $"lsn" < hi), "p", i.toLong)
          if (i % 2 == 0) t.compactAll()
          if (i % 3 == 2) t.vacuum(keepSnapshots = 2)
          val cold = LakeTable.open(spark, path)
          val sw = t.currentSnapshot.get
          val sc = cold.currentSnapshot.get
          assert(sc.version == sw.version && sc.buckets == sw.buckets &&
            sc.fileStats == sw.fileStats && sc.manifestList == sw.manifestList,
            s"cold reopen must reconstruct the writer's snapshot (seed=$seed step=$i)")
          val a = t.read().select("conv_id", "turn_idx", "text")
          val b = cold.read().select("conv_id", "turn_idx", "text")
          assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
        case _ =>
      }
      assertMatchesOracle(t.read().select("conv_id", "turn_idx", "text"))
    }
  }

  test("BucketPrune is invisible: random key-set filters equal the unpruned truth") {
    // An optimizer rule that rewrites scan file lists is the riskiest kind
    // of code — this property pins that NO literal conv_id filter, over any
    // random key subset (present keys, absent keys, empty-ish, mixed), can
    // ever change results: the pruned plan must equal both the bespoke
    // pruned API and the oracle state filtered in memory.
    val t = new LakeTable(spark, Files.createTempDirectory("prune").toString, 8)
    val cuts = Seq(150L, 300L)
    (Long.MinValue +: cuts :+ Long.MaxValue).sliding(2).zipWithIndex.foreach {
      case (Seq(lo, hi), i) => t.merge(walDf.where($"lsn" >= lo && $"lsn" < hi), "p", i.toLong)
      case _ =>
    }
    t.compactAll()
    // leave one bucket dirty so both MOR branches are exercised under pruning
    t.merge(walDf.where($"conv_id" === "c1").withColumn("lsn", $"lsn" + 500000L), "p", 99L)
    val universe = (0 until 6).map(i => s"c$i") ++ Seq("hot", "ghost-a", "ghost-b")
    val keysGen = Gen.nonEmptyListOf(Gen.oneOf(universe)).map(_.distinct)
    (1L to 8L).foreach { seed =>
      val keys = sample(keysGen, seed)
      val pruned = t.read().where($"conv_id".isin(keys: _*))
        .select("conv_id", "turn_idx", "text")
      val api = t.readConvs(keys).select("conv_id", "turn_idx", "text")
      assert(pruned.exceptAll(api).count() == 0 && api.exceptAll(pruned).count() == 0,
        s"pruned filter != pruned API for keys $keys")
    }
  }

  test("manifest-stat file skipping is invisible for ANY ts range (property)") {
    // Skipping is an OPTIMIZATION, not a semantic: for random ranges —
    // degenerate, disjoint, partial, covering — the skipped plans must equal
    // the unskipped filter applied in full. Bounds land on/around the
    // synthetic ts grid (1704067200 + 2*lsn seconds) to probe edges.
    val base = 1704067200L * 1000000L
    def tsOf(lsn: Long): Long = base + 2L * lsn * 1000000L
    val t = new LakeTable(spark, Files.createTempDirectory("skip").toString, 4)
    val cuts = Seq(100L, 250L)
    (Long.MinValue +: cuts :+ Long.MaxValue).sliding(2).zipWithIndex.foreach {
      case (Seq(lo, hi), i) => t.merge(walDf.where($"lsn" >= lo && $"lsn" < hi), "s", i.toLong)
      case _ =>
    }
    t.compactAll() // clean bases ⇒ readTimeRange skipping active
    val boundGen = Gen.choose(-10L, 460L).map(tsOf)
    (1L to 8L).foreach { seed =>
      val a = sample(boundGen, seed)
      val b = sample(boundGen, seed + 100)
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val viaSkip = t.readTimeRange(lo, hi).select("conv_id", "turn_idx", "text")
      val full = t.read().where(unix_micros($"ts").between(lo, hi))
        .select("conv_id", "turn_idx", "text")
      assert(viaSkip.exceptAll(full).count() == 0 && full.exceptAll(viaSkip).count() == 0,
        s"readTimeRange($lo,$hi) diverged from the unskipped filter")
      val feedSkip = t.changesInRange(lo, hi)
        .select($"conv_id", $"turn_idx", $"op", $"_lsn")
      val feedFull = t.changesSince(0)
        .where($"ts".isNotNull && unix_micros($"ts").between(lo, hi))
        .select($"conv_id", $"turn_idx", $"op", $"_lsn")
      assert(feedSkip.exceptAll(feedFull).count() == 0 &&
        feedFull.exceptAll(feedSkip).count() == 0,
        s"changesInRange($lo,$hi) diverged from the unskipped feed")
    }
  }
}
