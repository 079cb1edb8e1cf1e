package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CdcOps, DedupOps}

/** 64-bit fingerprint collisions are EXPECTED at the 10^10-row design point
  * (birthday bound ~4×10^9). These tests plant a REAL xxhash64 collision —
  * two different printable ASCII strings with the same hash — and prove the
  * engine's 128-bit (xxhash64, md5) fingerprint pair neither flags the
  * innocent twin as boilerplate nor deletes it as a duplicate.
  *
  * Collision construction: XXH64's short-input path is a chain of invertible
  * 64-bit steps (odd-constant multiply, rotate, xor). For a 16-byte input the
  * pre-avalanche accumulator is `step(step(h0, lane1), lane2)`; fixing the
  * target accumulator and any lane1 determines lane2 exactly (each step is a
  * bijection in the lane), so we sample printable lane1 values until the
  * solved lane2 is printable too (~1/3000 per try, deterministic LCG).
  */
class FingerprintSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // --- XXH64 (seed 42, inputs of exactly 16 bytes) and its inversion -------
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  /** Inverse of an odd multiplier mod 2^64 (Newton iteration). */
  private def inv64(a: Long): Long = {
    var x = a
    (0 until 6).foreach(_ => x = x * (2L - a * x))
    x
  }
  private val invP1 = inv64(P1)
  private val invP2 = inv64(P2)

  private def rotl(x: Long, r: Int) = java.lang.Long.rotateLeft(x, r)
  private def rotr(x: Long, r: Int) = java.lang.Long.rotateRight(x, r)
  private def mix(k: Long): Long = rotl(k * P2, 31) * P1
  private def step(h: Long, lane: Long): Long = rotl(h ^ mix(lane), 27) * P1 + P4

  private def laneOf(bytes: Array[Byte], off: Int): Long =
    (0 until 8).map(j => (bytes(off + j).toLong & 0xffL) << (8 * j)).reduce(_ | _)

  private def laneToBytes(k: Long): Array[Byte] =
    (0 until 8).map(j => ((k >>> (8 * j)) & 0xffL).toByte).toArray

  private def printable(k: Long): Boolean =
    laneToBytes(k).forall(b => b >= 0x21 && b <= 0x7e)

  /** A 16-char ASCII string whose xxhash64(seed=42) equals `target`'s. */
  private def forgeCollision(target: String): String = {
    val tb = target.getBytes("UTF-8")
    require(tb.length == 16, "construction is for 16-byte inputs")
    val h0 = 42L + P5 + 16L
    val accA = step(step(h0, laneOf(tb, 0)), laneOf(tb, 8))
    // lane2 = mix⁻¹( step⁻¹(accA) ^ step(h0, lane1) ), for sampled lane1
    val preRot = rotr((accA - P4) * invP1, 27) // = h1 ^ mix(lane2)
    var x = 0x5DEECE66DL // deterministic LCG — reproducible test
    while (true) {
      x = x * 6364136223846793005L + 1442695040888963407L
      val lane1 = x | 0x2121212121212121L // bias toward printable candidates
      if (printable(lane1)) {
        val h1 = step(h0, lane1)
        val lane2 = rotr((preRot ^ h1) * invP1, 31) * invP2
        if (printable(lane2) && !(lane1 == laneOf(tb, 0) && lane2 == laneOf(tb, 8))) {
          return new String(laneToBytes(lane1) ++ laneToBytes(lane2), "UTF-8")
        }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private val textA = "boilerplate-text" // 16 ASCII bytes
  private lazy val textB = forgeCollision(textA)

  test("forged pair genuinely collides under Spark's xxhash64 but not md5") {
    assert(textB != textA && textB.length == 16)
    val r = Seq(textA, textB).toDF("t")
      .select(xxhash64($"t").as("x"), md5($"t").as("m")).collect()
    assert(r(0).getLong(0) == r(1).getLong(0), "xxhash64 must collide")
    assert(r(0).getString(1) != r(1).getString(1), "md5 must differ")
  }

  test("flagBoilerplate: an innocent xxhash64-collision twin is NOT flagged") {
    // textA is true boilerplate (4 distinct convs); textB collides with it
    // but lives in ONE conv — a 64-bit fingerprint would flag (and the
    // ingest pipeline would DROP) it.
    val rows = (0 until 4).map(i => (s"c$i", 0, textA)) :+ (("c9", 0, textB))
    val out = CdcOps.flagBoilerplate(rows.toDF("conv_id", "turn_idx", "text"),
      minConvs = 3)
    assert(out.where($"text" === textA && !$"is_boilerplate").count() == 0)
    assert(out.where($"text" === textB).collect().forall(!_.getAs[Boolean]("is_boilerplate")),
      "collision twin wrongly flagged as boilerplate")
  }

  test("DedupOps.exact: an xxhash64-collision twin is NOT deduplicated away") {
    val df = Seq((1L, textA), (2L, textB), (3L, textA)).toDF("doc_id", "text")
    val kept = DedupOps.exact(df).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L), // 3 is a true dup of 1; 2 must survive
      s"expected the distinct collision twin to survive, kept ${kept.toSeq}")
  }
}
