package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import graft.operators.CuckooFilter
import graft.sources.Rng
import org.scalatest.funsuite.AnyFunSuite

class CuckooFilterSpec extends AnyFunSuite {

  private def keys(n: Int, seed: Long): Seq[Long] =
    (0 until n).map(i => Rng.mix(seed, i.toLong))

  test("no false negatives at 10k keys") {
    val f = CuckooFilter.create(10000)
    val ks = keys(10000, 1L)
    ks.foreach(k => assert(f.add(k), s"insert failed for $k"))
    ks.foreach(k => assert(f.mightContain(k)))
    assert(f.size === 10000L)
  }

  test("false positive rate is small") {
    val f = CuckooFilter.create(10000)
    keys(10000, 2L).foreach(f.add)
    val probes = keys(100000, 999L)
    val fp = probes.count(f.mightContain)
    // 16-bit fingerprints, 4-slot buckets → expected fpr ≈ 2*4/2^16 ≈ 1.2e-4
    assert(fp < 100, s"fp=$fp out of 100k probes")
  }

  test("delete removes membership") {
    val f = CuckooFilter.create(1000)
    val ks = keys(1000, 3L)
    ks.foreach(f.add)
    ks.take(500).foreach(k => assert(f.remove(k)))
    // deleted keys may still FP-collide with remaining fingerprints, but the
    // count must drop and all remaining keys must still be present
    assert(f.size === 500L)
    ks.drop(500).foreach(k => assert(f.mightContain(k)))
  }

  test("serialize round-trips") {
    val f = CuckooFilter.create(5000)
    val ks = keys(5000, 4L)
    ks.foreach(f.add)
    val bos = new ByteArrayOutputStream()
    f.serialize(new DataOutputStream(bos))
    val g = CuckooFilter.deserialize(new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
    assert(g.size === f.size)
    ks.foreach(k => assert(g.mightContain(k)))
  }

  test("property: added keys always found across many seeds/sizes") {
    for (seed <- 1L to 50L) {
      val n = (Rng.bounded(Rng.mix(seed, 77L), 500L) + 1).toInt
      val f = CuckooFilter.create(n.toLong * 2)
      val ks = keys(n, seed)
      ks.foreach(f.add)
      ks.foreach(k => assert(f.mightContain(k), s"seed=$seed n=$n key=$k"))
    }
  }
}
