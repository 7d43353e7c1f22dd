package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side xxhash64 identical to Spark's `xxhash64` column function
  * (seed 42, UTF8 bytes) — lets typed (Dataset) kernels produce hashes that
  * agree with Catalyst-computed ones. Cross-checked in HashingSpec. */
object Hashing {
  val Seed = 42L

  def xxhash64Str(s: String, seed: Long = Seed): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
  }

  def xxhash64Long(v: Long, seed: Long = Seed): Long = XXH64.hashLong(v, seed)
}
