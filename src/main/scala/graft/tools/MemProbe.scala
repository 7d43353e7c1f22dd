package graft.tools

/** Memory-bandwidth calibration probe (STREAM-triad-like, pure JVM): each of
  * `cpus` threads repeatedly walks a disjoint 64 MiB stripe of a shared long
  * array (read-sum — the lightest op, so the loop is bandwidth-bound, not
  * ALU-bound). Prints total GB/s. Used by [[graft.Bench]] alongside the
  * register-only LCG probe: the crawl's dominant work (row encode/decode,
  * parquet, shuffle) is bandwidth-bound, and a single VM's memory controllers
  * are shared across all active cores — whereas a real N→4N executor step
  * adds whole nodes with their own memory systems. The pair of probes brackets
  * the sandbox's hardware ceiling for compute-bound and bandwidth-bound work.
  */
object MemProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val perThreadLongs = 8 * 1024 * 1024 // 64 MiB per thread
    // fixed ~64 GiB total traffic per measurement regardless of width: a
    // sub-100 ms sweep measured garbage (one driver-bench window reported
    // 147 GB/s at 32 cores and 16 GB/s at 8 — pure weather aliasing); ~1-2 s
    // per pass averages over scheduler noise
    val stripeBytes = perThreadLongs.toLong * 8L
    val reps = math.max(8L, (64L << 30) / (stripeBytes * cpus)).toInt
    val arr = new Array[Long](perThreadLongs * cpus)
    java.util.Arrays.fill(arr, 3L)
    val sums = new java.util.concurrent.atomic.AtomicLong()
    // warmup pass (page-in + JIT)
    runPass(arr, cpus, perThreadLongs, 1, sums)
    val t0 = System.nanoTime()
    runPass(arr, cpus, perThreadLongs, reps, sums)
    val secs = (System.nanoTime() - t0) / 1e9
    val bytes = arr.length.toLong * 8L * reps
    println(f"MEM=${bytes / secs / 1e9}%.3f")
    if (sums.get == 42L) print("")
  }

  private def runPass(arr: Array[Long], cpus: Int, stripe: Int, reps: Int,
      sums: java.util.concurrent.atomic.AtomicLong): Unit = {
    val threads = (0 until cpus).map { t =>
      new Thread(() => {
        var acc = 0L
        var r = 0
        while (r < reps) {
          var i = t * stripe
          val end = i + stripe
          while (i < end) { acc += arr(i); i += 1 }
          r += 1
        }
        sums.addAndGet(acc)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
  }
}
