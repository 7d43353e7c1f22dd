package graft.tools

/** Durable-write bandwidth calibration probe: each of `cpus` threads
  * repeatedly creates, fills, and deletes its own file under the SAME
  * scratch root the crawl commits its tables to ([[graft.Bench.tmpRoot]] —
  * tmpfs in the bench sandbox), reusing one 4 MiB heap buffer so the probe
  * measures the kernel page-allocation + copy path, not JVM allocation.
  * Prints total GB/s.
  *
  * Why a third probe: the LCG probe bounds compute scaling and the STREAM
  * probe bounds read bandwidth, but the crawl's fetch wave is dominated by
  * parquet COMMITS — on tmpfs every written byte dirties fresh kernel pages,
  * a resource the host throttles independently of guest-visible CPU or read
  * bandwidth (congested windows show 32-core crawl walls equal to 8-core
  * ones while both other probes still scale). A real N→4N executor step
  * adds node-local NVMe + page cache with the nodes, so the write ceiling is
  * a sandbox artifact to normalize out, exactly like the other two.
  */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val root = java.nio.file.Files.createTempDirectory(graft.Bench.tmpRoot, "wprobe")
    val fileBytes = 256L << 20 // per file; created fresh + deleted per rep
    // fixed ~24 GiB aggregate traffic per measurement regardless of width
    // (same sub-100ms-aliasing lesson as MemProbe); peak concurrent disk use
    // = cpus × 256 MiB
    val repsPerThread = math.max(2L, (24L << 30) / (fileBytes * cpus)).toInt
    val buf = 4 << 20
    def pass(reps: Int): Unit = {
      val threads = (0 until cpus).map { t =>
        new Thread(() => {
          val b = new Array[Byte](buf)
          java.util.Arrays.fill(b, t.toByte)
          var r = 0
          while (r < reps) {
            val p = root.resolve(s"w-$t-$r")
            val out = java.nio.file.Files.newOutputStream(p)
            var written = 0L
            while (written < fileBytes) { out.write(b); written += buf }
            out.close()
            java.nio.file.Files.delete(p)
            r += 1
          }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
    }
    pass(1) // warmup: JIT + dentry/page-table paths
    val t0 = System.nanoTime()
    pass(repsPerThread)
    val secs = (System.nanoTime() - t0) / 1e9
    val bytes = fileBytes * repsPerThread.toLong * cpus
    java.nio.file.Files.deleteIfExists(root)
    println(f"WRT=${bytes / secs / 1e9}%.3f")
  }
}
