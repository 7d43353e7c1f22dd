package graft.tools

/** Pure-CPU scaling calibration subprocess (see Bench.lcgThroughput). */
object LcgProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    graft.Bench.lcgThroughput(cpus) // warmup (JIT)
    val rate = graft.Bench.lcgThroughput(cpus)
    println(s"LCG iters_per_sec=$rate")
  }
}
