ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ltcrawlerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked JVM's stdout through UNPREFIXED: sbt's default LoggedOutput
// strategy prepends "[info] " to every line, which made graft.Bench's summary
// JSON line unparseable to the round driver in rounds 1-2 (BENCH_r0x.json
// "parsed": null). StdoutOutput writes the child's stdout verbatim.
outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Forked-JVM heap: SPARK_DRIVER_MEM, CAPPED at 40 GiB. Round 1 shipped an
// uncapped pretouched heap: the driver exported ~90g, Bench forked a second
// JVM inheriting it, and two fully-pretouched ~90 GiB heaps in a 128 GiB
// sandbox got the bench OOM-killed (BENCH_r01.json rc=137). 40 GiB is ample
// for local[32] over sf0.1 and leaves room for Bench's CPU-confined
// subprocesses (which size their own, smaller heaps — see Bench.scala).
val forkHeapGb: Int = {
  val req = scala.util.Try(
    sys.env.getOrElse("SPARK_DRIVER_MEM", "32g").toLowerCase.stripSuffix("g").toInt
  ).getOrElse(32)
  math.min(req, 40)
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local-mode executor == driver JVM: size for 32 threads × wide rows
  // (8g causes GC thrash at local[32]).
  // Xms == Xmx: G1's commit/uncommit + page-zeroing cycles under a growing
  // heap measured 3-5× CPU inflation at local[32]; a pinned heap avoids them.
  // No AlwaysPreTouch: pinning already stops the commit/uncommit cycling;
  // pretouching made the full heap physically resident up front, which is
  // what starved the bench subprocesses of the round-1 OOM kill.
  s"-Xmx${forkHeapGb}g",
  s"-Xms${forkHeapGb}g",
  // throughput collector: this is a batch engine; G1's pause-time goal costs
  // ~15-25% on the allocation-heavy nested-row paths
  s"-XX:+Use${sys.env.getOrElse("SPARK_GC", "Parallel")}GC",
) ++ sys.env.get("SPARK_XMN").map(x => s"-Xmn$x").toSeq ++ Seq(
  // Catalyst's generated row (de)serializers for wide nested rows (FetchEvent:
  // frontier struct + discoveries + doc spans + doc_hashes) exceed HotSpot's
  // 8000-bytecode JIT refusal threshold — without this flag the whole
  // serializer runs interpreted (measured: fetch stage 70 → 417 cpu-sec after
  // adding one nested field). Standard Spark ops flag for wide schemas.
  "-XX:-DontCompileHugeMethods",
)
