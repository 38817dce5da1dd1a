ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "randomforestusinghadoopspark"
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
// Forked run output passes through WITHOUT sbt's [info]/[error] line
// prefixes: the driver harness tail-captures sbt output and parses the
// bench JSON line — a "[info] " prefix broke that parse in rounds 1-2
// (BENCH_r{1,2}.json: parsed=null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: 8g left the unified memory pool (~4.6g) thin for a
  // 32-thread local sweep — storage/execution contention showed up as
  // in-sweep queries running 2-7x slower than isolated (SCALE.md). The
  // machine has 128 GiB; 24g keeps headroom for the driver harness.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The JVM default ReservedCodeCacheSize (240 MB) is NOT enough for a
  // 640-query codegen sweep: every query compiles fresh generated
  // classes, the code cache fills mid-sweep, the sweeper starts
  // flushing hot methods, and whole-stage-codegen'd stages silently
  // fall back to the interpreter — measured 20x per-record slowdown on
  // IDENTICAL shuffle volumes (graph_hits_scores half-rounds: 37 s vs
  // 1161 s of task time for the same 6M-record stage, eventlog-
  // verified round 16), plus GC storms from interpreter allocation.
  // This — not memory-pool contention — is the root cause of the
  // in-sweep 2-7x slowdowns and the round-14 ts_* "spike": with 1g
  // code cache graph_hits_scores runs 9.8 s flat at 10x across
  // repeats; with the default it degrades 19 -> 54 -> 173 s run-over-
  // run in one JVM. 1g is reserved address space, not committed RAM.
  "-XX:ReservedCodeCacheSize=1g",
) ++
  // diagnostics: pin the initial heap (G1 uncommits and regrows the
  // heap between benchmark runs, which showed up as bimodal 2-6x GC
  // storms on the corpus-sort ops) and/or swap the collector
  sys.env.get("SPARK_GRAFT_XMS").map(m => s"-Xms$m").toSeq ++
  sys.env.get("SPARK_GRAFT_GC").map(g => s"-XX:+Use${g}GC").toSeq
// forward the opt-in sweep flag to the FORKED test JVM so the
// documented `sbt -Dgraft.sf01=true "testOnly graft.Sf01CrossCheckSpec"`
// works (Test/fork does not inherit sbt-JVM system properties)
javaOptions ++= sys.props.get("graft.sf01").map(v => s"-Dgraft.sf01=$v").toSeq
