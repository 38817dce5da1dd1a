package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args beyond <sfDir> <outDir> select a query subset (iteration
    // aid; the driver always invokes with exactly two)
    val sfDir = args(0); val outDir = args(1)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // match Bench: 640 distinct plans in one JVM cycle the 100-entry
      // generated-class cache default (round 18, SCALE_PROBE 18b)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, sfDir, outDir, only)
    spark.stop()
  }

  /** The dump itself, on a caller-owned session — lets the opt-in
    * Sf01CrossCheckSpec reuse the shared test session without main()
    * stopping it from under the other suites.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      only: Set[String]): Unit = {
    new java.io.File(outDir).mkdirs()
    // Sorted for run-order determinism, mirroring Bench (round-6 verdict)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      def dump(): Unit = fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      try dump()
      catch { case e1: Throwable =>
        // ONE retry: ml_pca_project's breeze eigensolve fails
        // intermittently in long sweeps (empty-message
        // NotConvergedException class; passes standalone and on
        // re-run) — a transient engine hiccup must not zero a
        // deterministic query's round entry. The first failure is
        // ALWAYS logged so a flaky query can't pass a sweep with its
        // failure silently swallowed by a lucky retry.
        System.err.println(s"[verify] $name first attempt failed " +
          s"(${e1.getClass.getName}: ${e1.getMessage}), retrying once")
        try dump()
        catch { case e: Throwable =>
          // class name + top frame: a bare getMessage can be empty,
          // which hides the cause
          System.err.println(s"[verify] $name failed: " +
            s"${e.getClass.getName}: ${e.getMessage} @ " +
            e.getStackTrace.headOption.map(_.toString).getOrElse("?") +
            s" (after retry; first: ${e1.getClass.getName})")
        }
      }
      // free localCheckpoint/persist blocks the query leaked (see
      // Bench: unchecked they accumulate across the sweep)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
