package graft

import org.apache.spark.sql.SparkSession

/** Long-lived-JVM drift diagnostic (round-16 verdict task 2): the 10×
  * full-board screen showed graph_hits_scores at 9.8 s fresh but 225 s
  * after ~190 other ops ran in the same JVM — WITH the 1 g code cache.
  * A 100 TB cluster job IS a long-lived JVM, so the mechanism matters.
  *
  * Runs the board alphabetically (1 timed run per op, Bench order) at
  * an arbitrary SF dir, re-times a fixed CANARY op every `batch` ops,
  * and after each canary logs one CSV line of suspect state:
  *   - canary seconds (the drift signal)
  *   - live heap after System.gc() (listener/status-store retention)
  *   - GC time delta, loaded classes, metaspace, code-heap occupancy
  *     (JIT exhaustion would show near-max code heap)
  *   - SQL status-store execution count (plan-string retention)
  *   - registered shuffle count (ContextCleaner backlog)
  *   - block count + storage bytes (leaked broadcasts/caches)
  *   - listener-bus dropped events
  *
  * Usage: runMain graft.JvmDrift <sfDir> [canary] [batch] [maxOps] [gc|nogc]
  *
  * `nogc` skips the System.gc() at each sample: a forced full GC kicks
  * the ContextCleaner's weak refs, so if the drift only reproduces
  * under `nogc`, the mechanism is GC-reclaimable driver state piling
  * up between organic old-gen collections (cleaner backlog); if it
  * reproduces under `gc` too, the retained state is strongly
  * reachable (status store, listener maps, codegen classes).
  */
object JvmDrift {
  def main(args: Array[String]): Unit = {
    val sfDir  = args.headOption.getOrElse("/tmp/graft_sf1")
    val canary = args.lift(1).getOrElse("graph_hits_scores")
    val batch  = args.lift(2).map(_.toInt).getOrElse(40)
    val maxOps = args.lift(3).map(_.toInt).getOrElse(Int.MaxValue)
    val forceGc = !args.lift(4).contains("nogc")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench: without this the 100-entry generated-class cache
      // cycles between canary re-times and every canary run pays
      // janino + fresh JIT — a fixed per-plan tax that reads as
      // "drift" but is just cache sizing (round-18 measurement)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    val gcBeans = ManagementFactory.getGarbageCollectorMXBeans.asScala
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
    def poolUsed(prefix: String): Long =
      pools.filter(_.getName.startsWith(prefix)).map(_.getUsage.getUsed).sum
    def codeHeapUsed: Long = poolUsed("CodeHeap")
    def gcMs: Long = gcBeans.map(_.getCollectionTime).sum

    def runOp(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"DRIFT FAIL $name: ${e.getClass.getSimpleName}"); -1L }
      val t = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      t
    }

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    var lastGc = gcMs
    println("nth_op,canary_s,live_heap_mb,gc_delta_ms,classes,metaspace_mb," +
      "codeheap_mb,sql_execs,shuffles,blocks,storage_mb,dropped_events")
    def sample(n: Int): Unit = {
      val t = runOp(canary)
      if (forceGc) { System.gc(); Thread.sleep(300); System.gc() } // settle to the live set
      val live = (ManagementFactory.getMemoryMXBean.getHeapMemoryUsage.getUsed / 1048576.0)
      val g = gcMs; val dg = g - lastGc; lastGc = g
      val (blocks, storageBytes) = org.apache.spark.graft.GraftIntrospect.blockStats(sc)
      println(Seq(
        n.toString, fmt(t), fmt(live), dg.toString,
        ManagementFactory.getClassLoadingMXBean.getLoadedClassCount.toString,
        fmt(poolUsed("Metaspace") / 1048576.0),
        fmt(codeHeapUsed / 1048576.0),
        spark.sharedState.statusStore.executionsCount().toString,
        org.apache.spark.graft.GraftIntrospect.shuffleCount(sc).toString,
        blocks.toString, fmt(storageBytes / 1048576.0),
        org.apache.spark.graft.GraftIntrospect.droppedEvents(sc).toString
      ).mkString(","))
    }

    // same warmup as Bench
    try {
      Tables.names.foreach(t => Tables(spark, sfDir, t).limit(1).count())
      SparkEntry.entry(spark).count()
    } catch { case _: Throwable => () }

    val board = SparkEntry.queries.keys.toSeq.sorted
      .filter(_ != canary).take(maxOps)
    sample(0)
    board.zipWithIndex.foreach { case (name, i) =>
      val t = runOp(name)
      System.err.println(s"  [${i + 1}/${board.size}] $name ${fmt(t)}s")
      if ((i + 1) % batch == 0) sample(i + 1)
    }
    if (board.size % batch != 0) sample(board.size)
    spark.stop()
  }
}
