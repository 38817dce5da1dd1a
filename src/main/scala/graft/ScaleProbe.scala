package graft

import org.apache.spark.sql.SparkSession

/** Scale-probe timer (round-13 verdict task 1): times a named subset
  * of the registered ops against an arbitrary sf directory and prints
  * the FULL per-op map as one JSON line — unlike Bench, whose stdout
  * contract is the fixed headline subset.
  *
  * Also serves verdict task 2 (cheap-query drift diagnosis): running
  * 3 ops in a fresh JVM here vs late in a 632-op Bench sweep isolates
  * shared-JVM accumulation from plan regressions.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> <op1,op2,...> [runs]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ops   = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq.empty)
    val runs  = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "32g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (k, _) => ops.isEmpty || ops.contains(k) }
    // Per-op spill + GC attribution, same volatile-label listener as
    // Bench (round-15 verdict task 4: spill_mb has never read nonzero,
    // so the probe must carry it to observe the FIRST spill as the
    // dataset outgrows the unified memory pool at 30x / small heaps).
    val spillBytes = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    val gcMs = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    @volatile var currentQuery = ""
    val taskEnds = new java.util.concurrent.atomic.AtomicLong
    def acc(m: java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong],
        k: String, v: Long): Unit =
      m.computeIfAbsent(k, _ => new java.util.concurrent.atomic.AtomicLong).addAndGet(v)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskEnds.incrementAndGet()
        val q = currentQuery
        val m = te.taskMetrics
        if (q.nonEmpty && m != null) {
          acc(spillBytes, q, m.memoryBytesSpilled + m.diskBytesSpilled)
          acc(gcMs, q, m.jvmGCTime)
        }
      }
    })
    // Drain the async listener bus before relabeling currentQuery: a
    // fixed grace sleep under-waits exactly when it matters (heavy GC /
    // spill delays task-end delivery), crediting trailing events to the
    // next op. Poll until no task-end arrives for a 40 ms quiet window
    // (500 ms cap so a stalled bus can't hang the probe).
    def drainBus(): Unit = {
      val deadline = System.nanoTime() + 500000000L
      var last = taskEnds.get(); Thread.sleep(40)
      while (taskEnds.get() != last && System.nanoTime() < deadline) {
        last = taskEnds.get(); Thread.sleep(40)
      }
    }
    // same warmup as Bench: scan each table once + one joined agg
    try {
      Tables.names.foreach(t => Tables(spark, sfDir, t).limit(1).count())
      SparkEntry.entry(spark).count()
    } catch { case _: Throwable => () }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def lk(m: java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong],
        k: String): Long = Option(m.get(k)).map(_.get).getOrElse(0L)
    val out = selected.map { case (name, fn) =>
      currentQuery = name
      val times = Seq.fill(runs) {
        val t0 = System.nanoTime()
        val n = try fn(spark, sfDir).count() catch { case e: Throwable =>
          System.err.println(s"PROBE FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}"); -1L }
        (n, (System.nanoTime() - t0) / 1e9)
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      drainBus()
      val med = times.map(_._2).sorted.apply(times.size / 2)
      val mn = times.map(_._2).min
      // spill/GC are TOTALS across all `runs` repetitions of the op —
      // named _total so nobody divides them by a single run's median
      val sp = lk(spillBytes, name) / 1048576.0
      System.err.println(s"  probe $name: med=${fmt(med)} min=${fmt(mn)} rows=${times.head._1}" +
        s" spill_mb_total=${fmt(sp)} gc_ms_total=${lk(gcMs, name)}")
      (name, med, mn, times.head._1, sp, lk(gcMs, name))
    }
    currentQuery = ""
    val js = out.map { case (k, med, mn, rows, sp, gc) =>
      s""""$k":{"med":${fmt(med)},"min":${fmt(mn)},"rows":$rows,"spill_mb_total":${fmt(sp)},"gc_ms_total":$gc}""" }.mkString("{", ",", "}")
    println(s"""{"sf":"$sfDir","runs":$runs,"ops":$js}""")
    spark.stop()
  }
}
