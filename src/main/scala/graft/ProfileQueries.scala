package graft

/** Scratch per-query timer with per-job attribution (not library API).
  * Usage: runMain graft.ProfileQueries [sfDir] [q_a q_b ...]
  * Runs each named registry query 3×: rep 1 warms, reps 2-3 print
  * wall time plus a job-by-job line (duration, task count, callsite)
  * so a slow query decomposes without the Spark UI.
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = GraftSession.localForData(sfDir)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobStart.put(e.jobId,
          (System.nanoTime(), e.stageInfos.map(_.numTasks).sum, site))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(e.jobId)).foreach { case (t0, nt, site) =>
          jobLines.add(f"    [job ${e.jobId}%3d] ${(System.nanoTime() - t0) / 1e9}%6.3f s tasks=$nt%3d  $site")
        }
      }
    })
    val qs = SparkEntry.registry.filter(q => names.isEmpty || names.contains(q.name))
    qs.foreach { q =>
      def once(print: Boolean): Double = {
        while (!jobLines.isEmpty) jobLines.poll()
        val t0 = System.nanoTime()
        val df = q.run(spark, sfDir)
        val t1 = System.nanoTime()
        // force analysis + physical planning without executing
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        val dt = (t3 - t0) / 1e9
        Thread.sleep(80)
        if (print) {
          while (!jobLines.isEmpty) println(jobLines.poll())
          println(f"    [split] construct ${(t1 - t0) / 1e9}%6.3f  plan ${(t2 - t1) / 1e9}%6.3f  exec ${(t3 - t2) / 1e9}%6.3f")
        }
        // SPARK_GRAFT_PROFQ_KEEPCACHE mirrors the bench's discipline
        // (cache lives across a query's reps, cleared between queries)
        // so warm-rep attribution matches what the bench MEDIAN times
        if (!sys.env.contains("SPARK_GRAFT_PROFQ_KEEPCACHE"))
          spark.catalog.clearCache()
        dt
      }
      try {
        once(print = false)
        (2 to 3).foreach { rep =>
          println(f"[profq] ${q.name}%-24s rep $rep")
          val dt = once(print = true)
          println(f"[profq] ${q.name}%-24s rep $rep total $dt%.3f s")
        }
      }
      catch { case e: Throwable => println(s"[profq] ${q.name} FAILED: ${e.getMessage}") }
      spark.catalog.clearCache() // between queries, always (bench parity)
    }
    spark.stop()
  }
}
