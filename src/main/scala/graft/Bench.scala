package graft

import graft.queries.Q

object Bench {
  /** Times each headline query on SPARK_GRAFT_SF_DIR (default sf0.1) and
    * prints ONE JSON line {"metric","value","unit","queries","sf"}.
    * An untimed warm-up pass over EVERY query absorbs one-off JVM/codegen
    * cost so the numbers reflect steady-state execution.
    */

  /** Materialize the complete result through a noop sink. `.count()`
    * would let Catalyst drop the final orderBy/projection, undertiming
    * the query the oracle actually checks; the noop writer consumes every
    * row of the exact plan at zero sink cost.
    */
  private def exec(q: Q, spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit =
    q.run(spark, sfDir).write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val headline = SparkEntry.registry.filter(_.headline)
    // untimed warm-up of every query: codegen compilation and the
    // parquet footer cache are one-off costs, not steady-state throughput
    headline.foreach(q => try exec(q, spark, sfDir) catch { case _: Throwable => })
    // n timed runs per query, report the MEDIAN: single-shot numbers have
    // twice been re-adjudicated as ambient-load noise (a one-off GC or a
    // background process lands entirely in one sample; the median of 3
    // discards it). A crashing query records the -1.0 sentinel, never its
    // time-to-failure — failures must be visible in the JSON line.
    val reps = 3
    val results = headline.map { q =>
      val times = Seq.fill(reps) {
        val t0 = System.nanoTime()
        try { exec(q, spark, sfDir); (System.nanoTime() - t0) / 1e9 }
        catch { case t: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: ${t.getMessage}")
          -1.0
        }
      }
      val ok = times.filter(_ >= 0).sorted
      q.name -> (if (ok.isEmpty) -1.0 else ok(ok.size / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // ambient-load sentinel: 1-minute system load average at the end of
    // the run (-1.0 where unavailable). A recorded run with load far
    // above the core count is machine noise, not a regression.
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // convergence observability for the one iterative operator
    val ccRounds = graft.dedup.Dedup.lastClusterRounds
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"cc_rounds":$ccRounds,"load_avg":$load}""")
    spark.stop()
  }
}
