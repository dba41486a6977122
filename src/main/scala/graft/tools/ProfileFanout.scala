package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch same-JVM A/B for the ops.Fanout single-split fan-out (not
  * library API): alternates fanout OFF/ON per rep for each named query
  * so machine drift cancels, prints per-mode times.
  * Usage: runMain graft.tools.ProfileFanout [sfDir] [q_a q_b ...]
  */
object ProfileFanout {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSet
    val spark = GraftSession.localForData(sfDir)
    val qs = SparkEntry.registry.filter(q => names.contains(q.name))
    qs.foreach { q =>
      // one warm pass per mode
      Seq(true, false).foreach { off =>
        graft.ops.Fanout.disabled = off
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
        spark.catalog.clearCache()
      }
      val times = scala.collection.mutable.Map(
        true -> Vector.empty[Double], false -> Vector.empty[Double])
      (1 to 5).foreach { _ =>
        Seq(true, false).foreach { off =>
          graft.ops.Fanout.disabled = off
          val t0 = System.nanoTime()
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          times(off) :+= dt
          spark.catalog.clearCache()
        }
      }
      def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
      println(f"[fanout] ${q.name}%-24s OFF median ${med(times(true))}%6.3f ${times(true).map(t => f"$t%.2f").mkString("[", ",", "]")}  ON median ${med(times(false))}%6.3f ${times(false).map(t => f"$t%.2f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
