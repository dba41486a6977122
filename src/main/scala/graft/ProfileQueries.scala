package graft

/** Scratch per-query timer for non-headline queries (not library API). */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = GraftSession.local()
    val qs = SparkEntry.registry.filter(q => names.isEmpty || names.contains(q.name))
    qs.foreach { q =>
      def once(): Double = {
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try { once(); println(f"[profq] ${q.name}%-24s ${once()}%.2f s") }
      catch { case e: Throwable => println(s"[profq] ${q.name} FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
