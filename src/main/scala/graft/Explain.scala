package graft

/** Plan auditor: prints the formatted physical plan of each headline
  * query (or all with --all) so scan pushdown (PushedFilters/ReadSchema),
  * join strategy (BroadcastHashJoin vs SortMerge) and codegen spans are
  * reviewable. Usage: runMain graft.Explain [sfDir] [--all]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.01")
    val all = args.contains("--all")
    val spark = GraftSession.local()
    val qs = SparkEntry.registry.filter(q => all || q.headline)
    qs.foreach { q =>
      println(s"\n========== ${q.name} ==========")
      try q.run(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
