package graft

/** Plan auditor: prints the formatted physical plan of each headline
  * query (or all with --all, or a named subset with --only=a,b) so scan
  * pushdown (PushedFilters/ReadSchema), join strategy (BroadcastHashJoin
  * vs SortMerge) and codegen spans are reviewable.
  * Usage: runMain graft.Explain [sfDir] [--all | --only=q_a,q_b]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.01")
    val all = args.contains("--all")
    val only = args.collectFirst { case a if a.startsWith("--only=") =>
      a.stripPrefix("--only=").split(",").toSet }
    val spark = GraftSession.local()
    val qs = SparkEntry.registry
      .filter(q => only.map(_.contains(q.name)).getOrElse(all || q.headline))
    qs.foreach { q =>
      println(s"\n========== ${q.name} ==========")
      try q.run(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
