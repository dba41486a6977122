package graft.tools

import graft.{GraftSession, Tables}
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the end-to-end DSv2 headliners (not part
  * of the library API): times each phase of q_dsv2_ann / q_dsv2_delete
  * separately so optimization effort lands where the seconds are.
  * Usage: sbt "runMain graft.tools.ProfilePhases [sfDir]"
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.localForData(d)
    def time[T](name: String)(f: => T): T = {
      s.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val simRoot = graft.ops.Fs.scratchDir("graft_prof_simcat")
    s.conf.set("spark.sql.catalog.graft_sim",
      classOf[graft.sources.PartitionedSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sim.root", simRoot)

    (1 to 2).foreach { rep =>
      println(s"=== q_dsv2_ann rep $rep")
      val emb = Tables.embeddings(s, d)
      time("ann: drop table")(s.sql("DROP TABLE IF EXISTS graft_sim.ivf_corpus"))
      val centsDist = time("ann: kmeansFit distributed")(
        Similarity.kmeansFit(
          emb.orderBy(col("vec_id")).limit(2048), "vec_id", "embedding",
          k = 16, iters = 3))
      val cents = time("ann: kmeansFitLocal")(
        Similarity.kmeansFitLocal(
          emb.orderBy(col("vec_id")).limit(2048), "vec_id", "embedding",
          k = 16, iters = 3))
      val maxDelta = centsDist.zip(cents).map { case (a, b) =>
        a.zip(b).map { case (x, y) => math.abs(x - y) }.max }.max
      println(f"[phase] centroid max |delta| dist vs local: $maxDelta%.3e")
      time("ann: write corpus (create)") {
        emb.withColumn("cell", Similarity.nearestCentroid(col("embedding"), cents))
          .writeTo("graft_sim.ivf_corpus")
          .tableProperty("graft.format", "parquet")
          .partitionedBy(col("cell")).create()
      }
      val p = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      val ann = time("ann: ivfLayoutTopK (noop)") {
        val r = Similarity.ivfLayoutTopK(s.table("graft_sim.ivf_corpus"),
          "vec_id", "embedding", "cell", p, cents, 10, nProbe = 4)
        noop(r); r
      }
      val exact = time("ann: bruteForceTopK (noop)") {
        val r = Similarity.bruteForceTopK(emb, "vec_id", "embedding", p, 10)
        noop(r); r
      }
      time("ann: recallAtK (noop)")(
        noop(Similarity.recallAtK(ann, exact, 10, minMeanRecall = 0.40)))
      // actual mean recall, to confirm the 0.40 bound's margin
      val annP = ann.select(col("probe_id"), col("neighbor_id")).distinct()
      val hit = exact.select(col("probe_id"), col("neighbor_id"))
        .join(annP, Seq("probe_id", "neighbor_id"), "left_semi").count()
      val nP = exact.select(col("probe_id")).distinct().count()
      println(f"[phase] mean recall@10 = ${hit.toDouble / (nP * 10)}%.4f over $nP probes")
    }

    val dynRoot = graft.ops.Fs.scratchDir("graft_prof_dyncat")
    s.conf.set("spark.sql.catalog.graft_dyn",
      classOf[graft.sources.PartitionedSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_dyn.root", dynRoot)
    (1 to 2).foreach { rep =>
      println(s"=== q_dsv2_delete rep $rep")
      val ord = Tables.orders(s, d)
      time("del: drop table")(s.sql("DROP TABLE IF EXISTS graft_dyn.del_orders"))
      def band(lo: Double, hi: Double) = ord
        .filter(col("o_totalprice") >= lo && col("o_totalprice") < hi)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"), col("o_orderpriority"))
      time("del: create (band 1)")(
        band(0, 100000).writeTo("graft_dyn.del_orders")
          .partitionedBy(col("o_orderpriority")).create())
      time("del: append band 2")(
        band(100000, 200000).writeTo("graft_dyn.del_orders").append())
      time("del: append band 3")(
        band(200000, Double.MaxValue).writeTo("graft_dyn.del_orders").append())
      time("del: DELETE (COW rewrite)")(
        s.sql("""DELETE FROM graft_dyn.del_orders
          WHERE o_totalprice >= 150000 AND o_totalprice < 250000
            AND o_orderstatus = 'F'"""))
      time("del: final agg read (noop)")(
        noop(s.table("graft_dyn.del_orders")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))))
    }
    s.stop()
  }
}
