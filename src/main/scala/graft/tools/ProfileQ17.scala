package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch same-JVM A/B of the two q_tpch_q17 renditions (window over
  * the fact vs per-part groupBy joined back), alternating per rep.
  * Usage: runMain graft.tools.ProfileQ17 [sfDir]
  */
object ProfileQ17 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.localForData(d)
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))
    def windowR() = {
      val w = Window.partitionBy(col("l_partkey"))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .withColumn("sq", sum(dec(col("l_quantity"))).over(w))
        .withColumn("nq", count(lit(1)).over(w))
        .filter(dec(col("l_quantity")) * lit(5) * col("nq") < col("sq"))
        .agg(count(lit(1)).as("n_small"))
    }
    def joinR() = {
      val pa = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_quantity"))).as("sq"), count(lit(1)).as("nq"))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(pa, Seq("l_partkey"))
        .filter(dec(col("l_quantity")) * lit(5) * col("nq") < col("sq"))
        .agg(count(lit(1)).as("n_small"))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(windowR()); noop(joinR())
    var tw = Vector.empty[Double]; var tj = Vector.empty[Double]
    (1 to 7).foreach { _ =>
      val t0 = System.nanoTime(); noop(windowR())
      tw :+= (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); noop(joinR())
      tj :+= (System.nanoTime() - t1) / 1e9
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    println(f"[q17] window median ${med(tw)}%6.3f ${tw.map(t => f"$t%.2f").mkString("[", ",", "]")}")
    println(f"[q17] join   median ${med(tj)}%6.3f ${tj.map(t => f"$t%.2f").mkString("[", ",", "]")}")
    s.stop()
  }
}
