package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: writes a `factor`× copy of a
  * harness testdata directory so scaling slopes (sf0.1 → sf1) can be
  * MEASURED instead of argued from plan structure.
  *
  * Semantics of the scale-up — each copy `cp ∈ [0, factor)` is the
  * source data with every surrogate key shifted into a disjoint range
  * (`key + cp·stride`, stride = max(key)+1), so FK edges stay valid
  * within a copy and cardinality ratios (orders per customer, lines
  * per order, docs per source) are preserved exactly. Fixed dimensions
  * (region, nation) are NOT scaled — as in TPC-H, where nation is 25
  * rows at every sf. Two content columns get a per-copy deterministic
  * decorrelation so pair-generating operators scale linearly the way
  * a real 10× corpus would, instead of superlinearly against 10 exact
  * clones of every row:
  *   - documents.text: per-copy AFFINE substitution cipher on letters
  *     (`i → a(cp)·i + cp mod 26`, a(cp) one of the 12 multipliers
  *     coprime to 26) — length, punctuation, token boundaries, and
  *     per-copy shingle structure all preserved; substitutions are
  *     distinct for every cp < 156 (the (multiplier, shift) schedule
  *     has period lcm(12, 26) = 156), so even a 100× scale-up never
  *     clones a text (a plain rotation collides at cp = 26);
  *   - embeddings.embedding: circular component rotation by `cp`,
  *     with the array REVERSED first on every wrap of the dimension
  *     (`cp div dim` odd) — norms exact-preserved, directions
  *     decorrelated, no identical vectors up to 2·dim copies.
  *
  * Facts are written range-partitioned + sorted on their date column
  * so parquet row-group min/max pruning behaves like the (naturally
  * date-correlated) source files rather than a shuffled worst case.
  *
  * Usage: runMain graft.tools.ScaleData <srcDir> <outDir> [factor]
  */
object ScaleData {

  private def shifted(df: DataFrame, cp: Int, shifts: Map[String, Long]): DataFrame =
    shifts.foldLeft(df) { case (d, (c, stride)) =>
      d.withColumn(c, col(c) + lit(cp * stride))
    }

  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private val upper = lower.toUpperCase
  private val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
  /** Affine substitution alphabet for copy `cp`: identity at cp = 0. */
  private def affine(s: String, cp: Int): String = {
    val a = coprimes(cp % coprimes.size)
    s.indices.map(i => s((a * i + cp) % 26)).mkString
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleData <srcDir> <outDir> [factor]")
    val (srcDir, outDir) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10

    // session sized to the OUTPUT (factor x the source bytes): the
    // factor-way union shuffles roughly the output volume
    val spark = graft.GraftSession.localForData(srcDir, factor.toDouble)
    import spark.implicits._

    def src(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")

    def maxKey(name: String, c: String): Long =
      src(name).agg(max(col(c))).as[Long].head() + 1L

    val strideCust = maxKey("customer", "c_custkey")
    val strideSupp = maxKey("supplier", "s_suppkey")
    val stridePart = maxKey("part", "p_partkey")
    val strideOrd  = maxKey("orders", "o_orderkey")
    val strideEv   = maxKey("events", "event_id")
    val strideUser = maxKey("events", "user_id")
    val strideDoc  = maxKey("documents", "doc_id")
    val strideVec  = maxKey("embeddings", "vec_id")

    /** factor copies with per-copy transforms, one write. */
    def scale(name: String, perCopy: (DataFrame, Int) => DataFrame,
              files: Int, sortCol: Option[String] = None): Unit = {
      val base = src(name)
      val all = (0 until factor).map(cp => perCopy(base, cp))
        .reduce(_ unionAll _)
      val laid = sortCol match {
        case Some(c) => all.repartitionByRange(files, col(c))
          .sortWithinPartitions(col(c))
        case None => all.repartition(files)
      }
      laid.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      System.err.println(s"[scale] $name x$factor written")
    }

    // fixed dims: copied once, unscaled (TPC-H nation/region semantics)
    for (t <- Seq("region", "nation"))
      src(t).write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    scale("customer", (d, cp) => shifted(d, cp, Map("c_custkey" -> strideCust)), 8)
    scale("supplier", (d, cp) => shifted(d, cp, Map("s_suppkey" -> strideSupp)), 1)
    scale("part", (d, cp) => shifted(d, cp, Map("p_partkey" -> stridePart)), 4)
    scale("orders", (d, cp) => shifted(d, cp,
      Map("o_orderkey" -> strideOrd, "o_custkey" -> strideCust)),
      16, Some("o_orderdate"))
    scale("lineitem", (d, cp) => shifted(d, cp,
      Map("l_orderkey" -> strideOrd, "l_partkey" -> stridePart,
        "l_suppkey" -> strideSupp)),
      32, Some("l_shipdate"))
    scale("events", (d, cp) => shifted(d, cp,
      Map("event_id" -> strideEv, "user_id" -> strideUser)),
      16, Some("ts"))
    scale("documents", (d, cp) =>
      shifted(d, cp, Map("doc_id" -> strideDoc))
        .withColumn("text",
          translate(col("text"), lower + upper, affine(lower, cp) + affine(upper, cp))),
      8)
    scale("embeddings", (d, cp) => {
      val base = shifted(d, cp, Map("vec_id" -> strideVec))
      val dim = 64 // harness embedding dimension (TESTDATA contract)
      val k = cp % dim
      val oriented =
        if ((cp / dim) % 2 == 1) base.withColumn("embedding", reverse(col("embedding")))
        else base
      oriented.withColumn("embedding", expr(
        s"concat(slice(embedding, ${k + 1}, size(embedding) - $k), " +
          s"slice(embedding, 1, $k))"))
    }, 4)

    System.err.println(s"[scale] done: $outDir at ${factor}x $srcDir")
    spark.stop()
  }
}
