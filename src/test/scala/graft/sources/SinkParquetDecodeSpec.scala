package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DECODE-throughput pin for the vectorized parquet path: drives
  * [[SinkParquetReader]] (row-materialized) and
  * [[SinkParquetColumnarReader]] (page-level vector fill) DIRECTLY on
  * the same files — no Spark job, no aggregation, no task scheduling —
  * and requires the columnar path to decode a wide scan at ≥2x the
  * rows/sec of the row path. This is the number the 100 TB posture
  * cares about: the cycles per value on the tier that carries every
  * byte the skip layers keep. (Query-level equivalence and plan
  * shape are pinned in SinkParquetColumnarSpec.)
  */
class SinkParquetDecodeSpec extends graft.SparkSpec {

  test("wide-scan decode: columnar ≥2x rows/sec vs row materialization on the same files") {
    val root = tmpDir("sink_decode_pin")
    spark.conf.set("spark.sql.catalog.graft_dec_spec",
      classOf[PartitionedSinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dec_spec.root", root)
    spark.range(0, 1500000).select(
      col("id").as("k"), (col("id") * 31).as("l"),
      col("id").cast("int").as("i"), (col("id") / 7.0).as("d"),
      col("id").cast("float").as("f"),
      concat(lit("v-"), col("id")).as("s"),
      (col("id") % 2 === 0).as("b"),
      when(col("id") % 13 === 0, lit(null))
        .otherwise(col("id") % 97).cast("int").as("n"),
      lit("A").as("p"))
      .coalesce(2)
      .writeTo("graft_dec_spec.t").partitionedBy(col("p")).create()

    val (partCols, fullSchema, props) = SinkSidecar.readDir(
      org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
        spark.sessionState.newHadoopConf()), s"$root/t")
    val fieldIds = SinkFormat.fieldIds(props)
    val required = StructType(
      fullSchema.fields.filterNot(f => partCols.contains(f.name)))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val files = new java.io.File(s"$root/t/p=A").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
    assert(files.nonEmpty)
    val keyTypes = partCols.map(c => fullSchema(c).dataType)
    def split(f: String) = SinkFileSplit(f, Seq("A"), keyTypes)

    // consume every value through the same accessor surface codegen
    // uses (getLong/getUTF8String/... on the row / on the vectors), so
    // neither path can skip materialization
    def rowPass(): Long = {
      var acc = 0L
      files.foreach { f =>
        val r = new SinkParquetReader(split(f), fullSchema, required,
          partCols, conf, fieldIds)
        try {
          while (r.next()) {
            val row = r.get()
            acc += row.getLong(0) + row.getLong(1) + row.getInt(2) +
              row.getDouble(3).toLong + row.getFloat(4).toLong +
              row.getUTF8String(5).numBytes() +
              (if (row.getBoolean(6)) 1L else 0L) +
              (if (row.isNullAt(7)) 0L else row.getInt(7))
          }
        } finally r.close()
      }
      acc
    }
    def colPass(): Long = {
      var acc = 0L
      files.foreach { f =>
        val r = new SinkParquetColumnarReader(split(f), fullSchema, required,
          partCols, conf, fieldIds)
        try {
          while (r.next()) {
            val batch = r.get()
            val n = batch.numRows()
            var i = 0
            while (i < n) {
              acc += batch.column(0).getLong(i) + batch.column(1).getLong(i) +
                batch.column(2).getInt(i) +
                batch.column(3).getDouble(i).toLong +
                batch.column(4).getFloat(i).toLong +
                batch.column(5).getUTF8String(i).numBytes() +
                (if (batch.column(6).getBoolean(i)) 1L else 0L) +
                (if (batch.column(7).isNullAt(i)) 0L
                 else batch.column(7).getInt(i))
              i += 1
            }
          }
        } finally r.close()
      }
      acc
    }

    assert(rowPass() === colPass(), "both decodes must see identical values")
    def median(passes: Seq[Double]): Double =
      passes.sorted.apply(passes.length / 2)
    val rowSec = median((1 to 5).map { _ =>
      val t0 = System.nanoTime(); rowPass(); (System.nanoTime() - t0) / 1e9 })
    val colSec = median((1 to 5).map { _ =>
      val t0 = System.nanoTime(); colPass(); (System.nanoTime() - t0) / 1e9 })
    info(f"row decode $rowSec%.3f s, columnar decode $colSec%.3f s, " +
      f"speedup ${rowSec / colSec}%.2fx")
    assert(rowSec / colSec >= 2.0,
      f"columnar decode must be ≥2x rows/sec, got ${rowSec / colSec}%.2fx " +
        f"(row $rowSec%.3f s, columnar $colSec%.3f s)")
    spark.sql("DROP TABLE graft_dec_spec.t")
  }
}
