package graft.tools

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scratch microbenchmark for the sink's per-FILE parquet writer cost
  * (not part of the library API): the DSv2 headliners' create/append
  * jobs write one file per partition leaf, so a 16-cell corpus create
  * pays 16× whatever `open`+`close` costs beyond the rows themselves.
  * Times N files × M rows for several (N, M) shapes to separate the
  * per-file floor from per-row encode.
  * Usage: sbt "runMain graft.tools.ProfileWriter"
  */
object ProfileWriter {
  def main(args: Array[String]): Unit = {
    val fields = Seq(
      StructField("o_orderkey", LongType) -> 0,
      StructField("o_totalprice", DoubleType) -> 1,
      StructField("o_orderstatus", StringType) -> 2)
    val ids = Map("o_orderkey" -> 1, "o_totalprice" -> 2, "o_orderstatus" -> 3)
    val conf = new org.apache.hadoop.conf.Configuration()
    def run(nFiles: Int, rowsPerFile: Int, tag: String): Unit = {
      val rows = (0 until rowsPerFile).map { i =>
        InternalRow(i.toLong, i * 1.5,
          UTF8String.fromString(if (i % 2 == 0) "F" else "O"))
      }.toArray
      (1 to 3).foreach { it =>
        val t0 = System.nanoTime()
        var f = 0
        while (f < nFiles) {
          val p = new org.apache.hadoop.fs.Path(
            s"/tmp/graft_prof_w_${tag}_${it}_$f.parquet")
          new java.io.File(p.toString).delete()
          val w = graft.sources.SinkParquetWrite.open(conf, p, fields, ids)
          var i = 0
          while (i < rowsPerFile) { w.write(rows(i)); i += 1 }
          w.close()
          f += 1
        }
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[pw] $tag%-20s it$it  $nFiles%3d files x $rowsPerFile%6d rows  total $dt%6.3f s  (${dt / nFiles * 1000}%6.1f ms/file)")
        (0 until nFiles).foreach(f => new java.io.File(
          s"/tmp/graft_prof_w_${tag}_${it}_$f.parquet").delete())
      }
    }
    run(16, 312, "ann-shape")     // q_dsv2_ann corpus: 16 cells x ~312 rows
    run(5, 30000, "delete-shape") // delete band: 5 priorities x ~30k rows
    run(64, 100, "many-tiny")
    run(1, 150000, "one-big")

    // open/write/close split for the tiny-file shape
    {
      val rows = (0 until 312).map { i =>
        InternalRow(i.toLong, i * 1.5, UTF8String.fromString("F"))
      }.toArray
      (1 to 3).foreach { it =>
        var tOpen = 0L; var tWrite = 0L; var tClose = 0L
        (0 until 32).foreach { f =>
          val p = new org.apache.hadoop.fs.Path(
            s"/tmp/graft_prof_w_split_${it}_$f.parquet")
          new java.io.File(p.toString).delete()
          val t0 = System.nanoTime()
          val w = graft.sources.SinkParquetWrite.open(conf, p, fields, ids)
          val t1 = System.nanoTime()
          var i = 0
          while (i < rows.length) { w.write(rows(i)); i += 1 }
          val t2 = System.nanoTime()
          w.close()
          val t3 = System.nanoTime()
          tOpen += t1 - t0; tWrite += t2 - t1; tClose += t3 - t2
          new java.io.File(p.toString).delete()
        }
        println(f"[pw] split it$it over 32 files: open ${tOpen / 32e6}%6.2f ms  write ${tWrite / 32e6}%6.2f ms  close ${tClose / 32e6}%6.2f ms (per file)")
      }
    }

    // inside open(): HadoopOutputFile.fromPath vs ParquetWriter build
    {
      import org.apache.parquet.hadoop.util.HadoopOutputFile
      (1 to 3).foreach { it =>
        var tFrom = 0L; var tCreate = 0L
        (0 until 32).foreach { f =>
          val p = new org.apache.hadoop.fs.Path(
            s"/tmp/graft_prof_w_open_${it}_$f.parquet")
          new java.io.File(p.toString).delete()
          val t0 = System.nanoTime()
          val of = HadoopOutputFile.fromPath(p, conf)
          val t1 = System.nanoTime()
          val os = of.createOrOverwrite(of.defaultBlockSize())
          os.close()
          val t2 = System.nanoTime()
          tFrom += t1 - t0; tCreate += t2 - t1
          new java.io.File(p.toString).delete()
        }
        println(f"[pw] open-split it$it: fromPath ${tFrom / 32e6}%6.2f ms  create-stream ${tCreate / 32e6}%6.2f ms (per file)")
      }
    }

    // raw hadoop fs create vs java.io, checksummed vs raw
    {
      val lfs = org.apache.hadoop.fs.FileSystem.getLocal(conf) // checksummed
      val raw = lfs.getRaw
      def bench(tag: String)(mk: Int => Unit): Unit =
        (1 to 2).foreach { it =>
          val t0 = System.nanoTime()
          (0 until 32).foreach(mk)
          println(f"[pw] create-bench $tag%-12s it$it ${(System.nanoTime() - t0) / 32e6}%6.2f ms/file")
          (0 until 32).foreach(f => new java.io.File(s"/tmp/graft_prof_cr_$f").delete())
        }
      bench("checksum") { f =>
        val os = lfs.create(new org.apache.hadoop.fs.Path(s"/tmp/graft_prof_cr_$f"), true)
        os.write(1); os.close()
      }
      bench("raw") { f =>
        val os = raw.create(new org.apache.hadoop.fs.Path(s"/tmp/graft_prof_cr_$f"), true)
        os.write(1); os.close()
      }
      bench("java.io") { f =>
        val os = new java.io.FileOutputStream(s"/tmp/graft_prof_cr_$f")
        os.write(1); os.close()
      }
    }
  }
}
