package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Scheme-aware filesystem probes via the Hadoop `FileSystem` API — the
  * reference probes the lake through HDFS (extract_flights.py:68-79), and
  * `java.io.File` silently answers "missing" for any non-local URI
  * (hdfs://, s3a://, …), which on a real cluster turns idempotent
  * appends into unconditional ones. Resolving the FS from the path makes
  * file:, hdfs:, s3a: all behave identically.
  */
object Fs {

  private def hadoopConf(): Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** True when the path exists, whatever its scheme. */
  def exists(dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(hadoopConf()).exists(p)
  }
}
