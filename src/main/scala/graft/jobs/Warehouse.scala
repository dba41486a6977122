package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse seam — the reference writes Hive managed tables
  * (reference: load_fct_flights.py:112-116 `format("hive").saveAsTable`),
  * but the harness has no metastore daemon, so the storage tier is
  * pluggable: production would bind a Hive/catalog implementation; tests
  * and the harness bind [[ParquetWarehouse]]. Query semantics are
  * identical either way — only the sink/scan bindings differ.
  */
trait Warehouse {
  def exists(table: String): Boolean
  def table(spark: SparkSession, name: String): DataFrame
  /** Dim snapshot replace (reference: load_dim_airports.py:61-64). */
  def overwrite(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit
  /** Incremental append (reference: load_fct_flights.py:112-116). */
  def append(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit
}

/** Parquet-directory warehouse: one partitioned parquet dataset per
  * table under `root`. Dynamic-partition append comes free from
  * `partitionBy` on the writer — the same layout Hive dynamic
  * partitioning produces.
  */
final class ParquetWarehouse(root: String) extends Warehouse {
  private def path(name: String) = s"$root/$name"

  def exists(table: String): Boolean =
    graft.ops.Fs.exists(path(table))

  def table(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(path(name))

  private def write(mode: SaveMode)(name: String, df: DataFrame, parts: Seq[String]): Unit = {
    val w = df.write.mode(mode)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(path(name))
  }

  def overwrite(name: String, df: DataFrame, partitionBy: Seq[String]): Unit =
    write(SaveMode.Overwrite)(name, df, partitionBy)

  def append(name: String, df: DataFrame, partitionBy: Seq[String]): Unit =
    write(SaveMode.Append)(name, df, partitionBy)
}
