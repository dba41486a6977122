package graft.sources

import org.apache.spark.{Partition, SparkContext, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Driver-assembled DataFrame over EXPLICIT sink splits, through the
  * engine's own readers — the decode path for internal jobs that need
  * semantics Spark's name-based parquet reader cannot give:
  *
  *   - FIELD-ID column resolution, so a table that RENAMEd a column
  *     reads its pre-rename files correctly (the name-based
  *     [[PartitionedSink.readPaths]] would serve NULL — wrong
  *     row-grain CDC rows after a rename);
  *   - the merge-on-read POSITION-DELETE anti-filter, so a diff's
  *     "before" side sees exactly the rows a table scan of that
  *     snapshot saw (rows already MOR-deleted must not re-delete).
  *
  * One RDD partition per split; each drives the same
  * [[PartitionedSinkReaderFactory]] readers the DSv2 scan uses, so the
  * two paths can never disagree on a value.
  */
private[graft] object SinkSplitsRead {
  def dataFrame(spark: SparkSession, splits: Seq[SinkFileSplit],
                fullSchema: StructType, partCols: Seq[String],
                fieldIds: Map[String, Int]): DataFrame = {
    val rdd = new SinkSplitsRDD(spark.sparkContext, splits, fullSchema,
      partCols, new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()), fieldIds)
    org.apache.spark.sql.GraftRowShim.internalCreateDataFrame(
      spark, rdd, fullSchema)
  }
}

private case class SinkSplitPartition(index: Int, split: SinkFileSplit)
    extends Partition

private class SinkSplitsRDD(
    sc: SparkContext, splits: Seq[SinkFileSplit], fullSchema: StructType,
    partCols: Seq[String],
    conf: org.apache.spark.util.SerializableConfiguration,
    fieldIds: Map[String, Int])
    extends RDD[InternalRow](sc, Nil) {

  override protected def getPartitions: Array[Partition] =
    splits.zipWithIndex.map { case (s, i) =>
      SinkSplitPartition(i, s): Partition }.toArray

  override def compute(p: Partition, ctx: TaskContext): Iterator[InternalRow] = {
    val factory = new PartitionedSinkReaderFactory(fullSchema, fullSchema,
      partCols, conf, fieldIds)
    val reader = factory.createReader(p.asInstanceOf[SinkSplitPartition].split)
    ctx.addTaskCompletionListener[Unit](_ => reader.close())
    new Iterator[InternalRow] {
      private var ready = false
      private var done = false
      override def hasNext: Boolean = {
        if (!ready && !done) { ready = reader.next(); done = !ready }
        ready
      }
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        ready = false
        reader.get()
      }
    }
  }
}
