package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels

import org.apache.arrow.vector.ipc.WriteChannel
import org.apache.arrow.vector.ipc.message.{IpcOption, MessageSerializer}
import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.StructType

/**
 * Arrow columnar surface for the training-data pipeline: exposes any
 * DataFrame — in particular [[Multimodal.featurizeImages]] output and raw
 * `binary` media columns — as Arrow record batches, so an out-of-JVM
 * consumer (a Python/pyarrow training loader, polars, pandas) reads the
 * columns zero-copy instead of re-encoding rows.
 *
 * Two granularities:
 *  - [[toArrowBatches]] / [[fromArrowBatches]]: a distributed
 *    `RDD[Array[Byte]]` of encapsulated IPC RecordBatch messages — the same
 *    wire format Spark's own Python integration (toPandas / mapInArrow)
 *    ships to workers, so each partition's batches can be handed to any
 *    Arrow-speaking sidecar without touching the driver.
 *  - [[toIpcStream]]: a self-describing Arrow IPC stream (schema header +
 *    batches + end-of-stream), directly readable by
 *    `pyarrow.ipc.open_stream` — for driver-bounded result sets (k-limited
 *    search hits, sampled features).
 *
 * The conversion runs on `queryExecution.toRdd` (InternalRow), so no
 * Row-object materialization happens on either path.
 */
object ArrowSurface {

  private def tz(spark: SparkSession): String =
    spark.sessionState.conf.sessionLocalTimeZone

  /** Each partition's rows as encapsulated Arrow IPC RecordBatch messages of
   *  ≤ `maxRecordsPerBatch` rows. Distributed — nothing is collected. */
  def toArrowBatches(df: DataFrame, maxRecordsPerBatch: Int = 4096): RDD[Array[Byte]] = {
    val schema = df.schema
    val zone = tz(df.sparkSession)
    val maxRec = maxRecordsPerBatch.toLong
    df.queryExecution.toRdd.mapPartitions { it =>
      GraftShim.toArrowBatchIterator(it, schema, maxRec, zone, TaskContext.get())
    }
  }

  /** Inverse of [[toArrowBatches]]: batch messages (+ the Spark schema they
   *  were produced with) back to a DataFrame. */
  def fromArrowBatches(spark: SparkSession, schema: StructType,
      batches: RDD[Array[Byte]]): DataFrame = {
    val zone = tz(spark)
    val rows = batches.mapPartitions { it =>
      GraftShim.fromArrowBatchIterator(it, schema, zone, TaskContext.get())
    }
    GraftShim.internalCreateDataFrame(spark, rows, schema)
  }

  /** The Arrow schema consumers need to interpret [[toArrowBatches]] output
   *  (JSON form available via `.toJson`). */
  def arrowSchema(df: DataFrame): org.apache.arrow.vector.types.pojo.Schema =
    GraftShim.toArrowSchema(df.schema, tz(df.sparkSession))

  /** Self-describing Arrow IPC stream bytes: schema + all batches + EOS.
   *  Collects to the driver — use for bounded results only (the unbounded
   *  path is [[toArrowBatches]], which stays distributed). */
  def toIpcStream(df: DataFrame, maxRecordsPerBatch: Int = 4096): Array[Byte] = {
    val batches = toArrowBatches(df, maxRecordsPerBatch).collect()
    val out = new ByteArrayOutputStream()
    val ch = new WriteChannel(Channels.newChannel(out))
    MessageSerializer.serialize(ch, arrowSchema(df))
    // batch messages are already encapsulated IPC messages — append verbatim
    batches.foreach(out.write)
    org.apache.arrow.vector.ipc.ArrowStreamWriter.writeEndOfStream(ch, IpcOption.DEFAULT)
    out.toByteArray
  }
}
