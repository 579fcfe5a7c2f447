package org.apache.spark.sql.graftbridge

import java.util.UUID

import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Write-side bridge for the graft.lake native v2 BatchWrite (same
  * private[sql] access rationale as [[LakeReadBridge]]): exposes
  * Spark's OWN parquet [[OutputWriter]] — the exact write support,
  * compression codec, and schema conversion a DataFrame write would
  * configure via `ParquetFileFormat.prepareWrite` — so executor-side
  * DataWriters produce files indistinguishable from stage()'s, readable
  * by the vectorized scan, with zero hand-rolled parquet plumbing.
  * All private[sql]/private[spark] types stay inside this object; the
  * lake side sees only the serializable opaque factory below.
  */
object LakeWriteBridge {

  /** One per-task parquet writer (opaque handle over [[OutputWriter]]). */
  final class ParquetWriter private[LakeWriteBridge] (w: OutputWriter) {
    def write(row: InternalRow): Unit = w.write(row)
    def close(): Unit = w.close()
  }

  /** Serializable, executor-shippable writer factory: carries the
    * prepared [[OutputWriterFactory]] plus the job configuration
    * `prepareWrite` populated (write support class, schema, codec).
    */
  final class Factory private[LakeWriteBridge] (
      factory: OutputWriterFactory, conf: SerializableConfiguration,
      schema: StructType) extends Serializable {
    def newWriter(path: String): ParquetWriter = {
      val attempt = new TaskAttemptID(
        new TaskID(new JobID(UUID.randomUUID().toString.take(8), 0),
          TaskType.MAP, 0), 0)
      new ParquetWriter(factory.newInstance(path, schema,
        new TaskAttemptContextImpl(conf.value, attempt)))
    }
  }

  /** Driver-side: prepare a parquet write of `schema` with the
    * session's hadoop/SQL configuration.
    */
  def prepare(spark: SparkSession, schema: StructType): Factory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, schema)
    new Factory(factory, new SerializableConfiguration(job.getConfiguration),
      schema)
  }
}
