package graft.sources.v2

import java.io.{File, FileWriter}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A complete DataSource V2 WRITE path — the exactly-once two-phase
  * commit protocol every production sink implements:
  *
  *  1. each task's [[DataWriter]] streams rows to a TEMP file
  *     (`_tmp_<partition>_<task>`), invisible to readers;
  *  2. task `commit()` atomically renames temp → `part-<partition>` and
  *     returns a [[WriterCommitMessage]] carrying (file, rowCount);
  *  3. the driver's `BatchWrite.commit(messages)` — which runs ONLY if
  *     every task succeeded — writes a `MANIFEST` listing the committed
  *     files and counts. Readers trust the manifest, so a half-failed
  *     job (abort() deletes temps) is never visible.
  *
  * Rows must be `(key BIGINT, n BIGINT)`; files are single-column CSV
  * lines `key,n`. Speculative/retried tasks are safe: the rename is
  * per-(partition, task) and the manifest only lists renames the driver
  * heard a commit message for.
  */
class CsvSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CsvSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CsvSinkTable(properties.get("path"))
}

object CsvSink {
  val schema: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))
}

class CsvSinkTable(path: String) extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "CsvSink requires option(\"path\", ...)")
  override def name(): String = s"graft_csv_sink($path)"
  override def schema(): StructType = CsvSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new CsvSinkWrite(path, doTruncate)
    }
}

case class CsvTaskCommit(file: String, rows: Long) extends WriterCommitMessage

class CsvSinkWrite(path: String, truncate: Boolean) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // driver-side, before any task launches: truncate = drop the previous
    // committed generation (stale part-N from a wider prior run would
    // otherwise survive the rename-based overwrite and corrupt readers)
    if (truncate) {
      val dir = new File(path)
      Option(dir.listFiles((_, n) => n.startsWith("part-") || n == "MANIFEST" ||
          n.startsWith("_tmp_")))
        .foreach(_.foreach(_.delete()))
    }
    new CsvWriterFactory(path)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val manifest = new File(path, "MANIFEST")
    val w = new FileWriter(manifest)
    try messages.collect { case CsvTaskCommit(f, n) => s"$f,$n\n" }
      .sorted.foreach(w.write)
    finally w.close()
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    Option(dir.listFiles((_, n) => n.startsWith("_tmp_")))
      .foreach(_.foreach(_.delete()))
  }
}

class CsvWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val dir = { val d = new File(path); d.mkdirs(); d }
      private val tmp = new File(dir, s"_tmp_${partitionId}_$taskId")
      private val out = new FileWriter(tmp)
      private var rows = 0L
      override def write(record: InternalRow): Unit = {
        out.write(s"${record.getLong(0)},${record.getLong(1)}\n")
        rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        val committed = new File(dir, s"part-$partitionId")
        if (committed.exists()) committed.delete()
        require(tmp.renameTo(committed), s"rename failed for $tmp")
        CsvTaskCommit(committed.getName, rows)
      }
      override def abort(): Unit = { out.close(); tmp.delete() }
      override def close(): Unit = ()
    }
}
