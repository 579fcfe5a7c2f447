package graft.sources.v2

import java.io.{File, FileWriter}
import java.nio.file.{Files, StandardCopyOption}
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
  *     (`_tmp_<jobId>_<partition>_<task>`), invisible to readers;
  *  2. task `commit()` atomically renames temp → `part-<jobId>-<partition>`
  *     — STAGED under the job-unique generation id, still invisible,
  *     because readers trust only the files the MANIFEST lists;
  *  3. the driver's `BatchWrite.commit(messages)` — which runs ONLY if
  *     every task succeeded — stages the new `MANIFEST` under a temp
  *     name and swaps it in with an ATOMIC_MOVE, then (and only then)
  *     garbage-collects the previous generation's files. `abort()`
  *     deletes only THIS job's files, so a failed overwrite leaves the
  *     previous committed generation — data files AND manifest — intact.
  *
  * The crash matrix: before manifest swap → old generation fully
  * readable (new files are orphans, GC'd by the next successful
  * commit); after swap, before GC → new generation readable, old files
  * are harmless orphans; mid-swap is impossible (rename is atomic).
  * There is no window in which a reader sees a manifest whose files are
  * missing or truncated.
  *
  * Rows must be `(key BIGINT, n BIGINT)`; files are single-column CSV
  * lines `key,n`. Speculative/retried tasks are safe: the rename is
  * per-(job, partition) and the manifest only lists renames the driver
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

  /** The committed generation = exactly the files the MANIFEST lists
    * (relative names, one `file,rows` line each). Readers resolve
    * through this, never a directory glob — staged files from an
    * in-flight or failed job share the directory but are not visible.
    */
  def committedFiles(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(new File(path, "MANIFEST").toPath).asScala.toSeq
      .filter(_.nonEmpty).map(l => s"$path/${l.split(",")(0)}")
  }
}

class CsvSinkTable(path: String) extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "CsvSink requires option(\"path\", ...)")
  override def name(): String = s"graft_csv_sink($path)"
  override def schema(): StructType = CsvSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // truncate (= overwrite) needs no eager delete: every successful
      // commit swaps in a manifest listing only the new generation and
      // then GCs unlisted files, which IS the truncate semantics —
      // without the old protocol's flaw of destroying the previous
      // generation before the new one exists.
      override def truncate(): WriteBuilder = this
      override def build(): Write = new CsvSinkWrite(path)
    }
}

case class CsvTaskCommit(file: String, rows: Long) extends WriterCommitMessage

class CsvSinkWrite(path: String) extends Write with BatchWrite {
  // Job-unique generation id: every file this job writes carries it, so
  // abort() can clean up without touching the previous committed
  // generation, and two concurrent jobs never collide on staged names.
  private val jobId = java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new File(path).mkdirs()
    new CsvWriterFactory(path, jobId)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    val committed = messages.collect { case CsvTaskCommit(f, _) => f }.toSet
    // 1. stage the manifest under a job-unique temp name, fully written
    //    and closed before it can be seen...
    val staged = new File(dir, s"_MANIFEST.tmp.$jobId")
    val w = new FileWriter(staged)
    try messages.collect { case CsvTaskCommit(f, n) => s"$f,$n\n" }
      .sorted.foreach(w.write)
    finally w.close()
    // 2. ...then swap it in atomically: readers see the complete old
    //    manifest or the complete new one, never a partial file. The old
    //    generation's data files still exist at this instant, so both
    //    manifests are fully readable.
    Files.move(staged.toPath, new File(dir, "MANIFEST").toPath,
      StandardCopyOption.ATOMIC_MOVE)
    // 3. only AFTER the new manifest is durable: GC the previous
    //    generation (part-* not listed) and any leftover temps. A crash
    //    before this point leaves orphan files, never corruption.
    Option(dir.listFiles((_, n) =>
        (n.startsWith("part-") && !committed.contains(n)) ||
          n.startsWith("_tmp_") || n.startsWith("_MANIFEST.tmp.")))
      .foreach(_.foreach(_.delete()))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // only THIS job's files (temps + staged parts + staged manifest);
    // the previous committed generation and its MANIFEST stay intact.
    val dir = new File(path)
    Option(dir.listFiles((_, n) => n.contains(jobId)))
      .foreach(_.foreach(_.delete()))
  }
}

class CsvWriterFactory(path: String, jobId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val dir = { val d = new File(path); d.mkdirs(); d }
      private val tmp = new File(dir, s"_tmp_${jobId}_${partitionId}_$taskId")
      private val out = new FileWriter(tmp)
      private var rows = 0L
      override def write(record: InternalRow): Unit = {
        out.write(s"${record.getLong(0)},${record.getLong(1)}\n")
        rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        // staged per-(job, partition): a retried attempt of the same
        // partition replaces its predecessor's staged file, never a
        // different job's or the committed generation's.
        val stagedPart = new File(dir, s"part-$jobId-$partitionId")
        if (stagedPart.exists()) stagedPart.delete()
        require(tmp.renameTo(stagedPart), s"rename failed for $tmp")
        CsvTaskCommit(stagedPart.getName, rows)
      }
      override def abort(): Unit = { out.close(); tmp.delete() }
      override def close(): Unit = ()
    }
}
