package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch SINK (and matching read-back scan) for JSON Lines —
  * the engine's load surface (reference §2.1 L1/E4, the per-row INSERT /
  * formatted-line delivery) as a first-class Spark writer with a REAL
  * two-phase commit protocol, symmetric with the `graft-http-json` read
  * path (same supported types, same missing-key→null contract):
  *
  * {{{
  * df.write.format("graft-jsonl").mode("overwrite").save(dir)   // truncate
  * df.write.format("graft-jsonl").mode("append").save(dir)      // accumulate
  * spark.read.format("graft-jsonl").schema(s).load(dir)         // read back
  * }}}
  *
  * Commit protocol (the part a `foreachPartition` sink cannot give you):
  *  - each task attempt writes `_temporary/<queryId>/part-<pid>-<taskId>`;
  *    `taskId` is unique PER ATTEMPT, so a speculative duplicate or a
  *    retried task never collides with the attempt that wins.
  *  - Spark's output commit coordinator (`useCommitCoordinator`) picks one
  *    winning attempt per partition; only ITS file path rides the
  *    [[WriterCommitMessage]] back to the driver.
  *  - `BatchWrite.commit` publishes exactly the files named in commit
  *    messages — a zombie attempt's file is left in `_temporary` and
  *    removed with it, never published. Truncate swaps via a CHECKED
  *    backup-rename dance (live parts → `_backup-<queryId>`, new parts in,
  *    drop backup — same recoverable-at-every-step posture as
  *    `graft.operators.Maintenance`); `_SUCCESS` is (re)written last.
  *  - `BatchWrite.abort` / `DataWriter.abort` delete only temp state:
  *    a failed write leaves the previous table contents fully intact.
  *
  * Rendering: schema-ordered JSON objects, one per line — nulls written
  * explicitly, strings minimally escaped, doubles via `Double.toString`
  * (lossless round-trip through the Jackson parse on the read side).
  * Non-finite doubles are REJECTED (JSON has no representation; silently
  * writing null would fabricate data — the task fails and the commit
  * protocol discards its output). Timestamps are out of scope by the same
  * design rule as the read path: serialize raw strings and cast in the
  * plan. Single-writer per directory, like [[graft.operators.DedupAppend]].
  */
class JsonLinesSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsonl"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-jsonl requires an explicit schema (.schema(...)) to read; " +
        "inference is disallowed by design (deterministic ingest)")

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-jsonl: a path is required (.save(dir) / .load(dir) or .option(\"path\", dir))"))
    new JsonLinesTable(schema, path)
  }
}

class JsonLinesTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-jsonl($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)

  // captured on the driver at plan time: the SESSION's Hadoop conf (all
  // spark.hadoop.* settings — s3a credentials, defaultFS) must reach every
  // FileSystem handle this source opens; a bare `new Configuration()`
  // would silently drop them and fail on any non-default filesystem
  private def sessionConf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonLinesScanBuilder(tableSchema, path, sessionConf)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new JsonLinesWriteBuilder(info.schema(), path, info.queryId(), sessionConf)
}

/** Minimal serializable Hadoop `Configuration` carrier, so the session's
  * Hadoop settings travel from the driver into executor-side
  * writers/readers (the standard write()/readFields round-trip). */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject(); value = new Configuration(false); value.readFields(in)
  }
}

// ---- write path --------------------------------------------------------

class JsonLinesWriteBuilder(schema: StructType, path: String, queryId: String,
                            conf: SerializableHadoopConf)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new JsonLinesBatchWrite(schema, path, queryId, truncateFirst, conf)
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      require(!truncateFirst,
        "graft-jsonl streaming supports append output mode only " +
          "(per-epoch truncate would discard prior epochs' published data)")
      new JsonLinesStreamingWrite(schema, path, conf)
    }
  }
}

case class JsonLinesCommitMessage(partitionId: Int, tempFile: Option[String])
    extends WriterCommitMessage

class JsonLinesBatchWrite(schema: StructType, path: String, queryId: String,
                          truncate: Boolean, conf: SerializableHadoopConf)
    extends BatchWrite {

  // one winning attempt per partition — the coordinator is what makes
  // "publish only committed files" safe under speculation/retry
  override def useCommitCoordinator(): Boolean = true

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new JsonLinesWriterFactory(schema, path, queryId, conf)

  private def fs(p: Path): FileSystem = p.getFileSystem(conf.value)

  private def checkedRename(f: FileSystem, from: Path, to: Path): Unit =
    if (!f.rename(from, to))
      throw new java.io.IOException(s"graft-jsonl commit: rename $from -> $to failed")

  /** Undo half of a truncate swap: drop any published parts carrying
    * `qid`, move the backup's parts home, remove the backup dir. Used both
    * for entry-time recovery of a backup stranded by a CRASHED previous
    * truncate (single-writer: recovery happens on the next write) and for
    * same-commit rollback when a publish rename throws. Idempotent — a
    * crash mid-restore re-runs it. */
  private def restoreBackup(f: FileSystem, dir: Path, backup: Path,
                            qid: String): Unit = {
    f.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith(s"part-$qid-"))
      .foreach(p => if (!f.delete(p, false))
        throw new java.io.IOException(s"graft-jsonl recovery: cannot drop $p"))
    f.listStatus(backup).map(_.getPath)
      .foreach(p => checkedRename(f, p, new Path(dir, p.getName)))
    if (!f.delete(backup, true))
      throw new java.io.IOException(s"graft-jsonl recovery: cannot remove $backup")
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val f = fs(dir)
    val committed = messages.collect {
      case JsonLinesCommitMessage(pid, Some(tmp)) => (pid, new Path(tmp))
    }
    if (!f.exists(dir) && !f.mkdirs(dir))
      throw new java.io.IOException(s"graft-jsonl commit: cannot create $dir")
    // entry recovery: a previous truncate that crashed mid-publish left
    // its backup dir behind — its partially-published parts (named with
    // ITS query id) are dropped and the old table restored before this
    // write proceeds, so the failed write's subset is never treated as
    // the table
    f.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.startsWith("_backup-"))
      .foreach(b => restoreBackup(f, dir, b, b.getName.stripPrefix("_backup-")))
    val backup = new Path(dir, s"_backup-$queryId")
    if (truncate) {
      // move live parts aside rather than deleting them: recoverable at
      // every step until the new parts are in place
      val old = f.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("part-"))
      if (old.nonEmpty) {
        if (!f.mkdirs(backup))
          throw new java.io.IOException(s"graft-jsonl commit: cannot create $backup")
        old.foreach(p => checkedRename(f, p, new Path(backup, p.getName)))
      }
    }
    // publish exactly the files the winning attempts committed; if a
    // publish fails midway, roll the swap back (drop this write's parts,
    // restore the backup) so the previous contents are intact as the
    // scaladoc promises — abort() only ever sees temp state
    try {
      committed.foreach { case (pid, tmp) =>
        checkedRename(f, tmp, new Path(dir, s"part-$queryId-$pid.jsonl"))
      }
    } catch {
      case e: Throwable =>
        try {
          if (truncate && f.exists(backup)) restoreBackup(f, dir, backup, queryId)
          else f.listStatus(dir).map(_.getPath) // failed append: unpublish
            .filter(_.getName.startsWith(s"part-$queryId-"))
            .foreach(p => f.delete(p, false))
        } catch { case e2: Throwable => e.addSuppressed(e2) }
        throw e
    }
    if (truncate && f.exists(backup) && !f.delete(backup, true))
      throw new java.io.IOException(
        s"graft-jsonl commit: could not remove $backup (table at $path is live and complete)")
    // zombie-attempt files go with the temp dir; _SUCCESS marks completion
    f.delete(new Path(dir, s"_temporary-$queryId"), true)
    val success = new Path(dir, "_SUCCESS")
    val out = f.create(success, true)
    out.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val f = fs(dir)
    // temp state only — the previous table contents stay intact
    f.delete(new Path(dir, s"_temporary-$queryId"), true): Unit
  }
}

class JsonLinesWriterFactory(schema: StructType, path: String, queryId: String,
                             conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonLinesDataWriter(schema, path, queryId, partitionId, taskId, conf)
}

// ---- streaming write path ----------------------------------------------

/** Streaming (micro-batch) side of the sink: same per-attempt temp files
  * and publish-on-commit, keyed by EPOCH instead of query — plus an epoch
  * commit log (`_epochs/<id>` markers) that makes re-delivered batches
  * no-ops. A `foreachBatch` + blind append is at-least-once (the
  * asofEnrichStream lesson); the epoch log is what upgrades a replayed
  * batch after a crash-before-checkpoint into an exactly-once publish,
  * surviving restarts (epoch ids persist in the stream's checkpoint;
  * query/run ids do not). Append output mode only. */
class JsonLinesStreamingWrite(schema: StructType, path: String,
                              conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new JsonLinesStreamingWriterFactory(schema, path, conf)

  private def fs(p: Path): FileSystem = p.getFileSystem(conf.value)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val f = fs(dir)
    val marker = new Path(new Path(path, "_epochs"), epochId.toString)
    val temp = new Path(path, s"_temporary-epoch-$epochId")
    if (f.exists(marker)) {
      // re-delivered epoch (crash between publish and checkpoint commit):
      // already published — drop the replay's output, change nothing
      f.delete(temp, true)
      return
    }
    val committed = messages.collect {
      case JsonLinesCommitMessage(pid, Some(tmp)) => (pid, new Path(tmp))
    }
    if (!f.exists(dir) && !f.mkdirs(dir))
      throw new java.io.IOException(s"graft-jsonl streaming commit: cannot create $dir")
    committed.foreach { case (pid, tmp) =>
      val to = new Path(dir, s"part-epoch-$epochId-$pid.jsonl")
      // a crash between publish and marker leaves this epoch's files
      // under their deterministic names with no marker; the replay
      // replaces them (rename onto an existing path returns false, so
      // the stale file is removed first) — idempotent, never duplicated
      if (f.exists(to) && !f.delete(to, false))
        throw new java.io.IOException(s"graft-jsonl streaming commit: cannot replace $to")
      if (!f.rename(tmp, to))
        throw new java.io.IOException(s"graft-jsonl streaming commit: rename $tmp -> $to failed")
    }
    // sweep this epoch's STALE partition ids: a crashed attempt may have
    // published under a different partitioning (shuffle-partition change,
    // AQE coalescing), and per-pid replacement alone would leave its extra
    // files permanently published — duplicate rows on every read
    val fresh = committed.map { case (pid, _) => s"part-epoch-$epochId-$pid.jsonl" }.toSet
    f.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.startsWith(s"part-epoch-$epochId-") && !fresh.contains(p.getName))
      .foreach(p => if (!f.delete(p, false))
        throw new java.io.IOException(
          s"graft-jsonl streaming commit: cannot remove stale $p"))
    f.delete(temp, true)
    // marker last: until it exists a replay re-runs the (idempotent)
    // publish above; once it exists a replay is a no-op
    val out = f.create(marker, true)
    out.close()
    val success = f.create(new Path(dir, "_SUCCESS"), true)
    success.close()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    fs(dir).delete(new Path(path, s"_temporary-epoch-$epochId"), true): Unit
  }
}

class JsonLinesStreamingWriterFactory(schema: StructType, path: String,
                                      conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new JsonLinesDataWriter(schema, path, s"epoch-$epochId", partitionId, taskId, conf)
}

class JsonLinesDataWriter(schema: StructType, path: String, queryId: String,
                          partitionId: Int, taskId: Long,
                          conf: SerializableHadoopConf)
    extends DataWriter[InternalRow] {

  private val tempPath =
    new Path(new Path(path, s"_temporary-$queryId"), s"part-$partitionId-$taskId")
  private var stream: java.io.BufferedWriter = _

  private def ensureOpen(): java.io.BufferedWriter = {
    if (stream == null) {
      val f = tempPath.getFileSystem(conf.value)
      stream = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        f.create(tempPath, true), java.nio.charset.StandardCharsets.UTF_8))
    }
    stream
  }

  override def write(row: InternalRow): Unit = {
    val out = ensureOpen()
    out.write(JsonLines.render(row, schema))
    out.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    val wrote = stream != null
    if (wrote) { stream.close(); stream = null }
    // empty partition → no file: commit carries None, the driver publishes
    // nothing for it (no zero-byte part litter)
    JsonLinesCommitMessage(partitionId, if (wrote) Some(tempPath.toString) else None)
  }

  override def abort(): Unit = {
    if (stream != null) { stream.close(); stream = null }
    val f = tempPath.getFileSystem(conf.value)
    f.delete(tempPath, false): Unit
  }

  override def close(): Unit =
    if (stream != null) { stream.close(); stream = null }
}

// ---- read-back scan ----------------------------------------------------

class JsonLinesScanBuilder(full: StructType, path: String,
                           conf: SerializableHadoopConf)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = {
    val dir = new Path(path)
    val f = dir.getFileSystem(conf.value)
    val files =
      if (!f.exists(dir)) Array.empty[String]
      else f.listStatus(dir).map(_.getPath)
        .filter(p => p.getName.startsWith("part-"))
        .sortBy(_.getName).map(_.toString)
    new JsonLinesScan(required, files, conf)
  }
}

case class JsonLinesInputPartition(file: String) extends InputPartition

class JsonLinesScan(required: StructType, files: Array[String],
                    conf: SerializableHadoopConf)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => JsonLinesInputPartition(f): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new JsonLinesReaderFactory(required, conf)
  override def description(): String =
    s"graft-jsonl [${files.length} files, schema=${required.simpleString}]"
}

class JsonLinesReaderFactory(required: StructType, conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonLinesPartitionReader(
      partition.asInstanceOf[JsonLinesInputPartition].file, required, conf)
}

class JsonLinesPartitionReader(file: String, required: StructType,
                               conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {
  private lazy val reader = {
    val p = new Path(file)
    val f = p.getFileSystem(conf.value)
    new java.io.BufferedReader(new java.io.InputStreamReader(
      f.open(p), java.nio.charset.StandardCharsets.UTF_8))
  }
  private lazy val rows: Iterator[InternalRow] = HttpJsonRows.parseLines(
    Iterator.continually(reader.readLine()).takeWhile(_ != null), required)
  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

/** InternalRow → JSON-line rendering (static, executor-side). The exact
  * mirror of [[HttpJsonRows]]' supported types, so `graft-jsonl` output is
  * always readable by the `graft-jsonl` / `graft-http-json` scans. */
object JsonLines {

  def render(row: InternalRow, schema: StructType): String = {
    val sb = new java.lang.StringBuilder(64)
    renderStruct(row, schema, sb)
    sb.toString
  }

  private def renderStruct(row: InternalRow, schema: StructType,
                           sb: java.lang.StringBuilder): Unit = {
    sb.append('{')
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append(", ")
      val f = schema(i)
      renderString(f.name, sb)
      sb.append(": ")
      if (row.isNullAt(i)) sb.append("null")
      else renderValue(row.get(i, f.dataType), f.dataType, sb)
      i += 1
    }
    sb.append('}')
  }

  private def renderValue(v: Any, dt: DataType, sb: java.lang.StringBuilder): Unit =
    dt match {
      case StringType  => renderString(v.asInstanceOf[UTF8String].toString, sb)
      case IntegerType => sb.append(v.asInstanceOf[Int]): Unit
      case LongType    => sb.append(v.asInstanceOf[Long]): Unit
      case BooleanType => sb.append(v.asInstanceOf[Boolean]): Unit
      case DoubleType =>
        val d = v.asInstanceOf[Double]
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
          throw new IllegalArgumentException(
            "graft-jsonl: non-finite double has no JSON representation " +
              "(filter or recode non-finite values before the sink)")
        sb.append(d): Unit
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        sb.append('[')
        var i = 0
        while (i < arr.numElements()) {
          if (i > 0) sb.append(", ")
          if (arr.isNullAt(i)) sb.append("null")
          else renderValue(arr.get(i, et), et, sb)
          i += 1
        }
        sb.append(']')
      case st: StructType =>
        renderStruct(v.asInstanceOf[InternalRow], st, sb)
      case other => throw new IllegalArgumentException(
        s"graft-jsonl: unsupported type $other (serialize raw strings and cast in the plan)")
    }

  private def renderString(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}
