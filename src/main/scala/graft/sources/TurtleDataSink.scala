package graft.sources

import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

import java.nio.charset.StandardCharsets

/** DataSource V2 write path for the `turtle` format:
  * `triples.write.format("turtle").save(dir)` renders one `.ttl` file per
  * input partition (`part-NNNNN.ttl`), each line one triple statement —
  * the sink counterpart of [[TurtleDataSource]]'s reader (together they
  * cover the reference's parse/serialize duality at the table level; the
  * expression-level counterpart is `serialize_turtle`).
  *
  * Input contract: the DataFrame must carry the reader's triple columns
  * (`subj, subj_kind, pred, obj_kind, obj_value, obj_datatype, obj_lang`;
  * extra columns such as `file`/`url`/`error` are ignored for rendering).
  * Error rows (null subj/pred) are REJECTED with a clear message — a sink
  * that silently drops rows corrupts provenance; filter `error IS NULL`
  * first.
  *
  * Commit protocol (same shape as Materialize's bucket commit): writers
  * stage to `dir/_temporary/part-<partition>-<taskId>.ttl` through the
  * Hadoop FS API and the driver renames staged files to
  * `part-<partition>-<jobTag>.ttl` on job commit; abort deletes the
  * staging dir. A crashed job leaves only `_temporary` junk, never a
  * half-written visible file; speculative duplicate tasks stage to
  * distinct files and only the committed one is renamed; the random
  * per-job tag keeps consecutive append jobs from colliding on (and
  * silently replacing) each other's part files.
  *
  * Scale shape: embarrassingly parallel — one writer per partition, no
  * shuffle, no driver data movement; the only driver work is one rename
  * per partition at commit.
  */
object TurtleDataSink {

  /** Columns required for rendering, resolved by NAME in the input schema. */
  val REQUIRED: Seq[String] = Seq("subj", "subj_kind", "pred", "obj_kind",
    "obj_value", "obj_datatype", "obj_lang")

  /** Canonical ECHAR escaping for quoted literals (the lossless serializer
    * preserves ORIGINAL spellings; the sink has no original to preserve, so
    * it emits the canonical escape set). */
  def quote(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 2)
    b.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => b.append("\\\\")
        case '"'  => b.append("\\\"")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c    => b.append(c)
      }
      i += 1
    }
    b.append('"')
    b.toString
  }

  /** An IRI rendered into `<...>` must not contain '>' (it would terminate
    * the IRIREF early and corrupt the rest of the statement on re-read —
    * the reader's quirk IRIREF accepts EVERYTHING else, newlines included,
    * because document parsing is not line-oriented). */
  private def checkIri(v: String, what: String): String = {
    require(v != null, s"null $what cannot be serialized as Turtle — filter " +
      "`error IS NULL` before writing to format(\"turtle\")")
    require(v.indexOf('>') < 0,
      s"$what contains '>' and cannot be rendered as an IRIREF: $v")
    v
  }

  /** Bnode labels are re-lexed as BLANK_NODE_LABEL on re-read; restrict to
    * a conservative always-relexable charset (the engine's own labels are
    * `h<hex>_<id>`). */
  private def checkBnode(v: String, what: String): String = {
    require(v != null && v.nonEmpty, s"null/empty $what bnode label")
    val label = if (v.startsWith("_:")) v.substring(2) else v
    require(label.nonEmpty && label.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '_') ,
      s"$what bnode label would not re-lex as BLANK_NODE_LABEL: $v")
    "_:" + label
  }

  /** One triple statement line. Pure — shared with tests. Malformed rows
    * are REJECTED with a clear message, never silently mangled. */
  def renderLine(subj: String, subjKind: String, pred: String, objKind: String,
      objValue: String, objDt: String, objLang: String): String = {
    require(subj != null && pred != null && objKind != null,
      "error/null rows cannot be serialized as Turtle — filter `error IS NULL` " +
        "before writing to format(\"turtle\")")
    val s = if (subjKind == "bnode") checkBnode(subj, "subj")
            else "<" + checkIri(subj, "subj") + ">"
    val o = objKind match {
      case "iri"   => "<" + checkIri(objValue, "obj_value") + ">"
      case "bnode" => checkBnode(objValue, "obj_value")
      case _ =>
        require(objValue != null, "null literal obj_value cannot be serialized")
        require(objLang == null || objLang.forall(c =>
            (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
              (c >= '0' && c <= '9') || c == '-'),
          s"obj_lang would not re-lex as LANGTAG: $objLang")
        quote(objValue) +
          (if (objLang != null) "@" + objLang
           else if (objDt != null) "^^<" + checkIri(objDt, "obj_datatype") + ">"
           else "")
    }
    s + " <" + checkIri(pred, "pred") + "> " + o + " ."
  }
}

private[sources] class TurtleWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateRequested = false
  override def truncate(): WriteBuilder = { truncateRequested = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new TurtleBatchWrite(path, info.schema(), truncateRequested)
  }
}

private class TurtleBatchWrite(path: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {

  // per-job tag in final file names (Spark's own part-file convention):
  // append jobs must never collide with a previous job's output files
  private val jobTag = java.util.UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val missing = TurtleDataSink.REQUIRED.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"turtle sink requires columns ${TurtleDataSink.REQUIRED.mkString(", ")}; " +
        s"missing: ${missing.mkString(", ")}")
    new TurtleWriterFactory(path, jobTag,
      TurtleDataSink.REQUIRED.map(schema.fieldIndex).toArray)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    if (truncate && fs.exists(root)) {
      // the reader lists .ttl RECURSIVELY (minus hidden/_ segments), so
      // truncate must delete the same visible set — a top-level-only delete
      // would leave subdirectory .ttl files to reappear on re-read
      val qualRoot = fs.makeQualified(root)
      val it = fs.listFiles(root, true)
      val doomed = Vector.newBuilder[org.apache.hadoop.fs.Path]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".ttl") &&
            !TurtleDataSource.hiddenUnder(f.getPath, qualRoot))
          doomed += f.getPath
      }
      doomed.result().foreach(p => fs.delete(p, false))
    }
    fs.mkdirs(root)
    // one FS rename per partition: independent operations, and on an
    // object store each is a round-trip — run them on a parallel stream
    // (localSurfaceMap's pattern) so commit wall-time is ~renames/cores,
    // not renames × latency. Failures propagate (job commit must fail).
    val failed = new java.util.concurrent.atomic.AtomicReference[String](null)
    java.util.Arrays.stream(messages).parallel().forEach {
      case TurtleCommitMessage(staged, partitionId) =>
        val src = new org.apache.hadoop.fs.Path(staged)
        val dst = new org.apache.hadoop.fs.Path(root,
          f"part-$partitionId%05d-$jobTag.ttl")
        if (fs.exists(dst)) fs.delete(dst, false) // retried commit leftover
        if (!fs.rename(src, dst)) failed.compareAndSet(null, s"$src -> $dst")
      case _ => ()
    }
    if (failed.get != null)
      throw new java.io.IOException(
        s"turtle sink commit rename failed: ${failed.get}")
    // only THIS job's staging subdir: concurrent jobs writing the same
    // directory each stage under _temporary/<jobTag>/ and must not see
    // their staged files wiped by another job's commit/abort
    fs.delete(new org.apache.hadoop.fs.Path(root, s"_temporary/$jobTag"), true)
    // crashed jobs never reach commit/abort, so their _temporary/<jobTag>
    // staging dirs would leak forever — sweep siblings with no activity for
    // STALE_STAGING_MS. "Activity" is the newest mtime among the dir AND
    // its direct children: running writers heartbeat a .beat file every
    // BEAT_INTERVAL_MS precisely so a LIVE job in a single >1h write wave
    // (no new file creations bumping the dir mtime — plausible at scale)
    // can never be mistaken for a crash and reaped mid-write (the dir
    // mtime alone only moves on child creation on HDFS-like stores).
    val tmpParent = new org.apache.hadoop.fs.Path(root, "_temporary")
    try {
      if (fs.exists(tmpParent)) {
        val cutoff = System.currentTimeMillis() - TurtleBatchWrite.STALE_STAGING_MS
        fs.listStatus(tmpParent)
          .filter(st => st.isDirectory &&
            TurtleBatchWrite.newestActivity(fs, st) < cutoff)
          .foreach(st => fs.delete(st.getPath, true))
        // opportunistically drop the shared parent when empty (best-effort)
        fs.delete(tmpParent, false)
      }
    } catch { case _: Exception => () }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_temporary/$jobTag")
    tmp.getFileSystem(conf).delete(tmp, true)
  }
}

private[sources] object TurtleBatchWrite {
  /** A `_temporary/<jobTag>` staging dir with no ACTIVITY (see
    * [[newestActivity]]) for this long is treated as a crashed job's leak
    * and reaped at the next commit. One hour — 12× the writer heartbeat
    * interval, far below "fills the disk". */
  val STALE_STAGING_MS: Long = 60L * 60 * 1000

  /** Writers refresh a `.beat-<partition>-<task>` file in their staging dir
    * at this interval while actively writing, so a live long wave keeps its
    * staging dir's newest-activity timestamp moving. */
  val BEAT_INTERVAL_MS: Long = 5L * 60 * 1000

  /** Newest activity timestamp of a staging dir: the max of its own mtime
    * (bumped by child creation) and its direct children's mtimes (the
    * heartbeat files; on local filesystems also the staged files as they
    * are written). Listing cost is per LEAKED dir candidate at commit —
    * normally zero entries. */
  private[sources] def newestActivity(fs: org.apache.hadoop.fs.FileSystem,
      st: org.apache.hadoop.fs.FileStatus): Long = {
    val kids =
      try fs.listStatus(st.getPath)
      catch { case _: Exception => Array.empty[org.apache.hadoop.fs.FileStatus] }
    (st.getModificationTime +: kids.map(_.getModificationTime)).max
  }
}

private case class TurtleCommitMessage(stagedPath: String, partitionId: Int)
    extends WriterCommitMessage

private class TurtleWriterFactory(path: String, jobTag: String,
    fieldIdx: Array[Int]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TurtleFileWriter(path, jobTag, fieldIdx, partitionId, taskId)
}

private class TurtleFileWriter(path: String, jobTag: String,
    fieldIdx: Array[Int], partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  // (partitionId, taskId) keeps speculative twins on distinct staged files;
  // the jobTag subdir keeps concurrent jobs' staging isolated
  private val staged = s"$path/_temporary/$jobTag/part-$partitionId-$taskId.ttl"
  private val fs = new org.apache.hadoop.fs.Path(staged)
    .getFileSystem(new org.apache.hadoop.conf.Configuration())
  // keep the output dir free of .crc sidecar noise on checksum filesystems
  fs.setWriteChecksum(false)
  private val out = fs.create(new org.apache.hadoop.fs.Path(staged), true)

  private def str(row: InternalRow, i: Int): String = {
    val idx = fieldIdx(i)
    if (row.isNullAt(idx)) null else row.getUTF8String(idx).toString
  }

  // liveness heartbeat on a shared daemon timer, armed from writer
  // CONSTRUCTION — not from write(): a live writer whose upstream iterator
  // stalls > STALE_STAGING_MS between rows (a skewed upstream stage is
  // enough) must keep beating, or a concurrent job's reaper mistakes it for
  // a crash and deletes its staging mid-write (round-6 ADVICE). The timer
  // also frees the row hot path of its per-row clock read. Advisory only:
  // a beat failure never fails the task.
  private val beatTask: java.util.concurrent.ScheduledFuture[_] =
    TurtleFileWriter.beatScheduler.scheduleWithFixedDelay(
      () => try {
        val b = fs.create(new org.apache.hadoop.fs.Path(
          s"$path/_temporary/$jobTag/.beat-$partitionId-$taskId"), true)
        b.close()
      } catch { case _: Exception => () },
      0L, TurtleBatchWrite.BEAT_INTERVAL_MS,
      java.util.concurrent.TimeUnit.MILLISECONDS)

  override def write(row: InternalRow): Unit = {
    val line = TurtleDataSink.renderLine(str(row, 0), str(row, 1), str(row, 2),
      str(row, 3), str(row, 4), str(row, 5), str(row, 6))
    out.write(line.getBytes(StandardCharsets.UTF_8))
    out.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    beatTask.cancel(false)
    out.close()
    TurtleCommitMessage(staged, partitionId)
  }

  override def abort(): Unit = {
    beatTask.cancel(false)
    try out.close() catch { case _: Exception => () }
    fs.delete(new org.apache.hadoop.fs.Path(staged), false)
    ()
  }

  override def close(): Unit = { beatTask.cancel(false); () }
}

private object TurtleFileWriter {
  /** One executor-wide daemon thread services every writer's heartbeat —
    * beats are millisecond FS creates minutes apart, so a single thread
    * never backs up, and tasks get no non-daemon thread that could pin a
    * shutting-down executor JVM. */
  val beatScheduler: java.util.concurrent.ScheduledThreadPoolExecutor = {
    val ex = new java.util.concurrent.ScheduledThreadPoolExecutor(1, (r: Runnable) => {
      val t = new Thread(r, "turtle-sink-heartbeat")
      t.setDaemon(true)
      t
    })
    ex.setRemoveOnCancelPolicy(true)
    ex
  }
}
