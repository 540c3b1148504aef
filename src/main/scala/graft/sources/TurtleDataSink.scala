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

  /** One triple statement line. Pure — shared with tests. */
  def renderLine(subj: String, subjKind: String, pred: String, objKind: String,
      objValue: String, objDt: String, objLang: String): String = {
    require(subj != null && pred != null && objKind != null,
      "error/null rows cannot be serialized as Turtle — filter `error IS NULL` " +
        "before writing to format(\"turtle\")")
    def bnode(v: String) = if (v.startsWith("_:")) v else "_:" + v
    val s = if (subjKind == "bnode") bnode(subj) else "<" + subj + ">"
    val o = objKind match {
      case "iri"   => "<" + objValue + ">"
      case "bnode" => bnode(objValue)
      case _ =>
        quote(objValue) +
          (if (objLang != null) "@" + objLang
           else if (objDt != null) "^^<" + objDt + ">"
           else "")
    }
    s + " <" + pred + "> " + o + " ."
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
    new TurtleWriterFactory(path,
      TurtleDataSink.REQUIRED.map(schema.fieldIndex).toArray)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    if (truncate && fs.exists(root)) {
      val existing = fs.listStatus(root)
      existing.filter(_.getPath.getName.endsWith(".ttl"))
        .foreach(f => fs.delete(f.getPath, false))
    }
    fs.mkdirs(root)
    messages.foreach { case TurtleCommitMessage(staged, partitionId) =>
      val src = new org.apache.hadoop.fs.Path(staged)
      val dst = new org.apache.hadoop.fs.Path(root,
        f"part-$partitionId%05d-$jobTag.ttl")
      if (fs.exists(dst)) fs.delete(dst, false) // retried commit leftover
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"turtle sink commit rename failed: $src -> $dst")
    }
    fs.delete(new org.apache.hadoop.fs.Path(root, "_temporary"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_temporary")
    tmp.getFileSystem(conf).delete(tmp, true)
  }
}

private case class TurtleCommitMessage(stagedPath: String, partitionId: Int)
    extends WriterCommitMessage

private class TurtleWriterFactory(path: String, fieldIdx: Array[Int])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TurtleFileWriter(path, fieldIdx, partitionId, taskId)
}

private class TurtleFileWriter(path: String, fieldIdx: Array[Int],
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  // (partitionId, taskId) keeps speculative twins on distinct staged files
  private val staged = s"$path/_temporary/part-$partitionId-$taskId.ttl"
  private val fs = new org.apache.hadoop.fs.Path(staged)
    .getFileSystem(new org.apache.hadoop.conf.Configuration())
  // keep the output dir free of .crc sidecar noise on checksum filesystems
  fs.setWriteChecksum(false)
  private val out = fs.create(new org.apache.hadoop.fs.Path(staged), true)

  private def str(row: InternalRow, i: Int): String = {
    val idx = fieldIdx(i)
    if (row.isNullAt(idx)) null else row.getUTF8String(idx).toString
  }

  override def write(row: InternalRow): Unit = {
    val line = TurtleDataSink.renderLine(str(row, 0), str(row, 1), str(row, 2),
      str(row, 3), str(row, 4), str(row, 5), str(row, 6))
    out.write(line.getBytes(StandardCharsets.UTF_8))
    out.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    TurtleCommitMessage(staged, partitionId)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    fs.delete(new org.apache.hadoop.fs.Path(staged), false)
    ()
  }

  override def close(): Unit = ()
}
