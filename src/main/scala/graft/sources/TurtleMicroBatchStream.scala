package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Micro-batch streaming read for the `turtle` format:
  * `spark.readStream.format("turtle").load(dir)` emits the triple rows of
  * each newly arrived `.ttl` document exactly once — continuous KG
  * construction over a landing directory (pair with watermarked aggs or
  * `Materialize` in `foreachBatch` downstream).
  *
  * Offset design (round 5 — compacting registry): an offset is
  * `{registry version, tail file set}`; the seen-file set it represents is
  * `registry(version) ∪ tail`. Registry versions are immutable JSON files
  * under `<checkpointLocation>/graft-registry/<version>.compact`, written
  * atomically (tmp + rename) by `commit()` whenever the committed tail
  * exceeds `compactTail` entries — the same periodic seen-files-log
  * compaction Spark's own `FileStreamSource` performs. The serialized
  * offset is therefore bounded by the arrivals since the last compaction,
  * not by the lifetime file count (the round-4 design carried the ENTIRE
  * seen set in every offset: tens of MB per micro-batch at ~10^6 tracked
  * files). Exactly-once survives restart because compact files are
  * immutable and the offset log's entries resolve against the version they
  * name; retention keeps the last [[TurtleMicroBatchStream.RETAIN_VERSIONS]]
  * versions (Spark replays only the trailing uncommitted batch, so older
  * versions are unreachable from the offset log by the time they are
  * pruned).
  *
  * A compaction changes the offset representation (same seen set, new
  * version + short tail), so the trigger after a compaction plans one
  * empty micro-batch to land the new representation in the offset log —
  * benign, and it keeps `latestOffset` cheap forever after.
  *
  * Executor-side behavior (parse unit, bnode labels, `maxBytes` size gate,
  * error-as-data rows) is IDENTICAL to the batch reader — both paths share
  * [[TurtleReaderFactory]], so every batch-path test covers the streaming
  * rows too.
  */
private class TurtleMicroBatchStream(path: String, maxBytes: Long,
    minAgeMs: Long, checkpointLocation: String, compactTail: Int)
    extends MicroBatchStream {
  import TurtleMicroBatchStream.RETAIN_VERSIONS

  private val registryPath = new Path(checkpointLocation, "graft-registry")
  private lazy val fs = registryPath.getFileSystem(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  // newest registry version + its file set (regVersion = -1 → no registry);
  // regCache holds every version read this stream's lifetime (bounded by
  // retention). All driver-side, rebuilt from the registry dir on restart.
  private val regCache = mutable.Map.empty[Long, Set[String]]
  private var regVersion: Long = -1L
  private var regFiles: Set[String] = Set.empty
  locally {
    if (fs.exists(registryPath)) {
      val vs = fs.listStatus(registryPath).toSeq.map(_.getPath.getName)
        .filter(_.endsWith(".compact"))
        .flatMap(n => n.stripSuffix(".compact").toLongOption)
      if (vs.nonEmpty) {
        regVersion = vs.max
        regFiles = readCompact(regVersion)
      }
    }
  }

  private def readCompact(v: Long): Set[String] =
    regCache.getOrElseUpdate(v, {
      val in = fs.open(new Path(registryPath, s"$v.compact"))
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](64 * 1024)
          var n = in.read(tmp)
          while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          buf.toByteArray
        } finally in.close()
      TurtleOffset.mapper.readValue(bytes, classOf[Array[String]]).toSet
    })

  private def seenSet(o: TurtleOffset): Set[String] =
    (if (o.version < 0) Set.empty[String] else readCompact(o.version)) ++ o.files

  override def initialOffset(): Offset = TurtleOffset(-1L, Nil)

  // minAgeMs: grace window for non-atomic producers (a file listed
  // mid-copy would be parsed truncated and permanently marked seen).
  // Producers that rename atomically into the dir can leave it 0.
  override def latestOffset(): Offset = {
    val listed = TurtleDataSource.listTtlFiles(path, minAgeMs)
    val tail = if (regVersion < 0) listed else listed.filterNot(regFiles)
    TurtleOffset(regVersion, tail)
  }

  override def deserializeOffset(json: String): Offset =
    TurtleOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = seenSet(start.asInstanceOf[TurtleOffset])
    val e = end.asInstanceOf[TurtleOffset]
    seenSet(e).iterator
      .filterNot(seen)
      .toArray.sorted // deterministic partition order
      .map(f => TurtleFilePartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TurtleReaderFactory(maxBytes)

  /** Called after a batch commits durably: fold an oversized tail into a
    * new immutable registry version, then prune versions out of retention. */
  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[TurtleOffset]
    if (e.files.length >= compactTail) {
      val newV = math.max(regVersion, e.version) + 1
      val full = seenSet(e)
      fs.mkdirs(registryPath)
      val tmp = new Path(registryPath, s".$newV.compact.tmp")
      val out = fs.create(tmp, true)
      try out.write(TurtleOffset.mapper.writeValueAsBytes(full.toArray.sorted))
      finally out.close()
      fs.rename(tmp, new Path(registryPath, s"$newV.compact"))
      regCache(newV) = full
      regVersion = newV
      regFiles = full
      fs.listStatus(registryPath).foreach { st =>
        val n = st.getPath.getName
        if (n.endsWith(".compact")) {
          n.stripSuffix(".compact").toLongOption.foreach { v =>
            if (v <= newV - RETAIN_VERSIONS) {
              fs.delete(st.getPath, false)
              regCache.remove(v)
            }
          }
        }
      }
    }
  }

  override def stop(): Unit = ()
}

private object TurtleMicroBatchStream {
  /** Compact when the committed offset's tail reaches this many files.
    * 4096 names ≈ a few hundred KB of offset JSON — comfortably inside
    * what the offset log handles per batch, and two orders of magnitude
    * under the round-4 unbounded design's 10^6-file pathology. */
  val DEFAULT_COMPACT_TAIL = 4096

  /** Registry versions kept on disk. Spark replays at most the trailing
    * uncommitted batch on restart, whose offsets reference the newest one
    * or two versions; 8 is a generous safety margin, and each retained
    * version costs one seen-set-sized JSON file. */
  val RETAIN_VERSIONS = 8
}

private case class TurtleOffset(version: Long, files: Seq[String]) extends Offset {
  override def json: String = {
    val node = TurtleOffset.mapper.createObjectNode()
    node.put("v", version)
    val arr = node.putArray("t")
    files.foreach(arr.add)
    TurtleOffset.mapper.writeValueAsString(node)
  }
}

private object TurtleOffset {
  val mapper = new ObjectMapper()

  /** Registry-less offset (tests, initial state). */
  def apply(files: Seq[String]): TurtleOffset = TurtleOffset(-1L, files)

  /** Parses both the current `{"v":N,"t":[...]}` form and the legacy
    * round-4 plain-array form (a checkpoint written before the registry
    * existed restarts cleanly as version -1 = full set in the tail). */
  def fromJson(s: String): TurtleOffset = {
    val t = s.trim
    if (t.startsWith("["))
      TurtleOffset(-1L, mapper.readValue(t, classOf[Array[String]]).toSeq)
    else {
      val node = mapper.readTree(t)
      TurtleOffset(node.get("v").asLong(-1L),
        node.get("t").elements().asScala.map(_.asText()).toSeq)
    }
  }
}
