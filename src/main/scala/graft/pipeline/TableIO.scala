package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Iceberg-emulating table layout (SURVEY.md §1.3): no Iceberg runtime jar
  * ships in this offline sandbox, so tables are bucket-partitioned Parquet
  * plus an explicit JSON manifest recording committed buckets and
  * snapshot lineage. The manifest IS the per-partition checkpoint ledger
  * of the north rule: a bucket listed in the manifest is durably
  * committed; restart = skip manifest buckets. Kept behind this narrow
  * object so a real Iceberg catalog (`spark.table(...)` + `MERGE`) drops
  * in unchanged on a real cluster.
  *
  * Schema evolution: ADDED columns work across snapshots via parquet
  * schema merging at read (older buckets surface NULL — see
  * `SchemaEvolutionSpec`). Column RENAMES/DROPS need Iceberg's field-id
  * indirection — provided by the [[SchemaEvolution]] sidecar
  * (`schema-v<id>.json` beside each manifest snapshot), whose
  * `readMerged` remaps/prunes/backfills every bucket to the current
  * schema by id. With a real Iceberg catalog both drop in unchanged.
  *
  * Commit protocol: write JSON to `manifest.json.tmp`, then atomic
  * `Files.move(..., ATOMIC_MOVE)` over `manifest.json` — readers never see
  * a torn manifest (same single-file-swap discipline Iceberg uses for its
  * metadata pointer).
  */
object TableIO {

  /** `writer` is the snapshot id that committed this bucket — stamped by
    * [[commit]] (callers pass -1), carried durably in every manifest so
    * schema attribution ([[SchemaEvolution.writerSnapshots]]) survives
    * [[expireSnapshots]] deleting the writer's own manifest file. -1 =
    * legacy entry predating the stamp (attribution falls back to
    * first-retained-snapshot derivation).
    */
  final case class BucketEntry(bucket: Int, rows: Long, bytes: Long, wallMs: Long,
      writer: Long = -1L)

  final case class Manifest(
      snapshotId: Long,
      completed: Map[Int, BucketEntry]) {
    def isDone(bucket: Int): Boolean = completed.contains(bucket)
  }

  val Empty: Manifest = Manifest(0L, Map.empty)

  private def manifestPath(tableDir: String): Path =
    Paths.get(tableDir, "manifest.json")

  def read(tableDir: String): Manifest = {
    val p = manifestPath(tableDir)
    if (!Files.exists(p)) return Empty
    // decode leniently: `readAllLines` THROWS MalformedInputException on
    // invalid UTF-8, so a bit-flipped manifest would kill resume instead
    // of degrading to re-processing (found by TableIOFuzzSpec). The
    // String constructor replaces malformed sequences and never throws.
    val content =
      try new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      catch { case scala.util.control.NonFatal(_) => return Empty }
    try parse(content)
    catch { case scala.util.control.NonFatal(_) => Empty }
  }

  private def snapshotPath(tableDir: String, id: Long): Path =
    Paths.get(tableDir, s"manifest-v$id.json")

  /** Append newly completed buckets and atomically swap the manifest.
    * Each commit also retains its manifest as an immutable
    * `manifest-v<id>.json` — the snapshot history behind [[readAt]]'s
    * time travel (the Iceberg metadata-file lineage, emulated).
    */
  def commit(tableDir: String, prev: Manifest, done: Seq[BucketEntry]): Manifest = {
    val id = prev.snapshotId + 1
    // stamp each newly committed bucket with ITS writer snapshot —
    // buckets re-listed from prev keep their original stamp
    val next = Manifest(id,
      prev.completed ++ done.map(e => e.bucket -> e.copy(writer = id)))
    Files.createDirectories(Paths.get(tableDir))
    val tmp = Paths.get(tableDir, "manifest.json.tmp")
    Files.write(tmp, render(next).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(tableDir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // history copy strictly AFTER the atomic swap: a crash between the
    // two then loses only the snapshot file (readAt → Empty), never
    // publishes an id the table never committed — the reverse order
    // would let snapshots() advertise phantom buckets that orphan
    // cleanup is about to delete
    Files.copy(manifestPath(tableDir), snapshotPath(tableDir, next.snapshotId),
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Committed snapshot ids, oldest first. */
  def snapshots(tableDir: String): Seq[Long] = {
    val d = Paths.get(tableDir)
    if (!Files.isDirectory(d)) return Nil
    scala.util.Using.resource(Files.list(d))(_.iterator().asScala
      .map(_.getFileName.toString)
      .flatMap {
        case n if n.startsWith("manifest-v") && n.endsWith(".json") =>
          n.stripPrefix("manifest-v").stripSuffix(".json").toLongOption
        case _ => None
      }
      .toVector.sorted)
  }

  /** The manifest as of snapshot `id` (time travel). Buckets are written
    * once and never rewritten, so the bucket set of an old manifest
    * exactly reproduces that snapshot's table contents.
    */
  def readAt(tableDir: String, id: Long): Manifest = {
    val p = snapshotPath(tableDir, id)
    if (!Files.exists(p)) return Empty
    try parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(_) => Empty }
  }

  /** [[readAt]] that DISTINGUISHES "snapshot absent/torn" (None) from a
    * committed empty manifest. Consumers whose correctness depends on
    * the manifest's contents being real — incremental deltas, not
    * point-in-time degradable reads — must use this: a torn
    * `manifest-v<id>.json` (the documented [[commit]] crash window)
    * degrading to Empty would silently turn "delta since id" into
    * "everything".
    */
  def readAtStrict(tableDir: String, id: Long): Option[Manifest] = {
    val p = snapshotPath(tableDir, id)
    if (!Files.exists(p)) return None
    val raw =
      try new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      catch { case scala.util.control.NonFatal(_) => return None }
    val m =
      try parse(raw)
      catch { case scala.util.control.NonFatal(_) => return None }
    // integrity: snapshot files are only ever produced by render(), so
    // an intact file round-trips byte-for-byte; a TRUNCATED file would
    // otherwise regex-parse to a silently PARTIAL bucket set — the
    // worst failure mode for a delta (missing rows, no error)
    if (render(m) == raw) Some(m) else None
  }

  /** Expire old snapshots, keeping the newest `keepLast` (Iceberg's
    * `expireSnapshots` emulation — bounds metadata growth on a table
    * that commits every micro-batch forever). Commits are append-only
    * and buckets write-once, so every bucket an expired manifest lists
    * is still listed by a retained one — expiration deletes ONLY
    * metadata files, never data, and `readAt`/`tableChanges` on an
    * expired id degrade exactly like the documented absent-snapshot
    * cases (Empty / rejected), not into wrong answers. The live
    * `manifest.json` is never touched.
    */
  def expireSnapshots(tableDir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val ids = snapshots(tableDir)
    val expire = ids.dropRight(keepLast)
    expire.foreach(id => Files.deleteIfExists(snapshotPath(tableDir, id)))
    expire
  }

  def clear(tableDir: String): Unit = {
    val p = manifestPath(tableDir)
    if (Files.exists(p)) Files.delete(p)
    val d = Paths.get(tableDir)
    if (Files.isDirectory(d)) {
      val history = scala.util.Using.resource(Files.list(d))(_.iterator().asScala
        .filter { f =>
          val n = f.getFileName.toString
          n.startsWith("manifest-v") && n.endsWith(".json")
        }
        .toVector)
      history.foreach(Files.delete)
    }
  }

  // -- tiny hand-rolled JSON (flat, numeric-only payload; no deps) ----------

  private def render(m: Manifest): String = {
    val entries = m.completed.values.toSeq.sortBy(_.bucket).map { e =>
      s"""{"bucket":${e.bucket},"rows":${e.rows},"bytes":${e.bytes},""" +
        s""""wall_ms":${e.wallMs},"writer":${e.writer}}"""
    }.mkString("[", ",", "]")
    s"""{"snapshot_id":${m.snapshotId},"completed":$entries}"""
  }

  private val EntryRe =
    """\{"bucket":(\d+),"rows":(\d+),"bytes":(\d+),"wall_ms":(\d+)(?:,"writer":(-?\d+))?\}""".r
  private val SnapRe = """"snapshot_id":(\d+)""".r

  private def parse(s: String): Manifest = {
    val snap = SnapRe.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
    val entries = EntryRe.findAllMatchIn(s).map { m =>
      val e = BucketEntry(m.group(1).toInt, m.group(2).toLong,
        m.group(3).toLong, m.group(4).toLong,
        Option(m.group(5)).map(_.toLong).getOrElse(-1L))
      e.bucket -> e
    }.toMap
    Manifest(snap, entries)
  }
}
