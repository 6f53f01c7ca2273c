package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** The shared at-least-once replay protocol of the persistent-state
  * streams (StreamingDedup / StreamingSimilarity / StreamingCorpusStats):
  *
  *  1. a `_stream_checkpoint` RUN-IDENTITY file records the owning
  *     checkpoint on first write; any batch arriving from a different
  *     checkpoint fails fast — a fresh checkpoint restarts batch ids
  *     at 0, so its batches would be silently swallowed by the old
  *     markers and the persisted state hidden from matching;
  *  2. a `_stream_config` fingerprint records the STATE-SHAPING
  *     parameters (hash planes, signature length, sketch widths…);
  *     resuming with different ones would merge incompatible state —
  *     e.g. CMS cells from two widths cell-summed as if they shared a
  *     hash space can silently UNDERcount, violating the sketch's
  *     guarantee — so a mismatch fails fast too;
  *  3. a committed per-batch marker with an id BEYOND the current
  *     batch catches a checkpoint deleted and recreated at the same
  *     path (which defense 1 cannot);
  *  4. the batch's own marker, written LAST by the caller via
  *     [[commit]], makes a fully-committed replay a no-op.
  *
  * All probes are driver-side filesystem metadata — no data scan. */
private[streaming] object StreamProtocol {

  private val RunFile = "_stream_checkpoint"
  private val ConfigFile = "_stream_config"

  def committedIds(fs: FileSystem, dir: Path, markerPrefix: String): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(markerPrefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(markerPrefix).toLong).toOption)

  private def readFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def writeFile(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Run guards 1-4; returns true when this batch is ALREADY fully
    * committed (replay of a finished batch → caller skips). On the
    * first batch the identity and config files are claimed. */
  def replayGuards(fs: FileSystem, dir: Path, checkpoint: String,
                   config: String, batchId: Long, markerPrefix: String,
                   streamName: String): Boolean = {
    val runMarker = new Path(dir, RunFile)
    if (fs.exists(runMarker)) {
      val owner = readFile(fs, runMarker)
      if (owner != checkpoint)
        throw new IllegalStateException(
          s"$streamName: $dir is owned by checkpoint '$owner' but this " +
            s"stream runs from '$checkpoint' — a fresh checkpoint restarts " +
            "batch ids at 0, so its batches would be silently swallowed " +
            "by the old batch markers and the persisted state hidden from " +
            "matching. Resume from the original checkpoint, or delete the " +
            "state directory and re-ingest. (Moved the checkpoint " +
            s"directory on purpose? Update the $RunFile file to the new " +
            "path.)")
    } else writeFile(fs, runMarker, checkpoint)
    val cfgMarker = new Path(dir, ConfigFile)
    if (fs.exists(cfgMarker)) {
      val owner = readFile(fs, cfgMarker)
      if (owner != config)
        throw new IllegalStateException(
          s"$streamName: $dir was built with state-shaping parameters " +
            s"[$owner] but this stream runs with [$config] — merging or " +
            "matching across different hash/sketch shapes silently " +
            "corrupts the persisted state (it cannot fail checksums; it " +
            "just answers wrongly). Resume with the original parameters, " +
            "or delete the state directory and re-ingest.")
    } else writeFile(fs, cfgMarker, config)
    val committed = committedIds(fs, dir, markerPrefix)
    if (committed.nonEmpty && committed.max > batchId)
      throw new IllegalStateException(
        s"$streamName: $dir already holds committed batches up to " +
          s"${committed.max} but this stream is at batch $batchId — a " +
          "fresh checkpoint is replaying over retained state. Either " +
          "resume from the original checkpoint or delete the state " +
          "directory and re-ingest.")
    fs.exists(new Path(dir, s"$markerPrefix$batchId"))
  }

  /** Commit point: the batch's marker, written LAST. */
  def commit(fs: FileSystem, dir: Path, markerPrefix: String,
             batchId: Long): Unit =
    fs.create(new Path(dir, s"$markerPrefix$batchId"), true).close()
}
