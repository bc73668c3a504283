package graft.streaming

/** The shared core of the marker-watermark fold, used by BOTH
  * streamed-table families ([[LayoutIngest.compactMarkers]],
  * [[IndexIngest.compactMarkers]]) so the crash-ordering of the
  * protocol lives in exactly one place: the contiguous committed
  * prefix of per-batch markers folds into ONE `batch-upto-<n>` file —
  * an atomic empty-file create whose NAME carries the state
  * (monotone; readers take the max) — and only then are the folded
  * markers and superseded watermarks retired. A crash between any two
  * steps leaves a state the next fold converges from: the watermark
  * never regresses, an unretired marker at or below it is re-deleted,
  * a missing watermark just re-folds. The families differ only in how
  * a commit marker is NAMED (`batch-<id>` vs a bare number) and in
  * what extra per-id debris a fold may retire (IndexIngest's stale
  * `.intent` files) — those are the two parameters.
  *
  * Callers hold their single-writer lock; this object does no
  * locking of its own.
  */
private[streaming] object MarkerLedger {

  /** Highest `batch-upto-<n>` among `names`, -1 when none. */
  def watermark(names: Seq[String]): Long =
    names.filter(_.matches("batch-upto-\\d+"))
      .map(_.stripPrefix("batch-upto-").toLong)
      .foldLeft(-1L)(math.max)

  /** Fold and retire (object doc). `commitIds` are the ids whose
    * individual commit markers exist in `names`; `commitName` renders
    * an id's marker file name; `retireBelow(n)` lists extra file
    * names to delete once the watermark stands at n — keyed on the
    * watermark, not on `commitIds`, so debris whose commit marker was
    * folded by an EARLIER crashed pass is still collected. */
  def fold(f: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, names: Seq[String],
      commitIds: Set[Long], commitName: Long => String,
      retireBelow: Long => Seq[String] = _ => Nil): Unit = {
    val w = watermark(names)
    var n = w
    while (commitIds.contains(n + 1)) n += 1
    if (n > w)
      f.create(new org.apache.hadoop.fs.Path(root,
        s"batch-upto-$n"), true).close()
    if (n >= 0) {
      commitIds.filter(_ <= n).foreach(i => f.delete(
        new org.apache.hadoop.fs.Path(root, commitName(i)), false))
      retireBelow(n).foreach(extra => f.delete(
        new org.apache.hadoop.fs.Path(root, extra), false): Unit)
      names.filter(_.matches("batch-upto-\\d+"))
        .map(_.stripPrefix("batch-upto-").toLong).filter(_ < n)
        .foreach(m => f.delete(new org.apache.hadoop.fs.Path(root,
          s"batch-upto-$m"), false))
    }
  }
}
