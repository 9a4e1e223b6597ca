package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE checked rename-swap discipline shared by every operator that
  * replaces a live parquet directory with a freshly-written sibling
  * ([[Maintenance.appendCycle]]'s compaction and [[StateMerge]]'s state
  * overwrite). Centralised so a crash-window fix lands once, not per copy.
  *
  * Invariant maintained at every step: the table's data survives a crash
  * or a false rename return under EXACTLY ONE of its sibling names —
  * never deleted-with-no-replacement (the failure mode of
  * delete-then-rename). The transient `tmp` sibling is never the sole
  * copy of anything: it becomes live only via rename, and until that
  * rename the previous state is at `live` or `backup`. Rename/delete
  * results are CHECKED — HDFS-style FileSystems report failure as
  * `false`, not an exception. In a catalog-backed table format this whole
  * dance is one atomic pointer flip; with plain parquet directories it
  * assumes the single-writer protocol the callers document.
  */
object TableSwap {

  /** Entry-point crash recovery: restore a table stranded at its backup
    * name (a crash BETWEEN the two swap renames — live absent, data at
    * `backup`), then clear stale transient siblings from earlier crashes:
    * a half-written `tmp` (crash mid-rewrite; never the sole copy), and a
    * `backup` lingering NEXT TO a live table (crash after a complete swap
    * but before the final delete). Without the cleanup a table that never
    * again crosses its compaction threshold would carry the stale
    * sibling — truncated data on disk forever, failing any no-siblings
    * hygiene gate. */
  def recover(fs: FileSystem, live: Path, tmp: Path, backup: Path,
              what: String): Unit = {
    if (!fs.exists(live) && fs.exists(backup) && !fs.rename(backup, live))
      throw new java.io.IOException(
        s"$what recovery: could not restore $backup -> $live")
    if (fs.exists(tmp) && !fs.delete(tmp, true))
      throw new java.io.IOException(
        s"$what recovery: could not remove stale $tmp")
    if (fs.exists(live) && fs.exists(backup) && !fs.delete(backup, true))
      throw new java.io.IOException(
        s"$what recovery: could not remove stale $backup")
  }

  /** The three-step checked swap: live→backup, tmp→live, drop backup.
    * `liveExists` = false is the bootstrap form (first write: one rename,
    * nothing to back up). On a failed tmp→live rename the previous state
    * is restored if possible and the error says where the data is. */
  def swapInto(fs: FileSystem, live: Path, tmp: Path, backup: Path,
               liveExists: Boolean, what: String): Unit = {
    if (liveExists && !fs.rename(live, backup))
      throw new java.io.IOException(s"$what swap: rename $live -> $backup failed")
    if (!fs.rename(tmp, live)) {
      // best-effort restore: some FileSystems (S3A) THROW on rename rather
      // than returning false — a throwing restore must not mask the
      // diagnostic below that says where the data actually sits
      val restored = liveExists &&
        (try fs.rename(backup, live) catch { case _: java.io.IOException => false })
      throw new java.io.IOException(
        s"$what swap: rename $tmp -> $live failed" +
          (if (restored) "; previous state restored"
           else if (liveExists) s"; PREVIOUS STATE LEFT AT $backup"
           else ""))
    }
    if (liveExists && !fs.delete(backup, true))
      throw new java.io.IOException(
        s"$what swap: could not remove backup $backup ($live is live and complete)")
  }
}
