package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** Single-writer ENFORCEMENT for maintained tables. [[DedupAppend]],
  * [[StateMerge]] and [[Maintenance.appendCycle]] all document a
  * single-writer assumption — two concurrent maintainers interleaving the
  * append/swap dance could duplicate keys (both see key X absent, both
  * insert) or strand a table mid-swap. This turns the assumption into a
  * checked protocol: a LEASE MARKER file is created next to the table with
  * create-fails-if-exists semantics (atomic on HDFS-style and local
  * FileSystems — the same primitive Structured Streaming's checkpoint
  * locks rely on), held for the duration of one maintenance operation,
  * and deleted on completion. The second maintainer's acquire fails
  * CLEANLY — no partial writes, table untouched.
  *
  * The marker is a SIBLING (`<table>__lease`), never inside the table
  * directory, so readers and parquet listings never see it and the swap
  * dance can rename the table directory freely while the lease is held.
  *
  * Crash story, two tiers. A maintainer that declares an OWNER token —
  * streaming maintainers pass their checkpoint location, the natural
  * one-logical-writer identity — self-heals: its restarted lineage
  * re-acquires its own stale lease (same owner ⇒ same logical writer;
  * the replayed batch is already a no-op under StateMerge's batch-id
  * stamp and the idempotent append forms, so take-over cannot
  * double-apply). An ANONYMOUS holder that dies leaves the marker
  * behind, and every later maintenance fails with the holder's identity
  * and acquisition time from the marker body — loud, diagnosable refusal
  * rather than silent corruption; recovery is the operator's explicit
  * [[Lease.break_]] after confirming the holder is gone (the same
  * judgement call breaking any distributed lock needs; a TTL would trade
  * it for clock trust). In a catalog-backed table format this whole
  * mechanism is the catalog's commit protocol.
  */
object Lease {

  private def marker(live: Path): Path = live.suffix("__lease")

  /** Thrown when another maintainer holds the table's lease. */
  final class HeldException(msg: String) extends java.io.IOException(msg)

  /** Same-JVM holders, keyed by the marker's fully-qualified URI. The
    * in-process putIfAbsent is ATOMIC where `FileSystem.create(f, false)`
    * is not: RawLocalFileSystem implements no-overwrite create as
    * check-then-create, so two threads racing a perfect barrier can both
    * pass it — two streaming maintainers in one driver JVM are exactly
    * that shape. Cross-PROCESS exclusion still rests on the marker file
    * (atomic on HDFS-style stores, where the namenode arbitrates;
    * best-effort on a raw local FS, which no multi-process production
    * deployment uses as a table store). */
  private val heldInJvm = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def key(fs: FileSystem, live: Path): String =
    fs.makeQualified(marker(live)).toString

  /** Length-prefixed owner field: `owner=<len>:<token>`. The prefix makes
    * the [[acquire]] same-owner comparison unambiguous over the
    * space-delimited holder line — with a raw token, owner "/tmp/ckpt"
    * would prefix-match a holder declared by owner "/tmp/ckpt state"
    * whose trailing word aligned with the next field, silently treating a
    * DIFFERENT logical writer as the same one. Two distinct tokens can
    * never share the full `owner=<len>:<token> ` prefix: equality forces
    * equal lengths, and equal-length prefixes of length len are the
    * tokens themselves. */
  private def ownerLine(owner: Option[String]): String =
    owner match {
      case Some(tok) => s"owner=${tok.length}:$tok"
      case None => "owner=-"
    }

  /** Acquire the lease for the table at `live` or throw [[HeldException]]
    * with the current holder's identity: in-JVM registry first (atomic
    * putIfAbsent), then the create-fails-if-exists marker file. A
    * declared `owner` token (a stream's checkpoint location) re-acquires
    * its OWN stale lease — same owner ⇒ the same logical writer's
    * restarted lineage, never a second concurrent maintainer. */
  def acquire(fs: FileSystem, live: Path, what: String,
              owner: Option[String] = None): Unit = {
    val holder = s"${ownerLine(owner)} $what pid=${ProcessHandle.current().pid()} " +
      s"thread=${Thread.currentThread().getName} " +
      s"acquired=${java.time.Instant.now()}"
    def refuse(existing: String, detail: String): Nothing =
      throw new HeldException(
        s"$what: another maintainer holds the lease on $live " +
          s"[$existing]; if its process is gone, break the lease " +
          s"explicitly (Lease.break_) — refusing to interleave.$detail")
    def sameOwner(existing: String): Boolean =
      owner.isDefined && existing.startsWith(ownerLine(owner) + " ")
    val k = key(fs, live)
    val prev = heldInJvm.putIfAbsent(k, holder)
    if (prev != null) {
      // same-JVM take-over for the declared owner (a restarted stream in
      // one long-lived driver): replace the stale entry atomically
      if (!(sameOwner(prev) && heldInJvm.replace(k, prev, holder)))
        refuse(prev, "")
    }
    val m = marker(live)
    // cross-process take-over: a marker left by OUR OWN crashed lineage
    // is removed before the fresh create (two same-owner processes racing
    // here were already corruption per the checkpoint-lineage contract)
    if (owner.isDefined && fs.exists(m)) {
      val existing =
        try {
          val in = fs.open(m)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        } catch { case scala.util.control.NonFatal(_) => "" }
      if (sameOwner(existing)) fs.delete(m, false)
    }
    val out =
      try fs.create(m, false)
      catch {
        // NonFatal, not just IOException: any create failure must roll the
        // registry entry back, or this JVM wedges the table behind a
        // holder that never actually took the lease
        case scala.util.control.NonFatal(e) =>
          heldInJvm.remove(k, holder)
          val existing =
            try {
              val in = fs.open(m)
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
            } catch { case scala.util.control.NonFatal(_) => "<unreadable>" }
          refuse(existing, s" (${e.getMessage})")
      }
    // if the holder write fails AFTER the marker was created, roll the
    // half-taken lease back (registry + marker) so the failure doesn't
    // permanently wedge the table behind an unreadable marker we own
    try { try out.write(holder.getBytes(StandardCharsets.UTF_8)) finally out.close() }
    catch {
      case t: Throwable =>
        heldInJvm.remove(k, holder)
        try fs.delete(m, false) catch { case _: java.io.IOException => () }
        throw t
    }
  }

  /** Release the lease (idempotent; a missing marker is not an error —
    * the holder may have been broken by an operator). Marker first, then
    * the registry entry: the spurious-HeldException window for a
    * back-to-back acquirer is then one map.remove (nanoseconds) instead
    * of an exists+delete filesystem round-trip. */
  def release(fs: FileSystem, live: Path): Unit = {
    val m = marker(live)
    if (fs.exists(m)) fs.delete(m, false)
    heldInJvm.remove(key(fs, live))
  }

  /** Operator action: forcibly remove a dead holder's lease. */
  def break_(fs: FileSystem, live: Path): Unit = release(fs, live)

  /** Run one maintenance operation under the table's lease. */
  def withLease[T](fs: FileSystem, live: Path, what: String,
                   owner: Option[String] = None)(f: => T): T = {
    acquire(fs, live, what, owner)
    try f finally release(fs, live)
  }
}
