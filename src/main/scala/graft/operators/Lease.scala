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
  * Crash story: a maintainer that dies holding the lease leaves the
  * marker behind, and every later maintenance fails with the holder's
  * identity and acquisition time from the marker body — loud, diagnosable
  * refusal rather than silent corruption. Recovery is the operator's
  * explicit [[Lease.break_]] after confirming the holder is gone (the
  * same judgement call breaking any distributed lock needs; a TTL would
  * trade it for clock trust). In a catalog-backed table format this whole
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

  /** Acquire the lease for the table at `live` or throw [[HeldException]]
    * with the current holder's identity: in-JVM registry first (atomic
    * putIfAbsent), then the create-fails-if-exists marker file. */
  def acquire(fs: FileSystem, live: Path, what: String): Unit = {
    val holder = s"$what pid=${ProcessHandle.current().pid()} " +
      s"thread=${Thread.currentThread().getName} " +
      s"acquired=${java.time.Instant.now()}"
    def refuse(existing: String, detail: String): Nothing =
      throw new HeldException(
        s"$what: another maintainer holds the lease on $live " +
          s"[$existing]; if its process is gone, break the lease " +
          s"explicitly (Lease.break_) — refusing to interleave.$detail")
    val k = key(fs, live)
    val prev = heldInJvm.putIfAbsent(k, holder)
    if (prev != null) refuse(prev, "")
    val m = marker(live)
    val out =
      try fs.create(m, false)
      catch {
        case e: java.io.IOException =>
          heldInJvm.remove(k, holder)
          val existing =
            try {
              val in = fs.open(m)
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
            } catch { case _: java.io.IOException => "<unreadable>" }
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
    * the holder may have been broken by an operator). */
  def release(fs: FileSystem, live: Path): Unit = {
    heldInJvm.remove(key(fs, live))
    val m = marker(live)
    if (fs.exists(m)) fs.delete(m, false)
  }

  /** Operator action: forcibly remove a dead holder's lease. */
  def break_(fs: FileSystem, live: Path): Unit = release(fs, live)

  /** Run one maintenance operation under the table's lease. */
  def withLease[T](fs: FileSystem, live: Path, what: String)(f: => T): T = {
    acquire(fs, live, what)
    try f finally release(fs, live)
  }
}
