package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** Publication protocol for the table's VERSION pointer — the ONE piece of
  * commit machinery whose atomicity is filesystem-specific. Every other
  * metadata object (manifests, snapshot nodes) is immutable and uniquely
  * named, so a plain PUT is safe on any store; the pointer is the single
  * mutable object and must advance atomically.
  *
  * GraftTable reads and advances the pointer ONLY through this interface:
  *  - [[RenamePointerCommitter]] (default) uses tmp-write + atomic rename —
  *    correct on local/HDFS-class filesystems, where the advisory process
  *    lock already serializes writers;
  *  - an S3-class object store (no atomic rename, advisory locks
  *    meaningless across clients) supplies a compare-and-swap
  *    implementation instead: conditional PUT (If-Match / x-amz-*
  *    preconditions) or an external CAS row (the DynamoDB-commit pattern
  *    Iceberg/Delta use publicly). `swap` returning false = another
  *    writer advanced the pointer first; the caller's commit MUST fail
  *    loudly, never retry blindly (its manifest may now be stale).
  */
trait PointerCommitter {
  /** Current committed version at `versionFile` (0 = empty table). */
  def currentVersion(versionFile: Path): Long

  /** Atomically publish `next` iff the pointer still reads `expected`.
    * False = lost the race (the caller must abort, not overwrite). */
  def swap(versionFile: Path, expected: Long, next: Long): Boolean

  /** Publish a VERSION-DERIVED metadata object (snapshot node, rewrite/
    * delete manifest). Unlike batch manifests, these names collide exactly
    * when two writers race the same version, so a blind overwrite would
    * let the CAS LOSER clobber the winner's already-published node before
    * its own `swap` is refused. False = an object already exists there
    * and may belong to a live competing writer — the caller must abort.
    *
    * The rename implementation overwrites and returns true: under the
    * advisory single-writer lock, a same-name leftover can only be a
    * crashed writer's orphan. An object-store implementation uses a
    * conditional PUT (if-none-match) and is itself responsible for
    * expiring crashed-writer orphans (lease/timestamp) before a retry can
    * succeed. */
  def putVersioned(target: Path, content: String): Boolean
}

/** Rename-based default for filesystems with atomic move. Writers are
  * serialized by the table's advisory process lock; the compare here is a
  * cheap backstop so a lock-bypassing writer (mis-mounted filesystem,
  * external mutation) surfaces as a refused swap instead of a silent
  * pointer regression. */
object RenamePointerCommitter extends PointerCommitter {
  override def currentVersion(vf: Path): Long =
    if (Files.exists(vf))
      new String(Files.readAllBytes(vf), StandardCharsets.UTF_8).trim.toLong
    else 0L

  override def swap(vf: Path, expected: Long, next: Long): Boolean =
    if (currentVersion(vf) != expected) false
    else {
      Files.createDirectories(vf.getParent)
      val tmp = vf.resolveSibling(vf.getFileName.toString + ".tmp")
      Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, vf, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      true
    }

  override def putVersioned(target: Path, content: String): Boolean = {
    // single-writer lock held by the caller ⇒ a pre-existing same-name
    // object is always a crashed writer's orphan: safe to replace
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    true
  }
}
