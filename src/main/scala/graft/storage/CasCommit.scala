package graft.storage

import java.io.File
import java.nio.file.{FileAlreadyExistsException, Files, Paths}

/** Conditional-put ("compare-and-swap on a name") commit primitive —
  * the object-store-safe seam behind the graph `_manifest` swap.
  *
  * The storage layer's multi-table atomicity rests on ONE primitive:
  * "publish these bytes under name N iff N does not exist yet". That
  * is exactly an object store's conditional PUT (`If-None-Match: *`,
  * supported natively by S3/GCS/Azure), so a cloud port of
  * [[GraphStore]] swaps only this object — everything above it
  * (generation dirs, manifest format, retention) is already
  * rename-free. The previous design (`ATOMIC_MOVE` onto a fixed
  * `_manifest` name + an advisory `FileChannel` lock) used two
  * primitives that DON'T exist on object storage; this one uses the
  * one that does.
  *
  * Local implementation: write the content to a unique temp sibling,
  * then `link(2)` it to the target name — hard-link creation fails
  * atomically when the name already exists, which is create-if-absent
  * WITH content (a bare `O_CREAT|O_EXCL` would let readers observe a
  * partially-written file). Works on POSIX and NTFS; NFS guarantees
  * link atomicity even where `O_EXCL` is historically broken.
  *
  * Reference parity: the reference serializes writers behind a per-DB
  * single-writer pool (robosystems/graph_api/core/lbug/pool.py) and
  * never faces this race; a shared-storage deployment of THIS engine
  * does, and resolves it optimistically — losers get a loud
  * [[CommitConflictException]] and retry against the new head, the
  * same protocol as a transactional table format's log commit.
  */
private[graft] object CasFiles {

  /** Publish `body` at `target` iff `target` does not exist.
    * @return true when this call won the name; false when the name
    *         already existed (some other writer committed first). */
  def putIfAbsent(target: File, body: Array[Byte]): Boolean = {
    val dir = target.getParentFile
    if (dir != null) Files.createDirectories(dir.toPath)
    val tmp = new File(dir,
      s".${target.getName}.put-${java.util.UUID.randomUUID()}")
    Files.write(tmp.toPath, body)
    try {
      Files.createLink(target.toPath, tmp.toPath)
      true
    } catch {
      case _: FileAlreadyExistsException => false
    } finally {
      Files.deleteIfExists(tmp.toPath)
    }
  }
}

/** An optimistic commit lost the race: another writer published the
  * next manifest version first. RETRYABLE — re-read the graph state
  * (the winner's commit is now the head) and re-apply the mutation.
  * Under the in-process [[WriterLock]] this cannot happen; it fires
  * only when a SECOND process/host writes the same graph, which the
  * advisory file lock cannot exclude on shared/object storage. */
final class CommitConflictException(graphId: String, version: Int)
    extends RuntimeException(
      s"graph '$graphId': manifest version $version was committed by " +
        "another writer between this mutation's read and its commit; " +
        "the mutation was NOT applied — re-read and retry against the " +
        "new head (optimistic-commit conflict, see SCALING.md \"Write " +
        "concurrency\")")
