package graft.storage

import java.nio.channels.{FileChannel, FileLock}
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Per-graph EXCLUSIVE writer lock — the storage layer's concurrency
  * contract made loud.
  *
  * The reference serializes all writes to one graph through a per-DB
  * single-writer connection pool (robosystems/graph_api/core/lbug/
  * pool.py — one writable connection per database, admission through
  * the queue); readers go through snapshot connections. This store
  * keeps that contract: parquet tables swapped by rename-aside
  * ([[GraphStore.rewriteInPlace]]) are safe under ONE writer and any
  * number of readers, and are NOT safe under two concurrent writers
  * (a lost-update: both read the same base, last swap wins). So every
  * mutating entry point takes this lock:
  *
  *  - cross-PROCESS: an OS `FileLock` on `<graph root>/.writer.lock`
  *    (advisory, held for the duration of the mutation);
  *  - cross-THREAD within a JVM (where overlapping `FileLock`s throw
  *    instead of blocking): a process-global holder table keyed by the
  *    canonical lock path, REENTRANT per thread because mutators
  *    compose (`ingestNodeFiles` → `ingestNodes`).
  *
  * Contention waits up to `waitMs` (the reference queues, it does not
  * fail fast), then REJECTS LOUDLY — never silently proceeds into a
  * lost-update. On a multi-writer deployment this contract is what a
  * transactional table format (Delta/Iceberg optimistic commit)
  * replaces; see SCALING.md "Write concurrency".
  */
private[graft] object WriterLock {

  private final class Held(val thread: Thread,
      val channel: FileChannel, val lock: FileLock) {
    var depth: Int = 1
  }
  private val held = scala.collection.mutable.Map.empty[String, Held]

  /** Run `body` holding the exclusive writer lock for `graphRoot`. */
  def withLock[A](graphRoot: String, waitMs: Long = 10000L)(body: => A): A = {
    Files.createDirectories(Paths.get(graphRoot))
    val key = Paths.get(graphRoot, ".writer.lock").toAbsolutePath.normalize.toString
    val me = Thread.currentThread()
    val deadline = System.currentTimeMillis() + waitMs

    def acquire(): Unit = {
      while (true) {
        held.synchronized {
          held.get(key) match {
            case Some(h) if h.thread eq me =>
              h.depth += 1; return
            case Some(_) => // other thread in this JVM — wait below
            case None =>
              val ch = FileChannel.open(Paths.get(key),
                StandardOpenOption.CREATE, StandardOpenOption.WRITE)
              val fl =
                try ch.tryLock()
                catch {
                  // same-JVM overlap (a channel outside this registry,
                  // e.g. an embedding application's own handle) throws
                  // instead of returning null — same meaning: held
                  case _: java.nio.channels.OverlappingFileLockException =>
                    ch.close(); null
                  case e: Throwable => ch.close(); throw e
                }
              if (fl != null) { held(key) = new Held(me, ch, fl); return }
              ch.close() // another PROCESS holds it
          }
        }
        if (System.currentTimeMillis() >= deadline)
          throw new IllegalStateException(
            s"another writer holds $key after ${waitMs} ms — the graph " +
              "store is single-writer per graph (reference pool.py " +
              "parity); serialize writers or move to a transactional " +
              "table format (SCALING.md 'Write concurrency')")
        Thread.sleep(25)
      }
    }

    def release(): Unit = held.synchronized {
      val h = held(key)
      h.depth -= 1
      if (h.depth == 0) {
        held.remove(key)
        try h.lock.release() finally h.channel.close()
      }
    }

    acquire()
    try body finally release()
  }
}
