package graft.store

/**
 * Session-scoped scratch directories for in-query index builds.
 *
 * Queries that demonstrate a persisted index (q_text_index, q_rag_indexed,
 * the IVF probe family…) build the index under a temp directory as part of
 * the query — honest benching keeps the build in-query — but a bare
 * `Files.createTempDirectory` leaks a full index copy into /tmp per
 * execution, and repeated bench/test runs accumulate them. Every scratch
 * dir created here is registered ONCE with a JVM shutdown hook that
 * removes the whole tree, so a session cleans up after itself no matter
 * how many times a query re-executed. (In-run reuse stays the caller's
 * choice — e.g. a per-session cached index keyed by the fixture dir.)
 */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** A fresh temp directory whose tree is swept at JVM exit. */
  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    dirs.add(d)
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        var f = dirs.poll()
        while (f != null) { StoreIO.rmTree(f); f = dirs.poll() }
      }, "graft-scratch-sweep"))
    d.toString
  }
}
