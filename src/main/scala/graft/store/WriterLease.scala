package graft.store

/** Another writer holds the lease (or won an acquisition race). The
  * caller's operation ran NO stage — fail-clean contract. */
final class LeaseHeldException(msg: String) extends IllegalStateException(msg)

/** The holder outlived its TTL and the lease was taken over — standard
  * lease semantics: a holder that misses its renew deadline may lose
  * ownership and must not publish. */
final class LeaseLostException(msg: String) extends IllegalStateException(msg)

/**
 * Single-WRITER lease for a store/index root — the enforcement of the
 * contract every store module documents ("single concurrent writer"): a
 * streaming maintainer and a compactor (or two maintainers after a
 * botched failover) can no longer interleave their stage/swap sequences;
 * the loser fails cleanly BEFORE writing any stage.
 *
 * Protocol (plain filesystem, no coordination service — the same
 * trade-off as the `_commit` marker): the lease is a file holding
 * `token \t expiresAtMillis \t op`.
 *  - ACQUIRE: atomic create-new wins; an existing UNEXPIRED file is a
 *    clean failure ([[LeaseHeldException]]).
 *  - EXPIRED file: take over by atomically renaming it to a
 *    taker-unique name — exactly one concurrent taker's rename succeeds
 *    (rename of a missing source fails) — then re-checking the stolen
 *    content: if it was renewed between read and rename (a LIVE lease
 *    grabbed by mistake), it is restored/discarded and the taker fails
 *    with [[LeaseHeldException]].
 *  - RENEW: write-new + atomic replace, only while still owned.
 *  - RELEASE: delete only if the file still carries the holder's token.
 * A crashed holder leaves its file behind; after `expiresAt` passes, the
 * next acquire proceeds (the crash-recovery story — see
 * WriterLeaseSpec). Leases are REENTRANT per thread+root, so a public
 * mutator calling another (Collection.add routing through index
 * compact/insert) never self-deadlocks.
 *
 * At 100 TB the same protocol runs against an object store's
 * conditional-put (create-new == if-none-match) — the file operations
 * here are the local-FS instantiation of CAS, not a driver-local lock
 * (java monitors could not fence a second driver).
 */
object WriterLease {

  /** Generous default: local operations finish far inside it; a real
    * streaming maintainer renews each batch. */
  val DefaultTtlMs: Long = 15 * 60 * 1000L

  private val FileName = "_writer_lease"

  /** Roots held by the current thread (reentrancy). */
  private val held = new ThreadLocal[java.util.HashMap[String, Lease]] {
    override def initialValue() = new java.util.HashMap[String, Lease]()
  }

  final class Lease private[WriterLease] (
      val leaseFile: java.nio.file.Path, val token: String,
      val op: String, ttlMs: Long, rootKey: String, nested: Boolean) {

    @volatile private var expiresAt: Long = 0L

    private[WriterLease] def writeInitial(): Unit = {
      expiresAt = System.currentTimeMillis() + ttlMs
      java.nio.file.Files.write(leaseFile, content,
        java.nio.file.StandardOpenOption.CREATE_NEW)
    }

    private def content: Array[Byte] =
      s"$token\t$expiresAt\t$op".getBytes(java.nio.charset.StandardCharsets.UTF_8)

    /** Still the recorded holder? (The file can change only via takeover
      * after expiry — or a release bug.) */
    def stillHeld(): Boolean =
      readLease(leaseFile).exists(_._1 == token)

    def assertHeld(): Unit =
      if (!nested && !stillHeld())
        throw new LeaseLostException(
          s"lease on $leaseFile lost (expired and taken over?) — do not publish")

    /** Extend the TTL — atomic replace, only while still owned. */
    def renew(): Unit = if (!nested) {
      assertHeld()
      expiresAt = System.currentTimeMillis() + ttlMs
      val tmp = leaseFile.resolveSibling(s"$FileName.renew.$token")
      java.nio.file.Files.write(tmp, content)
      java.nio.file.Files.move(tmp, leaseFile,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    def release(): Unit = if (!nested) {
      held.get.remove(rootKey): Unit
      if (stillHeld()) java.nio.file.Files.deleteIfExists(leaseFile): Unit
    }
  }

  private def readLease(f: java.nio.file.Path): Option[(String, Long, String)] =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8)
      s.split('\t') match {
        case Array(tok, exp, op) => Some((tok, exp.toLong, op))
        case _ => None // torn/foreign content: treat as absent-after-steal
      }
    } catch { case _: java.io.IOException => None }

  /** Acquire the single-writer lease for `root` (lease file INSIDE it —
    * valid for roots that are never themselves swapped: index roots,
    * store base dirs). Throws [[LeaseHeldException]] if another holder is
    * live. */
  def acquire(root: String, op: String, ttlMs: Long = DefaultTtlMs): Lease =
    acquireFile(java.nio.file.Paths.get(root, FileName), op, ttlMs, root)

  /** Acquire on an explicit lease-file path — for destinations whose dir
    * is wholly REPLACED by a swap (a Collection's parquet dir): the lease
    * must live beside, not inside, or the swap would erase it mid-hold. */
  def acquireFile(leaseFile: java.nio.file.Path, op: String, ttlMs: Long,
                  rootKey: String): Lease = {
    val nestedHeld = held.get.get(rootKey)
    if (nestedHeld != null)
      return new Lease(leaseFile, nestedHeld.token, op, ttlMs, rootKey, nested = true)
    Option(leaseFile.getParent).foreach(p => java.nio.file.Files.createDirectories(p))
    val token = java.util.UUID.randomUUID().toString
    val lease = new Lease(leaseFile, token, op, ttlMs, rootKey, nested = false)
    def tryCreate(): Boolean =
      try { lease.writeInitial(); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    if (!tryCreate()) {
      readLease(leaseFile) match {
        case Some((heldTok, exp, heldOp)) if System.currentTimeMillis() <= exp =>
          throw new LeaseHeldException(
            s"$leaseFile held by $heldOp ($heldTok) until $exp")
        case Some((_, readExp, _)) =>
          // expired: steal via unique rename — exactly one taker wins
          val steal = leaseFile.resolveSibling(s"$FileName.steal.$token")
          try java.nio.file.Files.move(leaseFile, steal,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.io.IOException =>
              throw new LeaseHeldException(
                s"$leaseFile takeover raced — another taker or the holder won")
          }
          // the rename could have grabbed a LIVE file renewed between the
          // read and the move: restore/discard it and fail clean
          val stolen = readLease(steal)
          val stillExpired = stolen.forall { case (_, e, _) =>
            e == readExp || e < System.currentTimeMillis()
          }
          if (!stillExpired) {
            try java.nio.file.Files.move(steal, leaseFile,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            catch { case _: java.io.IOException =>
              java.nio.file.Files.deleteIfExists(steal): Unit }
            throw new LeaseHeldException(s"$leaseFile renewed during takeover")
          }
          java.nio.file.Files.deleteIfExists(steal)
          if (!tryCreate())
            throw new LeaseHeldException(s"$leaseFile takeover raced at re-create")
        case None =>
          // vanished between create-fail and read (released): one retry
          if (!tryCreate())
            throw new LeaseHeldException(s"$leaseFile acquisition raced")
      }
    }
    held.get.put(rootKey, lease)
    lease
  }

  /** Run `body` under the lease; asserts ownership survived before
    * returning (a publish under a lost lease is the bug this exists to
    * catch), releases always. */
  def withLease[T](root: String, op: String, ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val l = acquire(root, op, ttlMs)
    try { val r = body; l.assertHeld(); r } finally l.release()
  }

  /** [[withLease]] over an explicit lease-file location. */
  def withLeaseFile[T](leaseFile: java.nio.file.Path, op: String, rootKey: String,
                       ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val l = acquireFile(leaseFile, op, ttlMs, rootKey)
    try { val r = body; l.assertHeld(); r } finally l.release()
  }
}
