package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Envelope encryption for [[EncryptedStore]] — the two-tier key model every
 * production KMS deployment uses: rows encrypt under a random DATA key
 * (DEK) that itself exists at rest only WRAPPED (AES-GCM) by the caller's
 * MASTER key.
 *
 * What it buys at 100 TB: master-key rotation — the compliance event that
 * actually recurs (quarterly policies, personnel changes, suspected master
 * exposure) — becomes [[rotateMaster]]: a re-wrap of ~60 bytes of metadata,
 * ZERO data bytes touched, where [[EncryptedStore.rotateKey]] is a full
 * corpus rewrite. The deep rewrite remains for the rarer DEK-compromise
 * case as [[rotateData]], staged crash-consistently: the new wrapped DEK
 * (plus the collection list) lands first, collections re-encrypt one
 * atomic commit at a time, the promote happens last, and a crash anywhere
 * resumes at the next [[open]] — per-collection ciphertext sampling
 * distinguishes already-rotated from pending.
 *
 * The reference derives one static key at process start and re-encrypts
 * wholesale on rotation (/root/reference/src/cyborgdb_store.py:1-11 markets
 * the encrypted store; no key hierarchy exists in the 505-line demo); a
 * production deployment of exactly that promise fronts the data key with a
 * KMS master this way.
 *
 * Layout (beside the collections, like every store sidecar):
 *   `basePath/__dek`      — 12-byte GCM IV ++ ciphertext of the DEK payload
 *   `basePath/__dek_next` — same format, present only mid-[[rotateData]]
 *     (payload additionally carries the pending collection list)
 *
 * The master key NEVER reaches an executor: wrap/unwrap is driver-side
 * `javax.crypto`, and Spark plans only ever see the DEK.
 */
object Envelope {

  /** DEK alphabet: 64 ASCII symbols, so a 32-char DEK carries 192 bits of
    * entropy and is exactly the 32 UTF-8 bytes AES-256 wants. */
  private val Alphabet =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"

  private def dekFile(basePath: String) =
    java.nio.file.Paths.get(basePath, "__dek")
  private def dekNextFile(basePath: String) =
    java.nio.file.Paths.get(basePath, "__dek_next")

  /** AES key sizes are BYTE counts and wrap/unwrap feed the master through
    * UTF-8 — a 16-CHAR non-ASCII master would pass a char-length check yet
    * produce >16 key bytes and die with an opaque InvalidKeyException
    * inside Cipher.init, so validate the encoded byte length. */
  private def requireKey(k: String, what: String): Unit = {
    val bytes = k.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    require(Set(16, 24, 32).contains(bytes),
      s"$what must be 16/24/32 UTF-8 BYTES (got $bytes bytes from ${k.length} chars" +
        (if (bytes != k.length) " — non-ASCII characters widen under UTF-8)" else ")"))
  }

  /** One base-wide lease for envelope metadata mutations — distinct from
    * the per-collection mutator leases (a master rotation and a collection
    * write may proceed concurrently; two key rotations may not). */
  private def withEnvLease[T](basePath: String, op: String)(body: => T): T =
    WriterLease.withLeaseFile(
      java.nio.file.Paths.get(basePath, "_writer_lease_envelope"),
      op, s"envelope:$basePath")(body)

  private def wrap(master: String, payload: String): Array[Byte] = {
    val iv = new Array[Byte](12)
    new java.security.SecureRandom().nextBytes(iv)
    val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(
        master.getBytes(java.nio.charset.StandardCharsets.UTF_8), "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, iv))
    iv ++ c.doFinal(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def unwrap(master: String, blob: Array[Byte], what: String): String = {
    val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(
        master.getBytes(java.nio.charset.StandardCharsets.UTF_8), "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, blob.take(12)))
    try new String(c.doFinal(blob.drop(12)),
      java.nio.charset.StandardCharsets.UTF_8)
    catch {
      case _: javax.crypto.AEADBadTagException =>
        throw new IllegalArgumentException(
          s"master key cannot unwrap $what — wrong master, or the file is corrupt")
    }
  }

  private def freshDek(): String = {
    val rnd = new java.security.SecureRandom()
    val sb = new StringBuilder
    (0 until 32).foreach(_ => sb.append(Alphabet.charAt(rnd.nextInt(Alphabet.length))))
    sb.toString
  }

  /** Stage-then-ATOMIC_MOVE, so a reader never sees a torn key file. */
  private def atomicWrite(p: java.nio.file.Path, bytes: Array[Byte]): Unit = {
    val tmp = p.resolveSibling(s"${p.getFileName}.tmp${System.nanoTime()}")
    java.nio.file.Files.write(tmp, bytes)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** The handle [[open]]/[[rotateData]] return: keyed by the unwrapped
    * DEK, with the pre-mutation fence installed — a write from a handle
    * whose DEK rotated away (or is mid-rotation) refuses loudly instead
    * of landing old-key ciphertext into a rotated collection. The fence
    * runs inside the per-collection writer lease, which rotateData's
    * per-collection rotateKey commits also take, so the check and the
    * write are one serialized unit against rotation. */
  private def fencedStore(spark: SparkSession, basePath: String,
                          master: String, dek: String): EncryptedStore = {
    val st = new EncryptedStore(spark, basePath, dek)
    st.mutationFence = Some(() => {
      require(!java.nio.file.Files.exists(dekNextFile(basePath)),
        s"a data-key rotation is in progress at $basePath — re-open() when it completes")
      val cur = unwrap(master,
        java.nio.file.Files.readAllBytes(dekFile(basePath)), "the data key")
      require(cur == dek,
        s"stale envelope handle — the data key at $basePath rotated; re-open()")
    })
    st
  }

  /** Open (or initialize) an envelope-encrypted store: unwraps the DEK —
    * creating and wrapping a fresh one on first open — and returns an
    * [[EncryptedStore]] keyed by it (fence installed, see
    * [[fencedStore]]). A pending [[rotateData]] (crash between its
    * stages) RESUMES here before the store is handed out, so callers can
    * never serve through a half-rotated keyspace. The steady-state path
    * (envelope exists, nothing pending) is LOCK-FREE — N serving replicas
    * open concurrently, reading the atomically-replaced key file; the
    * lease is taken only for first-open initialization and crash resume,
    * with the state re-checked under it. */
  def open(spark: SparkSession, basePath: String, master: String): EncryptedStore = {
    requireKey(master, "master key")
    val f = dekFile(basePath)
    def steady(): EncryptedStore = fencedStore(spark, basePath, master,
      unwrap(master, java.nio.file.Files.readAllBytes(f), "the data key"))
    if (java.nio.file.Files.exists(f) &&
        !java.nio.file.Files.exists(dekNextFile(basePath))) {
      val st = steady()
      // re-check AFTER the key read: a rotateData that staged its intent
      // between our two checks must not hand this caller an old-DEK
      // handle mid-rotation — fall into the leased path, which either
      // resumes the crashed rotation or fails loudly on the live one's
      // lease (a handle opened BEFORE the intent landed is the inherent
      // long-lived-handle case: its writes are fenced, its reads fail
      // loudly on GCM once its DEK rotates away)
      if (!java.nio.file.Files.exists(dekNextFile(basePath)))
        return st
    }
    withEnvLease(basePath, "Envelope.open") {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(basePath)): Unit
      if (java.nio.file.Files.exists(dekNextFile(basePath)))
        resumeRotateData(spark, basePath, master)
      if (!java.nio.file.Files.exists(f))
        atomicWrite(f, wrap(master, freshDek()))
      steady()
    }
  }

  /** MASTER-key rotation — the O(metadata) operation envelope encryption
    * exists for: unwrap the DEK with the old master, re-wrap with the new,
    * one atomic file replace. No data bytes are read, decrypted, or
    * rewritten (spec-pinned down to file mtimes), so rotating the master
    * over a 100 TB store costs the same as over an empty one. The old
    * master stops opening the store immediately (GCM tag failure). */
  def rotateMaster(basePath: String, oldMaster: String, newMaster: String): Unit =
      withEnvLease(basePath, "Envelope.rotateMaster") {
    requireKey(newMaster, "master key")
    require(!java.nio.file.Files.exists(dekNextFile(basePath)),
      s"a data-key rotation is pending at $basePath — open() resumes it first")
    val f = dekFile(basePath)
    require(java.nio.file.Files.exists(f),
      s"no envelope exists at $basePath — open() first")
    val dek = unwrap(oldMaster, java.nio.file.Files.readAllBytes(f), "the data key")
    atomicWrite(f, wrap(newMaster, dek))
  }

  /** DATA-key rotation — the deep rewrite for a suspected DEK compromise:
    * a fresh DEK re-encrypts every named collection's ciphertext through
    * [[EncryptedStore.rotateKey]]'s per-collection crash-consistent
    * commit. Staged so a crash anywhere leaves a resumable state, never a
    * torn keyspace:
    *   1. `__dek_next` lands first (new DEK + the collection list, wrapped
    *      under the SAME master) — the durable intent record;
    *   2. collections rotate one atomic commit at a time (each is fully
    *      on the old key or fully on the new, never mixed);
    *   3. `__dek` promotes and `__dek_next` drops, LAST.
    * [[open]] resumes from any point: it samples one ciphertext per listed
    * collection to classify rotated-vs-pending (a collection with nothing
    * to sample has nothing a key change could tear) and replays stages
    * 2-3 idempotently. Returns the store keyed by the new DEK. */
  def rotateData(spark: SparkSession, basePath: String, master: String,
                 names: Seq[String]): EncryptedStore =
      withEnvLease(basePath, "Envelope.rotateData") {
    requireKey(master, "master key")
    require(names.nonEmpty, "rotateData needs the collection names to rewrite")
    require(names.forall(n => !n.contains("\n")), "collection names cannot contain newlines")
    require(!java.nio.file.Files.exists(dekNextFile(basePath)),
      s"a data-key rotation is already pending at $basePath — open() resumes it")
    require(java.nio.file.Files.exists(dekFile(basePath)),
      s"no envelope exists at $basePath — open() first")
    stageDataRotation(basePath, master, names): Unit
    resumeRotateData(spark, basePath, master)
    fencedStore(spark, basePath, master,
      unwrap(master, java.nio.file.Files.readAllBytes(dekFile(basePath)), "the data key"))
  }

  /** Stage 1 of [[rotateData]] alone — the durable intent record. Package
    * -private so the crash-resume specs can plant a "crashed right after
    * intent" (and, with [[currentDek]], a "crashed mid-rewrite") state.
    * Returns the new DEK. */
  private[graft] def stageDataRotation(basePath: String, master: String,
                                       names: Seq[String]): String = {
    // validate BEFORE the durable intent record lands: a typo'd name would
    // otherwise wedge every subsequent open() on a failing resume
    names.foreach(n => require(new java.io.File(s"$basePath/$n").isDirectory,
      s"collection $n does not exist at $basePath"))
    val dek = freshDek()
    atomicWrite(dekNextFile(basePath), wrap(master, (dek +: names).mkString("\n")))
    dek
  }

  /** The currently-promoted DEK — crash-simulation seam for the specs. */
  private[graft] def currentDek(basePath: String, master: String): String =
    unwrap(master,
      java.nio.file.Files.readAllBytes(dekFile(basePath)), "the data key")

  /** Which key is `name`'s ciphertext on? Samples ONE row — data rows
    * first, then the centroid sidecar (an empty indexed collection still
    * has centroids) — and GCM-tag-checks it against the candidate key.
    * None when there is no ciphertext to sample (nothing a key change
    * could tear — safe to classify either way). */
  private def onKey(spark: SparkSession, basePath: String, name: String,
                    key: String): Option[Boolean] = {
    def probe(df: DataFrame, ctCol: String): Option[Boolean] =
      df.select(col(ctCol)).limit(1).collect().headOption.map { r =>
        !spark.range(1)
          .select(try_aes_decrypt(
            lit(r.getAs[Array[Byte]](0)), lit(key), lit("GCM")).as("pt"))
          .head().isNullAt(0)
      }
    def hasParquet(f: java.io.File): Boolean = StoreIO.hasParquetFooter(f)
    // COMMITTED dirs only (the liveRaw discipline): a crashed partial
    // append's ciphertext proves nothing about which key the collection
    // is on — rotateKey itself only ever rotates committed dirs, so an
    // uncommitted old-key row sampled from an already-rotated collection
    // would misclassify it as pending and wedge the resume on a
    // new-key-under-old-dek decrypt
    val dataDir = new java.io.File(s"$basePath/$name")
    val committed = StoreIO.committedBatchDirs(dataDir.getPath)
    val withFooter = committed.filter(hasParquet)
    val fromRows =
      if (withFooter.nonEmpty)
        probe(spark.read.option("basePath", dataDir.getPath)
          .parquet(withFooter.map(_.getPath).toIndexedSeq: _*), "doc_ct")
      else if (committed.isEmpty && hasParquet(dataDir))
        // flat (non-batch-keyed) layout — swapped atomically as a whole
        probe(spark.read.parquet(dataDir.getPath), "doc_ct")
      else None
    fromRows.orElse {
      val cents = new java.io.File(s"$basePath/__enc_centroids/$name")
      if (!hasParquet(cents)) None
      else probe(spark.read.parquet(cents.getPath), "cemb_ct")
    }
  }

  /** Stages 2-3 of [[rotateData]], idempotent under replay. */
  private def resumeRotateData(spark: SparkSession, basePath: String,
                               master: String): Unit = {
    val payload = unwrap(master,
      java.nio.file.Files.readAllBytes(dekNextFile(basePath)),
      "the pending data key").split("\n", -1)
    val newDek = payload.head
    val names = payload.tail.toSeq
    val oldDek = unwrap(master,
      java.nio.file.Files.readAllBytes(dekFile(basePath)), "the data key")
    val oldStore = new EncryptedStore(spark, basePath, oldDek)
    names.foreach { name =>
      // finish any interrupted staged publish FIRST — sampling a
      // half-swapped tree could read a stage dir's ciphertext
      oldStore.recoverCollection(name)
      onKey(spark, basePath, name, newDek) match {
        case Some(true) => // already rotated before the crash
        case Some(false) => oldStore.rotateKey(name, newDek): Unit
        case None => // no ciphertext anywhere (fully purged / empty store:
        // rows gone, and only indexed stores have sidecars — those always
        // sample via centroids) — nothing encrypted under either key
      }
    }
    // promote: new DEK becomes THE key only after every collection is on
    // it; a crash right here re-runs the (all-skip) loop and re-promotes
    atomicWrite(dekFile(basePath), wrap(master, newDek))
    java.nio.file.Files.deleteIfExists(dekNextFile(basePath)): Unit
  }

  /** True iff `master` currently unwraps the store at `basePath` — the
    * health check a key-rotation runbook ends with. NEVER throws: a
    * missing envelope, a wrong-length master, a corrupt key file are all
    * exactly the broken states the boolean exists to report. */
  def verifies(basePath: String, master: String): Boolean =
    try {
      requireKey(master, "master key")
      unwrap(master,
        java.nio.file.Files.readAllBytes(dekFile(basePath)), "the data key")
      true
    } catch { case scala.util.control.NonFatal(_) => false }
}
