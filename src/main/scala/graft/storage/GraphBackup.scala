package graft.storage

import java.nio.file.{Files, Path, Paths}
import java.security.{MessageDigest, SecureRandom}
import javax.crypto.{Cipher, SecretKeyFactory}
import javax.crypto.spec.{GCMParameterSpec, PBEKeySpec, SecretKeySpec}

import org.apache.spark.sql.SaveMode

/** Full-graph export/import (robosystems/operations/lbug/
  * backup_manager.py full-DB `.lbug` export; backup.py:467). Spark
  * shape: one parquet dataset per table under a destination root —
  * restorable into a fresh GraphStore, portable to object storage.
  *
  * Encrypted variant (backup_manager.py's encrypted backups):
  * AES-256-GCM per data file with a PBKDF2-derived key, plus a
  * manifest of ciphertext SHA-256s — wrong password and bit-rot both
  * fail loudly (GCM tag / digest mismatch), never as silent garbage
  * rows. Files are encrypted in an executor-side pass (`parallelize`
  * over the file list), so the work distributes wherever the backup
  * root is shared storage. */
object GraphBackup {

  /** Export every materialized table; returns (table, rows) pairs. */
  def exportGraph(store: GraphStore, destRoot: String): Seq[(String, Long)] = {
    val nodeCounts = store.schema.nodes.flatMap { n =>
      val df = store.node(n.name)
      val c = df.count()
      if (c > 0) {
        df.write.mode(SaveMode.Overwrite).parquet(s"$destRoot/nodes/${n.name}")
        Some(s"nodes/${n.name}" -> c)
      } else None
    }
    val relCounts = store.schema.rels.flatMap { r =>
      val df = store.rel(r.name)
      val c = df.count()
      if (c > 0) {
        df.write.mode(SaveMode.Overwrite).parquet(s"$destRoot/rels/${r.name}")
        Some(s"rels/${r.name}" -> c)
      } else None
    }
    nodeCounts ++ relCounts
  }

  /** Restore an export into a (fresh) graph id under the store root. */
  def importGraph(
      store: GraphStore, srcRoot: String): Seq[(String, Long)] = {
    def existing(path: String) = new java.io.File(path).exists()
    val nodes = store.schema.nodes.flatMap { n =>
      val p = s"$srcRoot/nodes/${n.name}"
      if (existing(p))
        Some(s"nodes/${n.name}" ->
          store.ingestNodes(n.name, store.spark.read.parquet(p),
            Some("restore"), ignoreErrors = true))
      else None
    }
    val rels = store.schema.rels.flatMap { r =>
      val p = s"$srcRoot/rels/${r.name}"
      if (existing(p))
        Some(s"rels/${r.name}" ->
          store.ingestRels(r.name, store.spark.read.parquet(p), Some("restore")))
      else None
    }
    nodes ++ rels
  }

  // ---- encrypted variant ---------------------------------------------------

  private val PbkdfIterations = 65536
  private val GcmTagBits = 128
  private val IvBytes = 12

  private def deriveKey(password: String, salt: Array[Byte]): Array[Byte] =
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(new PBEKeySpec(password.toCharArray, salt, PbkdfIterations, 256))
      .getEncoded

  private def cipher(mode: Int, key: Array[Byte], iv: Array[Byte]): Cipher = {
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new GCMParameterSpec(GcmTagBits, iv))
    c
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  private def sha256(bytes: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(bytes))

  private def dataFiles(root: Path): Seq[Path] = {
    val s = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_")
          && !p.getFileName.toString.startsWith("."))
        .toSeq
    } finally s.close()
  }

  /** Export then encrypt every data file in place (`<file>.enc`,
    * IV-prefixed AES-GCM) and write `manifest.json` carrying the KDF
    * salt and each ciphertext's SHA-256. */
  def exportGraphEncrypted(
      store: GraphStore, destRoot: String, password: String): Seq[(String, Long)] = {
    val counts = exportGraph(store, destRoot)
    val salt = new Array[Byte](16)
    new SecureRandom().nextBytes(salt)
    val key = deriveKey(password, salt)
    val root = Paths.get(destRoot)
    val files = dataFiles(root).map(_.toString)
    // Executor-side pass, RETRY-SAFE: tasks only ADD files (tmp write +
    // atomic move — a retried attempt re-reads the intact plaintext and
    // replaces the partial .enc); the destructive step (plaintext
    // delete) happens on the driver only after every seal succeeded AND
    // the manifest is durable. Caveat: task speculation could race two
    // IVs for one file — run backup jobs unspeculated (default here).
    val digests = store.spark.sparkContext
      .parallelize(files, math.max(1, files.size)).map { f =>
        val p = Paths.get(f)
        val plain = Files.readAllBytes(p)
        val iv = new Array[Byte](IvBytes)
        new SecureRandom().nextBytes(iv)
        val sealed0 = cipher(Cipher.ENCRYPT_MODE, key, iv).doFinal(plain)
        val out = iv ++ sealed0
        val tmp = Paths.get(f + ".enc.tmp")
        Files.write(tmp, out)
        Files.move(tmp, Paths.get(f + ".enc"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        (f + ".enc", sha256(out))
      }.collect().toSeq
    val manifest = digests.map { case (f, d) =>
      s"""    {"file": "${root.relativize(Paths.get(f))}", "sha256": "$d"}"""
    }.mkString(
      s"""{\n  "salt": "${hex(salt)}",\n  "files": [\n""", ",\n", "\n  ]\n}\n")
    Files.write(root.resolve("manifest.json"), manifest.getBytes("UTF-8"))
    Files.write(root.resolve("manifest.salt"), salt)
    files.foreach(f => Files.delete(Paths.get(f))) // plaintexts, post-manifest
    counts
  }

  /** Verify every ciphertext digest against the manifest, then decrypt
    * into `workDir` (a scratch restore area — NEVER the backup itself:
    * decrypting in place would silently convert the at-rest encrypted
    * archive to plaintext on its own read path) and import from there.
    * The source archive is read-only throughout, so a wrong password
    * (GCM tag failure) or a tampered file (digest mismatch, caught
    * before that file is decrypted) leaves it fully intact and
    * manifest-consistent. `workDir` is deleted after import. */
  def importGraphEncrypted(
      store: GraphStore, srcRoot: String, password: String,
      workDir: Option[String] = None): Seq[(String, Long)] = {
    val root = Paths.get(srcRoot)
    val salt = Files.readAllBytes(root.resolve("manifest.salt"))
    val manifest = new String(
      Files.readAllBytes(root.resolve("manifest.json")), "UTF-8")
    val expected = """"file": "([^"]+)", "sha256": "([0-9a-f]+)"""".r
      .findAllMatchIn(manifest).map(m => m.group(1) -> m.group(2)).toMap
    val key = deriveKey(password, salt)
    val files = dataFiles(root)
      .filter(_.getFileName.toString.endsWith(".enc")).map(_.toString)
    // verify the whole manifest BEFORE decrypting anything — BOTH ways:
    // every on-disk file must match its digest, and every manifest
    // entry must still exist (a deleted part-file would otherwise
    // restore a silently partial graph)
    val onDisk = files.map(f => root.relativize(Paths.get(f)).toString).toSet
    val missing = expected.keySet -- onDisk
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"backup integrity failure: manifest files missing from archive: " +
          missing.toSeq.sorted.mkString(", "))
    files.foreach { f =>
      val rel = root.relativize(Paths.get(f)).toString
      val want = expected.getOrElse(rel,
        throw new IllegalStateException(s"backup file not in manifest: $rel"))
      val got = sha256(Files.readAllBytes(Paths.get(f)))
      if (got != want)
        throw new IllegalStateException(
          s"backup integrity failure for $rel: digest $got != manifest $want")
    }
    val work = Paths.get(workDir.getOrElse(
      Files.createTempDirectory("graft-restore").toString))
    val (rootStr, workStr) = (root.toString, work.toString)
    try {
      store.spark.sparkContext
        .parallelize(files, math.max(1, files.size)).foreach { f =>
          val p = Paths.get(f)
          val rel = Paths.get(rootStr).relativize(p).toString.stripSuffix(".enc")
          val sealed0 = Files.readAllBytes(p)
          val iv = sealed0.take(IvBytes)
          val plain = cipher(Cipher.DECRYPT_MODE, key, iv)
            .doFinal(sealed0.drop(IvBytes)) // throws AEADBadTagException on wrong key
          val out = Paths.get(workStr).resolve(rel)
          Files.createDirectories(out.getParent)
          Files.write(out, plain)
        }
      importGraph(store, workStr)
    } finally {
      // scratch plaintext is removed on BOTH success and decrypt
      // failure (a wrong password must not leak partial plaintext)
      val s = Files.walk(work)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      } finally s.close()
    }
  }
}
