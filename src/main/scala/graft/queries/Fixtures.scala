package graft.queries

import org.apache.spark.sql.SparkSession

/** Fingerprint-marker fixture protocol, shared by every derived
  * on-disk fixture (partitioned fact, dedup signature store): a
  * `_GRAFT_COMPLETE` marker inside the fixture dir records the
  * FINGERPRINT of what built it (source file size+mtime + builder
  * version/params), not mere existence — a regenerated sf dataset or
  * a changed builder rebuilds instead of silently serving stale data
  * against a fresh oracle. Idempotent re-calls cost two filesystem
  * stats.
  */
private[queries] object Fixtures {

  /** Size+mtime stamp of a source file/dir for fingerprints. */
  def sourceStamp(spark: SparkSession, srcPath: String): String = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(srcPath)
    val st = p.getFileSystem(hconf).getFileStatus(p)
    s"${st.getLen}:${st.getModificationTime}"
  }

  /** Rebuild `path` via `build` unless its marker already records
    * `fingerprint`; the stale dir is deleted first (dynamic-overwrite
    * builders would otherwise leave mixed-generation partitions).
    *
    * Cross-process safe: two JVMs racing through the same sf dir's
    * fixture (e.g. verify and bench) would interleave delete/build/
    * marker and leave a corrupt fixture, so the whole check-and-build
    * runs under an OS file lock next to the fixture dir; the loser
    * blocks, re-reads the fresh marker, and skips. (Local-filesystem
    * lock — fixtures live under /tmp by convention.) */
  /** Same-JVM serialization per path: OS file locks are held per
    * JVM, so a second THREAD hitting the same fixture would get
    * OverlappingFileLockException instead of blocking — take a
    * process-local monitor first. */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def ensure(spark: SparkSession, path: String, fingerprint: String)
            (build: => Unit): Unit =
    jvmLocks.computeIfAbsent(path, _ => new Object).synchronized {
      ensureLocked(spark, path, fingerprint)(build)
    }

  // ------------------------------------------------------------------
  // Build-once PRISTINE master stores the operation gates branch from
  // — the bench's fixture-containment mechanism (GQuery.prepare): a
  // DML gate's assertions measure the OPERATION, but its body used to
  // re-pay the store-seeding IO (several appends of source-table
  // slices) on every timed rep. The seeding now lands once per JVM in
  // an untimed prepare ([[master]]), and the timed body takes a fresh
  // mutable branch ([[branch]]) — one METADATA-ONLY commit
  // (TableStore.shallowClone: the branch's v1 re-references the
  // master's files by absolute path, no data moves) — so each rep
  // mutates its own store for the cost of one log write.
  //
  // Contract for gates using this: the branch's history starts at v1
  // (one clone commit holding every master file), so bodies and
  // oracles must not reference the master's internal version numbers;
  // pruning is unaffected (clone entries carry the master's logged
  // stats); COW mutations never touch master files (TableStoreSpec
  // pins this); gates that PHYSICALLY delete files (vacuum) must not
  // branch — a swept master would poison later reps — and stay
  // documented as timing their fixtures on purpose. Verify stays
  // self-sufficient: [[branch]] builds the master lazily when no
  // prepare ran.
  // ------------------------------------------------------------------

  private val masters =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The pristine master for `key` at this sf dir — built once per
    * JVM (pinned scratch dir: survives the between-queries sweep),
    * returned thereafter. `build` must only APPEND — the master is
    * shared by every rep's branch. */
  def master(s: SparkSession, d: String, key: String)
            (build: String => Unit): String =
    masters.computeIfAbsent(s"$key|$d", _ => {
      val root = graft.TempRoots.createPinned(s"graft_fix_$key") + "/t"
      build(root)
      root
    })

  /** A fresh mutable branch of the master: shallowClone into a
    * normally-swept scratch root — the body pays one metadata commit
    * plus the measured operation, never the seeding IO. */
  def branch(s: SparkSession, d: String, key: String)
            (build: String => Unit): String = {
    val m = master(s, d, key)(build)
    val dst = graft.TempRoots.create(s"graft_br_$key") + "/t"
    graft.ops.TableStore.shallowClone(s, m, dst)
    dst
  }

  private def ensureLocked(spark: SparkSession, path: String,
                           fingerprint: String)(build: => Unit): Unit = {
    val lockPath = java.nio.file.Paths.get(s"$path.lock")
    java.nio.file.Files.createDirectories(lockPath.getParent)
    val ch = java.nio.channels.FileChannel.open(lockPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val lock = ch.lock() // blocks until a racing builder finishes
    try {
      val hconf = spark.sparkContext.hadoopConfiguration
      val marker = new org.apache.hadoop.fs.Path(s"$path/_GRAFT_COMPLETE")
      val fs = marker.getFileSystem(hconf)
      val current =
        if (!fs.exists(marker)) None
        else {
          val in = fs.open(marker)
          try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
        }
      if (!current.contains(fingerprint)) {
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        build
        val out = fs.create(marker, true)
        try out.write(fingerprint.getBytes("UTF-8")) finally out.close()
      }
    } finally {
      lock.release()
      ch.close()
    }
  }
}
