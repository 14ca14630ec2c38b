package graft

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

/** Per-process registry for the registry queries' scratch stores.
  *
  * Every per-run fixture (a TableStore bootstrap, a BPE model dir, a
  * streaming checkpoint) used to come from a bare
  * `Files.createTempDirectory` and was never deleted — a full bench
  * run leaves gigabytes of orphaned stores in /tmp, repeated runs
  * accumulate without bound, and the in-run churn lands as page-cache
  * pressure on exactly the disk-heavy queries that sort last in the
  * bench sequence (the r10 end-of-run drift cluster). Three levers
  * close that:
  *
  *  - every scratch dir lives under ONE per-process root
  *    (`graft_run_<pid>`) that a shutdown hook deletes, so a normal
  *    exit leaves nothing;
  *  - stale roots from crashed JVMs (pid no longer alive) are swept
  *    the first time any process allocates, so crashes self-heal on
  *    the next run instead of leaking forever;
  *  - long-lived harnesses (Bench, Verify) call [[sweepCreated]]
  *    between queries to reclaim finished queries' scratch MID-run —
  *    a dir is only ever referenced by the frame returned from its
  *    own query body, so once that frame has been fully consumed the
  *    tree is dead weight.
  */
object TempRoots {

  private val Prefix = "graft_run_"
  private val created = new ConcurrentLinkedQueue[Path]()

  private lazy val root: Path = {
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    sweepStale(tmp)
    val r = Files.createDirectories(
      tmp.resolve(s"$Prefix${ProcessHandle.current().pid()}"))
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteTree(r), "graft-temproots-sweep"))
    r
  }

  /** A fresh scratch directory (prefix `tag`) under the per-process
    * root: deleted at JVM exit, reclaimable mid-run via
    * [[sweepCreated]]. Drop-in for `Files.createTempDirectory`. */
  def create(tag: String): String = {
    val p = Files.createTempDirectory(root, tag)
    created.add(p)
    p.toString
  }

  /** A scratch dir EXCLUDED from [[sweepCreated]] — for CROSS-QUERY
    * fixtures (the bench-prepare master stores gate bodies branch
    * from): it must survive the between-queries sweep, and is still
    * reclaimed by the per-process shutdown hook / stale-pid sweep
    * like everything else under the root. */
  def createPinned(tag: String): String =
    Files.createTempDirectory(root, tag).toString

  /** Delete every dir handed out since the last sweep — called by the
    * harnesses BETWEEN queries (after the previous query's frame has
    * been fully consumed; never while one is pending). Deletion cost
    * lands outside any timed window. */
  def sweepCreated(): Unit = {
    var p = created.poll()
    while (p != null) { deleteTree(p); p = created.poll() }
  }

  /** Roots left by JVMs that are no longer alive. A live pid whose
    * process isn't ours is left alone — concurrent runs coexist. */
  private def sweepStale(tmp: Path): Unit = {
    val self = ProcessHandle.current().pid()
    val dirs =
      try Files.list(tmp).filter(p =>
        p.getFileName.toString.startsWith(Prefix)).toArray(Array.ofDim[Path](_))
      catch { case _: Exception => Array.empty[Path] }
    dirs.foreach { d =>
      val pid = d.getFileName.toString.stripPrefix(Prefix)
      val alive = pid.toLongOption.exists(p =>
        p == self || ProcessHandle.of(p).map[Boolean](_.isAlive).orElse(false))
      if (!alive) deleteTree(d)
    }
  }

  /** Reverse-order recursive delete; errors swallowed (a sweep must
    * never fail the work that triggered it). */
  private def deleteTree(p: Path): Unit =
    try {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      finally s.close()
    } catch { case _: Exception => () }
}
