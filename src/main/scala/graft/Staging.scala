package graft

import org.apache.spark.sql.DataFrame

/** Staged-directory hygiene for queries that write a temp layout (or a
  * streaming sink) and return a DataFrame reading it back (q69/q74/q79/
  * q82/q84/q89, streaming q68/q83/q92/q99).
  *
  * DataFrames are lazy, so a returned plan that scans a staged directory
  * needs that directory to outlive the call. Earlier rounds solved this
  * by collecting the (small) final aggregate to the driver and deleting
  * the dir eagerly — correct but driver-bounded, and it turned every
  * round-trip result into a LocalRelation instead of a distributed scan
  * (round-4 verdict item 1). The replacement is DEFERRED deletion:
  *
  *   - each staged dir is registered under its query key; registering a
  *     NEW dir for the same key deletes the previous one (so bench
  *     warm-up + timed runs, and repeated Verify invocations, never
  *     accumulate more than one live dir per query);
  *   - a JVM shutdown hook removes whatever is still registered at exit.
  *
  * The returned DataFrame therefore stays distributed end-to-end: the
  * driver never materializes result rows, and `.explain` on a round-trip
  * query shows a real FileScan, not a LocalTableScan. The one contract
  * callers accept: re-running the same query invalidates DataFrames
  * returned by its previous run (they'd scan a deleted dir) — the
  * harness consumes each result before re-running, and a long-lived
  * session holds at most one staged dir per query key.
  */
object Staging {

  private val live = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val hook = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Recursively delete a local staging directory. Symlinks are removed
    * as entries, never followed (Files.walk does not descend into them),
    * so staged input links to read-only test data are safe. */
  def deleteRecursively(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
  }

  /** Register `tmpDir` as the live staged dir for `key`, deleting the
    * dir a previous run of the same key left behind. Installs the
    * at-exit sweeper on first use. */
  def retireOnReuse(key: String, tmpDir: String): Unit = {
    if (hook.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        live.values().forEach(d => deleteRecursively(d))))
    Option(live.put(key, tmpDir)).foreach(deleteRecursively)
  }

  /** Return `out` (whose plan scans `tmpDir`) unchanged, with `tmpDir`'s
    * deletion deferred to the next run of `key` or JVM exit. The result
    * stays a distributed scan — no driver materialization. */
  def deferDelete(out: DataFrame, tmpDir: String, key: String): DataFrame = {
    retireOnReuse(key, tmpDir)
    out
  }
}
