package graft.sources

/** Per-process scratch directories for round-trip sources and bucketed
  * layouts. Queries that materialize to local disk (CSV/JSONL round-trips,
  * bucketed tables) must never share a directory across JVMs: the write is
  * eager but the read-back is lazy, so a concurrent Verify/Bench pair on
  * the same SF would race overwrite-vs-read (the reader lists files, the
  * other process's overwrite deletes them mid-scan).
  */
object Scratch {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Delete `dir` recursively at JVM exit. Per-process scratch must not
    * outlive its process: `mode("overwrite")` never reclaims ANOTHER
    * process's directory, so without this every verify/bench run leaves
    * dead copies under /tmp until the disk fills. */
  def deleteOnExit(dir: String): Unit =
    if (registered.add(dir)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(dir))
      }))
      ()
    }

  /** `/tmp/graft_<kind>/<sf-basename>_p<pid>/<name>`, registered for
    * exit-time cleanup. The PID suffix is what makes the layout safe
    * under concurrent processes; within one JVM the (kind, sf, name)
    * triple is already unique per query. */
  def dir(kind: String, sfDir: String, name: String): String = {
    val sf = new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9]", "_") +
      "_p" + ProcessHandle.current().pid()
    val base = s"/tmp/graft_$kind/$sf"
    deleteOnExit(base)
    s"$base/$name"
  }
}
