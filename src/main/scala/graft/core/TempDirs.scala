package graft.core

/** Temp-dir registry for gate queries that materialize fixtures on
  * disk (q72/q73/q76/q77): every dir created here is deleted on JVM
  * exit, so a min-of-3 bench or a long Verify session doesn't
  * accumulate full corpus copies in /tmp (ADVICE r5). Deletion runs at
  * shutdown — after every query action has consumed its data. */
object TempDirs {

  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(p => delete(p.toFile))
    }))

  private def delete(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(delete)
    f.delete()
    ()
  }

  /** Create a temp dir that is deleted on JVM exit. */
  def create(prefix: String): String = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }
}
