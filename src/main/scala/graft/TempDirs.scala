package graft

/** JVM-lifetime temp directories with cleanup that actually works:
  * `File.deleteOnExit` is a plain `delete()` at exit — a silent no-op on
  * a non-empty directory — so query-registry state dirs registered
  * through it leak across runs. One shutdown hook walks every
  * registered tree bottom-up instead. */
object TempDirs {
  private val registered =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() =>
    registered.forEach { dir =>
      try {
        val p = java.nio.file.Paths.get(dir)
        if (java.nio.file.Files.exists(p)) {
          val s = java.nio.file.Files.walk(p)
          try s.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
          finally s.close()
        }
      } catch { case _: Exception => () } // exit-path cleanup: best effort
    }))

  /** Create a temp directory deleted (recursively) at JVM exit. */
  def create(prefix: String): String = {
    hook
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    registered.add(dir)
    dir
  }
}
