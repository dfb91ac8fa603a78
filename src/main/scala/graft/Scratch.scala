package graft

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

/** RAM-backed scratch directories with JVM-exit cleanup.
  *
  * Throwaway warehouses/sinks prefer tmpfs (/dev/shm): they measure
  * engine semantics, not disk. tmpfs files count against host RAM and
  * outlive the process, so every scratch dir is registered for recursive
  * deletion on JVM exit — repeated verify/bench runs must not accumulate
  * resident files.
  */
object Scratch {

  private val cleanupQueue = new ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var p = cleanupQueue.poll()
    while (p != null) {
      deleteRecursively(p)
      p = cleanupQueue.poll()
    }
  }))

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p))
        Files.list(p).forEach(deleteRecursively)
      Files.deleteIfExists(p)
    } catch { case _: Throwable => () } // best-effort: never fail exit
  }

  private lazy val base: Path =
    Seq("/dev/shm", System.getProperty("java.io.tmpdir"))
      .map(Paths.get(_))
      .find(p => Files.isDirectory(p) && Files.isWritable(p)).get

  /** Fresh scratch directory, deleted on JVM exit. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(base, prefix)
    cleanupQueue.add(p)
    p.toString
  }
}
