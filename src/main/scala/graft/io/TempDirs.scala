package graft.io

import java.nio.file.{Files, Path}
import java.util.Comparator

/**
 * Process-scoped temp directories with shutdown cleanup: the round-trip
 * queries and StreamGate stage full table copies per invocation, and bare
 * `Files.createTempDirectory` would leak them across repeated Verify/Bench
 * runs until /tmp fills.
 */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => purge(), "graft-tempdir-purge"))

  def create(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    dirs.add(d)
    d
  }

  def purge(): Unit = {
    var d = dirs.poll()
    while (d != null) {
      try
        Files.walk(d).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { try Files.deleteIfExists(p) catch { case _: Exception => () } })
      catch { case _: Exception => () }
      d = dirs.poll()
    }
  }
}
