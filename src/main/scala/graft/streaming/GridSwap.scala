package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

/** The publish step shared by every sum-merge streaming twin: the
  * micro-batch writes the merged grid to `<table>.tmp`, then the live
  * `<table>` directory is swapped to it. Previously each twin did
  * `deleteDirectory(live); tmp.renameTo(live)` and IGNORED renameTo's
  * boolean — if the rename failed after the delete, the maintained grid
  * was silently lost and the next micro-batch restarted from empty,
  * breaking stream==batch with no error (r15 ADVICE). `Files.move`
  * throws on failure, so a lost grid is now a loud foreachBatch error
  * that fails the StreamingQuery instead of a silent reset.
  *
  * ATOMIC_MOVE is attempted first (same filesystem: one rename syscall,
  * readers never observe a missing table); if the filesystem refuses
  * atomic directory moves, plain move still throws on failure.
  */
object GridSwap {
  def swap(tmp: String, table: String): Unit = {
    val live = new java.io.File(table)
    if (live.exists) org.apache.commons.io.FileUtils.deleteDirectory(live)
    try
      Files.move(Paths.get(tmp), Paths.get(table), StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(Paths.get(tmp), Paths.get(table))
    }
    ()
  }
}
