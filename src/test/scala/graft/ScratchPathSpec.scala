package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression spec for the r17/r18 cross-JVM path races: every
  * per-run side file a query writes must live under a PID-SCOPED
  * root, never a flat name-keyed /tmp path two concurrent graft JVMs
  * (a Verify beside a Bench, overlapping harness runs) would share.
  * The checkpoint root learned this in commit 88e913e ("Race while
  * writing batch 0"); the st_asof_serve warm write escaped that sweep
  * with the identical hazard — this lint keeps the class closed.
  */
class ScratchPathSpec extends AnyFunSuite {

  test("StreamOps.scratchPath is pid-scoped") {
    val live = java.lang.ProcessHandle.current().pid()
    val p = graft.streaming.StreamOps.scratchPath("lint-probe")
    assert(p.contains(s"pid-$live"),
      s"scratch path $p does not carry this JVM's pid segment")
  }

  test("no main source writes a flat name-keyed /tmp/graft path") {
    // The only legitimate flat /tmp/graft paths are the two
    // deliberately CROSS-JVM staged-input caches in StreamOps (guarded
    // by atomic temp-sibling rename + _SUCCESS) and the warehouse dir
    // (catalog metadata only — managed-table DDL is never run
    // concurrently by the harness).
    val allowed = Set(
      "streaming/StreamOps.scala", // /tmp/graft-stream staged caches
      "GraftSession.scala"         // spark.sql.warehouse.dir
    )
    // anchor on user.dir (sbt sets it to the project root) instead of
    // assuming a bare relative path resolves; fail loudly if the tree
    // is not where the fork put us rather than silently walking nothing
    val root = java.nio.file.Paths.get(
      sys.props("user.dir"), "src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(root),
      s"lint source root not found at $root — test JVM cwd moved?")
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val walk = java.nio.file.Files.walk(root)
    try walk.forEach { p =>
      val rel = root.relativize(p).toString
      if (rel.endsWith(".scala") && !allowed.contains(rel)) {
        val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        src.linesIterator.zipWithIndex.foreach { case (line, i) =>
          if (line.contains("\"/tmp/graft") && !line.trim.startsWith("//"))
            offenders += s"$rel:${i + 1}"
        }
      }
    } finally walk.close()
    assert(offenders.isEmpty,
      s"flat /tmp/graft paths outside the allowed staged caches: " +
        offenders.mkString(", "))
  }
}
