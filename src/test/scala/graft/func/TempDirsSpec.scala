package graft.func

import org.scalatest.funsuite.AnyFunSuite

class TempDirsSpec extends AnyFunSuite {

  test("cached: one directory per tag, stable across calls") {
    val a = TempDirs.cached("graft_test_tempdirs_a")
    val b = TempDirs.cached("graft_test_tempdirs_b")
    assert(a !== b)
    assert(TempDirs.cached("graft_test_tempdirs_a") === a)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(a)))
  }

  test("cached: concurrent first use converges on one directory, no orphans") {
    // 16 threads race the same fresh tag; all must observe the SAME
    // path, and any loser's directory must be cleaned up immediately
    // (the pre-fix TrieMap.getOrElseUpdate leaked it until JVM exit)
    val tag = s"graft_test_tempdirs_race_${System.nanoTime()}"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val results = (1 to 16).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = { gate.await(); TempDirs.cached(tag) }
        })
      }
      gate.countDown()
      val paths = results.map(_.get()).toSet
      assert(paths.size === 1, s"racers saw distinct dirs: $paths")
      // losing directories were deleted: the temp root holds exactly
      // one entry for this tag prefix
      val root = java.nio.file.Paths.get(paths.head).getParent
      val stream = java.nio.file.Files.list(root)
      val survivors =
        try {
          val it = stream.iterator()
          var n = 0
          while (it.hasNext) {
            if (it.next().getFileName.toString.startsWith(tag)) n += 1
          }
          n
        } finally stream.close()
      assert(survivors === 1, "loser temp directories must be removed")
    } finally pool.shutdown()
  }
}
