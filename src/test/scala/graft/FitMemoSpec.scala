package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the fit-memo contract (VERDICT r8 #5 / ADVICE r8): the per-dir
  * fit memos that made the langid/PQ families 2x faster must not become a
  * driver-memory leak in a long-lived service, must re-fit when the dir's
  * data is regenerated, and must report their one-time fit cost so the
  * bench artifact can carry it explicitly (`fit_sec`). */
class FitMemoSpec extends AnyFunSuite {
  private def tmpDir(): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("fitmemo")
    d.toFile.deleteOnExit()
    d
  }

  test("fit runs once per (dir, mtime); repeat calls are cache hits") {
    val memo = new graft.util.FitMemo[String]("spec_once")
    val d = tmpDir().toString
    var fits = 0
    def fit(): String = { fits += 1; s"model$fits" }
    assert(memo.getOrFit(d)(fit()) == "model1")
    assert(memo.getOrFit(d)(fit()) == "model1")
    assert(fits == 1)
    assert(memo.size == 1)
  }

  test("regenerated data (mtime bump) forces a re-fit — no stale serving") {
    val memo = new graft.util.FitMemo[String]("spec_stale")
    val d = tmpDir()
    val f = d.resolve("part-0.parquet")
    java.nio.file.Files.write(f, "v1".getBytes)
    var fits = 0
    def fit(): String = { fits += 1; s"model$fits" }
    assert(memo.getOrFit(d.toString)(fit()) == "model1")
    // rewrite the dataset with a strictly newer mtime (filesystem mtime
    // granularity can be 1s — set it explicitly rather than sleeping)
    java.nio.file.Files.write(f, "v2".getBytes)
    java.nio.file.Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 5000))
    assert(memo.getOrFit(d.toString)(fit()) == "model2")
    assert(fits == 2)
  }

  test("entries are bounded: oldest evicted past maxEntries") {
    val memo = new graft.util.FitMemo[Int]("spec_bound", maxEntries = 3)
    val dirs = (1 to 5).map(_ => tmpDir().toString)
    dirs.zipWithIndex.foreach { case (d, i) => memo.getOrFit(d)(i) }
    assert(memo.size == 3, "memo must cap at maxEntries")
    // the two oldest dirs were evicted — refitting them is a miss
    var refits = 0
    memo.getOrFit(dirs.head) { refits += 1; 99 }
    assert(refits == 1)
    // the newest dir is still cached
    memo.getOrFit(dirs.last) { refits += 1; 98 }
    assert(refits == 1)
  }

  test("fit wall time is recorded per memo name for the bench artifact") {
    graft.util.FitMemo.resetFitSeconds()
    val memo = new graft.util.FitMemo[String]("spec_fitsec")
    val d = tmpDir().toString
    memo.getOrFit(d) { Thread.sleep(15); "m" }
    memo.getOrFit(d)("never") // hit — must not add time
    val rec = graft.util.FitMemo.fitSeconds
    assert(rec.contains("spec_fitsec"))
    assert(rec("spec_fitsec") >= 0.010)
  }

  test("concurrent getOrFit on one dir fits exactly once") {
    val memo = new graft.util.FitMemo[String]("spec_conc")
    val d = tmpDir().toString
    val fits = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val futs = (1 to 8).map { _ =>
      pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String =
          memo.getOrFit(d) { fits.incrementAndGet(); "m" }
      })
    }
    futs.foreach(f => assert(f.get() == "m"))
    pool.shutdown()
    assert(fits.get() == 1)
  }
}
