package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit coverage for the lease protocol edges that CatalogSpec's
  * integration tests can't reach deterministically: the heartbeat's
  * stop-the-world pause fence (injectable clock), the atomic
  * rename-based stale reclaim, and mid-body loss detection via the
  * [[WriterLease.Handle]].
  */
class WriterLeaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def leaseFile(base: String) = new java.io.File(base, "_writer.lease")

  private def writeForeign(base: String, token: String = "foreign#1#x"): java.io.File = {
    val f = leaseFile(base)
    java.nio.file.Files.write(f.toPath, s"$token\nspec\n".getBytes("UTF-8"))
    f
  }

  /** Body that waits (bounded) for the heartbeat to trip the lost flag. */
  private def waitForLoss(h: WriterLease.Handle): String = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (System.nanoTime() < deadline) {
      try h.assertHeld()
      catch { case _: IllegalStateException => return "lost-observed" }
      Thread.sleep(10)
    }
    "never-lost"
  }

  test("pause fence: a > staleMs pause between verify and rewrite surrenders the lease") {
    val base = TempDirs.create("lease_fence_prewrite")
    // clock: heartbeat's verify stamps t0, the pre-write fence check
    // then sees staleMs+1 ms elapsed — simulating a stop-the-world
    // pause between the ownership verify and the non-exclusive rewrite
    val calls = new java.util.concurrent.atomic.AtomicLong(0)
    val t = 1000000L
    val staleMs = 300L
    val clock = () => if (calls.incrementAndGet() == 1) t else t + staleMs + 1
    val e = intercept[IllegalStateException] {
      WriterLease.run(spark, base, "fence-test", staleMs, clock)(waitForLoss)
    }
    assert(e.getMessage.contains("reclaimed mid-mutation"))
    // surrendered cleanly: no rewrite happened, and the still-ours file
    // was dropped so the path unblocks immediately, not after staleMs
    assert(!leaseFile(base).exists())
    // a new writer acquires right away
    WriterLease.withLease(spark, base, "after-fence") { () }
    assert(!leaseFile(base).exists())
  }

  test("pause fence: a > staleMs pause DURING the rewrite surrenders too") {
    val base = TempDirs.create("lease_fence_postwrite")
    val calls = new java.util.concurrent.atomic.AtomicLong(0)
    val t = 1000000L
    val staleMs = 300L
    // verify at t, pre-write check at t+1 (passes), post-write check at
    // t+staleMs+1 — the pause hit inside the rewrite itself
    val clock = () => calls.incrementAndGet() match {
      case 1 => t
      case 2 => t + 1
      case _ => t + staleMs + 1
    }
    val e = intercept[IllegalStateException] {
      WriterLease.run(spark, base, "fence-test-2", staleMs, clock)(waitForLoss)
    }
    assert(e.getMessage.contains("reclaimed mid-mutation"))
    assert(!leaseFile(base).exists())
  }

  test("stale reclaim is rename-based and leaves no tombstone behind") {
    val base = TempDirs.create("lease_reclaim_rename")
    val f = writeForeign(base)
    assert(f.setLastModified(System.currentTimeMillis() - 2 * WriterLease.DefaultStaleMs))
    var ran = false
    WriterLease.withLease(spark, base, "reclaim-test") { ran = true }
    assert(ran)
    assert(!f.exists())
    val leftovers = new java.io.File(base).listFiles()
      .filter(_.getName.startsWith("_writer.lease"))
    assert(leftovers.isEmpty,
      s"reclaim must clean its tombstone: ${leftovers.map(_.getName).mkString(", ")}")
  }

  test("a reclaim that loses the rename race fails loudly against the winner's fresh lease") {
    val base = TempDirs.create("lease_reclaim_lost_race")
    // simulate the loser's view: by the time this writer acts, the
    // stale file was already replaced by the race winner's FRESH lease
    writeForeign(base, "winner#2#y")
    val e = intercept[IllegalStateException] {
      WriterLease.withLease(spark, base, "loser") { () }
    }
    assert(e.getMessage.contains("another writer holds the lease"))
    assert(e.getMessage.contains("winner#2#y"))
  }

  test("mid-body loss: a foreign overwrite trips the handle before release") {
    val base = TempDirs.create("lease_midbody_loss")
    val staleMs = 300L
    val e = intercept[IllegalStateException] {
      WriterLease.withLeaseHandle(spark, base, "loss-test", staleMs) { h =>
        writeForeign(base, "usurper#3#z") // reclaimed from under us
        val r = waitForLoss(h)
        assert(r == "lost-observed")
        r
      }
    }
    assert(e.getMessage.contains("reclaimed mid-mutation"))
    // the usurper's file must NOT be deleted by our release
    assert(leaseFile(base).exists())
    assert(new String(java.nio.file.Files.readAllBytes(leaseFile(base).toPath), "UTF-8")
      .startsWith("usurper#3#z"))
  }
}
