package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession

/** The spill-headroom guard on the default `spark.local.dir` choice:
  * tmpfs spill is RAM, so the /dev/shm default must degrade to the
  * disk-backed JVM tmpdir when the store cannot offer real headroom —
  * never OOM a 100 TB-shaped spill because a box's shm was small or full.
  */
class GraftSessionSpec extends AnyFunSuite {

  test("headroom guard mirrors the store's usable space against the 8 GiB bar") {
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val usable = java.nio.file.Files.getFileStore(tmp).getUsableSpace
    assert(GraftSession.hasSpillHeadroom(tmp) ===
      (usable >= GraftSession.ShmMinFreeBytes))
    assert(GraftSession.ShmMinFreeBytes === (8L << 30))
  }

  test("headroom guard fails CLOSED (disk fallback) on an unreadable store") {
    assert(!GraftSession.hasSpillHeadroom(
      java.nio.file.Paths.get("/graft_no_such_store_probe")))
  }

  test("default localDir is tmpfs only when writable WITH headroom, else tmpdir") {
    assume(sys.env.get("SPARK_GRAFT_LOCAL_DIR").isEmpty)
    val shm = java.nio.file.Paths.get("/dev/shm")
    val shmOk = java.nio.file.Files.isDirectory(shm) &&
      java.nio.file.Files.isWritable(shm) && GraftSession.hasSpillHeadroom(shm)
    val expected =
      if (shmOk) "/dev/shm/graft_spark_local" else System.getProperty("java.io.tmpdir")
    assert(GraftSession.localDir === expected)
  }

  test("explicit SPARK_GRAFT_LOCAL_DIR always wins over the default chain") {
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").foreach { v =>
      assert(GraftSession.localDir === v)
    }
  }
}
