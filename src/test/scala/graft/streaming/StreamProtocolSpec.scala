package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The shared replay protocol, exercised directly (no Spark needed):
  * identity claim, config-fingerprint pinning, marker bound, and
  * commit/skip — the guards every persistent-state stream relies on. */
class StreamProtocolSpec extends AnyFunSuite {

  private def withDir(f: (org.apache.hadoop.fs.FileSystem, Path) => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_proto_")
    val dir = new Path(tmp.toString)
    val fs = dir.getFileSystem(new Configuration())
    try f(fs, dir)
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("first batch claims identity+config; commit makes its replay a skip") {
    withDir { (fs, dir) =>
      assert(!StreamProtocol.replayGuards(fs, dir, "ck", "w=2", 0L, "_b_", "S"))
      // not yet committed: a replay of batch 0 re-runs
      assert(!StreamProtocol.replayGuards(fs, dir, "ck", "w=2", 0L, "_b_", "S"))
      StreamProtocol.commit(fs, dir, "_b_", 0L)
      assert(StreamProtocol.replayGuards(fs, dir, "ck", "w=2", 0L, "_b_", "S"))
      // the next batch proceeds normally
      assert(!StreamProtocol.replayGuards(fs, dir, "ck", "w=2", 1L, "_b_", "S"))
    }
  }

  test("a different checkpoint fails fast (fresh checkpoint over retained state)") {
    withDir { (fs, dir) =>
      StreamProtocol.replayGuards(fs, dir, "ck1", "w=2", 0L, "_b_", "S")
      val e = intercept[IllegalStateException] {
        StreamProtocol.replayGuards(fs, dir, "ck2", "w=2", 0L, "_b_", "S")
      }
      assert(e.getMessage.contains("fresh checkpoint"))
    }
  }

  test("a different state-shaping config fails fast, even on the same checkpoint") {
    withDir { (fs, dir) =>
      StreamProtocol.replayGuards(fs, dir, "ck", "width=2048", 0L, "_b_", "S")
      val e = intercept[IllegalStateException] {
        StreamProtocol.replayGuards(fs, dir, "ck", "width=4096", 1L, "_b_", "S")
      }
      assert(e.getMessage.contains("state-shaping"))
      assert(e.getMessage.contains("width=2048") && e.getMessage.contains("width=4096"))
    }
  }

  test("a committed marker beyond the current batch fails fast (recreated checkpoint)") {
    withDir { (fs, dir) =>
      StreamProtocol.replayGuards(fs, dir, "ck", "w=2", 0L, "_b_", "S")
      StreamProtocol.commit(fs, dir, "_b_", 0L)
      StreamProtocol.commit(fs, dir, "_b_", 5L)
      val e = intercept[IllegalStateException] {
        StreamProtocol.replayGuards(fs, dir, "ck", "w=2", 3L, "_b_", "S")
      }
      assert(e.getMessage.contains("batch 3"))
    }
  }
}
