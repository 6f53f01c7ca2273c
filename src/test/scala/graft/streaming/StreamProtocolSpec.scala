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

  test("recreated checkpoint at the SAME path after ONE committed batch fails fast") {
    withDir { (fs, dir) =>
      withDir { (_, ckDir) =>
        def setMetaId(id: String): Unit = {
          val out = fs.create(new Path(ckDir, "metadata"), true)
          try out.write(s"""{"id":"$id"}""".getBytes("UTF-8")) finally out.close()
        }
        val ck = ckDir.toString
        setMetaId("run-A")
        assert(!StreamProtocol.replayGuards(fs, dir, ck, "w=2", 0L, "_b_", "S"))
        StreamProtocol.commit(fs, dir, "_b_", 0L)
        assert(StreamProtocol.replayGuards(fs, dir, ck, "w=2", 0L, "_b_", "S"))
        // checkpoint deleted + recreated at the same path: new instance
        // id, batch ids restart at 0 — before the instance-id identity
        // this was silently "already committed" (data loss); now loud
        setMetaId("run-B")
        val e = intercept[IllegalStateException] {
          StreamProtocol.replayGuards(fs, dir, ck, "w=2", 0L, "_b_", "S")
        }
        assert(e.getMessage.contains("fresh checkpoint"))
      }
    }
  }

  test("legacy bare-path identity is accepted once and upgraded in place") {
    withDir { (fs, dir) =>
      withDir { (_, ckDir) =>
        val ck = ckDir.toString
        // legacy claim: the run file holds the bare path (no metadata
        // existed when it was written)
        val out = fs.create(new Path(dir, "_stream_checkpoint"), true)
        try out.write(ck.getBytes("UTF-8")) finally out.close()
        val meta = fs.create(new Path(ckDir, "metadata"), true)
        try meta.write("""{"id":"run-A"}""".getBytes("UTF-8")) finally meta.close()
        // accepted + upgraded...
        assert(!StreamProtocol.replayGuards(fs, dir, ck, "w=2", 1L, "_b_", "S"))
        // ...so a recreated instance now fails
        val meta2 = fs.create(new Path(ckDir, "metadata"), true)
        try meta2.write("""{"id":"run-B"}""".getBytes("UTF-8")) finally meta2.close()
        val e = intercept[IllegalStateException] {
          StreamProtocol.replayGuards(fs, dir, ck, "w=2", 0L, "_b_", "S")
        }
        assert(e.getMessage.contains("fresh checkpoint"))
      }
    }
  }

  test("a crash mid-publish leaves an orphan .tmp and no marker — the next " +
      "batch re-claims cleanly and the orphan never shadows the real file") {
    withDir { (fs, dir) =>
      // the worst crash window of the atomic publish: tmp written,
      // target deleted, rename not yet executed
      val out = fs.create(new Path(dir, "_stream_checkpoint.tmp"), true)
      try out.write("half-writ".getBytes("UTF-8")) finally out.close()
      // an absent run file is simply re-claimed by the rightful owner;
      // the orphan tmp must not be read as the identity
      assert(!StreamProtocol.replayGuards(fs, dir, "ck", "w=2", 0L, "_b_", "S"))
      StreamProtocol.commit(fs, dir, "_b_", 0L)
      assert(StreamProtocol.replayGuards(fs, dir, "ck", "w=2", 0L, "_b_", "S"))
      // and a subsequent different checkpoint still fails fast (the
      // re-claim installed the real identity, not the orphan's bytes)
      val e = intercept[IllegalStateException] {
        StreamProtocol.replayGuards(fs, dir, "ck2", "w=2", 1L, "_b_", "S")
      }
      assert(e.getMessage.contains("fresh checkpoint"))
    }
  }

  test("a legacy config rendering is accepted once and upgraded in place") {
    withDir { (fs, dir) =>
      // state claimed before the fingerprint gained a field (the old
      // code's rendering, semantically identical values)
      StreamProtocol.replayGuards(fs, dir, "ck", "k=9;bands=3", 0L, "_b_", "S")
      StreamProtocol.commit(fs, dir, "_b_", 0L)
      // the new code resumes: legacy string listed -> accepted, file
      // rewritten to the current format, committed batch still skips
      assert(StreamProtocol.replayGuards(fs, dir, "ck",
        "k=9;bands=3;bucketMod=64", 0L, "_b_", "S",
        legacyConfigs = Seq("k=9;bands=3")))
      // upgrade persisted: the next batch needs no legacy list
      assert(!StreamProtocol.replayGuards(fs, dir, "ck",
        "k=9;bands=3;bucketMod=64", 1L, "_b_", "S"))
      // a legacy string whose values DIFFER still fails fast
      val e = intercept[IllegalStateException] {
        StreamProtocol.replayGuards(fs, dir, "ck",
          "k=5;bands=2;bucketMod=64", 1L, "_b_", "S",
          legacyConfigs = Seq("k=5;bands=2"))
      }
      assert(e.getMessage.contains("state-shaping"))
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

  test("a MODERN claim whose config marker vanished (crash mid-rewrite) refuses a blind re-claim") {
    withDir { (fs, dir) =>
      withDir { (_, ckDir) =>
        val ck = ckDir.toString
        val meta = fs.create(new Path(ckDir, "metadata"), true)
        try meta.write("""{"id":"run-A"}""".getBytes("UTF-8")) finally meta.close()
        assert(!StreamProtocol.replayGuards(fs, dir, ck, "w=2", 0L, "_b_", "S"))
        // the publish crash window: old config deleted, rename never ran
        fs.delete(new Path(dir, "_stream_config"), false)
        // re-claiming from the RESUMING stream's params (w=3!) would
        // disarm the mismatch guard — refuse with the restore remedy
        val e = intercept[IllegalStateException] {
          StreamProtocol.replayGuards(fs, dir, ck, "w=3", 1L, "_b_", "S")
        }
        assert(e.getMessage.contains("no _stream_config"), e.getMessage)
        // a LEGACY bare-path claim predates the config era: its absent
        // config claims fresh (pinned by the legacy-identity test too)
      }
    }
  }
}
