package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class ConnectionsSpec extends AnyFunSuite {

  test("resolution returns the registered connection; latest registration wins") {
    Connections.register("c_spec_a", Connection("/data/a", Map("mode" -> "PERMISSIVE")))
    assert(Connections.resolve("c_spec_a").endpoint == "/data/a")
    // rotation semantics: re-registering replaces (a secrets-backend update)
    Connections.register("c_spec_a", Connection("/data/a2"))
    assert(Connections.resolve("c_spec_a").endpoint == "/data/a2")
    Connections.remove("c_spec_a")
  }

  test("missing name fails loudly with the known names — and no secret material") {
    Connections.register("c_spec_known",
      Connection("/data/k", secrets = Map("token" -> "hunter2")))
    val e = intercept[NoSuchElementException](Connections.resolve("c_spec_nope"))
    assert(e.getMessage.contains("c_spec_nope"))
    assert(e.getMessage.contains("c_spec_known"), "error must list known names")
    assert(!e.getMessage.contains("hunter2"), "error must never carry secrets")
    Connections.remove("c_spec_known")
  }

  test("toString redacts secret VALUES but shows endpoint, options and secret keys") {
    val c = Connection("https://feed.example/daily",
      options = Map("format" -> "jsonl"),
      secrets = Map("api_key" -> "s3cr3t-value", "token" -> "t0ps3cret"))
    val s = c.toString
    assert(s.contains("https://feed.example/daily"))
    assert(s.contains("format=jsonl"))
    assert(s.contains("api_key=***") && s.contains("token=***"))
    assert(!s.contains("s3cr3t-value") && !s.contains("t0ps3cret"),
      s"secret value leaked through toString: $s")
    // log-interpolation path is the same render: s"$c" must be clean too
    assert(!s"conn=$c".contains("s3cr3t-value"))
    // the deliberate accessor still works
    assert(c.secret("api_key").contains("s3cr3t-value"))
    assert(c.secret("absent").isEmpty)
  }

  test("landed-feed sensor resolves the conn per poke: empty dir pends, data file readies, rotation re-points") {
    val dirA = java.nio.file.Files.createTempDirectory("connfeed_a")
    val dirB = java.nio.file.Files.createTempDirectory("connfeed_b")
    Connections.register("c_spec_feed", Connection(dirA.toString))
    val probe = DailyPipeline.landedFeedReadiness("c_spec_feed")
    assert(probe() == Pipeline.StillRunning, "empty landing dir must pend")
    // writer bookkeeping must not trip the sensor
    java.nio.file.Files.createFile(dirA.resolve("_SUCCESS.inprogress"))
    java.nio.file.Files.createFile(dirA.resolve(".hidden"))
    assert(probe() == Pipeline.StillRunning, "markers/dotfiles are not data")
    java.nio.file.Files.write(dirA.resolve("part-00000.json"),
      "{}".getBytes("UTF-8"))
    assert(probe() == Pipeline.Done, "a visible data file readies the feed")
    // rotation mid-wait: the SAME probe re-resolves the name next poke
    Connections.register("c_spec_feed", Connection(dirB.toString))
    assert(probe() == Pipeline.StillRunning, "rotated endpoint is empty again")
    Connections.remove("c_spec_feed")
  }

  test("sources register the landed feeds as named connections and read through them") {
    // landedConn is deterministic per (kind, path) and the conn-name
    // readers resolve it — the q89/q95/q222/q227 read path
    val name = graft.operators.Sources.landedConn("spectest", "/tmp/spec_path")
    assert(name.startsWith("graft_spectest_feed_"))
    assert(Connections.resolve(name).endpoint == "/tmp/spec_path")
    assert(graft.operators.Sources.landedConn("spectest", "/tmp/spec_path") == name,
      "same path must map to the same conn name")
    Connections.remove(name)
  }
}
