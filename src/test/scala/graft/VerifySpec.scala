package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Verify gate's stale-output discipline: a FAILED query dump
  * must leave NO output dir behind. `overwrite` mode only clears a
  * dir on success, so without the failure-handler delete a stale
  * parquet from an earlier run would be compared (and pass) when the
  * query now fails — the round-12 soundness hole.
  */
class VerifySpec extends AnyFunSuite {
  import SparkTestSession._

  test("deleteStaleDir removes a nested dir and survives a missing one") {
    val out = Files.createTempDirectory("verifyspec").toString
    val dir = Paths.get(out, "q_stale", "part")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("stale.parquet"), "old bytes")
    Verify.deleteStaleDir(out, "q_stale")
    assert(!Files.exists(Paths.get(out, "q_stale")))
    // idempotent on an absent dir — must not throw
    Verify.deleteStaleDir(out, "q_never_existed")
  }

  test("failed query leaves no output dir (end-to-end failure handler)") {
    assume(spark != null) // shared session must exist for getOrCreate reuse
    val out = Files.createTempDirectory("verifyspec_e2e").toString
    // seed a stale result as if a previous run had succeeded
    val stale = Paths.get(out, "q1_pricing_summary")
    Files.createDirectories(stale)
    Files.writeString(stale.resolve("part-00000.parquet"), "stale")
    // nonexistent sf dir ⇒ the query throws at read; the handler must
    // wipe the seeded dir rather than leaving it for the compare
    Verify.run(spark, "/nonexistent-sfdir", out, Some(Set("q1_pricing_summary")))
    assert(!Files.exists(stale),
      "failed query must not leave a (stale) output dir for the oracle compare")
    // the oracle json is still written for the filtered set
    assert(Files.exists(Paths.get(out, "oracle_sql.json")))
  }
}
