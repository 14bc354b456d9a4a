package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** The round-correctness record must not be able to silently blank
  * (r12 verdict What's-wrong #1): `CORRECTNESS_r12.json` shipped as a
  * literal `{}` and nothing in the round loop noticed — the round
  * closed with NO hard correctness record while the registry held 144
  * queries. Two defenses now exist: check.py refuses to WRITE an empty
  * summary (exit 2), and this spec refuses to let one SIT in the repo
  * — every committed round artifact that parses empty while the live
  * registry is non-empty must be backed by a non-empty first-party
  * `CORRECTNESS_local_rN.json` from the verify cycle, and the latest
  * first-party record must itself be non-empty and all-green. */
class CorrectnessArtifactSpec extends AnyFunSuite {

  private val root = Paths.get(".").toAbsolutePath

  private def list(glob: String): Seq[Path] = {
    val m = java.nio.file.FileSystems.getDefault
      .getPathMatcher("glob:" + glob)
    Files.list(root).iterator().asScala
      .filter(p => m.matches(p.getFileName)).toSeq
  }

  /** Top-level key count of a JSON object file — a real parser is
    * overkill for "is this `{}`": strip whitespace and check for any
    * key material. Non-JSON content counts as non-empty (the driver
    * writes either a dict or nothing). */
  private def isEmptyJson(p: Path): Boolean =
    new String(Files.readAllBytes(p), "UTF-8")
      .replaceAll("\\s", "") == "{}"

  private def roundOf(p: Path): String =
    p.getFileName.toString.replaceAll("^CORRECTNESS(_local)?_r|\\.json$", "")

  test("the query registry is non-empty") {
    assert(SparkEntry.queries.nonEmpty)
  }

  test("no round ships with only an empty correctness artifact") {
    val driver = list("CORRECTNESS_r*.json")
    assert(driver.nonEmpty, "no driver correctness artifacts found")
    val localByRound = list("CORRECTNESS_local_r*.json")
      .map(p => roundOf(p) -> p).toMap
    val naked = driver.filter(isEmptyJson).filterNot { p =>
      localByRound.get(roundOf(p)).exists(lp => !isEmptyJson(lp))
    }
    assert(naked.isEmpty,
      s"empty correctness artifact(s) with no non-empty first-party " +
        s"backfill: ${naked.map(_.getFileName).mkString(", ")} — run " +
        s"Verify + tools/check.py with a summary path and commit it")
  }

  test("the latest first-party record is non-empty and all-green") {
    val locals = list("CORRECTNESS_local_r*.json")
    assert(locals.nonEmpty, "no CORRECTNESS_local_r*.json committed — " +
      "the verify cycle must emit one per round (check.py 3rd arg)")
    val latest = locals.maxBy(p => roundOf(p).toInt)
    val txt = new String(Files.readAllBytes(latest), "UTF-8")
    assert(!isEmptyJson(latest), s"$latest is empty")
    // every per-query record carries the three driver booleans; a
    // red one must not be committable as the round's record
    val falses = "\"(rows_match|schema_match|hash_match)\"\\s*:\\s*false"
      .r.findFirstIn(txt)
    assert(falses.isEmpty, s"$latest contains a failed check: $falses")
    // and it covers the registry: one key per registered oracle query
    val keys = "\"([a-z0-9_]+)\"\\s*:\\s*\\{".r
      .findAllMatchIn(txt).map(_.group(1)).toSet
    val missing = SparkEntry.oracleSql.keySet -- keys
    assert(missing.isEmpty,
      s"$latest misses registered queries: ${missing.mkString(", ")}")
  }
}
