package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Rewrites the operator counts in README.md from `SparkEntry.registry`
  * itself, so the documented numbers are generated from code instead of
  * hand-edited. The counts drifted twice in two rounds when a query landed
  * after the README was written; the `QueriesSmokeSpec` guard caught both,
  * but detection is weaker than prevention. Run `sbt "runMain
  * graft.SyncCounts"` after touching the registry; the guard test remains
  * as the CI-side proof the regeneration actually happened.
  *
  * No SparkSession is needed: the registry is a pure value.
  */
object SyncCounts {
  private val Begin = "<!-- COUNTS -->"
  private val End   = "<!-- /COUNTS -->"

  /** The one sentence both README.md and the suite guard agree on. */
  def countsLine: String = {
    val registered = SparkEntry.registry.size
    val oracled    = SparkEntry.oracleSql.size
    val rowsOnly   = registered - oracled
    val tail =
      if (rowsOnly == 0) "."
      else s" (the remaining $rowsOnly are rows-only by design: " +
        "engine-specific sketches, error-bounded against exact " +
        "counterparts in the suite)."
    s"$registered operators are registered; $oracled oracle-checked$tail"
  }

  def rewrite(readme: String): String = {
    val begin = readme.indexOf(Begin)
    val end   = readme.indexOf(End)
    require(begin >= 0 && end > begin, s"README is missing $Begin/$End markers")
    readme.substring(0, begin + Begin.length) + countsLine + readme.substring(end)
  }

  def main(args: Array[String]): Unit = {
    val path    = Paths.get(if (args.nonEmpty) args(0) else "README.md")
    val before  = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
    val after   = rewrite(before)
    if (after != before) {
      Files.write(path, after.getBytes(StandardCharsets.UTF_8))
      println(s"$path: counts line rewritten -> $countsLine")
    } else println(s"$path: counts line already current")
  }
}
