package graft

import graft.queries.Queries

/** Doc-generation main: print the full query catalog (QUERIES.md) from
  * the registered QueryDefs — name, gate kind, and the scale-design
  * description each query carries. Generated, never hand-edited, so the
  * catalog cannot drift from the code the way hand-maintained totals
  * did. Usage: `tools/run_main.sh graft.Catalog QUERIES.md`
  * (writes UTF-8 explicitly — the container JVM's default stdout
  * charset would mangle the prose).
  */
object Catalog {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("QUERIES.md")
    val defs = Queries.all.sortBy(_.name)
    val oracleCount = defs.count(_.oracleGated)
    val sb = new StringBuilder
    sb ++= "# QUERIES — generated catalog (graft.Catalog; do not hand-edit)\n\n"
    sb ++= s"${defs.length} registered queries, $oracleCount with a DuckDB oracle " +
      s"(${defs.length - oracleCount} rows-only). Every query runs against the " +
      "driver fixtures via `SparkEntry.queries(name)(spark, sfDir)`; oracle SQL " +
      "ships in `SparkEntry.oracleSql` and is diffed by the driver's t2 gate " +
      "(`tools/local_check.py` locally).\n\n"
    sb ++= "| query | gate | what it covers |\n"
    sb ++= "|---|---|---|\n"
    defs.foreach { d =>
      val gate = if (d.oracleGated) "oracle" else "rows-only"
      val doc = d.doc.replace("|", "\\|").replace("\n", " ")
      sb ++= s"| `${d.name}` | $gate | $doc |\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString,
      java.nio.charset.StandardCharsets.UTF_8)
    System.err.println(s"[catalog] wrote ${defs.length} queries to $out")
  }
}
