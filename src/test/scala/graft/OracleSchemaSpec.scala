package graft

import graft.queries.Queries

import scala.sys.process.{Process, ProcessLogger}

/** The HUGEINT output-schema guard, promoted into the MANDATORY suite
  * (round-12 verdict): DuckDB's SUM(BIGINT) silently widens to int128,
  * which the driver's hasher serializes differently from Spark's int64
  * even when every value is equal — six queries went hash-red in round
  * 11 from exactly this. `tools/local_check.py` guards it, but only
  * when someone runs that tool; this spec makes a future uncast SUM
  * fail `sbt test` itself.
  *
  * The check is DESCRIBE-only (O(plan), nothing executes), so HUGEINT
  * *intermediates* — legitimate in e.g. stat_gini — are not flagged;
  * only the final projection the driver hashes is.
  *
  * DuckDB has no JVM build in this environment, so the schema walk
  * shells out to python3+duckdb (present on the driver/judge boxes).
  * Where the interpreter is absent the test CANCELS (assume) rather
  * than green-washing — the tool-side guard still exists there.
  */
class OracleSchemaSpec extends SparkSpec {

  test("no registered oracle's DuckDB OUTPUT schema contains HUGEINT") {
    val probe = Process(Seq("python3", "-c", "import duckdb"))
      .!(ProcessLogger(_ => (), _ => ()))
    assume(probe == 0,
      "python3+duckdb unavailable — guard runs via tools/local_check.py")

    // resolve late oracles (fitted-literal SQL exists only after the
    // owning query runs) by running those queries once at sf0.001
    val sqls = Queries.all.flatMap { q =>
      val resolved = q.oracleNow.orElse {
        if (q.oracleGated) {
          try q.run(spark, sf("sf0.001")).count()
          catch { case _: Throwable => () }
          q.oracleNow
        } else None
      }
      resolved.map(q.name -> _)
    }.toMap
    val gated = Queries.all.count(_.oracleGated)
    assert(sqls.size == gated,
      s"only ${sqls.size} of $gated gated oracles resolved — late thunks failing?")

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val tmp = java.io.File.createTempFile("graft_oracle_sql", ".json")
    tmp.deleteOnExit()
    java.nio.file.Files.writeString(tmp.toPath,
      sqls.map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString("{", ",", "}"))

    val out = new StringBuilder
    val log = ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n'))
    val code = Process(Seq("python3", "tools/oracle_schema_check.py",
      sf("sf0.001"), tmp.getPath), new java.io.File(".")).!(log)
    assert(code == 0,
      s"oracle OUTPUT-schema violations (add ::BIGINT casts):\n$out")
  }
}
