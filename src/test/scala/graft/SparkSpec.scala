package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session —
  * ScalaTest runs suites sequentially in the forked JVM; Spark session
  * creation is the dominant cost).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def sf(name: String): String = s"/root/testdata/$name"

  override def afterAll(): Unit = () // session shared; never stopped per-suite
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local(cores = 4)
}
