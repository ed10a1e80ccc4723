package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites. Small core count: test data is tiny and
  * JVM-local; plan shapes, not parallelism, are under test. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.get("4")

  override def afterAll(): Unit = {
    // Session is shared process-wide across suites; do not stop it per-suite.
    super.afterAll()
  }
}
