package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for operator specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession =
    GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()

  override def afterAll(): Unit = {
    // shared across suites in one JVM; don't stop between suites
    super.afterAll()
  }
}
