package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // unpin PlanCache entries between suites — the session is shared
    // process-wide, so without this each suite's cached relations stay
    // persisted for the whole test run
    PlanCache.clear()
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local(4)
}
