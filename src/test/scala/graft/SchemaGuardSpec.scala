package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The testdata shape contract (VERDICT r7 #5): every driver-provided
  * parquet table at every scale factor must match SchemaGuard.expected,
  * and the guard itself must actually detect drift (negative cases).
  */
class SchemaGuardSpec extends AnyFunSuite with SparkTestBase {

  Seq("sf0.001", "sf0.01", "sf0.1").foreach { sfName =>
    test(s"all testdata tables at $sfName match the expected shape") {
      val dir = s"/root/testdata/$sfName"
      assume(new java.io.File(dir).isDirectory, s"$dir not present")
      SchemaGuard.check(spark, dir)
    }
  }

  test("guard accepts every ts generation the loaders normalize") {
    Seq(TimestampType, TimestampNTZType, LongType).foreach { t =>
      val schema = StructType(SchemaGuard.expected("events").map {
        case ("ts", _) => StructField("ts", t)
        case (n, ok) => StructField(n, ok.head)
      })
      assert(SchemaGuard.diff("events", schema).isEmpty, s"rejected ts: $t")
    }
  }

  test("guard flags a renamed column, a type change, and an extra column") {
    val good = StructType(SchemaGuard.expected("events").map {
      case (n, ok) => StructField(n, ok.head)
    })
    val renamed = StructType(good.map {
      case f if f.name == "user_id" => f.copy(name = "uid")
      case f => f
    })
    assert(SchemaGuard.diff("events", renamed).exists(_.contains("missing column user_id")))
    assert(SchemaGuard.diff("events", renamed).exists(_.contains("unexpected column uid")))
    val retyped = StructType(good.map {
      case f if f.name == "value" => f.copy(dataType = StringType)
      case f => f
    })
    assert(SchemaGuard.diff("events", retyped).exists(_.contains("column value has type string")))
  }
}
