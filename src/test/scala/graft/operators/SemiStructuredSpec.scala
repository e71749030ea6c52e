package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SemiStructuredSpec extends SparkSpec {

  test("flattenJson: inferred schema extracts typed columns, drops the json column") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 5, "tag": "a"}"""),
      (2L, """{"k": 7, "tag": "b"}""")
    ).toDF("id", "props")
    val out = SemiStructured.flattenJson(df, "props")
    assert(out.columns.toSeq === Seq("id", "k", "tag"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getAs[Long]("k") === 5L && rows(0).getAs[String]("tag") === "a")
    assert(rows(1).getAs[Long]("k") === 7L && rows(1).getAs[String]("tag") === "b")
  }

  test("flattenJson: corrupt rows yield nulls, keys missing from a row yield nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 5}"""),
      (2L, "not json at all"),
      (3L, """{"other": 1}""")
    ).toDF("id", "props")
    // explicit schema: inference over mixed rows must not be required
    val schema = StructType(Seq(StructField("k", LongType)))
    val rows = SemiStructured.flattenJson(df, "props", Some(schema))
      .orderBy("id").collect()
    assert(rows(0).getAs[Long]("k") === 5L)
    assert(rows(1).isNullAt(1), "corrupt JSON must null out, not fail")
    assert(rows(2).isNullAt(1), "missing key must null out")
  }

  test("inferJsonSchema: corrupt sample rows don't leak a _corrupt_record column") {
    import spark.implicits._
    val df = Seq((1L, """{"k": 5}"""), (2L, "oops not json")).toDF("id", "props")
    val s = SemiStructured.inferJsonSchema(df, "props")
    assert(s.fieldNames.toSeq === Seq("k"), s.treeString)
  }

  test("flattenJson: a JSON key colliding with an existing column is rejected clearly") {
    import spark.implicits._
    val df = Seq((1L, """{"id": 9}""")).toDF("id", "props")
    val e = intercept[IllegalArgumentException] {
      SemiStructured.flattenJson(df, "props")
    }
    assert(e.getMessage.contains("collide") && e.getMessage.contains("id"))
  }

  test("flattenJson: nested objects flatten recursively with parent_child names") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"device": {"os": "linux", "hw": {"cores": 8}}, "ok": true}"""),
      (2L, """{"device": {"os": "mac"}, "ok": false}""")
    ).toDF("id", "props")
    val out = SemiStructured.flattenJson(df, "props")
    assert(out.columns.toSeq === Seq("id", "device_hw_cores", "device_os", "ok"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getAs[Long]("device_hw_cores") === 8L)
    assert(rows(0).getAs[String]("device_os") === "linux")
    assert(rows(1).isNullAt(1), "absent nested key must null out")
    assert(rows(1).getAs[String]("device_os") === "mac")
    // recurse = false keeps the nested object as one struct column
    val top = SemiStructured.flattenJson(df, "props", recurse = false)
    assert(top.columns.toSeq === Seq("id", "device", "ok"))
    assert(top.schema("device").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
  }

  test("flattenJson: mangled-name self-collision and the reserved temp name are rejected") {
    import spark.implicits._
    // {"a_b": 1} and {"a": {"b": 2}} both want column a_b
    val df = Seq((1L, """{"a_b": 1, "a": {"b": 2}}""")).toDF("id", "props")
    val e = intercept[IllegalArgumentException] {
      SemiStructured.flattenJson(df, "props")
    }
    assert(e.getMessage.contains("collide") && e.getMessage.contains("a_b"))
    // an input column named __graft_json would be silently clobbered
    // by the internal parse column — must error instead
    val df2 = Seq((1L, "x", """{"k": 5}""")).toDF("id", "__graft_json", "props")
    val e2 = intercept[IllegalArgumentException] {
      SemiStructured.flattenJson(df2, "props")
    }
    assert(e2.getMessage.contains("__graft_json") && e2.getMessage.contains("reserved"))
    // ...and so would a JSON field of that name
    val df3 = Seq((1L, """{"__graft_json": 5}""")).toDF("id", "props")
    val e3 = intercept[IllegalArgumentException] {
      SemiStructured.flattenJson(df3, "props")
    }
    assert(e3.getMessage.contains("reserved"))
  }

  test("flattenJson: extraction runs as one codegen'd from_json pass, no shuffle") {
    val ev = table("events").select(col("event_id"), col("props"))
    val out = SemiStructured.flattenJson(ev, "props", sampleRows = 100)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("from_json"), plan)
  }
}
