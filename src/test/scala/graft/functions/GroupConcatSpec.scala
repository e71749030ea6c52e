package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GroupConcatSpec extends SparkSpec {

  test("orderedConcat respects the position ordering regardless of input order") {
    import spark.implicits._
    val df = Seq(
      ("a", 3, "z"), ("a", 1, "x"), ("a", 2, "y"),
      ("b", 2, "q"), ("b", 1, "p")
    ).toDF("g", "pos", "v").repartition(4) // scramble physical order
    val out = df
      .groupBy($"g")
      .agg(GroupConcat.orderedConcat($"pos", $"v", ",").as("s"))
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out === Array(("a", "x,y,z"), ("b", "p,q")))
  }

  test("sortedConcat orders by value") {
    import spark.implicits._
    val df = Seq(("g", "b"), ("g", "a"), ("g", "c")).toDF("g", "v")
    val out = df.groupBy($"g").agg(GroupConcat.sortedConcat($"v", "|").as("s"))
      .collect()(0).getString(1)
    assert(out === "a|b|c")
  }

  test("matches the reference's index-column listagg shape on fixtures") {
    // listagg(l_linenumber, ',') within group (order by l_linenumber)
    val li = table("lineitem")
    val row = li
      .filter(col("l_orderkey") === 1)
      .groupBy(col("l_orderkey"))
      .agg(GroupConcat
        .orderedConcat(col("l_linenumber"), col("l_linenumber").cast("string"), ",")
        .as("s"))
      .collect()
    if (row.nonEmpty) {
      val parts = row(0).getString(1).split(",").map(_.toInt)
      assert(parts.sorted.sameElements(parts), "must be ascending")
    }
  }
}
