package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ordered string aggregation — the Spark equivalent of Oracle's
  * `listagg(col, sep) within group (order by pos)` / the `xmlagg` idiom
  * the reference pushes down (cmd/tablemeta.go:194, cmd/root.go:313).
  *
  * Spark's `collect_list` has no intra-group ordering guarantee, so the
  * deterministic pattern is: collect (pos, value) structs, `array_sort`
  * (struct ordering is field-by-field, so pos sorts first), project the
  * value, join. All four steps are codegen'd catalyst expressions — no
  * UDF/UDAF, so the aggregate still gets partial (map-side) combine and
  * scales as an ordinary hash aggregate at 100 TB.
  */
object GroupConcat {

  /** `listagg(value, sep) within group (order by pos)` as a single
    * aggregate Column. Use inside `groupBy(...).agg(...)`.
    */
  def orderedConcat(pos: Column, value: Column, sep: String): Column =
    array_join(
      transform(
        array_sort(collect_list(struct(pos.as("p"), value.as("v")))),
        x => x.getField("v")
      ),
      sep
    )

  /** Same, ordering by the value itself. */
  def sortedConcat(value: Column, sep: String): Column =
    array_join(array_sort(collect_list(value)), sep)
}
