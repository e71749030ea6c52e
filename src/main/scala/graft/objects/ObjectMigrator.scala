package graft.objects

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GroupConcat

/** Schema-object transpilers (indexes, sequences, FKs, comments, views) —
  * the Spark-native rendering of the reference's catalog-SQL DDL
  * generators (cmd/tablemeta.go:190-458).
  *
  * The reference pushes each generator down as one Oracle SQL statement;
  * here the dictionary tables arrive as DataFrames (from JDBC reads of
  * USER_* views, or synthetic frames in tests) and the string assembly is
  * column expressions: `when`/`concat`/ordered `listagg` — so generation
  * itself distributes and the output is a DataFrame of (table_name,
  * sql_cmd) ready for a driver-side DDL executor or a plan-only script
  * sink. Catalog data is small; every join below auto-broadcasts.
  */
object ObjectMigrator {

  /** Index/PK/constraint DDL (reference: the big CASE at
    * cmd/tablemeta.go:194).
    *
    * @param indCols     USER_IND_COLUMNS: table_name, index_name,
    *                    column_name, column_position
    * @param indexes     USER_INDEXES: index_name, uniqueness, index_type
    * @param constraints USER_CONSTRAINTS: constraint_name, constraint_type
    * @return (table_name, sql_cmd)
    */
  def indexDdl(indCols: DataFrame, indexes: DataFrame, constraints: DataFrame): DataFrame = {
    val joined = indCols
      .join(indexes, Seq("index_name"))
      .join(constraints, indCols("index_name") === constraints("constraint_name"), "left_outer")
      .filter(col("index_type") =!= "FUNCTION-BASED NORMAL")
    val grouped = joined
      .groupBy(col("table_name"), col("index_name"), col("uniqueness"),
        col("index_type"), col("constraint_type"))
      .agg(GroupConcat
        .orderedConcat(col("column_position"), col("column_name"), ",")
        .as("cols"))
    val constraintSql = concat(
      lit("ALTER TABLE `"), col("table_name"), lit("` ADD CONSTRAINT `"),
      col("index_name"), lit("`"),
      when(col("constraint_type") === "P", lit(" PRIMARY KEY ("))
        .otherwise(lit(" FOREIGN KEY (")),
      col("cols"), lit(");")
    )
    val indexSql = concat(
      lit("CREATE "),
      when(col("uniqueness") === "UNIQUE", lit("UNIQUE "))
        .otherwise(when(col("index_type") === "NORMAL", lit(""))
          .otherwise(concat(col("index_type"), lit(" ")))),
      lit("INDEX `"), col("index_name"), lit("` ON "), col("table_name"),
      lit("("), col("cols"), lit(");")
    )
    grouped.select(
      col("table_name"),
      when(col("constraint_type").isin("P", "R"), constraintSql)
        .otherwise(indexSql)
        .as("sql_cmd")
    )
  }

  /** Function-based-index DDL (reference: NormalIdx, cmd/tablemeta.go:
    * 318-361): for every `index_type = 'FUNCTION-BASED NORMAL'` index the
    * reference pulls `dbms_metadata.get_ddl('INDEX', name, user)` and
    * cleans it with a substr/instr/regexp chain — uppercase, cut at the
    * storage clause (` PCTFREE`), strip double-quotes and the
    * `<OWNER>.` prefix, drop newlines, trim. Here the raw get_ddl text
    * arrives as a column (fetched via the scalar-subquery pushdown,
    * [[graft.sources.Sources]] `dbmsMetadataSql`) and the same chain is
    * column expressions, so cleanup distributes over however many
    * indexes the schema has.
    *
    * @param indexes   USER_INDEXES: index_name, table_name, index_type
    * @param indexDdls per-index raw get_ddl text: index_name, ddl_text
    * @param userName  owning schema (the reference's `select user from
    *                  dual`), stripped from the DDL case-insensitively
    * @return (table_name, sql_cmd)
    */
  def functionIndexDdl(
      indexes: DataFrame,
      indexDdls: DataFrame,
      userName: String
  ): DataFrame = {
    val up = upper(col("ddl_text"))
    // cut at the first storage-clause token, exclusive; absent (already
    // clean DDL) keeps the whole string — the reference assumes Oracle
    // always emits PCTFREE, which a defensive port shouldn't
    val cut = locate(" PCTFREE", up)
    val head = up.substr(lit(1), when(cut > 0, cut - 1).otherwise(length(up)))
    // literal replaces (the string is already uppercased, so the
    // reference's case-insensitive flag is moot): quotes, owner prefix,
    // newlines — in the reference's order
    val cleaned = trim(
      replace(
        replace(
          replace(head, lit("\""), lit("")),
          lit(userName.toUpperCase + "."), lit("")),
        lit("\n"), lit("")))
    indexes
      .filter(col("index_type") === "FUNCTION-BASED NORMAL")
      .join(indexDdls, Seq("index_name"))
      .select(col("table_name"), concat(cleaned, lit(";")).as("sql_cmd"))
  }

  /** Sequence → auto_increment conversion (reference: SeqCreate,
    * cmd/tablemeta.go:227-283): detect BEFORE-EACH-ROW triggers that
    * assign `seq.NEXTVAL INTO :NEW.<col>` and emit the supporting index
    * plus the `modify ... auto_increment` statement.
    *
    * @param triggers USER_TRIGGERS: table_name, trigger_body
    * @return (table_name, sql_cmd) — two rows per matching trigger
    */
  def sequenceDdl(triggers: DataFrame): DataFrame = {
    val body = regexp_replace(
      regexp_replace(
        regexp_replace(upper(col("trigger_body")), "INTO:", "INTO :"),
        "SYS\\.DUAL", "DUAL"),
      "\n", "")
    val normalized = triggers.select(col("table_name"), body.as("body"))
      // level 1: only sequence-assignment triggers qualify
      .filter(col("body").rlike("SELECT\\s+(.*?)\\.NEXTVAL\\s+INTO\\s+:NEW\\."))
      // level 2: the auto-increment column is the :NEW target
      .withColumn("auto_col", regexp_extract(col("body"), ":NEW\\.(\\w+)", 1))
      .filter(col("auto_col") =!= "")
      // index names only need uniqueness WITHIN a table — partitioning
      // the window by table_name keeps numbering distributed (a global
      // orderBy window collapses to one partition, the WindowExec
      // single-partition warning at scale)
      .withColumn("seq_idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("table_name")).orderBy(col("auto_col"))))
    normalized.select(
      col("table_name"),
      explode(array(
        concat(lit("create index ids_"), col("table_name"), lit("_"),
          col("auto_col"), lit("_"), col("seq_idx"), lit(" on "),
          col("table_name"), lit("("), col("auto_col"), lit(");")),
        concat(lit("alter table "), col("table_name"), lit(" modify "),
          col("auto_col"), lit(" bigint auto_increment;"))
      )).as("sql_cmd")
    )
  }

  /** Foreign-key DDL (reference: FkCreate, cmd/tablemeta.go:289-311) —
    * the correlated scalar subqueries decorrelated into two grouped
    * column-list frames plus joins.
    *
    * @param constraints USER_CONSTRAINTS: constraint_name, table_name,
    *                    constraint_type, r_constraint_name
    * @param consCols    USER_CONS_COLUMNS: constraint_name, column_name,
    *                    position
    */
  def foreignKeyDdl(constraints: DataFrame, consCols: DataFrame): DataFrame = {
    val colLists = consCols
      .groupBy(col("constraint_name"))
      .agg(GroupConcat.orderedConcat(col("position"), col("column_name"), ",").as("cols"))
    val refTables = constraints
      .select(col("constraint_name").as("r_constraint_name"),
        col("table_name").as("r_table_name"))
    constraints
      .filter(col("constraint_type") === "R")
      .join(colLists, Seq("constraint_name"))
      .join(colLists.select(col("constraint_name").as("r_constraint_name"),
        col("cols").as("r_cols")), Seq("r_constraint_name"))
      .join(refTables, Seq("r_constraint_name"))
      .select(
        col("table_name"),
        concat(
          lit("ALTER TABLE "), col("table_name"),
          lit(" ADD CONSTRAINT "), col("constraint_name"),
          lit(" FOREIGN KEY ("), col("cols"),
          lit(") REFERENCES "), col("r_table_name"),
          lit("("), col("r_cols"), lit(");")
        ).as("sql_cmd")
      )
  }

  /** Table-comment DDL (reference: CommentCreate, cmd/tablemeta.go:367-396).
    * @param tabComments USER_TAB_COMMENTS: table_name, comments
    */
  def commentDdl(tabComments: DataFrame): DataFrame =
    tabComments
      .filter(col("comments").isNotNull)
      .select(
        col("table_name"),
        concat(lit("alter table "), col("table_name"), lit(" comment '"),
          regexp_replace(col("comments"), "'", "''"), lit("';")).as("sql_cmd")
      )

  /** View transpilation (reference: ViewCreate, cmd/tablemeta.go:398-435):
    * uppercase + the regex-grade Oracle→MySQL dialect rewrites. Kept
    * regex-grade deliberately (parity; not a SQL parser).
    * @param views USER_VIEWS: view_name, text
    */
  def viewDdl(views: DataFrame): DataFrame = {
    val rewritten = Seq[Column => Column](
      c => upper(c),
      c => regexp_replace(c, "--", "-- -- "),
      c => regexp_replace(c, "\"", "`"),
      c => regexp_replace(c, "NVL\\(", "IFNULL("),
      c => regexp_replace(c, java.util.regex.Pattern.quote("UNISTR('0')"), "0"),
      c => regexp_replace(c, java.util.regex.Pattern.quote("UNISTR('1')"), "1"),
      c => regexp_replace(c, java.util.regex.Pattern.quote("UNISTR('3')"), "3")
    ).foldLeft(col("text"))((c, f) => f(c))
    views.select(
      col("view_name"),
      concat(lit("create or replace view "), col("view_name"), lit(" as "),
        rewritten, lit(";")).as("sql_cmd")
    )
  }
}
