package graft.objects

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ObjectMigratorSpec extends SparkSpec {
  import spark.implicits._

  test("indexDdl: primary key, unique index, normal index, multi-column order") {
    val indCols = Seq(
      ("t1", "pk_t1", "id", 1),
      ("t1", "ix_t1_ab", "b", 2),
      ("t1", "ix_t1_ab", "a", 1),
      ("t1", "ux_t1_c", "c", 1)
    ).toDF("table_name", "index_name", "column_name", "column_position")
    val indexes = Seq(
      ("pk_t1", "UNIQUE", "NORMAL"),
      ("ix_t1_ab", "NONUNIQUE", "NORMAL"),
      ("ux_t1_c", "UNIQUE", "NORMAL")
    ).toDF("index_name", "uniqueness", "index_type")
    val constraints = Seq(
      ("pk_t1", "P")
    ).toDF("constraint_name", "constraint_type")

    val ddl = ObjectMigrator.indexDdl(indCols, indexes, constraints)
      .collect().map(_.getString(1)).toSet

    assert(ddl.contains("ALTER TABLE `t1` ADD CONSTRAINT `pk_t1` PRIMARY KEY (id);"))
    assert(ddl.contains("CREATE INDEX `ix_t1_ab` ON t1(a,b);")) // position-ordered
    assert(ddl.contains("CREATE UNIQUE INDEX `ux_t1_c` ON t1(c);"))
  }

  test("indexDdl excludes function-based indexes") {
    val indCols = Seq(("t1", "fx", "upper(a)", 1))
      .toDF("table_name", "index_name", "column_name", "column_position")
    val indexes = Seq(("fx", "NONUNIQUE", "FUNCTION-BASED NORMAL"))
      .toDF("index_name", "uniqueness", "index_type")
    val constraints = Seq.empty[(String, String)]
      .toDF("constraint_name", "constraint_type")
    assert(ObjectMigrator.indexDdl(indCols, indexes, constraints).count() === 0)
  }

  test("sequenceDdl detects NEXTVAL triggers and emits index + auto_increment") {
    val triggers = Seq(
      ("orders", "BEGIN SELECT seq_orders.NEXTVAL INTO :NEW.order_id FROM sys.dual; END;"),
      ("audit", "BEGIN :NEW.ts := SYSDATE; END;") // not a sequence trigger
    ).toDF("table_name", "trigger_body")
    val ddl = ObjectMigrator.sequenceDdl(triggers).collect()
      .map(_.getString(1))
    assert(ddl.length === 2)
    assert(ddl.exists(_.startsWith("create index ids_orders_ORDER_ID_")))
    assert(ddl.contains("alter table orders modify ORDER_ID bigint auto_increment;"))
  }

  test("foreignKeyDdl decorrelates column lists and referenced table") {
    val constraints = Seq(
      ("fk_o_c", "orders", "R", "pk_cust"),
      ("pk_cust", "customer", "P", null),
      ("pk_o", "orders", "P", null)
    ).toDF("constraint_name", "table_name", "constraint_type", "r_constraint_name")
    val consCols = Seq(
      ("fk_o_c", "custkey", 1),
      ("pk_cust", "c_custkey", 1),
      ("pk_o", "o_orderkey", 1)
    ).toDF("constraint_name", "column_name", "position")
    val ddl = ObjectMigrator.foreignKeyDdl(constraints, consCols).collect()
    assert(ddl.length === 1)
    assert(ddl(0).getString(1) ===
      "ALTER TABLE orders ADD CONSTRAINT fk_o_c FOREIGN KEY (custkey) REFERENCES customer(c_custkey);")
  }

  test("commentDdl filters nulls and escapes quotes") {
    val comments = Seq(
      ("t1", "user's table"),
      ("t2", null)
    ).toDF("table_name", "comments")
    val ddl = ObjectMigrator.commentDdl(comments).collect()
    assert(ddl.length === 1)
    assert(ddl(0).getString(1) === "alter table t1 comment 'user''s table';")
  }

  test("viewDdl applies the dialect rewrite chain") {
    val views = Seq(
      ("v1", "select nvl(\"a\", 0) from t -- note")
    ).toDF("view_name", "text")
    val ddl = ObjectMigrator.viewDdl(views).collect()(0).getString(1)
    assert(ddl === "create or replace view v1 as SELECT IFNULL(`A`, 0) FROM T -- --  NOTE;")
  }

  test("functionIndexDdl cleans the get_ddl output like the reference chain") {
    val indexes = Seq(
      ("idx_fn_upper", "t_users", "FUNCTION-BASED NORMAL"),
      ("ix_plain", "t_users", "NORMAL"),
      ("idx_fn_trunc", "t_orders", "FUNCTION-BASED NORMAL")
    ).toDF("index_name", "table_name", "index_type")
    val ddls = Seq(
      ("idx_fn_upper",
        "\n  CREATE INDEX \"Scott\".\"IDX_FN_UPPER\" ON \"Scott\".\"T_USERS\" (UPPER(\"NAME\")) \n  PCTFREE 10 INITRANS 2 MAXTRANS 255 COMPUTE STATISTICS"),
      ("idx_fn_trunc",
        "CREATE INDEX \"Scott\".\"IDX_FN_TRUNC\" ON \"Scott\".\"T_ORDERS\" (TRUNC(\"ORDER_DATE\"))"),
      ("ix_plain",
        "CREATE INDEX \"Scott\".\"IX_PLAIN\" ON \"Scott\".\"T_USERS\" (\"A\") PCTFREE 10")
    ).toDF("index_name", "ddl_text")
    val out = ObjectMigrator.functionIndexDdl(indexes, ddls, "Scott")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // non-function-based ix_plain is NOT migrated here (indexDdl owns it)
    assert(out === Set(
      ("t_users", "CREATE INDEX IDX_FN_UPPER ON T_USERS (UPPER(NAME));"),
      ("t_orders", "CREATE INDEX IDX_FN_TRUNC ON T_ORDERS (TRUNC(ORDER_DATE));")
    ))
  }

  test("functionIndexDdl without a storage clause keeps the whole statement") {
    val indexes = Seq(("f1", "t", "FUNCTION-BASED NORMAL"))
      .toDF("index_name", "table_name", "index_type")
    val ddls = Seq(("f1", "CREATE INDEX \"U\".\"F1\" ON \"U\".\"T\" (LOWER(\"X\"))"))
      .toDF("index_name", "ddl_text")
    val out = ObjectMigrator.functionIndexDdl(indexes, ddls, "u").collect()(0).getString(1)
    assert(out === "CREATE INDEX F1 ON T (LOWER(X));")
  }
}
