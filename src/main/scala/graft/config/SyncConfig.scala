package graft.config

/** Connection endpoint (reference: connect/connect.go:4-16). */
final case class Endpoint(
    host: String = "",
    port: Int = 0,
    database: String = "",
    username: String = "",
    password: String = ""
) {
  def oracleJdbcUrl: String = s"jdbc:oracle:thin:@//$host:$port/$database"
  def mysqlJdbcUrl: String =
    s"jdbc:mysql://$host:$port/$database?rewriteBatchedStatements=true"
}

/** Engine configuration, key-compatible with the reference's YAML
  * (example.yml:1-21): src/dest endpoints, pageSize (rows per read
  * partition), maxParallel (connection budget), batchRowSize (insert
  * batch), custom per-table SQL, exclude list.
  */
final case class SyncConfig(
    src: Endpoint = Endpoint(),
    dest: Endpoint = Endpoint(),
    pageSize: Long = 100000L,
    maxParallel: Int = 100,
    batchRowSize: Int = 1000,
    tables: Map[String, Seq[String]] = Map.empty, // table -> custom SQL(s)
    exclude: Set[String] = Set.empty
)

object SyncConfig {

  /** Minimal flat-YAML reader for the reference's config shape — no
    * external YAML dependency (offline build). Handles two indent levels,
    * `key: value` pairs, and `- item` lists; enough for example.yml.
    */
  def parse(yaml: String): SyncConfig = {
    var cfg = SyncConfig()
    var section: String = ""
    var subKey: String = ""
    var srcM = Map.empty[String, String]
    var destM = Map.empty[String, String]
    var tables = Map.empty[String, Seq[String]]
    var exclude = Set.empty[String]

    def endpoint(m: Map[String, String]) = Endpoint(
      m.getOrElse("host", ""),
      m.get("port").map(_.toInt).getOrElse(0),
      m.getOrElse("database", ""),
      m.getOrElse("username", ""),
      m.getOrElse("password", "")
    )

    yaml.linesIterator.foreach { raw =>
      val line = raw.replaceAll("#.*$", "")
      if (line.trim.nonEmpty) {
        val indent = line.takeWhile(_ == ' ').length
        val t = line.trim
        if (indent == 0) {
          val Array(k, v @ _*) = t.split(":", 2).map(_.trim): @unchecked
          val value = v.headOption.getOrElse("")
          section = k
          k match {
            case "pageSize"     => cfg = cfg.copy(pageSize = value.toLong)
            case "maxParallel"  => cfg = cfg.copy(maxParallel = value.toInt)
            case "batchRowSize" => cfg = cfg.copy(batchRowSize = value.toInt)
            case _              => ()
          }
        } else if (t.startsWith("- ")) {
          val item = t.stripPrefix("- ").trim
          section match {
            case "tables" =>
              tables = tables.updated(subKey, tables.getOrElse(subKey, Seq.empty) :+ item)
            case "exclude" => exclude += item
            case _         => ()
          }
        } else {
          val Array(k, v @ _*) = t.split(":", 2).map(_.trim): @unchecked
          val value = v.headOption.getOrElse("")
          section match {
            case "src"  => srcM += (k -> value)
            case "dest" => destM += (k -> value)
            case "tables" =>
              subKey = k
              if (value.nonEmpty) tables = tables.updated(k, Seq(value))
            case "exclude" => exclude += k
            case _         => ()
          }
        }
      }
    }
    cfg.copy(
      src = endpoint(srcM),
      dest = endpoint(destM),
      tables = tables,
      exclude = exclude
    )
  }

  def load(path: String): SyncConfig =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))
}
