package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Per-category run-log file sinks (reference K7: `LogOutput` /
  * `LogError`, cmd/app.go:110-152, and the `run.log` appenders at
  * cmd/root.go:56, cmd/compare.go:45, cmd/create.go:50).
  *
  * Every category writes `<logDir>/<name>.log` append-only, exactly like
  * the reference: generated DDL goes to `createSql.log`, each failure
  * category gets its own file (`NormalIdxCreateFailed.log`,
  * `errorTableData.log`, ...), and the overall run narrative goes to
  * `run.log`. Driver-side by design — these are operator-facing audit
  * files, not data-path output; volume is O(schema objects + failures),
  * never O(rows).
  */
class RunLogs(logDir: String) {

  private def path(name: String): Path = Paths.get(logDir, s"$name.log")

  private def append(name: String, line: String): Unit = synchronized {
    Files.createDirectories(Paths.get(logDir))
    Files.writeString(path(name), line + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** `LogOutput` analog (cmd/app.go:132-152). */
  def output(logName: String, content: String): Unit = append(logName, content)

  /** `LogError` analog (cmd/app.go:110-130): content + error, one line. */
  def error(logName: String, content: String, err: Throwable): Unit =
    append(logName, s"$content -- ErrorInfo ${Option(err.getMessage).getOrElse(err.toString)}")

  /** `run.log` appender (cmd/root.go:56 et al.). */
  def run(msg: String): Unit = append("run", msg)

  /** Read a category file back (for specs / report assembly). */
  def lines(logName: String): Seq[String] = synchronized {
    val p = path(logName)
    if (Files.exists(p))
      scala.jdk.CollectionConverters.ListHasAsScala(Files.readAllLines(p)).asScala.toSeq
    else Seq.empty
  }
}

object RunLogs {

  /** Dated per-run log directory (reference `CreateDateDir`,
    * cmd/app.go:246-262): `<base>/log/yyyy_MM_dd_HH_mm_ss`, created
    * eagerly so the path exists even for failure-free runs.
    */
  def datedUnder(basePath: String): RunLogs = {
    val stamp = java.time.LocalDateTime.now().format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy_MM_dd_HH_mm_ss"))
    val dir = Paths.get(basePath, "log", stamp)
    Files.createDirectories(dir)
    new RunLogs(dir.toString)
  }

  /** Swallow-everything sink for callers that don't want files. */
  val noop: RunLogs = new RunLogs("/dev/null") {
    override def output(logName: String, content: String): Unit = ()
    override def error(logName: String, content: String, err: Throwable): Unit = ()
    override def run(msg: String): Unit = ()
    override def lines(logName: String): Seq[String] = Seq.empty
  }
}
