package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSON config document source/sink with default-on-missing (ref A2
  * `load_settings`/`save_settings`, `Batch Processor.py:87-97`): the
  * reference persists a single-row key→value JSON document and writes
  * the default when absent.
  *
  * Engine config belongs in `SparkSession.conf`; this is the
  * *data-plane* JSON document capability: read-or-default, validated
  * update, atomic save via [[graft.operators.CommitSink]]-style
  * staging (single driver-side doc — no distributed write needed).
  */
object Settings {

  /** Read a one-document JSON settings file; write + return `defaults`
    * when missing (ref `:92-93`).
    */
  def loadOrDefault(
      spark: SparkSession,
      path: String,
      defaults: Map[String, String]): Map[String, String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val df = spark.read.option("multiLine", "true").json(path)
      if (df.columns.isEmpty) defaults
      else {
        val row = df.head()
        val present = df.columns.zipWithIndex.collect {
          // a JSON null is a missing value, not the string "null" —
          // fall through to the default for that key
          case (c, i) if !row.isNullAt(i) => c -> String.valueOf(row.get(i))
        }.toMap
        defaults ++ present
      }
    } else {
      save(path, defaults)
      defaults
    }
  }

  /** Persist settings as a single JSON document (atomic via temp+move,
    * ref `save_settings` `:95-97`).
    */
  def save(path: String, settings: Map[String, String]): Unit = {
    val json = settings.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${escape(k)}": "${escape(v)}"""" }
      .mkString("{", ", ", "}")
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    java.nio.file.Files.writeString(tmp, json)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Validated config commit (ref `save_options` `:490-497`): reject
    * the update unless the validator passes; returns whether saved.
    */
  def saveValidated(
      path: String,
      settings: Map[String, String],
      validate: Map[String, String] => Boolean): Boolean = {
    if (!validate(settings)) false
    else { save(path, settings); true }
  }

  /** The data-plane JSON column capability over a DataFrame (exercised
    * against `events.props` by q15): extract a typed field from a JSON
    * string column.
    */
  def jsonField(df: DataFrame, jsonCol: String, field: String): DataFrame =
    df.withColumn(field, get_json_object(col(jsonCol), s"$$.$field"))

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}
