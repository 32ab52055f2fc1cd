package graft.template

import java.io.{File, FileInputStream}
import java.util.{List => JList, Map => JMap}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Loads + validates every `*.yaml` template in a directory, memoized per
  * directory — the Scala equivalent of the reference's
  * `load_table_templates()` (`dagster/lakehouse/utils/table_loader.py:14-36`)
  * including its error surface: empty-file error and missing-required-keys
  * error (`tests/test_table_loader.py:85-100`), and `get_template`'s
  * helpful KeyError listing available templates (`table_loader.py:39-44`).
  */
object TemplateLoader {

  val RequiredKeys: Seq[String] = Seq("name", "columns", "partition_spec")

  private val cache = TrieMap.empty[String, Map[String, TableTemplate]]

  def load(dir: String): Map[String, TableTemplate] =
    cache.getOrElseUpdate(new File(dir).getCanonicalPath, loadUncached(dir))

  def invalidate(): Unit = cache.clear()

  def get(dir: String, name: String): TableTemplate = {
    val all = load(dir)
    all.getOrElse(
      name,
      throw new NoSuchElementException(
        s"Unknown table template '$name'. Available: ${all.keys.toSeq.sorted.mkString(", ")}"))
  }

  private def loadUncached(dir: String): Map[String, TableTemplate] = {
    val files = Option(new File(dir).listFiles())
      .getOrElse(throw new IllegalArgumentException(s"Template directory not found: $dir"))
      .filter(f => f.getName.endsWith(".yaml") || f.getName.endsWith(".yml"))
      .filterNot(_.getName.startsWith("_")) // _schema.json-style meta files
      .sortBy(_.getName)
    files.map { f =>
      val t = parseFile(f)
      t.name -> t
    }.toMap
  }

  def parseFile(f: File): TableTemplate = {
    val in = new FileInputStream(f)
    val raw =
      try new Yaml().load[Any](in)
      finally in.close()
    if (raw == null)
      throw new IllegalArgumentException(s"Empty YAML template: ${f.getPath}")
    val m = asMap(raw, f.getPath)
    val missing = RequiredKeys.filterNot(m.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Template ${f.getPath} missing required keys: ${missing.mkString(", ")}")
    fromMap(m)
  }

  private def fromMap(m: Map[String, Any]): TableTemplate = {
    val columns = asList(m("columns")).map { c =>
      val cm = asMap(c, "column")
      ColumnDef(
        name = cm("name").toString,
        icebergType = cm("type").toString,
        required = bool(cm.get("required")),
        pii = bool(cm.get("pii")),
        accessLevel = cm.get("access_level").map(_.toString).getOrElse("public"),
        description = cm.get("description").map(_.toString).getOrElse("")
      )
    }
    val partitions = asList(m("partition_spec")).map { p =>
      val pm = asMap(p, "partition_spec")
      val transform = pm("transform").toString
      // bucket[N] / truncate[N] carry the width inline, per the reference
      // grammar (`table-templates/_schema.json:68-70`).
      val BracketRe = """(bucket|truncate)\[(\d+)\]""".r
      transform match {
        case BracketRe(t, n) => PartitionField(pm("column").toString, t, n.toInt)
        case t               => PartitionField(pm("column").toString, t)
      }
    }
    val sortOrder = m.get("sort_order").map(asList).getOrElse(Nil).map { s =>
      val sm = asMap(s, "sort_order")
      SortField(
        column = sm("column").toString,
        direction = sm.get("direction").map(_.toString).getOrElse("asc"),
        nullOrder = sm.get("null_order").map(_.toString).getOrElse("nulls_last")
      )
    }
    val source = m.get("source").map { s =>
      val sm = asMap(s, "source")
      SourceDef(
        path = sm("path").toString,
        format = sm.get("format").map(_.toString).getOrElse("parquet"),
        options = sm.get("options")
          .map(o => asMap(o, "source.options").map { case (k, v) => k -> v.toString })
          .getOrElse(Map.empty)
      )
    }
    TableTemplate(
      name = m("name").toString,
      namespace = m.get("namespace").map(_.toString).getOrElse("default"),
      columns = columns,
      partitionSpec = partitions,
      sortOrder = sortOrder,
      properties = m.get("properties")
        .map(p => asMap(p, "properties").map { case (k, v) => k -> v.toString })
        .getOrElse(Map.empty),
      tags = m.get("tags")
        .map(t => asMap(t, "tags").map { case (k, v) => k -> v.toString })
        .getOrElse(Map.empty),
      source = source
    )
  }

  private def asMap(v: Any, where: String): Map[String, Any] = v match {
    case jm: JMap[_, _] => jm.asScala.map { case (k, vv) => k.toString -> vv }.toMap
    case _ => throw new IllegalArgumentException(s"Expected a YAML mapping at $where, got: $v")
  }

  private def asList(v: Any): Seq[Any] = v match {
    case jl: JList[_] => jl.asScala.toSeq
    case _            => throw new IllegalArgumentException(s"Expected a YAML list, got: $v")
  }

  private def bool(v: Option[Any]): Boolean = v.exists {
    case b: java.lang.Boolean => b
    case s                    => s.toString.toBoolean
  }
}
