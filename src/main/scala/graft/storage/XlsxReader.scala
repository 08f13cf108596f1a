package graft.storage

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** Minimal XLSX reader on pure JDK (zip + StAX) — closes the Excel
  * path of the reference's upload surface
  * (robosystems/middleware/mcp/tools/data_tools.py:238 accepts
  * "CSV, Excel, Parquet") without an external reader dependency.
  *
  * Scope (deliberately the upload-endpoint subset, not a general
  * OOXML implementation): first worksheet; row 1 = header; shared
  * strings, inline strings, numbers, booleans; formula cells read by
  * their cached value; sparse/skipped cells → null. Column types are
  * inferred like the CSV staging path (all-long → long, all-numeric →
  * double, else string).
  *
  * Scale judgment: uploads are SMALL single files (an API surface, not
  * a data lake) — the sheet parses on the driver and parallelizes into
  * a DataFrame, exactly like the reference streams the upload into its
  * staging database. Bulk columnar data enters through the parquet
  * scan path, never through spreadsheets. The parser is streaming
  * (StAX, one pass, no DOM) and hardened against XXE (DTD and external
  * entities disabled — uploads are untrusted bytes). */
object XlsxReader {

  private def factory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
      java.lang.Boolean.FALSE)
    f
  }

  /** "B3" → 0-based column index 1; empty ref → -1. */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    if (letters.isEmpty) -1
    else letters.foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1
  }

  /** All <t> text inside the current element (e.g. an <si> or <is> —
    * rich-text runs concatenate). Consumes through the matching end. */
  private def collectText(r: XMLStreamReader): String = {
    val sb = new StringBuilder
    var depth = 1
    var inT = false
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1; inT = r.getLocalName == "t"
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1; inT = false
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inT) sb.append(r.getText)
        case _ =>
      }
    }
    sb.toString
  }

  private def parseSharedStrings(in: java.io.InputStream): IndexedSeq[String] = {
    val out = ArrayBuffer.empty[String]
    val r = factory().createXMLStreamReader(in)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "si")
          out += collectText(r)
      }
    } finally r.close()
    out.toIndexedSeq
  }

  /** One worksheet → sparse rows of (colIndex, cellValue) with cell
    * type already resolved against the shared-string table. */
  private def parseSheet(
      in: java.io.InputStream, shared: IndexedSeq[String]): Seq[Seq[(Int, String)]] = {
    val rows = ListBuffer.empty[Seq[(Int, String)]]
    val r = factory().createXMLStreamReader(in)
    try {
      var cells = ListBuffer.empty[(Int, String)]
      var nextIdx = 0 // position fallback for writers that omit r=
      var cellIdx = -1
      var cellType = ""
      var value: Option[String] = None
      var inV = false
      val sb = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => cells = ListBuffer.empty; nextIdx = 0
            case "c" =>
              val ref = Option(r.getAttributeValue(null, "r")).getOrElse("")
              cellIdx = { val i = colIndex(ref); if (i >= 0) i else nextIdx }
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              value = None
            case "v" => inV = true; sb.clear()
            case "is" => value = Some(collectText(r))
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inV) sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "v" => inV = false; value = Some(sb.toString)
            case "c" =>
              val resolved = value.map { v =>
                cellType match {
                  case "s" => shared(v.trim.toInt)
                  case "b" => if (v.trim == "1") "true" else "false"
                  case _ => v // "str", "inlineStr" (handled via <is>), numbers
                }
              }
              resolved.foreach(v => cells += ((cellIdx, v)))
              nextIdx = cellIdx + 1
            case "row" => rows += cells.toSeq
            case _ =>
          }
          case _ =>
        }
      }
    } finally r.close()
    rows.toSeq
  }

  private val longRe = """-?\d{1,18}""".r
  private val doubleRe = """-?\d+(\.\d+)?([eE][+-]?\d+)?""".r

  /** Sparse sheet rows → typed DataFrame: header row = column names
    * (missing header cells become col_N, duplicates get a positional
    * suffix like Spark's CSV dedup); column types inferred like the
    * CSV staging path (all-long → long, all-numeric → double, else
    * string). Shared by the XLSX and legacy-XLS readers so both Excel
    * formats land with identical staging semantics. */
  private[storage] def sheetToDataFrame(
      spark: SparkSession, sparse: Seq[Seq[(Int, String)]],
      context: String): DataFrame = {
    require(sparse.nonEmpty, s"empty worksheet in $context")
    val width = sparse.iterator.flatMap(_.map(_._1)).maxOption.getOrElse(-1) + 1
    def dense(row: Seq[(Int, String)]): Array[String] = {
      val a = Array.fill[String](width)(null)
      row.foreach { case (i, v) => if (i >= 0 && i < width) a(i) = v }
      a
    }
    val header = dense(sparse.head)
    // resolve fallbacks (col_N for empty cells) FIRST, then dedup over
    // the resolved list — a literal "col_2" header next to an empty
    // cell 2 must not yield two columns both named col_2
    val resolved = header.zipWithIndex.map { case (h, i) =>
      Option(h).map(_.trim).filter(_.nonEmpty).getOrElse(s"col_$i")
    }
    val names = resolved.zipWithIndex.map { case (base, i) =>
      if (resolved.count(_ == base) > 1) s"${base}_$i" else base
    }
    require(names.distinct.length == names.length,
      s"header names still collide after dedup in $context: ${names.mkString(", ")}")
    val data = sparse.tail.map(dense)

    def colType(i: Int): DataType = {
      val vs = data.flatMap(r => Option(r(i)))
      if (vs.isEmpty) StringType
      else if (vs.forall(longRe.matches)) LongType
      else if (vs.forall(doubleRe.matches)) DoubleType
      else StringType
    }
    val types = names.indices.map(colType)
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true) })
    val rows = data.map { r =>
      Row.fromSeq(names.indices.map { i =>
        Option(r(i)).map { v =>
          types(i) match {
            case LongType => v.toLong
            case DoubleType => v.toDouble
            case _ => v
          }
        }.orNull
      })
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
  }

  /** Read an .xlsx file into a typed DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      def stream(name: String) =
        Option(zf.getEntry(name)).map(zf.getInputStream)
      val shared = stream("xl/sharedStrings.xml")
        .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
      val sheetName = stream("xl/worksheets/sheet1.xml").map(_ => "xl/worksheets/sheet1.xml")
        .orElse {
          import scala.jdk.CollectionConverters._
          zf.entries().asScala.map(_.getName)
            .filter(n => n.startsWith("xl/worksheets/") && n.endsWith(".xml"))
            .toSeq.sorted.headOption
        }
        .getOrElse(throw new IllegalArgumentException(s"no worksheet in $path"))
      val sparse = parseSheet(stream(sheetName).get, shared)
      sheetToDataFrame(spark, sparse, path)
    } finally zf.close()
  }
}
