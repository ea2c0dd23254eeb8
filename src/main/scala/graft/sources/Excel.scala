package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Self-contained XLSX source/sink — no POI, no external deps: an .xlsx
  * is a zip of small XML parts, which the JDK reads natively.
  *
  * Reference surface: pandas-ai's `read_excel` (reference
  * pandasai/__init__.py:97-142) — header row → column names, numeric
  * type inference, one sheet per call.
  *
  * Scale notes: spreadsheets are bounded artifacts (the format caps at
  * ~1M rows), so this source parses driver-side and parallelizes the
  * rows into a DataFrame — the same shape the reference takes (pandas
  * in-memory load). Big data does not arrive as .xlsx; this exists for
  * ingest completeness, not as a scan path.
  *
  * Supported cell types: shared strings (t="s"), inline strings
  * (t="inlineStr"), formula-cached strings (t="str"), booleans (t="b"),
  * and numbers (default). Missing cells are null; column letters beyond
  * the header are ignored.
  */
object Excel {

  // --- read ---------------------------------------------------------

  /** Default read = the workbook's FIRST sheet, matching the reference's
    * `sheet_name=0` default (pandasai/__init__.py:300-310). */
  def read(spark: SparkSession, path: String, header: Boolean = true,
      inferSchema: Boolean = true): DataFrame =
    withWorkbook(path) { zf =>
      readSheetAt(spark, zf, sheetEntries(zf).head._2, header, inferSchema)
    }

  /** Declared sheet names, in workbook order. */
  def sheetNames(path: String): Seq[String] =
    withWorkbook(path)(zf => sheetEntries(zf).map(_._1))

  /** One sheet by 0-based index (reference `sheet_name=<int>`). */
  def readSheet(spark: SparkSession, path: String, sheet: Int,
      header: Boolean = true, inferSchema: Boolean = true): DataFrame =
    withWorkbook(path) { zf =>
      val entries = sheetEntries(zf)
      require(sheet >= 0 && sheet < entries.length,
        s"sheet index $sheet out of range (workbook has ${entries.length} sheets)")
      readSheetAt(spark, zf, entries(sheet)._2, header, inferSchema)
    }

  /** One sheet by name (reference `sheet_name=<str>`). */
  def readSheet(spark: SparkSession, path: String, sheet: String,
      header: Boolean, inferSchema: Boolean): DataFrame =
    withWorkbook(path) { zf =>
      val entries = sheetEntries(zf)
      val target = entries.collectFirst { case (n, p) if n == sheet => p }
        .getOrElse(throw new IllegalArgumentException(
          s"no sheet named '$sheet' (have: ${entries.map(_._1).mkString(", ")})"))
      readSheetAt(spark, zf, target, header, inferSchema)
    }

  def readSheet(spark: SparkSession, path: String, sheet: String): DataFrame =
    readSheet(spark, path, sheet, header = true, inferSchema = true)

  /** ALL sheets, in workbook order (reference `sheet_name=None` →
    * dict of frames keyed by sheet name). Returned ordered so callers
    * can rebuild the reference's dict (or register `file_sheet` views —
    * see Graft.readExcelAll) without losing workbook order. */
  def readAll(spark: SparkSession, path: String, header: Boolean = true,
      inferSchema: Boolean = true): Seq[(String, DataFrame)] =
    withWorkbook(path) { zf =>
      // shared strings are workbook-global: parse them once, not per sheet
      val shared = readSharedStrings(zf)
      sheetEntries(zf).map { case (name, p) =>
        name -> readSheetAt(spark, zf, p, header, inferSchema, Some(shared))
      }
    }

  private def withWorkbook[A](path: String)(f: ZipFile => A): A = {
    val zf = new ZipFile(path)
    try f(zf) finally zf.close()
  }

  private def readSheetAt(spark: SparkSession, zf: ZipFile, sheetPath: String,
      header: Boolean, inferSchema: Boolean,
      sharedPreparsed: Option[IndexedSeq[String]] = None): DataFrame = {
      val shared = sharedPreparsed.getOrElse(readSharedStrings(zf))
      val rows = readSheet(zf, sheetPath, shared)
      if (rows.isEmpty) return spark.emptyDataFrame
      val width = rows.map(_.length).max
      val padded = rows.map(r => r.padTo(width, null: Any))
      val (rawNames: Seq[String], dataRows: Seq[Array[Any]]) =
        if (header)
          (padded.head.toSeq.zipWithIndex.map { case (v, i) =>
            Option(v).map(_.toString).filter(_.nonEmpty).getOrElse(s"_c$i")
          }, padded.tail)
        else (Seq.tabulate(width)(i => s"_c$i"), padded)
      // duplicate headers get positional suffixes — a frame with two
      // identical column names fails on the first select-by-name
      val seen = mutable.Map.empty[String, Int]
      val names = rawNames.map { n =>
        val k = seen.getOrElse(n, 0); seen(n) = k + 1
        if (k == 0) n else s"${n}_$k"
      }
      val fields = names.zipWithIndex.map { case (n, i) =>
        val col = dataRows.map(_(i))
        StructField(n, if (inferSchema) inferType(col) else StringType, nullable = true)
      }
      val schema = StructType(fields.toSeq)
      val coerced = dataRows.map { r =>
        Row.fromSeq(r.zip(fields).map { case (v, f) => coerce(v, f.dataType) }.toSeq)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(coerced.toSeq), schema)
  }

  private def readSharedStrings(zf: ZipFile): IndexedSeq[String] = {
    val e = zf.getEntry("xl/sharedStrings.xml")
    if (e == null) return IndexedSeq.empty
    val doc = parseXml(zf, e)
    val sis = doc.getElementsByTagName("si")
    (0 until sis.getLength).map { i =>
      // an <si> may hold one <t> or several rich-text runs <r><t>…
      val ts = sis.item(i).asInstanceOf[org.w3c.dom.Element].getElementsByTagName("t")
      (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
    }
  }

  /** (sheetName, zipEntryPath) per declared sheet, in workbook order;
    * each sheet's r:id maps to a worksheet target in the workbook rels. */
  private def sheetEntries(zf: ZipFile): Seq[(String, String)] = {
    val wb = parseXml(zf, zf.getEntry("xl/workbook.xml"))
    val sheets = wb.getElementsByTagName("sheet")
    require(sheets.getLength > 0, "xlsx has no sheets")
    val rels = parseXml(zf, zf.getEntry("xl/_rels/workbook.xml.rels"))
    val rs = rels.getElementsByTagName("Relationship")
    val relTargets = (0 until rs.getLength).map { i =>
      rs.item(i).getAttributes.getNamedItem("Id").getNodeValue ->
        rs.item(i).getAttributes.getNamedItem("Target").getNodeValue
    }.toMap
    (0 until sheets.getLength).map { i =>
      val attrs = sheets.item(i).getAttributes
      val name = attrs.getNamedItem("name").getNodeValue
      val rid = attrs.getNamedItem("r:id").getNodeValue
      val target = relTargets.getOrElse(rid,
        throw new IllegalArgumentException(s"no rel for sheet $rid"))
      name -> (if (target.startsWith("/")) target.drop(1) else s"xl/$target")
    }
  }

  private def readSheet(zf: ZipFile, sheetPath: String,
      shared: IndexedSeq[String]): Seq[Array[Any]] = {
    val doc = parseXml(zf, zf.getEntry(sheetPath))
    val rowNodes = doc.getElementsByTagName("row")
    (0 until rowNodes.getLength).map { i =>
      val row = rowNodes.item(i).asInstanceOf[org.w3c.dom.Element]
      val cells = row.getElementsByTagName("c")
      val buf = mutable.ArrayBuffer.empty[Any]
      (0 until cells.getLength).foreach { j =>
        val c = cells.item(j).asInstanceOf[org.w3c.dom.Element]
        val ref = Option(c.getAttributes.getNamedItem("r")).map(_.getNodeValue)
        val idx = ref.map(colIndex).getOrElse(buf.length)
        while (buf.length < idx) buf += null
        val t = Option(c.getAttributes.getNamedItem("t")).map(_.getNodeValue).getOrElse("n")
        val value: Any = t match {
          case "s" =>
            val v = c.getElementsByTagName("v")
            if (v.getLength == 0) null else shared(v.item(0).getTextContent.toInt)
          case "inlineStr" =>
            val ts = c.getElementsByTagName("t")
            if (ts.getLength == 0) null
            else (0 until ts.getLength).map(k => ts.item(k).getTextContent).mkString
          case "str" =>
            val v = c.getElementsByTagName("v")
            if (v.getLength == 0) null else v.item(0).getTextContent
          case "b" =>
            val v = c.getElementsByTagName("v")
            if (v.getLength == 0) null else v.item(0).getTextContent.trim == "1"
          case _ =>
            val v = c.getElementsByTagName("v")
            if (v.getLength == 0) null
            else {
              // integral literals parse as Long (a bare toDouble would
              // silently lose precision for ids >= 2^53)
              val s = v.item(0).getTextContent.trim
              if (s.forall(ch => ch.isDigit || ch == '-') && s.nonEmpty &&
                  s != "-" && (s.length < 19 || s.toLongOption.isDefined))
                s.toLong
              else s.toDouble
            }
        }
        buf += value
      }
      buf.toArray
    }
  }

  /** "BC7" → 0-based column index 54. */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  private def parseXml(zf: ZipFile, e: ZipEntry): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // not namespace-aware: we match on qualified tag names directly
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder().parse(zf.getInputStream(e))
  }

  private def inferType(values: Seq[Any]): DataType = {
    val present = values.filter(_ != null)
    if (present.isEmpty) StringType
    else if (present.forall(_.isInstanceOf[Boolean])) BooleanType
    else if (present.forall(_.isInstanceOf[Long])) LongType
    else if (present.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Double]))
      DoubleType
    else StringType
  }

  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, DoubleType) => l.toDouble
    case (x, StringType) => x.toString
    case (x, _) => x
  }

  // --- write --------------------------------------------------------

  /** Write a DataFrame as a single-sheet .xlsx. The format itself is
    * driver-scale (see the object docs) but the contract is BOUNDED:
    * rows stream through `toLocalIterator` into the zip — the driver
    * holds at most one partition of rows at a time, never the frame.
    *
    * Roundtrip contract: numbers, booleans, and strings come back with
    * their types; any OTHER type (timestamps, dates, arrays, …) is
    * serialized via toString into a string cell — xlsx has no native
    * representation for them here (real Excel dates are style-tagged
    * serial numbers, deliberately out of scope).
    */
  def write(df: DataFrame, path: String): Unit =
    writeSheets(Seq("Sheet1" -> df), path)

  /** Multi-sheet variant: one worksheet per (name, frame), in order. */
  def writeSheets(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    require(sheets.nonEmpty, "writeSheets needs at least one sheet")
    require(sheets.map(_._1).distinct.length == sheets.length,
      "sheet names must be unique")
    val out = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def entry(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    // XML 1.0 cannot represent control chars below 0x20 (except \t \n \r)
    // in ANY form, so they are stripped — the one documented lossy case.
    def esc(s: String): String = s
      .filter(c => c >= ' ' || c == '\t' || c == '\n' || c == '\r')
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
    def cellXml(ref: String, v: Any): String = v match {
      case null => ""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case n @ (_: Double | _: Float | _: Long | _: Int | _: Short | _: Byte |
                _: java.math.BigDecimal) =>
        s"""<c r="$ref"><v>$n</v></c>"""
      case other => s"""<c r="$ref" t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>"""
    }
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    try {
      val overrides = sheets.indices.map(i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        .mkString("\n")
      entry("[Content_Types].xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |$overrides
          |</Types>""".stripMargin)
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      val sheetDecls = sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString
      entry("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets>$sheetDecls</sheets>
          |</workbook>""".stripMargin)
      val sheetRels = sheets.indices.map(i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
        .mkString("\n")
      entry("xl/_rels/workbook.xml.rels",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |$sheetRels
          |</Relationships>""".stripMargin)
      // rows STREAM through toLocalIterator into the zip entry — the
      // driver holds one partition's rows at a time, never the frame
      // (xlsx is written sequentially anyway, so streaming costs
      // nothing; a collect() here was an unbounded driver contract)
      sheets.zipWithIndex.foreach { case ((_, df), si) =>
        val names = df.schema.fieldNames
        out.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${si + 1}.xml"))
        def emit(s: String): Unit = out.write(s.getBytes("UTF-8"))
        emit("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
        emit("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
        val sb = new StringBuilder
        sb.append("<row r=\"1\">")
        names.zipWithIndex.foreach { case (n, i) => sb.append(cellXml(s"${colRef(i)}1", n)) }
        sb.append("</row>")
        emit(sb.toString)
        var r = 0
        df.toLocalIterator().forEachRemaining { row =>
          val rb = new StringBuilder
          rb.append(s"""<row r="${r + 2}">""")
          (0 until row.length).foreach { i =>
            rb.append(cellXml(s"${colRef(i)}${r + 2}", row.get(i)))
          }
          rb.append("</row>")
          emit(rb.toString)
          r += 1
        }
        emit("</sheetData></worksheet>")
        out.closeEntry()
      }
    } finally out.close()
  }
}
