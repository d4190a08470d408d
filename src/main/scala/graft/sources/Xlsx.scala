package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal pure-JVM XLSX workbook source/sink — closes the one
  * capability delta vs the reference, whose end-user surface is Excel
  * in and Excel out (`SL_SPK_Cleansing.py:40-55` `read_excel`,
  * `:328-338` `ExcelWriter`): no external Excel library exists in this
  * environment, but OOXML is just a zip of small XML parts, which the
  * JDK handles natively (`java.util.zip` + JAXP).
  *
  * Writer: one workbook, N sheets, header row + data rows; numbers and
  * booleans as native cell types, everything else as inline strings
  * (no sharedStrings table — inline keeps the writer single-pass).
  * Like the reference's `ExcelWriter` (and pandas generally), a
  * workbook is an inherently single-file, driver-side REPORT sink:
  * rows stream through `toLocalIterator` one partition at a time.
  * Datasets at corpus scale belong in parquet; this is for the
  * human-facing audit sheets the pipelines end in.
  *
  * Reader: resolves sheet name → part via the workbook rels, parses
  * cells of type inline string, shared string, number, and boolean,
  * and returns every column as a string — deliberately mirroring the
  * reference's own pattern of `read_excel` followed by a blanket
  * str-cast (P1/P2, `SL_SPK_Cleansing.py:63-70`); typed casts are the
  * caller's explicit next step, exactly as in the reference.
  */
object Xlsx {

  /** 0-based column index → A1-style letters (0→A, 25→Z, 26→AA). */
  private[graft] def colLetters(i: Int): String = {
    val sb = new StringBuilder
    var n = i
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  /** A1-style cell ref → 0-based column index ("C7" → 2). */
  private[graft] def refToCol(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      // XML 1.0 forbids most control chars outright — emitting them
      // (SAP exports carry stray s) would make the workbook
      // unparseable; substitute U+FFFD
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => sb.append('�')
      case c => sb.append(c)
    }
    sb.toString
  }

  // ---- writer ------------------------------------------------------

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    // NaN/Infinity are not valid numeric cell values — fall through to
    // the inline-string branch rather than corrupt the workbook
    case d: Double if d.isNaN || d.isInfinite =>
      s"""<c r="$ref" t="inlineStr"><is><t>$d</t></is></c>"""
    case f: Float if f.isNaN || f.isInfinite =>
      s"""<c r="$ref" t="inlineStr"><is><t>$f</t></is></c>"""
    case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double) =>
      s"""<c r="$ref" t="n"><v>$n</v></c>"""
    case d: java.math.BigDecimal => s"""<c r="$ref" t="n"><v>${d.toPlainString}</v></c>"""
    case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case other =>
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>"""
  }

  private def rowXml(rowNum: Int, values: Seq[Any]): String =
    values.zipWithIndex
      .map { case (v, i) => cellXml(s"${colLetters(i)}$rowNum", v) }
      .mkString(s"""<row r="$rowNum">""", "", "</row>")

  /** Writes `sheets` (name → DataFrame, in order) as one workbook. */
  def write(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)), UTF_8)
    def part(name: String)(body: => Unit): Unit = {
      zos.putNextEntry(new ZipEntry(name)); body; zos.closeEntry()
    }
    def w(s: String): Unit = zos.write(s.getBytes(UTF_8))
    val decl = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    try {
      part("[Content_Types].xml") {
        w(decl)
        w("""<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""")
        w("""<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""")
        w("""<Default Extension="xml" ContentType="application/xml"/>""")
        w("""<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""")
        sheets.indices.foreach { i =>
          w(s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        }
        w("</Types>")
      }
      part("_rels/.rels") {
        w(decl)
        w("""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""")
        w("""<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""")
        w("</Relationships>")
      }
      part("xl/workbook.xml") {
        w(decl)
        w("""<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""")
        sheets.zipWithIndex.foreach { case ((name, _), i) =>
          w(s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""")
        }
        w("</sheets></workbook>")
      }
      part("xl/_rels/workbook.xml.rels") {
        w(decl)
        w("""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""")
        sheets.indices.foreach { i =>
          w(s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
        }
        w("</Relationships>")
      }
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        part(s"xl/worksheets/sheet${i + 1}.xml") {
          w(decl)
          w("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
          w(rowXml(1, df.columns.toSeq))
          var r = 2
          val it = df.toLocalIterator()
          while (it.hasNext) { w(rowXml(r, it.next().toSeq)); r += 1 }
          w("</sheetData></worksheet>")
        }
      }
    } finally zos.close()
  }

  // ---- reader ------------------------------------------------------

  private def parseXml(in: InputStream): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    // harden against malicious workbooks: no DTDs, no external entities
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder().parse(in)
  }

  private def elems(parent: org.w3c.dom.Element, tag: String): Seq[org.w3c.dom.Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  /** Sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] = {
    val zf = new ZipFile(path)
    try {
      val wb = parseXml(zf.getInputStream(zf.getEntry("xl/workbook.xml")))
      elems(wb.getDocumentElement, "sheet").map(_.getAttribute("name"))
    } finally zf.close()
  }

  /** Reads one sheet as an all-string DataFrame (header row = column
    * names), like the reference's `read_excel` + blanket str-cast. */
  def read(spark: SparkSession, path: String, sheet: String): DataFrame = {
    val (schema, data) = readSheet(path, sheet)
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(
        data.map(Row.fromSeq)).asJava),
      schema)
  }

  /** Session-free core of [[read]]: header-derived all-string schema +
    * row values. Also the parse path of the DataSourceV2 connector
    * ([[XlsxSource]]), whose PartitionReader runs executor-side where
    * no SparkSession exists. */
  private[sources] def readSheet(path: String, sheet: String): (StructType, Seq[Seq[String]]) = {
    val zf = new ZipFile(path)
    try {
      val wb = parseXml(zf.getInputStream(zf.getEntry("xl/workbook.xml")))
      val sheetEl = elems(wb.getDocumentElement, "sheet")
        .find(_.getAttribute("name") == sheet)
        .getOrElse(sys.error(s"no sheet '$sheet' in $path"))
      // the relationship-id attribute is namespaced; foreign writers may
      // bind the relationships namespace to any prefix, not just "r".
      // Prefer the canonical r:id EXACTLY; fall back to any ':id'-suffixed
      // attribute only when r:id is absent (a preceding unrelated
      // namespaced id, e.g. ext:id, must not shadow a present r:id)
      val rid = {
        val atts = sheetEl.getAttributes
        val all = (0 until atts.getLength).map(atts.item(_))
        all.collectFirst { case a if a.getNodeName == "r:id" => a.getNodeValue }
          .orElse(all.collectFirst {
            case a if a.getNodeName.endsWith(":id") => a.getNodeValue
          })
          .getOrElse(sys.error(s"sheet '$sheet' has no relationship id"))
      }
      val rels = parseXml(zf.getInputStream(zf.getEntry("xl/_rels/workbook.xml.rels")))
      val target = elems(rels.getDocumentElement, "Relationship")
        .find(_.getAttribute("Id") == rid)
        .map(_.getAttribute("Target"))
        .getOrElse(sys.error(s"unresolved sheet relationship $rid"))
      val partName = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
      val shared: IndexedSeq[String] = Option(zf.getEntry("xl/sharedStrings.xml")) match {
        case Some(e) =>
          val ss = parseXml(zf.getInputStream(e))
          elems(ss.getDocumentElement, "si")
            // only <t> directly under <si> or inside rich runs <r> —
            // NOT <rPh> phonetic runs, which Excel adds for CJK text
            // and which would concatenate furigana into the value
            .map(si => elems(si, "t")
              .filter(t => t.getParentNode.getNodeName match {
                case "si" | "r" => true
                case _ => false
              })
              .map(_.getTextContent).mkString)
            .toIndexedSeq
        case None => IndexedSeq.empty
      }
      val doc = parseXml(zf.getInputStream(zf.getEntry(partName)))
      val rows: Seq[Array[(Int, String)]] = elems(doc.getDocumentElement, "row").map { rowEl =>
        // the r= cell ref is OPTIONAL in OOXML — when absent the column
        // is position-implied (one past the previous cell), so track a
        // running index instead of dropping the cell
        var nextCol = 0
        elems(rowEl, "c").flatMap { c =>
          val ref = c.getAttribute("r")
          val col = if (ref.nonEmpty && ref.head.isLetter) refToCol(ref) else nextCol
          nextCol = col + 1
          val cellValue = c.getAttribute("t") match {
            case "inlineStr" => elems(c, "t").headOption.map(_.getTextContent)
            case "s" => elems(c, "v").headOption.map(v => shared(v.getTextContent.trim.toInt))
            case "b" => elems(c, "v").headOption.map(v => if (v.getTextContent.trim == "1") "true" else "false")
            case _ => elems(c, "v").headOption.map(_.getTextContent)
          }
          cellValue.map(col -> _)
        }.toArray
      }
      if (rows.isEmpty || rows.head.isEmpty)
        sys.error(s"sheet '$sheet' has no header row")
      val header = rows.head.toMap
      // width = widest ROW, not just the header — a data cell past the
      // header width (legal in sparse sheets) gets a filler name below
      val nCols = (rows.iterator.flatMap(_.iterator.map(_._1)).max + 1) max 1
      val raw = (0 until nCols).map(i => header.getOrElse(i, s"_c$i"))
      // duplicate headers are legal in xlsx; disambiguate (a_2, a_3, …)
      // so NAME-based column resolution — the V2 pruned-read path —
      // cannot silently alias two columns onto the first occurrence,
      // and stays consistent with the positional driver-side read.
      // A chosen suffix must skip names occurring ANYWHERE in the raw
      // header list (ADVICE r4): with headers [k, k, k_2] the second
      // 'k' becomes k_3, so the literal k_2 column keeps its own name
      // instead of being shadowed and renamed to k_2_2.
      val names = raw.foldLeft(Vector.empty[String]) { (acc, n) =>
        if (!acc.contains(n)) acc :+ n
        else {
          var i = 2
          while (acc.contains(s"${n}_$i") || raw.contains(s"${n}_$i")) i += 1
          acc :+ s"${n}_$i"
        }
      }
      val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
      val data = rows.tail.map { cells =>
        val m = cells.toMap
        (0 until nCols).map(m.get(_).orNull)
      }
      (schema, data)
    } finally zf.close()
  }
}
