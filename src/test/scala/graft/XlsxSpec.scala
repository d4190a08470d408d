package graft

import graft.sources.Xlsx

/** Pins the pure-JVM XLSX workbook source/sink: multi-sheet roundtrip,
  * cell typing, XML escaping, sparse rows, A1 reference math. */
class XlsxSpec extends SparkSpec {
  import spark.implicits._

  test("column letters and refs roundtrip") {
    assert(Xlsx.colLetters(0) === "A")
    assert(Xlsx.colLetters(25) === "Z")
    assert(Xlsx.colLetters(26) === "AA")
    assert(Xlsx.colLetters(701) === "ZZ")
    assert(Xlsx.colLetters(702) === "AAA")
    for (i <- 0 to 800) assert(Xlsx.refToCol(Xlsx.colLetters(i) + "7") === i)
  }

  test("multi-sheet workbook roundtrips values, escapes, nulls, and types") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "xlsx").toString
    val path = s"$dir/audit.xlsx"
    val a = Seq(
      ("a & <b>", 1L, Some(1.5), true),
      ("line\nbreak \"quoted\"", -2L, None, false)
    ).toDF("Text Col", "n", "maybe", "flag")
    val b = Seq(("only", 9L)).toDF("k", "v")
    Xlsx.write(Seq("Sheet One" -> a, "Other" -> b), path)

    assert(Xlsx.sheetNames(path) === Seq("Sheet One", "Other"))
    val back = Xlsx.read(spark, path, "Sheet One")
    assert(back.columns.toSeq === Seq("Text Col", "n", "maybe", "flag"))
    val rows = back.collect().map(_.toSeq).toSeq
    assert(rows(0) === Seq("a & <b>", "1", "1.5", "true"))
    // the None cell is absent from the row XML → null on read
    assert(rows(1) === Seq("line\nbreak \"quoted\"", "-2", null, "false"))
    assert(Xlsx.read(spark, path, "Other").collect().map(_.toSeq).toSeq ===
      Seq(Seq("only", "9")))
  }

  test("reader resolves sharedStrings when a foreign workbook uses them") {
    // handcraft a minimal workbook with a sharedStrings table (the
    // layout Excel itself writes) — our writer never produces one
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "xlsx").toString
    val path = s"$dir/foreign.xlsx"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def part(n: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="x"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/sharedStrings.xml",
      """<sst><si><t>hdr</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>""")
    part("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row><row r="2"><c r="A2" t="s"><v>1</v></c></row></sheetData></worksheet>""")
    zos.close()
    val df = Xlsx.read(spark, path, "S")
    assert(df.columns.toSeq === Seq("hdr"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("rich")) // runs concatenated
  }

  test("reader handles r=-less cells and a foreign relationship-id prefix") {
    // ADVICE r2: the r= cell ref is optional OOXML (column is
    // position-implied), and foreign writers may bind the
    // relationships namespace to any prefix, not just "r"
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "xlsx").toString
    val path = s"$dir/noref.xlsx"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def part(n: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:ns9="x"><sheets><sheet name="S" sheetId="1" ns9:id="rId1"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/worksheets/sheet1.xml",
      // header row: no r= at all (positions implied 0,1,2);
      // data row 1: explicit C2 then an implied D2 after it;
      // data row 2: implied A3, then explicit B3, then implied C3
      """<worksheet><sheetData>""" +
        """<row r="1"><c t="inlineStr"><is><t>h0</t></is></c><c t="inlineStr"><is><t>h1</t></is></c><c t="inlineStr"><is><t>h2</t></is></c></row>""" +
        """<row r="2"><c r="C2" t="inlineStr"><is><t>v2</t></is></c><c t="n"><v>7</v></c></row>""" +
        """<row r="3"><c t="n"><v>1</v></c><c r="B3" t="n"><v>2</v></c><c t="n"><v>3</v></c></row>""" +
        """</sheetData></worksheet>""")
    zos.close()
    val df = Xlsx.read(spark, path, "S")
    // the implied D2 cell extends the width to 4 columns (filler name)
    assert(df.columns.toSeq === Seq("h0", "h1", "h2", "_c3"))
    val rows = df.collect().map(_.toSeq).toSeq
    assert(rows(0) === Seq(null, null, "v2", "7"))
    assert(rows(1) === Seq("1", "2", "3", null))
  }

  test("DataSourceV2 connector reads the sheet and prunes columns") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("xlsxv2").toFile
    val path = new java.io.File(dir, "t.xlsx").getPath
    val df0 = Seq((1L, "en", 10L), (2L, "de", 20L)).toDF("doc_id", "lang", "n")
    Xlsx.write(Seq("docs" -> df0), path)
    val v2 = spark.read.format("graft-xlsx")
      .option("path", path).option("sheet", "docs").load()
    // full read equals the driver-side helper
    assert(v2.collect().map(_.toSeq).toSet ===
      Xlsx.read(spark, path, "docs").collect().map(_.toSeq).toSet)
    // pruning: a one-column projection reaches the scan
    val pruned = v2.select(col("lang"))
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("BatchScan"), s"expected a V2 BatchScan in:\n$p")
    assert(!p.contains("doc_id"), s"doc_id must be pruned from the scan:\n$p")
    assert(pruned.collect().map(_.getString(0)).toSet === Set("en", "de"))
  }

  test("V2 connector: a two-sheet read plans one InputPartition per sheet") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("xlsxv2m").toFile
    val path = new java.io.File(dir, "m.xlsx").getPath
    val s1 = Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
    // sheet "b" carries the SAME columns in a DIFFERENT physical order —
    // per-sheet header resolution (ADVICE r4 medium) must map each
    // required name to that sheet's own column, not read positionally
    val s2 = Seq(("fr", 3L)).toDF("lang", "doc_id")
    Xlsx.write(Seq("a" -> s1, "b" -> s2), path)
    val v2 = spark.read.format("graft-xlsx")
      .option("path", path).option("sheets", "a,b").load()
    // one task per worksheet — a sheet is one zipped XML stream,
    // unsplittable, so sheet-level parallelism is the partition unit
    assert(v2.rdd.getNumPartitions === 2)
    assert(v2.collect().map(_.toSeq).toSet ===
      Set(Seq("1", "en"), Seq("2", "de"), Seq("3", "fr")))
    // pruning still applies across the union of sheet partitions
    assert(v2.select(col("lang")).collect().map(_.getString(0)).toSet ===
      Set("en", "de", "fr"))
  }

  test("V2 connector: a sheet missing a required column fails loud, not wrong") {
    val dir = java.nio.file.Files.createTempDirectory("xlsxv2w").toFile
    val path = new java.io.File(dir, "w.xlsx").getPath
    val s1 = Seq((1L, "en")).toDF("doc_id", "lang")
    val s2 = Seq(Tuple1(2L)).toDF("doc_id") // narrower: no 'lang'
    Xlsx.write(Seq("a" -> s1, "b" -> s2), path)
    val v2 = spark.read.format("graft-xlsx")
      .option("path", path).option("sheets", "a,b").load()
    val e = intercept[org.apache.spark.SparkException](v2.collect())
    assert(e.getMessage.contains("union-compatible") ||
      Option(e.getCause).exists(_.getMessage.contains("union-compatible")),
      s"expected the union-compatibility error, got: ${e.getMessage}")
  }

  test("V2 connector: 'sheet' is verbatim — commas inside a sheet name resolve") {
    val dir = java.nio.file.Files.createTempDirectory("xlsxv2c").toFile
    val path = new java.io.File(dir, "c.xlsx").getPath
    val df0 = Seq((1L, "en")).toDF("doc_id", "lang")
    Xlsx.write(Seq("a, b" -> df0), path)
    val v2 = spark.read.format("graft-xlsx")
      .option("path", path).option("sheet", "a, b").load()
    assert(v2.collect().map(_.toSeq).toSet === Set(Seq("1", "en")))
  }

  test("duplicate headers disambiguate consistently for positional AND name-based reads") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("xlsxdup").toFile
    val path = new java.io.File(dir, "dup.xlsx").getPath
    // legal xlsx: two columns both headed "k" (plus a pre-existing k_2)
    val df0 = Seq(("l", "r", "x")).toDF("k", "tmp", "k_2")
      .select(col("k"), col("tmp").as("k"), col("k_2"))
    Xlsx.write(Seq("s" -> df0), path)
    val back = Xlsx.read(spark, path, "s")
    // the second "k" must skip suffixes present anywhere in the raw
    // header list (ADVICE r4): it becomes k_3, and the LITERAL k_2
    // header keeps its own name — selecting "k_2" must never silently
    // return the duplicated k column's data
    assert(back.columns.toSeq === Seq("k", "k_3", "k_2"),
      s"got ${back.columns.toSeq}")
    assert(back.select(col("k_2")).collect().head.getString(0) === "x")
    // name-based (V2) resolution sees the same columns as positional,
    // and each name reads its own column's values — not the first "k"
    val v2 = spark.read.format("graft-xlsx")
      .option("path", path).option("sheet", "s").load()
    assert(v2.columns.toSeq === back.columns.toSeq)
    val row = v2.select(back.columns.map(col): _*).collect().head.toSeq
    assert(row === Seq("l", "r", "x"))
  }
}
