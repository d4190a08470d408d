package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("graft-xlsx").option("path", …).option("sheet",
  * …)` — the workbook reader as a REAL DataSourceV2 connector, the
  * third source surface next to declared-schema parquet and the
  * driver-side [[Xlsx.read]] convenience API.
  *
  * Why a connector and not just the helper: a V2 table participates
  * in Catalyst like any file source — the scan node reports
  * `readSchema`, and `SupportsPushDownRequiredColumns` makes COLUMN
  * PRUNING real (a `select(one_col)` parses every row once but
  * materializes exactly one column into InternalRows, and the plan
  * shows the pruned schema — the same contract the plan gates assert
  * for parquet scans).
  *
  * Geometry: one [[InputPartition]] per sheet — a worksheet is a
  * single zipped XML stream, inherently unsplittable; the 100 TB
  * posture for spreadsheet-shaped inputs is many workbooks → many
  * partitions (one task each), never a big sheet. Rows parse lazily
  * executor-side via the shared session-free parser
  * ([[Xlsx.readSheet]]).
  */
class XlsxSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsx"

  private def pathOf(o: CaseInsensitiveStringMap) =
    Option(o.get("path")).getOrElse(sys.error("graft-xlsx: 'path' option required"))
  // 'sheet' names ONE sheet, taken VERBATIM — commas and padding spaces
  // are legal inside xlsx sheet names, so the single-sheet option must
  // never be split (ADVICE r4). Multi-sheet reads use the separate
  // 'sheets' option: delimiter-separated (default ',', overridable via
  // 'sheetDelimiter' when a name contains the delimiter); each named
  // sheet becomes ONE InputPartition (sheets must be union-compatible;
  // the table schema is the first sheet's).
  private def sheetsOf(o: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(o.get("sheets")).map { s =>
      val delim = Option(o.get("sheetDelimiter")).getOrElse(",")
      s.split(java.util.regex.Pattern.quote(delim), -1)
        .map(_.trim).filter(_.nonEmpty).toSeq
    }
    multi.orElse(Option(o.get("sheet")).map(Seq(_)))
      .filter(_.nonEmpty)
      .getOrElse(sys.error("graft-xlsx: 'sheet' or 'sheets' option required"))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Xlsx.readSheet(pathOf(options), sheetsOf(options).head)._1

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val o = new CaseInsensitiveStringMap(properties)
    new XlsxTable(schema, pathOf(o), sheetsOf(o))
  }
}

private[sources] class XlsxTable(tableSchema: StructType, path: String, sheets: Seq[String])
  extends Table with SupportsRead {
  override def name(): String = s"xlsx:`$path`#${sheets.mkString(",")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(tableSchema, path, sheets)
}

private[sources] class XlsxScanBuilder(full: StructType, path: String, sheets: Seq[String])
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new XlsxScan(full, required, path, sheets)
}

private[sources] case class XlsxPartitionSpec(path: String, sheet: String)
  extends InputPartition

private[sources] class XlsxScan(full: StructType, required: StructType,
                                path: String, sheets: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-xlsx $path#${sheets.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    sheets.map(XlsxPartitionSpec(path, _)).toArray[InputPartition]
  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(required.fieldNames)
}

private[sources] class XlsxReaderFactory(requiredNames: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val spec = partition.asInstanceOf[XlsxPartitionSpec]
    new PartitionReader[InternalRow] {
      // Resolve the pruned columns against THIS sheet's own
      // (disambiguated) header, not the first sheet's (ADVICE r4
      // medium): 'union-compatible' constrains the column SET, not the
      // physical order — a later sheet with the same columns in a
      // different order must yield each column's own values, and a
      // sheet missing a required column must fail loud, not index out
      // of bounds. Lazy: projection and rows parse on first next(),
      // executor-side.
      private lazy val (proj, rows) = {
        val (sheetSchema, data) = Xlsx.readSheet(spec.path, spec.sheet)
        val sheetCols = sheetSchema.fieldNames
        val p = requiredNames.map { n =>
          val i = sheetCols.indexOf(n)
          if (i < 0) sys.error(s"graft-xlsx: sheet '${spec.sheet}' has no column " +
            s"'$n' (its columns: ${sheetCols.mkString(", ")}); sheets read " +
            "together must be union-compatible")
          i
        }
        (p, data.iterator)
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) {
          val r = rows.next()
          current = new GenericInternalRow(
            proj.map(i => if (r(i) != null)
              UTF8String.fromString(r(i)) else null).asInstanceOf[Array[Any]])
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
