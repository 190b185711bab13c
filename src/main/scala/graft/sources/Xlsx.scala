package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native XLSX reader (SURVEY S3) — JDK-only: an .xlsx file is a zip of
  * XML parts, so `java.util.zip` + StAX cover it without any external
  * dependency. Replaces the reference's `pd.read_excel` raw-ingest step
  * (`Billion_Dollar/DATA PREPROCESSING/noaa_disaster_db.ipynb` cell 0,
  * EDGAR `C02_Emissions_-2.ipynb` cell 1).
  *
  * Supported surface (what the reference's workbooks use): shared and
  * inline strings, numeric/boolean cells, sparse rows (missing cells →
  * NULL), header row, and pandas-style numeric inference (a column whose
  * every non-null value parses as Long → LongType, else Double, else
  * String).
  *
  * Scale posture: the XLSX container is not splittable and its XML
  * inflates ~10× over the data it carries, so this reader is the
  * DRIVER-SIDE ingest seam for small raw workbooks — parse once,
  * `createDataFrame`, then write parquet (the documented pre-conversion
  * posture). Anything large should never ship as XLSX in the first
  * place.
  */
object Xlsx {

  private def newFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // workbook XML is data, not documents: no DTDs, no external entities
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** Column letters of an A1-style reference → 0-based index
    * (A→0, Z→25, AA→26). */
  def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
  }

  /** xl/sharedStrings.xml → indexed string table (rich-text runs inside
    * one <si> concatenate, matching how Excel renders them). */
  private def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val in = zip.getInputStream(entry)
    try {
      val r = newFactory().createXMLStreamReader(in)
      val out = IndexedSeq.newBuilder[String]
      val sb = new StringBuilder
      var inSi = false
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "si" => inSi = true; sb.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "si" => inSi = false; out += sb.toString
            case "t" => inT = false
            case _ =>
          }
          case _ =>
        }
      }
      out.result()
    } finally in.close()
  }

  /** xl/worksheets/sheetN.xml → one sparse (colIndex → rawValue) map per
    * row. Cell types: t="s" shared string, t="inlineStr" inline text,
    * t="b" boolean, otherwise the literal <v> content. */
  private def sheetRows(zip: ZipFile, sheet: Int,
                        shared: IndexedSeq[String]): Seq[Map[Int, String]] = {
    val entry = zip.getEntry(s"xl/worksheets/sheet$sheet.xml")
    require(entry != null, s"workbook has no xl/worksheets/sheet$sheet.xml")
    val in = zip.getInputStream(entry)
    try {
      val r = newFactory().createXMLStreamReader(in)
      val rows = Seq.newBuilder[Map[Int, String]]
      var cur: mutable.Map[Int, String] = null
      var cellCol = -1
      var cellType = ""
      var capture = false
      var hasVal = false
      var nextCol = 0
      val sb = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => cur = mutable.Map.empty; nextCol = 0
            case "c" if cur != null =>
              // cells without an r= attribute (writers may omit it) fall
              // back to sequential placement
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(nextCol)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              sb.clear(); hasVal = false
            case "v" | "t" if cur != null && cellCol >= 0 =>
              capture = true
            case _ =>
          }
          case XMLStreamConstants.CHARACTERS if capture => sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            // text ACCUMULATES across elements and is assigned at cell end:
            // a rich-text inline string is several <r><t>…</t></r> runs in
            // one <is>, which concatenate into the cell value (the same
            // rendering the sharedStrings path gives multi-run <si>s) —
            // assigning per-<t> would keep only the last run
            case "v" | "t" if capture => capture = false; hasVal = true
            case "c" if cur != null =>
              if (hasVal && cellCol >= 0) {
                cur(cellCol) = cellType match {
                  case "s" => shared(sb.toString.trim.toInt)
                  case "b" => if (sb.toString.trim == "1") "true" else "false"
                  case _ => sb.toString
                }
              }
              nextCol = cellCol + 1; cellCol = -1; hasVal = false
            case "row" if cur != null => rows += cur.toMap; cur = null
            case _ =>
          }
          case _ =>
        }
      }
      rows.result()
    } finally in.close()
  }

  /** Read sheet `sheet` (1-based) of an .xlsx into a DataFrame. */
  def read(spark: SparkSession, path: String, sheet: Int = 1,
           header: Boolean = true, infer: Boolean = true): DataFrame = {
    val zip = new ZipFile(path)
    val rowMaps =
      try sheetRows(zip, sheet, sharedStrings(zip))
      finally zip.close()
    if (rowMaps.isEmpty) return spark.emptyDataFrame
    val width = rowMaps.map(m => if (m.isEmpty) 0 else m.keys.max + 1).max
    val grid = rowMaps.map(m => (0 until width).map(i => m.get(i).orNull))
    val (names, data) =
      if (header) {
        val hs = grid.head.zipWithIndex.map { case (h, i) =>
          Option(h).map(_.trim).filter(_.nonEmpty).getOrElse(s"_c$i") }
        (hs, grid.tail)
      } else ((0 until width).map(i => s"_c$i"), grid)
    def longOk(s: String) = s.nonEmpty && (try { s.toLong; true } catch { case _: NumberFormatException => false })
    def doubleOk(s: String) = s.nonEmpty && (try { s.toDouble; true } catch { case _: NumberFormatException => false })
    val types: Seq[DataType] = (0 until width).map { i =>
      val vs = data.flatMap(r => Option(r(i)))
      if (!infer || vs.isEmpty) StringType
      else if (vs.forall(longOk)) LongType
      else if (vs.forall(doubleOk)) DoubleType
      else StringType
    }
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true) })
    val rows = new java.util.ArrayList[Row](data.length)
    data.foreach { r =>
      rows.add(Row.fromSeq((0 until width).map { i =>
        r(i) match {
          case null => null
          case v => types(i) match {
            case LongType => v.toLong
            case DoubleType => v.toDouble
            case _ => v
          }
        }
      }))
    }
    spark.createDataFrame(rows, schema)
  }
}
