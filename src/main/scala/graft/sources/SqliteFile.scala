package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Read-only reader for the SQLite main database file format (the
  * published spec: sqlite.org/fileformat2.html) — no JDBC driver needed.
  * Covers exactly what a legacy-bootstrap ingest requires: table b-trees
  * (interior + leaf pages), overflow-page chains, the record serial-type
  * codec, short records from ALTER TABLE ADD COLUMN, and
  * INTEGER-PRIMARY-KEY rowid aliasing.
  *
  * Reference analogue: sqlite_to_postgresql/etl.py:62-117 reads this
  * exact file through the sqlite3 driver. This container ships no SQLite
  * JDBC driver, so we read the (public) file format directly; the parsed
  * tables then flow through the same JDBC source/sink path as any other
  * relational source (see [[JdbcIO]] and GoldenJdbcSpec).
  *
  * Driver-side by design: a legacy bootstrap file is sub-MB control
  * data, not data-plane input. The resulting DataFrame distributes; the
  * 100 TB path never touches this reader.
  */
object SqliteFile {

  /** Read one table into a DataFrame with the declared schema.
    *
    * @param rowidAlias column declared INTEGER PRIMARY KEY in the source
    *        DDL — SQLite stores NULL in the record for it and the real
    *        value is the b-tree rowid (fileformat2.html §2.1).
    */
  def readTable(
      spark: SparkSession, path: String, table: String,
      schema: StructType, rowidAlias: Option[String] = None): DataFrame = {
    val db = new Db(Files.readAllBytes(Paths.get(path)))
    val root = db.masterRootPages.getOrElse(table,
      sys.error(s"no table '$table' in $path; " +
        s"have: ${db.masterRootPages.keys.mkString(", ")}"))
    val aliasIdx = rowidAlias.map(schema.fieldIndex)
    val rows = new java.util.ArrayList[Row]()
    db.tableRows(root).foreach { case (rowid, rec) =>
      val vals = schema.fields.zipWithIndex.map { case (f, i) =>
        val raw =
          if (i < rec.length) rec(i) else null // ADD COLUMN short record
        val aliased =
          if (aliasIdx.contains(i) && raw == null) rowid else raw
        convert(aliased, f.dataType)
      }
      rows.add(Row.fromSeq(vals.toSeq))
    }
    spark.createDataFrame(rows, schema)
  }

  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, LongType) => l
    case (l: Long, IntegerType) => l.toInt
    case (l: Long, StringType) => l.toString
    case (l: Long, DoubleType) => l.toDouble
    case (d: Double, DoubleType) => d
    case (d: Double, StringType) => d.toString
    case (s: String, StringType) => s
    case (s: String, LongType) => s.toLong
    case (b: Array[Byte], BinaryType) => b
    case (x, t) => sys.error(s"cannot convert ${x.getClass} to $t")
  }

  /** One open database image; all offsets per fileformat2.html. */
  private final class Db(bytes: Array[Byte]) {
    require(bytes.length > 100 &&
      new String(bytes, 0, 15, "ISO-8859-1") == "SQLite format 3",
      "not a SQLite 3 database file")

    private val pageSize: Int = {
      val raw = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
      if (raw == 1) 65536 else raw
    }
    private val usable: Int = pageSize - (bytes(20) & 0xff)
    private val maxLeaf: Int = usable - 35
    private val minLeaf: Int = (usable - 12) * 32 / 255 - 23

    private def u8(o: Int): Int = bytes(o) & 0xff
    private def u16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    private def u32(o: Int): Long =
      (u16(o).toLong << 16) | u16(o + 2).toLong
    private def pageStart(p: Int): Int = (p - 1) * pageSize

    /** Big-endian base-128 varint at `o` in `buf`: (value, width). */
    private def varint(buf: Array[Byte], o: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = buf(o + i) & 0xff
        v = (v << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      ((v << 8) | (buf(o + 8) & 0xff), 9)
    }

    /** Leaf-cell payload starting at `off`, following overflow chains. */
    private def payload(off: Int, len: Long): Array[Byte] = {
      if (len <= maxLeaf)
        java.util.Arrays.copyOfRange(bytes, off, off + len.toInt)
      else {
        val k = (minLeaf + (len - minLeaf) % (usable - 4)).toInt
        val local = if (k <= maxLeaf) k else minLeaf
        val out = new Array[Byte](len.toInt)
        System.arraycopy(bytes, off, out, 0, local)
        var got = local
        var page = u32(off + local).toInt
        while (page != 0 && got < len) {
          val ps = pageStart(page)
          val chunk = math.min(usable - 4, len.toInt - got)
          System.arraycopy(bytes, ps + 4, out, got, chunk)
          got += chunk
          page = u32(ps).toInt
        }
        require(got == len, s"overflow chain truncated: $got of $len bytes")
        out
      }
    }

    /** Decode a record payload into column values (serial-type codec). */
    private def record(p: Array[Byte]): Array[Any] = {
      val (hdrLen, n0) = varint(p, 0)
      var o = n0
      val types = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (o < hdrLen) {
        val (t, n) = varint(p, o); types += t; o += n
      }
      var d = hdrLen.toInt
      def be(n: Int): Long = {
        var x = 0L
        var i = 0
        while (i < n) { x = (x << 8) | (p(d + i) & 0xff); i += 1 }
        val sh = 64 - 8 * n
        (x << sh) >> sh // sign-extend
      }
      types.map { t =>
        val out: Any = t match {
          case 0 => null
          case 1 => val x = be(1); d += 1; x
          case 2 => val x = be(2); d += 2; x
          case 3 => val x = be(3); d += 3; x
          case 4 => val x = be(4); d += 4; x
          case 5 => val x = be(6); d += 6; x
          case 6 => val x = be(8); d += 8; x
          case 7 =>
            val x = java.lang.Double.longBitsToDouble(be(8)); d += 8; x
          case 8 => 0L
          case 9 => 1L
          case s if s >= 13 && s % 2 == 1 =>
            val n = ((s - 13) / 2).toInt
            val x = new String(p, d, n, "UTF-8"); d += n; x
          case s if s >= 12 =>
            val n = ((s - 12) / 2).toInt
            val x = java.util.Arrays.copyOfRange(p, d, d + n); d += n; x
          case other => sys.error(s"reserved serial type $other")
        }
        out
      }.toArray
    }

    /** All (rowid, record) pairs in the table b-tree rooted at `page`. */
    def tableRows(page: Int): Iterator[(Long, Array[Any])] = {
      val ps = pageStart(page)
      val hdr = if (page == 1) ps + 100 else ps
      u8(hdr) match {
        case 5 => // table interior: left children + right-most pointer
          val nCells = u16(hdr + 3)
          val kids = (0 until nCells).iterator.map { i =>
            u32(ps + u16(hdr + 12 + 2 * i)).toInt
          } ++ Iterator(u32(hdr + 8).toInt)
          kids.flatMap(tableRows)
        case 13 => // table leaf
          val nCells = u16(hdr + 3)
          (0 until nCells).iterator.map { i =>
            val off = ps + u16(hdr + 8 + 2 * i)
            val (len, n1) = varint(bytes, off)
            val (rowid, n2) = varint(bytes, off + n1)
            (rowid, record(payload(off + n1 + n2, len)))
          }
        case other => sys.error(s"unexpected b-tree page type $other")
      }
    }

    /** sqlite_master (root = page 1): table name → root page. */
    val masterRootPages: Map[String, Int] =
      tableRows(1).map(_._2)
        .filter(r => r(0) == "table")
        .map(r => r(1).toString -> r(3).asInstanceOf[Long].toInt)
        .toMap
  }
}
