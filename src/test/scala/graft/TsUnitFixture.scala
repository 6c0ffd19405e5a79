package graft

import java.nio.file.{Files, Path}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.MessageTypeParser

/** Test-side writer of a tiny events-shaped parquet with `ts` annotated
  * TIMESTAMP(unit, isAdjustedToUTC=false) for an arbitrary unit — Spark
  * cannot WRITE TIMESTAMP(NANOS), so the file is produced with the
  * parquet-java example writer (same approach as [[graft.etl.UnsignedFixture]]).
  *
  * The driver has already regenerated `/root/testdata` with a different
  * unit once (round 7: NANOS→MICROS), so both unit paths of
  * [[Tables.events]] need a regression fixture that does NOT depend on
  * whatever unit the current testdata happens to carry.
  */
object TsUnitFixture {

  /** Epoch seconds of 2024-01-01T00:00:00Z — all fixture rows land in 2024. */
  val BaseEpochSec = 1704067200L

  /** Write `rows` events rows into `dir/events.parquet` with ts in `unit`
    * ("NANOS" | "MICROS" | "MILLIS"); row i has ts = base + i seconds. */
  def writeEvents(dir: Path, unit: String, rows: Int = 100): Path = {
    Files.createDirectories(dir)
    val file = dir.resolve("events.parquet")
    val schema = MessageTypeParser.parseMessageType(
      s"""message events {
         |  required int64 event_id;
         |  required int64 ts (TIMESTAMP($unit,false));
         |  required int64 user_id;
         |  required binary event_type (STRING);
         |  required double value;
         |  required binary props (STRING);
         |}""".stripMargin)
    val perSec = unit match {
      case "NANOS"  => 1000000000L
      case "MICROS" => 1000000L
      case "MILLIS" => 1000L
      case u        => sys.error(s"unsupported unit $u")
    }
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(file.toString))
      .withConf(new Configuration())
      .withType(schema)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val gf = new SimpleGroupFactory(schema)
    var i = 0
    while (i < rows) {
      val g = gf.newGroup()
      g.append("event_id", i.toLong)
      g.append("ts", (BaseEpochSec + i) * perSec)
      g.append("user_id", (i % 7).toLong)
      g.append("event_type", s"t${i % 3}")
      g.append("value", i * 0.5)
      g.append("props", s"""{"i":$i}""")
      writer.write(g)
      i += 1
    }
    writer.close()
    file
  }
}
