package graft

import org.apache.spark.sql.functions._

/** q183: the Avro Object Container File roundtrip built on avro-core at
  * the mapPartitions kernel boundary (spark-avro does not ship in this
  * container). Raw kernel fidelity is asserted row-exactly here; the
  * catalog query asserts aggregate equality against the DuckDB oracle.
  */
class AvroRoundtripSpec extends SparkSpec {
  import spark.implicits._

  test("avro container roundtrip preserves rows exactly, including " +
      "unicode strings, negatives, and special doubles") {
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"Order","fields":[
        {"name":"o_orderkey","type":"long"},
        {"name":"o_orderstatus","type":"string"},
        {"name":"o_totalprice","type":"double"}]}""")
    val rows = Seq(
      (1L, "O", 123.45), (-7L, "Ünïcødé ✓", -0.0),
      (Long.MaxValue, "", 1e300), (0L, "F", Double.MinPositiveValue))
    val f = java.io.File.createTempFile("avrospec_", ".avro")
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    w.create(schema, f)
    rows.foreach { case (k, st, tp) =>
      val r = new org.apache.avro.generic.GenericData.Record(schema)
      r.put("o_orderkey", k); r.put("o_orderstatus", st)
      r.put("o_totalprice", tp)
      w.append(r)
    }
    w.close()
    val rd = new org.apache.avro.file.DataFileReader(f,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val back = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Double)]
    while (rd.hasNext) {
      val r = rd.next()
      back += ((r.get("o_orderkey").asInstanceOf[Long],
        r.get("o_orderstatus").toString,
        r.get("o_totalprice").asInstanceOf[Double]))
    }
    rd.close(); f.delete()
    assert(back.toSeq == rows)
  }

  test("q183 equals the direct aggregate over the source table " +
      "(format fidelity end to end)") {
    val sf = "/root/testdata/sf0.001"
    val viaAvro = SparkEntry.queries("q183_avro_roundtrip")(spark, sf)
      .collect().toSeq
    val direct = graft.schema.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("price_cents"))
      .orderBy(col("o_orderstatus")).collect().toSeq
    assert(viaAvro == direct)
    assert(viaAvro.nonEmpty)
  }
}
