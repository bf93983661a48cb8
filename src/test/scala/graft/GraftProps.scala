package graft

import graft.functions.AvroDecodeIngestion
import graft.ops.Multimodal
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.BinaryType
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import java.io.ByteArrayOutputStream

/** Property-based checks (SURVEY §5.3) for the driver-side pure pieces —
  * no SparkSession needed, so thousands of cases run in milliseconds. */
object GraftProps extends Properties("graft") {

  property("decodeStub: histogram sums to 1 for nonempty input, 0 for empty") =
    forAll { (bytes: Array[Byte]) =>
      val h = Multimodal.decodeStub(bytes)
      h.length == 16 && {
        if (bytes.isEmpty) h.forall(_ == 0f)
        else math.abs(h.sum - 1.0f) < 1e-4
      }
    }

  property("decodeStub: deterministic") = forAll { (bytes: Array[Byte]) =>
    Multimodal.decodeStub(bytes).toSeq == Multimodal.decodeStub(bytes).toSeq
  }

  property("frameOffsets: video covers [0, n) with stride 64, stills sample once") =
    forAll(Gen.choose(0, 100000)) { n =>
      val v = Multimodal.frameOffsets("video/mp4", n)
      val img = Multimodal.frameOffsets("image/png", n)
      v.length == (n + 63) / 64 &&
        v.forall(o => o >= 0 && o < math.max(n, 1)) &&
        (v.isEmpty || v.head == 0) &&
        img.toSeq == Seq(0)
    }

  private val schema = new Schema.Parser().parse(AvroDecodeIngestion.SchemaJson)
  private val genTag = for {
    k <- Gen.alphaNumStr.suchThat(_.nonEmpty)
    v <- Gen.alphaNumStr
  } yield (k, v)
  private val genRecord = for {
    uuid <- Gen.uuid.map(_.toString)
    ms <- Gen.choose(0L, 4102444800000L)
    tags <- Gen.option(Gen.listOfN(3, genTag))
  } yield (uuid, ms, tags)

  private def encode(uuid: String, ms: Long, tags: Option[List[(String, String)]]): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    rec.put("identifier", "id"); rec.put("name", "n"); rec.put("uuid", uuid)
    rec.put("type", "t"); rec.put("ingestion_time", ms)
    tags.foreach { ts =>
      val tagSchema = schema.getField("tags").schema().getTypes.get(1)
      val arr = new GenericData.Array[GenericRecord](ts.size, tagSchema)
      ts.foreach { case (k, v) =>
        val t = new GenericData.Record(tagSchema.getElementType)
        t.put("type", k); t.put("value", v); arr.add(t)
      }
      rec.put("tags", arr)
    }
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  property("avro decode inverts avro encode (uuid, time, tag count)") =
    forAll(genRecord) { case (uuid, ms, tags) =>
      val row = AvroDecodeIngestion(Literal(encode(uuid, ms, tags), BinaryType))
        .eval(InternalRow.empty).asInstanceOf[InternalRow]
      val tagsOk = tags match {
        case None => row.isNullAt(5)
        case Some(ts) => row.getArray(5).numElements() == ts.size
      }
      row.getUTF8String(2).toString == uuid && row.getLong(4) == ms && tagsOk
    }

  // The stopword hit-count regex (TextAnalysis.hitCount) must equal
  // whole-token counting WITH multiplicity on normalized text — Spark
  // evaluates it with java.util.regex, so this pure-JVM property covers
  // the engine-side semantics of the r3 lambda->regex rewrite.
  private val stopwords = graft.ops.TextAnalysis.LangStopwords.flatMap(_._2)
  private val hitPattern = java.util.regex.Pattern.compile(
    graft.ops.TextAnalysis.wordPattern(stopwords))
  private val genToken =
    Gen.oneOf(Gen.oneOf(stopwords), Gen.oneOf("fox", "und9", "theo", "a1", "的了", "x"))

  property("stopword regex count == whole-token count with multiplicity") =
    forAll(Gen.listOf(genToken)) { tokens =>
      val text = tokens.mkString(" ")
      val m = hitPattern.matcher(text)
      var found = 0
      while (m.find()) found += 1
      found == tokens.count(stopwords.contains)
    }

  property("avro decode never throws on arbitrary bytes (null or row)") =
    forAll { (bytes: Array[Byte]) =>
      val r = AvroDecodeIngestion(Literal(bytes, BinaryType)).eval(InternalRow.empty)
      r == null || r.isInstanceOf[InternalRow] // reaching here means no exception
    }

  // Int8 quantizer contract (graft.functions.VecQuantize): codes stay in
  // [-127, 127] and per-element reconstruction error is ≤ scale/2 — the
  // defining property of round-to-nearest symmetric quantization. Pure
  // expression eval; the codegen path is pinned by SimilaritySpec.
  private val genVec = Gen.nonEmptyListOf(
    Gen.chooseNum(-1000.0f, 1000.0f)).map(_.toArray)

  property("vec_quantize: int8-ranged codes, reconstruction error <= scale/2") =
    forAll(genVec) { xs =>
      import org.apache.spark.sql.types.{ArrayType, FloatType}
      val lit = Literal.create(xs, ArrayType(FloatType))
      val codes = graft.functions.VecQuantize(lit)
        .eval(InternalRow.empty)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toByteArray()
      val scale = graft.functions.VecMaxAbsScale(lit)
        .eval(InternalRow.empty).asInstanceOf[Double]
      codes.length == xs.length &&
        codes.forall(c => c >= -127 && c <= 127) &&
        (if (scale == 0.0) codes.forall(_ == 0)
         else xs.indices.forall { i =>
           math.abs(xs(i).toDouble - codes(i) * scale) <=
             scale * 0.5000001 + 1e-12
         })
    }

  property("vec_dotq equals the integer dot of the evaled codes") =
    forAll(genVec) { xs =>
      import org.apache.spark.sql.types.{ArrayType, ByteType, FloatType}
      val lit = Literal.create(xs, ArrayType(FloatType))
      val codes = graft.functions.VecQuantize(lit)
        .eval(InternalRow.empty)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toByteArray()
      // toSeq: an Array[Byte] literal would be BINARY, not array<tinyint>
      val clit = Literal.create(codes.toSeq, ArrayType(ByteType))
      val dot = graft.functions.VecDotQ(clit, clit)
        .eval(InternalRow.empty).asInstanceOf[Long]
      dot == codes.map(c => c.toLong * c.toLong).sum && dot >= 0
    }

  property("tokBucket: stable and within [0, IndexBuckets) for any term") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { tok =>
      val b = graft.ops.Search.tokBucket(tok)
      b >= 0 && b < graft.ops.Search.IndexBuckets &&
        b == graft.ops.Search.tokBucket(tok)
    }

  private val genWord = Gen.choose(1, 6)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  property("wordPattern: anchored-regex count equals whole-token count") =
    forAll(Gen.listOfN(12, genWord).suchThat(_.nonEmpty)) { pool =>
      // a normalized text drawn from the pool; count the first word both
      // ways — the regex mechanism underlying hitCount/langId/gopher/
      // bm25 must agree with naive token equality, including when the
      // target is a prefix/suffix/substring of neighbors in the pool
      val target = pool.head
      val text = (pool ++ pool.take(5)).mkString(" ")
      val rx = java.util.regex.Pattern
        .compile(graft.ops.TextAnalysis.wordPattern(Seq(target)))
      val m = rx.matcher(text)
      var hits = 0
      while (m.find()) hits += 1
      hits == text.split(' ').count(_ == target)
    }
}
