package graft

import org.apache.spark.sql.functions._

import graft.operators.{MediaRow, MultimodalOps}

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("asMedia: binary payload is the UTF-8 bytes, kind round-robins") {
    val m = MultimodalOps.asMedia(docs((0L, "ab"), (1L, "cd"), (2L, "ef"), (3L, "gh")))
    val got = m.as[MediaRow].collect().map(r => r.media_id -> (r.kind, new String(r.payload, "UTF-8"))).toMap
    assert(got(0L) == ("image", "ab"))
    assert(got(1L) == ("audio", "cd"))
    assert(got(2L) == ("video", "ef"))
    assert(got(3L) == ("image", "gh"))
  }

  test("mediaMeta: length, md5, magic on a hand-checked payload") {
    val r = MultimodalOps.mediaMeta(MultimodalOps.asMedia(docs((1L, "hello")))).head()
    assert(r.getAs[Long]("n_bytes") == 5L)
    assert(r.getAs[String]("fp_md5") == "5d41402abc4b2a76b9719d911017c592")
    assert(r.getAs[String]("magic") == "68656c6c") // 'hell'
  }

  test("frameSample: 8 evenly spaced bytes; short payloads dropped") {
    val text16 = "abcdefghijklmnop" // 16 bytes, step 2: a c e g i k m o
    val df = MultimodalOps.frameSample(MultimodalOps.asMedia(docs((1L, text16), (2L, "short"))))
    val rows = df.collect()
    assert(rows.length == 1)
    val expected = "acegikmo".getBytes("UTF-8").map("%02x".format(_)).mkString
    assert(rows(0).getAs[String]("frame_hex") == expected)
  }

  test("decodeFeatures: typed per-partition decode emits byte stats") {
    val media = MultimodalOps.asMedia(docs((1L, "hello"))).repartition(4)
    val got = MultimodalOps.decodeFeatures(media.as[MediaRow]).collect()
    assert(got.length == 1)
    val f = got(0)
    assert(f.n_bytes == 5L)
    assert(f.b_first == 'h'.toLong && f.b_last == 'o'.toLong)
    assert(f.checksum == ('h' + 'o') % 256)
  }

  test("decodeFeatures: empty payload is safe") {
    val media = Seq(MediaRow(9L, "image", Array.emptyByteArray)).toDS()
    val f = MultimodalOps.decodeFeatures(media).collect()(0)
    assert(f.n_bytes == 0L && f.b_first == 0L && f.b_last == 0L)
  }
}
