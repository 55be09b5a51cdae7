package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

class TextIntSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeTemp(content: String): String = {
    val dir = Files.createTempDirectory("graft_textint_v2")
    Files.write(dir.resolve("part-00000.txt"), content.getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  private def readV2(path: String, chunkSize: Long): Seq[Int] =
    spark.read.format("textint")
      .option("chunkSize", chunkSize)
      .load(path)
      .as[Int].collect().toSeq

  test("every chunkSize yields the same multiset: no token split or double-read") {
    // tokens of varying width, multi-space runs, newlines — every boundary
    // position in this content is hit by some chunkSize below
    val content = "7 42  999999 3\n1000000 5 -12  8 123456789 0"
    val expected = Seq(7, 42, 999999, 3, 1000000, 5, -12, 8, 123456789, 0)
    val path = writeTemp(content)
    (1L to content.length + 2).foreach { cs =>
      val got = readV2(path, cs)
      assert(got.sorted == expected.sorted, s"chunkSize=$cs got $got")
    }
  }

  test("split planning: ceil(len/chunkSize) partitions, metadata only") {
    val content = "1 2 3 4 5 6 7 8 9 10"
    val path = writeTemp(content)
    val df = spark.read.format("textint").option("chunkSize", 7).load(path)
    assert(df.rdd.getNumPartitions == (content.length + 6) / 7)
    assert(df.as[Int].collect().sorted.toSeq == (1 to 10))
  }

  test("agrees with TextIntIO.read on the same file") {
    val ints = Seq(5, 3, 999999, 1000001, -7, 0, 42)
    val path = writeTemp(ints.mkString(" "))
    val viaV2 = readV2(path, 4)
    val viaText = graft.sources.TextIntIO.read(spark, path).as[Int].collect().toSeq
    assert(viaV2.sorted == viaText.sorted)
  }

  test("lenient default drops malformed tokens; strict mode names them") {
    val path = writeTemp("1 x2x 3")
    assert(readV2(path, 100).sorted == Seq(1, 3))
    val strict = spark.read.format("textint")
      .option("lenient", false).load(path)
    val e = intercept[org.apache.spark.SparkException] { strict.collect() }
    assert(e.getCause.getMessage.contains("x2x"))
  }

  test("empty file and whitespace-only file read as zero rows") {
    assert(readV2(writeTemp(""), 10).isEmpty)
    assert(readV2(writeTemp("   \n  "), 3).isEmpty)
  }

  test("values beyond the reference's 999999 sentinel survive (bug not inherited)") {
    val ints = Seq(999998, 999999, 1000000, Int.MaxValue, Int.MinValue)
    val path = writeTemp(ints.mkString(" "))
    (1L to 12L).foreach { cs =>
      assert(readV2(path, cs).sorted == ints.sorted, s"chunkSize=$cs")
    }
  }

  test("directory input: all part files read, underscore/dot files skipped") {
    val dir = Files.createTempDirectory("graft_textint_dir")
    Files.write(dir.resolve("a.txt"), "1 2".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("b.txt"), "3 4".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("_SUCCESS"), "99".getBytes(StandardCharsets.UTF_8))
    assert(readV2(dir.toString, 100).sorted == Seq(1, 2, 3, 4))
  }

  test("V2 write: round trip preserves the multiset; files are space-joined") {
    val tmp = Files.createTempDirectory("graft_v2w").toString + "/out"
    val xs = Seq(5, -3, 999999, 0, 1000000, 42)
    xs.toDF("value").coalesce(2).write.format("textint").mode("append").save(tmp)
    assert(readV2(tmp, 16).sorted == xs.sorted)
    // visible files are committed parts only — no temp residue (hidden
    // .crc checksums are Hadoop LocalFS artifacts, invisible to readers)
    // — and the content is the reference's exact format (single spaces,
    // no trailing delimiter)
    val files = new java.io.File(tmp).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(files.nonEmpty && files.forall(_.startsWith("part-")), files.mkString(","))
    val body = new String(Files.readAllBytes(
      new java.io.File(tmp, files.head).toPath), StandardCharsets.UTF_8)
    assert(!body.startsWith(" ") && !body.endsWith(" ") && !body.contains("  "))
  }

  test("V2 write: overwrite truncates old parts atomically in the commit") {
    val tmp = Files.createTempDirectory("graft_v2o").toString + "/out"
    Seq(1, 2, 3).toDF("value").write.format("textint").mode("append").save(tmp)
    Seq(9, 8).toDF("value").write.format("textint").mode("overwrite").save(tmp)
    assert(readV2(tmp, 64).sorted == Seq(8, 9))
  }

  test("V2 write of a range-partitioned sort: part concat IS the total order") {
    val tmp = Files.createTempDirectory("graft_v2s").toString + "/out"
    val ints = sf("lineitem").select(col("l_orderkey").cast("int").as("value"))
    ints.repartitionByRange(4, col("value")).sortWithinPartitions("value")
      .write.format("textint").mode("append").save(tmp)
    // concatenating part files in name order must already be sorted —
    // the TeraSort contract, no post-sort read needed
    val dir = new java.io.File(tmp)
    val concat = dir.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .flatMap(f => new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
        .split("\\s+").filter(_.nonEmpty).map(_.toInt)).toSeq
    assert(concat == concat.sorted && concat.sorted == ints.as[Int].collect().toSeq.sorted)
  }

  test("end-to-end: V2 scan of a TeraSort-partitioned write, totally sorted") {
    val ints = sf("lineitem").select(col("l_orderkey").cast("int").as("value"))
    val tmp = Files.createTempDirectory("graft_textint_rt").toString
    graft.sources.TextIntIO.writePartitioned(ints, s"$tmp/ints")
    val back = spark.read.format("textint").option("chunkSize", 4096)
      .load(s"$tmp/ints").orderBy("value").as[Int].collect().toSeq
    val expected = ints.as[Int].collect().toSeq.sorted
    assert(back == expected)
  }
}
