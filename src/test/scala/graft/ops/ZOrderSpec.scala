package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.{StateStore, Warehouse}

/** C100: Z-order (Morton) clustering — exact interleave math and the
  * layout property it exists for (2-D box filters touch few files). */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: hand-computed morton values") {
    // a=0b101, b=0b011 -> z bits (a0,b0,a1,b1,a2,b2) = 1,1,0,1,1,0
    //   = 1 + 2 + 8 + 16 = 27
    val out = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), 3)).head().getLong(0)
    assert(out == 27L)
    // identity cases: b=0 spreads a's bits to even positions
    val even = Seq((7L, 0L)).toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), 3)).head().getLong(0)
    assert(even == (1L + 4L + 16L)) // bits 0,2,4
  }

  test("interleave: bijective on the full bucket grid (exhaustive, bits=4)") {
    // 16x16 bucket pairs must map to exactly the 256 distinct z values
    // 0..255 — interleaving is a permutation of the key space, so no
    // two cells ever collide into one curve position
    val grid = (for { a <- 0L until 16L; b <- 0L until 16L } yield (a, b))
      .toDF("a", "b")
    val zs = grid.select(ZOrder.interleave(col("a"), col("b"), 4))
      .collect().map(_.getLong(0)).sorted
    assert(zs.toSeq == (0L until 256L))
  }

  test("bucket: order-preserving, endpoint-exact, clamped") {
    val xs = Seq(-5L, 0L, 3L, 9L, 42L).toDF("x")
    val out = xs.select(ZOrder.bucket(col("x"), 0L, 9L, 4)).collect()
      .map(_.getLong(0))
    // -5 clamps to min -> 0; 42 clamps to max -> bucket(9) = 90 div 10 = 14
    assert(out.toSeq == Seq(0L, 0L, 4L, 14L, 14L))
    // monotone over the whole domain
    val dom = (0L to 9L).toDF("x")
      .select(ZOrder.bucket(col("x"), 0L, 9L, 4)).collect().map(_.getLong(0))
    assert(dom.toSeq == dom.toSeq.sorted)
  }

  test("bucket: overflow headroom is a loud require, not silent garbage") {
    intercept[IllegalArgumentException] {
      ZOrder.bucket(col("x"), 0L, Long.MaxValue - 1, 16)
    }
  }

  test("withZValue: NULLs bucket to the curve origin, rows kept") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (null, 20L), (3L, null)).toDF("a", "b")
    val out = ZOrder.withZValue(df, "a", "b", 4).collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2)))
    assert(out.length == 3)
    // a NULL dimension contributes bucket 0, NOT a clamped-to-max
    // bucket (least/greatest skip nulls — the gated clamp pins this):
    // null-a row's z must equal interleave(0, bucket(b)), which has no
    // even (a-side) bits set
    val nullA = out.find(_._1.isEmpty).get._3
    assert((0 until 4).forall(i => ((nullA >> (2 * i)) & 1L) == 0L),
      s"null a leaked into a-side bits: $nullA")
    val nullB = out.find(_._2.isEmpty).get._3
    assert((0 until 4).forall(i => ((nullB >> (2 * i + 1)) & 1L) == 0L),
      s"null b leaked into b-side bits: $nullB")
  }

  test("withZValue: an all-NULL dimension degrades to one side, not to z=0") {
    // colA entirely NULL must not collapse the curve — colB still
    // produces a spread of z values (else range partitioning by __z
    // degenerates to one giant file)
    val df = (0L until 32L)
      .map(i => (None: Option[Long], i)).toDF("a", "b")
    val zs = ZOrder.withZValue(df, "a", "b", 5).collect()
      .map(_.getLong(2)).distinct
    assert(zs.length > 1, s"z collapsed: ${zs.toSeq}")
  }

  test("z-ordered layout: a 2-D box filter touches few files") {
    // 64x64 grid, identity buckets (min 0, max 63, bits 6); an aligned
    // 8x8 box occupies ONE contiguous z-run of 64 values out of 4096,
    // so with 16 range-partitioned files (~256 z-values each) the box
    // must land in <= 3 files. A single-column sort would smear the
    // second dimension across ALL files.
    val grid = (for { a <- 0L until 64L; b <- 0L until 64L } yield (a, b))
      .toDF("a", "b")
    val whDir = java.nio.file.Files.createTempDirectory("graft_z_wh_").toString
    val wh = new Warehouse(spark, whDir, StateStore(whDir + "/state"))
    wh.writeVersionZOrdered("grid_z", grid, "a", "b", numFiles = 16, bits = 6)
    val matches = wh.read("grid_z")
      .filter(col("a").between(16, 23) && col("b").between(16, 23))
      .select(input_file_name().as("f"))
    assert(matches.count() == 64L)
    val files = matches.distinct().count()
    assert(files <= 3, s"2-D box smeared across $files files")
    // layout is results-invariant: full content round-trips
    assert(wh.read("grid_z").count() == 64L * 64L)
  }

  test("numFiles=0 sizes the layout by bytes and tracks data volume") {
    val whDir = java.nio.file.Files.createTempDirectory("graft_z_wh_").toString
    val wh = new Warehouse(spark, whDir, StateStore(whDir + "/state"))
    val grid = (for { a <- 0L until 64L; b <- 0L until 64L } yield (a, b))
      .toDF("a", "b")
    def fileCount(model: String): Long =
      wh.read(model).select(input_file_name()).distinct().count()
    // default 128 MB target: tiny frame -> one file
    wh.writeVersionZOrdered("z_auto", grid, "a", "b", bits = 6)
    assert(fileCount("z_auto") == 1L)
    // a small byte target splits the same data into multiple files, so
    // the count TRACKS volume instead of each file silently growing
    wh.writeVersionZOrdered("z_small", grid, "a", "b", bits = 6,
      targetFileBytes = 8L * 1024)
    val small = fileCount("z_small")
    assert(small > 1L, s"expected multiple files, got $small")
    // content is layout-invariant across both sizings
    assert(wh.read("z_auto").count() == 64L * 64L &&
      wh.read("z_small").count() == 64L * 64L)
    // range-clustered writes share the sizing contract
    wh.writeVersionRangeClustered("rc_auto", grid, Seq("a"))
    assert(fileCount("rc_auto") == 1L)
  }
}
