package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("zvalue interleaves bits (hand-computed points)") {
    import spark.implicits._
    // x=0b11, y=0b01 at 2 bits → z = y1 x1 y0 x0 = 0 1 1 1 = 7
    val got = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.zvalue(Seq($"x", $"y"), bits = 2)).as[Long].head()
    assert(got === 7L)
    // locality: near points interleave to near z-values
    val zs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (1023L, 1023L))
      .toDF("x", "y")
      .select(ZOrder.zvalue(Seq($"x", $"y"), bits = 10)).as[Long].collect().toSeq
    assert(zs === Seq(0L, 1L, 2L, 3L, (1L << 20) - 1))
  }

  test("z-clustered files prune on EITHER column; linear sort only on its own") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("wh-zorder"))
    val grid = spark.range(0, 1 << 14).toDF("i")
      .select(($"i" % 128).as("x"), ($"i" / 128).cast("long").as("y"),
        $"i".as("payload"))

    val zref = TableRef("silver", "facts", "zordered")
    wh.overwrite(zref,
      grid.repartitionByRange(16, ZOrder.zvalue(Seq($"x", $"y"), bits = 7)),
      statsColumns = Seq("x", "y"))
    val zTotal = wh.read(zref).inputFiles.length
    val zPrunedX = wh.readPruned(zref, "x", 0L, 15L).inputFiles.length
    val zPrunedY = wh.readPruned(zref, "y", 0L, 15L).inputFiles.length
    assert(zPrunedX < zTotal, s"x-pruning: $zPrunedX vs $zTotal")
    assert(zPrunedY < zTotal, s"y-pruning: $zPrunedY vs $zTotal")

    // control: linear clustering on x prunes x but cannot prune y
    val lref = TableRef("silver", "facts", "linear")
    wh.overwrite(lref, grid.repartitionByRange(16, $"x"),
      statsColumns = Seq("x", "y"))
    val lTotal = wh.read(lref).inputFiles.length
    assert(wh.readPruned(lref, "x", 0L, 15L).inputFiles.length < lTotal)
    assert(wh.readPruned(lref, "y", 0L, 15L).inputFiles.length === lTotal)

    // pruning never changes results
    val exact = wh.readPruned(zref, "y", 0L, 15L)
      .filter($"y".between(0L, 15L)).count()
    assert(exact === wh.read(zref).filter($"y".between(0L, 15L)).count())
  }

  test("z-ordered compact keeps BOTH columns pruning after maintenance") {
    import spark.implicits._
    val wh = new Warehouse(spark, tmpDir("wh-zorder-compact"))
    val grid = spark.range(0, 1 << 14).toDF("i")
      .select(($"i" % 128).as("x"), ($"i" / 128).cast("long").as("y"),
        $"i".as("payload"))
    val ref = TableRef("silver", "facts", "z_compact")
    // a deliberately fragmented layout: many small unclustered files
    wh.overwrite(ref, grid.repartition(24), statsColumns = Seq("x", "y"))
    val hconf = spark.sparkContext.hadoopConfiguration
    def len(p: String) = { val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).getFileStatus(hp).getLen }
    val total = wh.dataFiles(ref).map(len).sum
    // force ~8 packed outputs, z-ordered on the stats columns
    assert(wh.compact(ref, smallFileBytes = 1L << 30,
      targetFileBytes = total / 8 + 1, zOrder = true) === 24)
    val files = wh.dataFiles(ref).length
    assert(files > 2, s"need several packed files to prove pruning, got $files")
    assert(wh.readPruned(ref, "x", 0L, 15L).inputFiles.length < files)
    assert(wh.readPruned(ref, "y", 0L, 15L).inputFiles.length < files)
    assert(wh.readPruned(ref, "y", 0L, 15L)
      .filter($"y".between(0L, 15L)).count() ===
      grid.filter($"y".between(0L, 15L)).count())
  }
}
