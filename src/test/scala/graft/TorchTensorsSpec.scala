package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.TorchTensors
import graft.queries.Tables.FixturesDir

class TorchTensorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parsePt decodes the torch zip/pickle/storage layout") {
    val f = new java.io.File(s"$FixturesDir/tensors")
      .listFiles().filter(_.getName.endsWith(".pt")).minBy(_.getName)
    val t = TorchTensors.parsePt(java.nio.file.Files.readAllBytes(f.toPath))
    assert(t.storageType == "IntStorage")
    assert(t.shape.length == 4 && t.shape(2) == 7 && t.shape(3) == 7)
    assert(t.data.length == t.shape.product)
  }

  test("toStationBands applies permute(1,0,2,3)") {
    // shape (bands=2, stations=3, 1, 1): data[b*3 + s]
    val t = TorchTensors.PtTensor("IntStorage", Seq(2, 3, 1, 1), Seq(3, 1, 1, 1), 0,
      Array(0, 1, 2, 10, 11, 12))
    val sb = TorchTensors.toStationBands(t)
    assert(sb.length == 3 && sb.head.length == 2)
    assert(sb(0).map(_.head) == Seq(0.0, 10.0)) // station 0: band0, band1
    assert(sb(2).map(_.head) == Seq(2.0, 12.0))
  }

  test("ingest produces one row per scene with permuted nested tensors") {
    val df = TorchTensors.ingest(spark, s"$FixturesDir/tensors")
    assert(df.count() == 3)
    val row = df.filter(org.apache.spark.sql.functions.col("scene_id")
      .startsWith("LT05")).head()
    val tensor = row.getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](1)
    assert(tensor.length == 5)        // stations
    assert(tensor.head.length == 7)   // L5 bands
    assert(tensor.head.head.length == 49)
  }
}
