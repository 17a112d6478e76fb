package graft.torch

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Validation semantics of reference src/config.rs:38-57, 82-92. */
class TorchConfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("defaults are cpu/0/1 (config.rs:15-23)") {
    spark.conf.unset(TorchConf.DeviceKey)
    spark.conf.unset(TorchConf.CudaDeviceKey)
    spark.conf.unset(TorchConf.BatchSizeKey)
    assert(TorchConf.get(spark) == TorchConf.Conf("cpu", 0, 1))
  }

  test("unknown key rejected") {
    intercept[IllegalArgumentException](TorchConf.validate("torchfusion.bogus", "1"))
  }

  test("non-int batch_size / cuda_device rejected (config.rs:46-53)") {
    intercept[IllegalArgumentException](TorchConf.validate(TorchConf.BatchSizeKey, "abc"))
    intercept[IllegalArgumentException](TorchConf.validate(TorchConf.BatchSizeKey, "0"))
    intercept[IllegalArgumentException](TorchConf.validate(TorchConf.CudaDeviceKey, "x"))
  }

  test("unknown device rejected; unavailable device rejected (config.rs:82-92)") {
    intercept[IllegalArgumentException](TorchConf.validate(TorchConf.DeviceKey, "tpu"))
    intercept[IllegalArgumentException](TorchConf.validate(TorchConf.DeviceKey, "cuda"))
    TorchConf.validate(TorchConf.DeviceKey, "cpu") // ok
  }

  test("SET via SQL then read-back; settings view shape") {
    spark.sql(s"SET ${TorchConf.BatchSizeKey}=8")
    assert(TorchConf.get(spark).batchSize == 8)
    TorchConf.registerView(spark)
    val rows = spark.sql(
      "SELECT name, value FROM torchfusion_settings WHERE name LIKE 'torchfusion%' ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(
      (TorchConf.BatchSizeKey, "8"),
      (TorchConf.CudaDeviceKey, "0"),
      (TorchConf.DeviceKey, "cpu")))
    spark.conf.unset(TorchConf.BatchSizeKey)
  }

  test("function creation fails under an invalid session config") {
    spark.conf.set(TorchConf.BatchSizeKey, "not_a_number")
    intercept[IllegalArgumentException] {
      Torch.createFunction(spark, "bad_fn", "/root/reference/model/iris.spt")
    }
    spark.conf.unset(TorchConf.BatchSizeKey)
  }
}
