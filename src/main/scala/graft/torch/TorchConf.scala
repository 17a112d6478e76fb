package graft.torch

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Session-scoped `torchfusion.*` configuration, mirroring the reference's
 * `TorchConfig` extension options (reference src/config.rs:1-105):
 * keys `torchfusion.device` / `torchfusion.cuda_device` /
 * `torchfusion.batch_size`, defaults cpu/0/1 (config.rs:15-23), with the
 * same validation rules (config.rs:38-57, 82-92): unknown keys rejected,
 * ints parsed strictly, and a device is only accepted when available —
 * this JVM build executes on CPU only, so cuda/mps/vulkan are rejected
 * like the reference rejects unavailable accelerators (config.rs:88-91).
 *
 * Spark's `SET` accepts arbitrary keys without hooks, so validation runs
 * when the configuration is READ (function creation time) and via
 * [[TorchConf.set]]; a created function keeps the device it was built
 * with, as documented by the reference (lib.rs:81-84).
 */
object TorchConf {
  val DeviceKey = "torchfusion.device"
  val CudaDeviceKey = "torchfusion.cuda_device"
  val BatchSizeKey = "torchfusion.batch_size"

  val DefaultDevice = "cpu"
  val DefaultCudaDevice = 0
  val DefaultBatchSize = 1

  final case class Conf(device: String, cudaDevice: Int, batchSize: Int)

  private val knownDevices = Set("cpu", "cuda", "mps", "vulkan")
  /** Devices usable in this build (JVM GEMM executes on CPU). */
  private val availableDevices = Set("cpu")

  /** Validate one key/value pair; throws IllegalArgumentException on bad
    * input, mirroring config.rs:38-57's error paths. */
  def validate(key: String, value: String): Unit = key match {
    case DeviceKey =>
      val d = value.trim.toLowerCase
      if (!knownDevices.contains(d))
        throw new IllegalArgumentException(
          s"$DeviceKey: unknown device '$value' (expected one of ${knownDevices.toSeq.sorted.mkString(", ")})")
      if (!availableDevices.contains(d))
        throw new IllegalArgumentException(
          s"$DeviceKey: device '$d' is not available on this platform")
    case CudaDeviceKey =>
      try value.trim.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"$CudaDeviceKey: expected an integer, got '$value'")
      }
    case BatchSizeKey =>
      val n =
        try value.trim.toInt
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"$BatchSizeKey: expected an integer, got '$value'")
        }
      if (n < 1)
        throw new IllegalArgumentException(s"$BatchSizeKey: must be >= 1, got $n")
    case other =>
      throw new IllegalArgumentException(s"unknown torchfusion configuration key: $other")
  }

  /** Validated set — the programmatic equivalent of `SET torchfusion.k = v`. */
  def set(spark: SparkSession, key: String, value: String): Unit = {
    validate(key, value)
    spark.conf.set(key, value)
  }

  /** Read the current (validated) configuration from the session. */
  def get(spark: SparkSession): Conf = {
    val device = spark.conf.get(DeviceKey, DefaultDevice)
    val cuda = spark.conf.get(CudaDeviceKey, DefaultCudaDevice.toString)
    val batch = spark.conf.get(BatchSizeKey, DefaultBatchSize.toString)
    validate(DeviceKey, device)
    validate(CudaDeviceKey, cuda)
    validate(BatchSizeKey, batch)
    Conf(device.trim.toLowerCase, cuda.trim.toInt, batch.trim.toInt)
  }

  /** The settings introspection rows: (name, value, description) — the
    * shape of `information_schema.df_settings` the reference exposes
    * (reference src/config.rs:59-78, examples/torchfusion.rs:19-22). */
  def settings(spark: SparkSession): DataFrame = {
    val c = get(spark)
    import spark.implicits._
    Seq(
      (BatchSizeKey, c.batchSize.toString, "Batch size to be used when processing rows"),
      (CudaDeviceKey, c.cudaDevice.toString, "CUDA device to use"),
      (DeviceKey, c.device, "Device to run model on (cpu, cuda, mps, vulkan)")
    ).toDF("name", "value", "description")
  }

  /** Register the `torchfusion_settings` view answering the reference's
    * introspection query shape (examples/torchfusion.rs:19-22). */
  def registerView(spark: SparkSession): Unit =
    settings(spark).createOrReplaceTempView("torchfusion_settings")
}
