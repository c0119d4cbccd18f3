package graft.runtime

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-oriented defaults the engine assumes:
  * AQE on (skew-join splitting + dynamic coalescing — the north rule calls
  * out mega-repo skew), shuffle partitions sized to cores in local mode
  * (a real cluster deployment would size them to 2-3× total cores).
  */
object Sessions {
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus
    ).getOrCreate()

  def configure(
      b: SparkSession.Builder,
      shufflePartitions: Int
  ): SparkSession.Builder =
    b.appName("graft-kg")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // shuffle/block scratch on tmpfs: the sandbox's /tmp is virtio-disk
      // backed, which serializes shuffle I/O and caps core scaling (on a
      // real cluster this is local NVMe / remote shuffle service)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark-local"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true")) // A/B knob: AQE query-stage
      // barriers add driver-serial replan latency per exchange; production
      // keeps AQE on (skew mandate) — the knob exists to quantify the cost
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // keep reduce-side parallelism pinned to the core count: without
      // this AQE coalesces small-data shuffles to a handful of 64MB-target
      // partitions, serializing every aggregate/join on a 32-core box
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
      .config("spark.default.parallelism", shufflePartitions.toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // ObjectHashAggregate (every TypedImperativeAggregate: KeepRowBy,
      // collect_set in the mention dedup) silently degrades to
      // SORT-based aggregation once the per-task hash map passes this
      // row count — Spark's default of 128 turns OHA into a sort on any
      // real group cardinality. Buffers here are bounded single rows
      // (winner row / context set), so the map is ~entries × row-width:
      // 2M × ~500B ≈ 1 GB per task worst-case. The scale contract is
      // that shuffle partition count grows with data so groups/partition
      // stays under this bound (parts = O(input bytes / target), not a
      // constant) — same sizing rule as every hash join build side.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("GRAFT_OHA_FALLBACK", "2097152"))
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
}
