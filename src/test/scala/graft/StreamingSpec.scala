package graft

import java.nio.file.Files
import graft.model.CodeFile
import graft.streaming.StreamingIngest

class StreamingSpec extends SparkSpec {
  test("streaming ingest + compaction equals the batch pipeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("stream-out").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString

    val files = graft.corpus.CorpusGen.generate(spark, 80).collect().toSeq
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CodeFile]
    // two micro-batches
    source.addData(files.take(40))
    val q = StreamingIngest.run(source.toDS(), out, ckpt)
    q.awaitTermination()
    source.addData(files.drop(40))
    val q2 = StreamingIngest.run(source.toDS(), out, ckpt)
    q2.awaitTermination()

    val streamed = StreamingIngest.compact(spark, out)
      .as[(String, String, String)].collect().toSet
    val batch = graft.pipeline.KgPipeline.runSynthetic(spark, 80)
      .tripleSet.as[(String, String, String)].collect().toSet
    assert(streamed == batch)
  }
}
