package graft.tools
import org.apache.spark.sql.SparkSession
object Q46Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = graft.queries.Media.q46AudioDecode(spark, dir).count()
      println(f"q46 sweep $i: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    // isolate: encode+decode 6000 wavs single-threaded, no spark
    val t0 = System.nanoTime()
    var i = 0L
    while (i < 6000) {
      val nS = (64 + i % 64).toInt
      val samples = Array.tabulate(nS)(j => (((i * 31 + j.toLong * 17) % 65536) - 32768).toShort)
      graft.multimodal.Multimodal.decodeWav(graft.multimodal.Multimodal.encodeWav(samples, 8000, 1)).get
      i += 1
    }
    println(f"raw 6000 encode+decode single-thread: ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
