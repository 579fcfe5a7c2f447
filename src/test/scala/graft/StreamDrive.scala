package graft

/** Manual end-to-end drive of the streaming surface (not a test):
  * stages events into a dir, runs the tumbling streaming job through a
  * real FileStreamSource → memory sink, prints observed output.
  * Run: sbt "Test/runMain graft.StreamDrive"
  */
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkFixture.spark
    val dir = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"), "graft_drive_events")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkFixture.sf, "events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val out = graft.streaming.StreamingJobs.tumbling(spark, dir.toString, "drive_tumbling")
    println(s"[drive] tumbling rows=${out.count()}")
    out.orderBy("user_id", "win_start").show(5, truncate = false)
    val sess = graft.streaming.StreamingJobs.sessionWindows(spark, dir.toString, "drive_session")
    println(s"[drive] session rows=${sess.count()}")
    spark.stop()
  }
}
