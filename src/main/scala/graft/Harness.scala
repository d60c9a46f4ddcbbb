package graft

/** Shared harness plumbing for the Bench/Verify mains. */
object Harness {
  /** Spark local dir for shuffle/spill: tmpfs when available (/tmp is
    * disk-backed on the harness machine and writeback caused multi-second
    * stalls), the JVM default tmpdir otherwise, `SPARK_GRAFT_LOCAL_DIR`
    * overriding both. */
  def localDir: String = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", {
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      "/dev/shm/spark-graft"
    else System.getProperty("java.io.tmpdir")
  })
}
