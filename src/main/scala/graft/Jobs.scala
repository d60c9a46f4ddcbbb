package graft

/** Run independent Spark actions concurrently from the driver.
  *
  * Spark's scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because driver code calls
  * them sequentially. Overlapping independent actions lets one job's
  * task tail back-fill with the next job's tasks (FIFO scheduling gives
  * exactly that behavior), which matters most for sequences of small
  * store writes whose per-job scheduling overhead otherwise adds up.
  * Failures propagate like a sequential loop (the first failed task's
  * exception is rethrown).
  */
object Jobs {

  def mapConcurrently[A](tasks: Seq[() => A]): Seq[A] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(tasks.map(t => Future(t()))), Duration.Inf)
  }

  def runConcurrently(tasks: Seq[() => Unit]): Unit = {
    mapConcurrently(tasks)
    ()
  }
}
