package graft.sources.connector

import java.nio.charset.StandardCharsets
import java.nio.file.Paths

/** Cross-language driver for the connector-sink 2PC protocol (the twin of
  * ConnectorDemo, pointed the other way): ships fixed batches through a
  * [[TwoPcSinkClient]] into an external sink process — the Python
  * `graft.experimental.TwoPCSinkConnector` in the cross-language test.
  * Pure JVM (no SparkSession): the client protocol is driver-side.
  *
  *   runMain graft.sources.connector.TwoPcSinkDemo <host> <port> <logDir> crash
  *     batch 0 commits, batch 1 dies after phase 1 (exit 3) — the torn
  *     window the recovery path must heal
  *   runMain graft.sources.connector.TwoPcSinkDemo <host> <port> <logDir> resume
  *     reconnects on the same txn log: batch 1 replays (recovery aborts
  *     the leftover txn first), batch 2 commits, exit 0
  */
object TwoPcSinkDemo {
  private def b(s: String) = s.getBytes(StandardCharsets.UTF_8)

  def main(args: Array[String]): Unit = {
    val Array(host, port, logDir, mode) = args.take(4)
    val client = new TwoPcSinkClient(host, port.toInt, "xlang",
      Paths.get(logDir))
    try mode match {
      case "crash" =>
        client.processBatch(0L, Iterator(b("alpha;"), b("beta;")))
        client.crashAfterPhase1 = true
        try {
          client.processBatch(1L, Iterator(b("gamma;")))
          sys.exit(1) // should have crashed
        } catch {
          // the "crash": drop the connection with the txn un-decided —
          // print a marker instead of a nonzero exit (sbt folds child
          // exit codes into its own status)
          case _: java.io.IOException => println("CRASH_OK")
        }
      case "resume" =>
        client.processBatch(1L, Iterator(b("gamma;")))
        client.processBatch(2L, Iterator(b("delta;")))
        println("RESUME_OK")
      case other => sys.error(s"unknown mode $other")
    } finally client.close()
  }
}
