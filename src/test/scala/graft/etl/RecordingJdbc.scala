package graft.etl

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** Recording fake JDBC endpoint (test seam for the executed sink
  * path): dynamic proxies over java.sql.Connection/PreparedStatement
  * that record every prepared SQL string, bound parameter row, and
  * executed batch size into JVM-static queues. local[*] executors
  * share the JVM, so executor-side `foreachPartition` writes are
  * visible to test assertions — the no-DB stand-in for a real
  * postgres/timescale endpoint. */
object RecordingJdbc {
  final case class Exec(sql: String, rows: Int)

  val execs = new ConcurrentLinkedQueue[Exec]()
  val paramRows = new ConcurrentLinkedQueue[(String, Vector[Any])]()
  val connectionsOpened = new AtomicInteger(0)

  def clear(): Unit = { execs.clear(); paramRows.clear(); connectionsOpened.set(0) }

  class Factory extends Sinks.ConnectionFactory {
    override def connect(): Connection = newConnection()
  }

  def newConnection(): Connection = {
    connectionsOpened.incrementAndGet()
    proxy[Connection](new ConnHandler)
  }

  private def proxy[T](h: InvocationHandler)(implicit ct: scala.reflect.ClassTag[T]): T =
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(ct.runtimeClass), h).asInstanceOf[T]

  private def defaultValue(m: Method): AnyRef = m.getReturnType match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
    case _ => null
  }

  private final class ConnHandler extends InvocationHandler {
    override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
      case "prepareStatement" =>
        proxy[PreparedStatement](new StatementHandler(args(0).asInstanceOf[String]))
      case "close" | "commit" | "rollback" | "setAutoCommit" => null
      case "isClosed" => java.lang.Boolean.FALSE
      case "toString" => "RecordingJdbc.Connection"
      case _ => defaultValue(m)
    }
  }

  private final class StatementHandler(sql: String) extends InvocationHandler {
    private val current = scala.collection.mutable.Map[Int, Any]()
    private var batched = 0

    override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
      case "setObject" | "setString" | "setLong" | "setInt" | "setDouble" | "setTimestamp" =>
        current(args(0).asInstanceOf[Integer].intValue()) = args(1)
        null
      case "setNull" =>
        current(args(0).asInstanceOf[Integer].intValue()) = null
        null
      case "addBatch" =>
        paramRows.add(sql -> current.toSeq.sortBy(_._1).map(_._2).toVector)
        batched += 1
        null
      case "executeBatch" =>
        execs.add(Exec(sql, batched))
        val r = Array.fill(batched)(1)
        batched = 0
        r
      case "executeUpdate" =>
        execs.add(Exec(sql, 1))
        Integer.valueOf(1)
      case "close" | "clearParameters" | "clearBatch" => null
      case "toString" => s"RecordingJdbc.Statement($sql)"
      case _ => defaultValue(m)
    }
  }
}
