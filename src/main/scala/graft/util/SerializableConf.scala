package graft.util

import org.apache.hadoop.conf.Configuration

import java.io.{ObjectInputStream, ObjectOutputStream}

/** Hadoop `Configuration` is not java-serializable, so closures that need
  * filesystem access on executors (e.g. the distributed deletion-vector
  * writer) ship it wrapped in its own Writable encoding — the same trick
  * Spark uses internally for its broadcast Hadoop confs. */
class SerializableConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
