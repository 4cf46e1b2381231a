package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed rows for the core tables — `Dataset[T]` accessors for callers
  * that want compile-time field safety (the DataFrame loaders in
  * [[Tables]] remain the schema-dynamic path). `ts` is the raw
  * nanosecond epoch Long (see GraftSession's nanosAsLong note).
  */
case class Event(event_id: Long, ts: Long, user_id: Long,
                 event_type: String, value: Double, props: String)

case class Document(doc_id: Long, text: String, lang: String,
                    source: String, n_chars: Long)

case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

object Models {
  def events(s: SparkSession, dir: String): Dataset[Event] = {
    import s.implicits._
    Tables.events(s, dir).as[Event]
  }

  def documents(s: SparkSession, dir: String): Dataset[Document] = {
    import s.implicits._
    Tables.documents(s, dir).as[Document]
  }

  def embeddings(s: SparkSession, dir: String): Dataset[Embedding] = {
    import s.implicits._
    Tables.embeddings(s, dir).as[Embedding]
  }
}
