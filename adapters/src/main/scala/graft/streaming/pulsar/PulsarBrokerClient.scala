package graft.streaming.pulsar

import org.apache.pulsar.client.api.{Producer, PulsarClient, Schema}

import graft.streaming.{BrokerClient, BrokerProducer}

/** pulsar::Client behind graft's broker SPI — the drop-in vendor adapter
  * for a real Pulsar deployment (the analogue of bolson's producer setup,
  * reference: src/bolson/publish/publisher.cpp:55-77 — client create,
  * producer create with topic, synchronous send, flush/close).
  * `url` ≙ bolson --pulsar-url.
  *
  * Compile-gated here against the api-shim facade (`sbt
  * adapters/compile`; see adapters/api-shim — the zero-egress sandbox
  * cannot resolve the real pulsar-client jar). In production, drop the
  * shim and add `"org.apache.pulsar" % "pulsar-client" % "3.3.2"`; this
  * source compiles unchanged.
  *
  * The factory closure (`() => new PulsarBrokerClient(url)`) is created
  * driver-side and invoked inside each partition task
  * (BrokerPublisher.open), so the PulsarClient itself is never
  * serialized — only the url string is. */
final class PulsarBrokerClient(url: String) extends BrokerClient {
  @transient private lazy val client: PulsarClient =
    PulsarClient.builder().serviceUrl(url).build()

  override def createProducer(topic: String): BrokerProducer = {
    val p: Producer[Array[Byte]] = client.newProducer(Schema.BYTES)
      .topic(topic)                       // ≙ --pulsar-topic
      .blockIfQueueFull(true)
      // graft's BatchingFilePublisher knobs map 1:1 onto the client's
      // native batching (≙ bolson --pulsar-batch-max-*); disable here if
      // you wrap this producer in BatchingOptions instead
      .enableBatching(true)
      .batchingMaxMessages(1000)
      .batchingMaxPublishDelay(10, java.util.concurrent.TimeUnit.MILLISECONDS)
      .create()
    new BrokerProducer {
      override def send(key: String, payload: Array[Byte]): Unit = {
        // synchronous, throws on broker error — that exception failing
        // the partition task is WHAT gives at-least-once + idempotent
        // replay (see BrokerSemanticsSpec); do not swallow it
        p.newMessage().key(key).value(payload).send(); ()
      }
      override def flush(): Unit = p.flush()
      override def close(): Unit = p.close()
    }
  }

  override def close(): Unit = client.close()
}
