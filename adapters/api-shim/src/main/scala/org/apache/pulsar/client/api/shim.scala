// COMPILE-TIME FACADE, NOT A PULSAR IMPLEMENTATION.
//
// This sandbox has zero network egress, so the real
// `org.apache.pulsar:pulsar-client` jar cannot resolve — but the Pulsar
// adapter in ../../../../../graft/streaming/pulsar must still be
// COMPILE-CHECKED or it rots (it used to live as prose in
// doc/pulsar-adapter.md). This file declares the exact subset of the
// PUBLIC Pulsar client API (https://pulsar.apache.org/api/client/) the
// adapter touches, with source-compatible signatures, so
// `sbt adapters/compile` type-checks the adapter for real.
//
// In production: DELETE this api-shim source directory and add the real
// dependency instead —
//   libraryDependencies += "org.apache.pulsar" % "pulsar-client" % "3.3.2"
// The adapter source compiles unchanged against the real jar; this shim
// must never be on a runtime classpath (its one entry point throws).
package org.apache.pulsar.client.api

import java.util.concurrent.TimeUnit

trait PulsarClient {
  def newProducer[T](schema: Schema[T]): ProducerBuilder[T]
  def close(): Unit
}

object PulsarClient {
  def builder(): ClientBuilder =
    throw new UnsupportedOperationException(
      "org.apache.pulsar.client.api shim: compile-time facade only — " +
        "replace the api-shim source dir with the real pulsar-client jar")
}

trait ClientBuilder {
  def serviceUrl(url: String): ClientBuilder
  def build(): PulsarClient
}

trait Schema[T]

object Schema {
  val BYTES: Schema[Array[Byte]] = new Schema[Array[Byte]] {}
}

trait ProducerBuilder[T] {
  def topic(topic: String): ProducerBuilder[T]
  def blockIfQueueFull(block: Boolean): ProducerBuilder[T]
  def enableBatching(enable: Boolean): ProducerBuilder[T]
  def batchingMaxMessages(n: Int): ProducerBuilder[T]
  def batchingMaxPublishDelay(delay: Long, unit: TimeUnit): ProducerBuilder[T]
  def create(): Producer[T]
}

trait Producer[T] {
  def newMessage(): TypedMessageBuilder[T]
  def flush(): Unit
  def close(): Unit
}

trait TypedMessageBuilder[T] {
  def key(key: String): TypedMessageBuilder[T]
  def value(value: T): TypedMessageBuilder[T]
  def send(): MessageId
}

trait MessageId
