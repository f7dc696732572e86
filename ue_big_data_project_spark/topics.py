"""Kafka topic administration (SURVEY §2.2 K6).

The reference ships a create-if-not-exists helper built on
kafka-python's AdminClient (reference: src/topics.py:10-67, called from
src/naolib_producer.py:215-229). This engine keeps the same capability
as an import-gated utility: the kafka client library is optional (this
container has none), and every operator works Kafka-less, so the gate
raises a clear, actionable error instead of an ImportError at call time.
"""

from __future__ import annotations


def ensure_topic(
    bootstrap_servers: str,
    name: str,
    num_partitions: int = 1,
    replication_factor: int = 1,
) -> bool:
    """Create ``name`` if it does not exist. Returns True if created,
    False if it already existed. Idempotent under concurrent callers
    (TopicAlreadyExists races are swallowed).

    Scale note: ``num_partitions`` bounds Spark's Kafka source
    parallelism (one task per partition) — size it to the consumer
    cluster, not the producer.
    """
    try:
        from kafka.admin import KafkaAdminClient, NewTopic
        from kafka.errors import TopicAlreadyExistsError
    except ImportError as e:
        raise RuntimeError(
            "ensure_topic needs the 'kafka-python' package; the engine "
            "runs Kafka-less otherwise (file/rate sources)"
        ) from e

    admin = KafkaAdminClient(bootstrap_servers=bootstrap_servers)
    try:
        if name in admin.list_topics():
            return False
        try:
            admin.create_topics(
                [
                    NewTopic(
                        name=name,
                        num_partitions=num_partitions,
                        replication_factor=replication_factor,
                    )
                ]
            )
            return True
        except TopicAlreadyExistsError:
            return False
    finally:
        admin.close()
