"""Scale gate for the kafka_py fallback reader (round 13).

Measures the Spark-side batch read wall against tools/minikafka.py:

1. 1x vs 10x record volume on an 8-partition topic (fixed cores) — the
   standing at-or-below-linear criterion;
2. the same 10x volume on a 1-partition topic — isolates what the
   one-InputPartition-per-Kafka-partition fan-out buys (at 100 TB the
   fan-out IS the design: a 1000-partition topic becomes 1000 tasks);
3. verifyCrc=false on the 8-partition 10x read — the documented
   throughput opt-out (pure-Python CRC32C dominates decode otherwise).

Usage: python tools/scale_kafka_py.py  (prints a markdown table row set)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from feathub_spark import default_spark_session  # noqa: E402
from feathub_spark.common.kafkawire import KafkaWireClient  # noqa: E402
from feathub_spark.processors.spark.kafka_python_source import (  # noqa: E402
    ensure_kafka_py_registered,
)
from tools.minikafka import MiniKafkaBroker  # noqa: E402

N_1X = 15_000
N_10X = 150_000
PARTS = 8
BATCH = 2_000


def produce(client: KafkaWireClient, topic: str, n: int, parts: int) -> None:
    per = [[] for _ in range(parts)]
    for i in range(n):
        per[i % parts].append(
            (b"k%08d" % i, b"v" * 40 + b"%08d" % i, 1_700_000_000_000 + i)
        )
    for p, recs in enumerate(per):
        for off in range(0, len(recs), BATCH):
            client.produce(topic, p, recs[off : off + BATCH])


def timed_read(spark, bootstrap: str, topic: str, n_expected: int, **opts) -> float:
    reader = (
        spark.read.format("kafka_py")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    walls = []
    for _ in range(3):
        t0 = time.time()
        assert reader.load().count() == n_expected
        walls.append(time.time() - t0)
    walls.sort()
    return walls[1]  # median of 3


def main() -> None:
    spark = default_spark_session("scale_kafka_py", cpus=8)
    ensure_kafka_py_registered(spark)
    with MiniKafkaBroker(num_partitions=PARTS) as broker:
        client = KafkaWireClient.from_bootstrap(broker.bootstrap)
        t0 = time.time()
        produce(client, "t1x", N_1X, PARTS)
        produce(client, "t10x", N_10X, PARTS)
        broker.create_topic("t10x_p1", partitions=1)
        produce(client, "t10x_p1", N_10X, 1)
        client.close()
        print(f"# produce setup: {time.time() - t0:.1f}s")
        w1 = timed_read(spark, broker.bootstrap, "t1x", N_1X)
        w10 = timed_read(spark, broker.bootstrap, "t10x", N_10X)
        w10_p1 = timed_read(spark, broker.bootstrap, "t10x_p1", N_10X)
        w10_nocrc = timed_read(
            spark, broker.bootstrap, "t10x", N_10X, verifyCrc="false"
        )
        print("| path | records | wall (s) | note |")
        print("|---|---|---|---|")
        print(f"| 8-partition read, 1x | {N_1X:,} | {w1:.2f} | |")
        print(
            f"| 8-partition read, 10x | {N_10X:,} | {w10:.2f} | "
            f"{w10 / w1:.2f}x wall on 10x data |"
        )
        print(
            f"| 1-partition read, 10x | {N_10X:,} | {w10_p1:.2f} | "
            f"fan-out speedup {w10_p1 / w10:.1f}x |"
        )
        print(
            f"| 8-partition read, 10x, verifyCrc=false | {N_10X:,} | "
            f"{w10_nocrc:.2f} | {w10 / w10_nocrc:.1f}x vs CRC-on |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
