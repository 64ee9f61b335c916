# Container packaging for the exporter daemon (reference parity:
# Dockerfile:1-12 ships `python mb8600.py` on alpine; this image ships
# `python -m mb8600_clickhouse_spark` on a JVM-bearing base, since the
# engine runs on Spark).
#
# The daemon runs fine on local[*] inside one container (a modem poll
# is a trickle); against a real cluster, set SPARK_MASTER to the
# cluster URL (session.py reads it) or submit with spark-submit.
#
# Build / run:
#   docker build -t mb8600-clickhouse-spark .
#   docker run -e MODEM_URL=http://192.168.100.1 -e MODEM_USERNAME=admin \
#     -e MODEM_PASSWORD=... -e CLICKHOUSE_URL=http://ch:8123 \
#     -e CLICKHOUSE_USERNAME=... -e CLICKHOUSE_PASSWORD=... \
#     -e CLICKHOUSE_DATABASE=metrics mb8600-clickhouse-spark

FROM eclipse-temurin:17-jre-jammy

RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip tini \
    && rm -rf /var/lib/apt/lists/*

# pyspark pulls its own Spark distribution; pin to the engine's tested line
RUN pip3 install --no-cache-dir "pyspark>=4.0,<4.2" pyarrow pandas numpy

COPY mb8600_clickhouse_spark /app/mb8600_clickhouse_spark
WORKDIR /app

ENV PYTHONUNBUFFERED=1 \
    CHECKPOINT_DIR=/data/checkpoint
VOLUME ["/data"]

# tini forwards SIGTERM to python so the daemon's graceful-stop handler
# (streaming query stop + checkpoint flush) actually runs on `docker stop`
ENTRYPOINT ["tini", "--", "python3", "-m", "mb8600_clickhouse_spark"]
