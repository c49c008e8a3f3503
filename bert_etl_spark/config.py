"""bert-etl.yaml job-config → Spark configuration mapping (SURVEY §2C).

The reference merges per-job YAML config ``every_lambda`` → ``<job_name>`` →
defaults (/root/reference bert/utils.py:64-307). This module reproduces the
merge semantics and maps each analytics-relevant key onto its Spark
equivalent; deploy-surface keys (IAM/KMS/Cognito/API) are recognized but
ignored, as SURVEY §2C prescribes.

| yaml key            | default | Spark mapping                                |
|---------------------|---------|----------------------------------------------|
| batch_size          | 100     | reader option maxFilesPerTrigger             |
| batch_size_delay    | 0       | trigger processingTime (seconds)             |
| timeout             | 900     | spark.task.maxDirectResultSize n/a → noted;  |
|                     |         | mapped to spark.network.timeout              |
| memory_size (MB)    | 128     | spark.executor.memory (validated ×64)        |
| workers             | ncpu    | spark.sql.shuffle.partitions                 |
| concurrency_limit   | 0       | spark.cores.max (0 = unlimited → unset)      |
| max-retries         | 10      | spark.task.maxFailures                       |
| environment         | {}      | spark.executorEnv.*                          |
"""

from __future__ import annotations

import os
from typing import Any

DEFAULTS: dict[str, Any] = {
    "batch_size": 100,
    "batch_size_delay": 0,
    "timeout": 900,
    "memory_size": 128,
    "workers": os.cpu_count() or 8,
    "concurrency_limit": 0,
    "max-retries": 10,
    "environment": {},
}

# recognized but deliberately unmapped (deploy surface, SURVEY §2C)
IGNORED_KEYS = frozenset(
    {"iam", "kms", "cognito", "api", "dynamodb", "events", "runtime",
     "requirements", "layers", "binary_paths", "invoke_args", "ignore",
     "identity_encoders", "queue_encoders", "queue_decoders"}
)


class ConfigError(ValueError):
    pass


def merge_job_config(
    every_job: dict | None, job: dict | None
) -> dict[str, Any]:
    """``every_lambda`` → ``<job>`` → defaults merge (reference order)."""
    merged = dict(DEFAULTS)
    for layer in (every_job or {}), (job or {}):
        for key, value in layer.items():
            if key in IGNORED_KEYS:
                continue
            merged[key] = value
    if merged["memory_size"] % 64 != 0:
        # reference validation: memory must be a multiple of 64 MB
        # (bert/utils.py:124-126)
        raise ConfigError(f"memory_size must be a multiple of 64: {merged['memory_size']}")
    return merged


def to_spark_confs(job_conf: dict[str, Any]) -> dict[str, str]:
    """Job config → Spark conf dict (feed to get_spark(extra_confs=…))."""
    confs: dict[str, str] = {
        "spark.sql.shuffle.partitions": str(job_conf["workers"]),
        "spark.task.maxFailures": str(job_conf["max-retries"]),
        "spark.executor.memory": f"{job_conf['memory_size']}m",
        "spark.network.timeout": f"{job_conf['timeout']}s",
    }
    if job_conf["concurrency_limit"]:
        confs["spark.cores.max"] = str(job_conf["concurrency_limit"])
    for key, value in job_conf.get("environment", {}).items():
        confs[f"spark.executorEnv.{key}"] = str(value)
    return confs


def to_reader_options(job_conf: dict[str, Any]) -> dict[str, Any]:
    """Streaming-source options from the batching keys (SURVEY §2A#28)."""
    opts: dict[str, Any] = {"maxFilesPerTrigger": job_conf["batch_size"]}
    if job_conf["batch_size_delay"]:
        opts["trigger_processing_time"] = f"{job_conf['batch_size_delay']} seconds"
    return opts
