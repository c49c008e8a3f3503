"""Pipeline composition — the Spark-native analog of ``bert.binding.follow``.

The reference chains jobs into a linear pipeline where each job's done-queue
feeds the next job's work-queue (`bert/binding.py:34-132`), materializing
every item through Redis/DynamoDB between stages. Here a "job" is a
``DataFrame -> DataFrame`` transformation and the chain is pure lazy plan
composition (`df.transform`): Catalyst fuses adjacent stages into single
whole-stage-codegen'd physical operators, so stage boundaries cost nothing
unless a shuffle is genuinely required.

Parity notes:
- ``follow(parent)`` reproduces the decorator wiring, including the reference
  rule "one child per parent" (`bert/binding.py:125-126`).
- ``follow(schema=...)`` reproduces the marshmallow-Schema ingest validation
  (`bert/binding.py:38,95-96`): the stage's input is conformed to the given
  StructType/DDL via ``DataFrame.to`` before the stage body runs — missing
  or incompatible columns fail at plan time (analysis), surplus columns are
  pruned, matching the reference's validate-before-invoke contract without
  a per-row Python pass.
- ``Pipeline.run`` reproduces ``build_job_chain`` ordering
  (`bert/binding.py:134-149`): topological = linear chain from the root.
- Unlike the reference there is NO per-stage materialization: an explicit
  ``checkpoint=`` hook gives the stage-cache / restart-at-job-N behavior of
  RedisCacheBackend (`bert/backends.py:27-113`) only when asked for.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from typing import Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import types as T

Transform = Callable[[DataFrame], DataFrame]
SchemaLike = Union[str, T.StructType]

# Registry of decorated jobs: name -> (fn, parent_name). Mirrors the
# reference's REGISTRY/DAISY_CHAIN module globals (`bert/binding.py:18-31`).
_REGISTRY: dict[str, tuple[Transform, Optional[str]]] = {}
_CHILDREN: dict[str, str] = {}


class PipelineError(Exception):
    pass


def conform(df: DataFrame, schema: SchemaLike) -> DataFrame:
    """Validate/conform a DataFrame to a schema at the stage boundary.

    Missing columns raise ``PipelineError`` (``DataFrame.to`` alone would
    silently null-fill them — validation must reject, like the reference's
    marshmallow check); present columns are reordered and safely cast via
    ``DataFrame.to``, which fails analysis on unsafe casts. Purely a plan
    rewrite — no data pass, so it is free at any scale.
    """
    target = (
        T._parse_datatype_string(schema) if isinstance(schema, str) else schema
    )
    missing = [f.name for f in target.fields if f.name not in df.columns]
    if missing:
        raise PipelineError(f"schema validation failed: missing columns {missing}")
    return df.to(target)


def follow(
    parent: Transform | str | None = None,
    schema: SchemaLike | None = None,
) -> Callable[[Transform], Transform]:
    """Declare that the decorated transform consumes ``parent``'s output.

    ``parent=None`` marks a root job (the reference's 'noop' space,
    `bert/binding.py:44`). ``schema`` (StructType or DDL string) validates
    the stage's INPUT before the body runs — the reference's
    ``follow(schema=marshmallow.Schema)`` ingest check.
    """
    parent_name = parent if isinstance(parent, str) or parent is None else parent.__name__

    def decorator(fn: Transform) -> Transform:
        if schema is not None:
            body = fn

            @functools.wraps(body)
            def fn(df: DataFrame) -> DataFrame:  # noqa: F811
                return body(conform(df, schema))

        name = fn.__name__
        if parent_name is not None:
            if parent_name not in _REGISTRY:
                raise PipelineError(f"unknown parent job: {parent_name}")
            if parent_name in _CHILDREN:
                # reference: "One child to parent per program"
                raise PipelineError(f"{parent_name} already has child {_CHILDREN[parent_name]}")
            _CHILDREN[parent_name] = name
        _REGISTRY[name] = (fn, parent_name)
        return fn

    return decorator


def build_job_chain() -> list[Transform]:
    """Ordered job list from the root — ``build_job_chain`` parity."""
    roots = [n for n, (_, p) in _REGISTRY.items() if p is None]
    if len(roots) != 1:
        raise PipelineError(f"expected exactly one root job, found {roots}")
    chain, name = [], roots[0]
    while name is not None:
        chain.append(_REGISTRY[name][0])
        name = _CHILDREN.get(name)
    return chain


def clear_registry() -> None:
    _REGISTRY.clear()
    _CHILDREN.clear()


class Pipeline:
    """Explicit (non-decorator) pipeline: an ordered list of transforms.

    ``checkpoint_dir`` enables per-stage parquet materialization — the analog
    of the reference's stage cache/replay (`bert/backends.py:27-113`) — useful
    when a stage is expensive and downstream stages will be iterated on.
    """

    def __init__(self, *stages: Transform, checkpoint_dir: str | None = None):
        self.stages: list[Transform] = list(stages)
        self.checkpoint_dir = checkpoint_dir

    def then(self, fn: Transform) -> "Pipeline":
        self.stages.append(fn)
        return self

    def run(self, df: DataFrame, checkpoint_stages: set[int] | None = None) -> DataFrame:
        for i, stage in enumerate(self.stages):
            df = df.transform(stage)
            if checkpoint_stages and i in checkpoint_stages:
                if self.checkpoint_dir is None:
                    raise PipelineError("checkpoint requested but no checkpoint_dir set")
                path = f"{self.checkpoint_dir}/stage_{i}"
                df.write.mode("overwrite").parquet(path)
                df = df.sparkSession.read.parquet(path)
        return df
