"""Cluster provisioning analogue (SURVEY §3.3).

The reference's own code is control-plane: bake an image, `spawn` a
sized cluster on demand, auto-delete after an idle expiry.  On Spark
every one of those behaviors is CONFIGURATION, not code — this module
maps the reference's spawn-style knobs onto the Spark configs that
realize them, so a reference user gets the same lifecycle with the
same call shape:

| reference knob            | Spark realization                         |
| ------------------------- | ----------------------------------------- |
| spawn(name, cpu, ram)     | executor instances / cores / memory       |
| scale with workload       | dynamic allocation + shuffle tracking     |
| self-delete when idle     | executorIdleTimeout (executors), driver   |
|                           | exit releases the app (cluster level)     |
| client connects remotely  | Spark Connect (`sc://host`) in Spark 4    |

Locally (this container) `spawn` sizes `local[cpu]`; the emitted conf
dict is identical to what a cluster deployment would pass, so the
mapping is testable without a cluster.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from ondemand_dask_spark.session import build_session


@dataclass(frozen=True)
class ClusterSpec:
    """The reference's spawn(...) parameters, Spark-shaped."""

    name: str = "ondemand-spark"
    cpu: int = 4                 # cores per executor (local: total threads)
    ram_gb: int = 8              # memory per executor
    workers: int = 2             # executor instances (cluster mode)
    min_workers: int = 0         # dynamic-allocation floor
    max_workers: int | None = None  # dynamic-allocation ceiling
    idle_expiry_minutes: int = 10   # self-delete-when-idle analogue
    local: bool = True           # this container has no cluster manager


def spec_to_conf(spec: ClusterSpec) -> dict[str, str]:
    """The Spark conf realizing a spawn() request.  Pure function —
    unit-testable without starting a JVM."""
    conf = {
        "spark.executor.cores": str(spec.cpu),
        "spark.executor.memory": f"{spec.ram_gb}g",
        "spark.executor.instances": str(spec.workers),
        # scale-with-workload + idle self-release (the reference's
        # expiry monitor, built in):
        "spark.dynamicAllocation.enabled": "true",
        "spark.dynamicAllocation.shuffleTracking.enabled": "true",
        "spark.dynamicAllocation.minExecutors": str(spec.min_workers),
        "spark.dynamicAllocation.maxExecutors": str(
            spec.max_workers if spec.max_workers is not None else spec.workers * 4
        ),
        "spark.dynamicAllocation.executorIdleTimeout": (
            f"{spec.idle_expiry_minutes * 60}s"
        ),
    }
    if spec.local:
        # No cluster manager here: dynamic allocation is meaningless
        # (and noisy) on local[*]; sizing folds into the master url.
        conf = {
            k: v for k, v in conf.items() if not k.startswith("spark.dynamicAllocation")
        }
        conf.pop("spark.executor.instances")
    return conf


def spawn(spec: ClusterSpec | None = None) -> SparkSession:
    """Reference `spawn(name, cpu, ram, ..., expired=...)` → a
    configured SparkSession."""
    spec = spec or ClusterSpec()
    master = f"local[{spec.cpu}]" if spec.local else None
    return build_session(
        app_name=spec.name, master=master, extra_conf=spec_to_conf(spec)
    )


def teardown(spark: SparkSession) -> None:
    """Reference instance deletion → release the application."""
    spark.stop()
