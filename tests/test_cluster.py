"""Unit tests for the provisioning analogue (cluster.py) — the
spawn-knob → Spark-conf mapping, checked without starting a JVM."""

from __future__ import annotations

from ondemand_dask_spark.cluster import ClusterSpec, spec_to_conf


def test_cluster_mode_conf():
    spec = ClusterSpec(
        name="etl",
        cpu=8,
        ram_gb=32,
        workers=10,
        min_workers=2,
        max_workers=50,
        idle_expiry_minutes=15,
        local=False,
    )
    conf = spec_to_conf(spec)
    assert conf["spark.executor.cores"] == "8"
    assert conf["spark.executor.memory"] == "32g"
    assert conf["spark.executor.instances"] == "10"
    assert conf["spark.dynamicAllocation.enabled"] == "true"
    assert conf["spark.dynamicAllocation.minExecutors"] == "2"
    assert conf["spark.dynamicAllocation.maxExecutors"] == "50"
    # the self-delete-when-idle analogue
    assert conf["spark.dynamicAllocation.executorIdleTimeout"] == "900s"


def test_local_mode_drops_cluster_only_knobs():
    conf = spec_to_conf(ClusterSpec(local=True))
    assert "spark.executor.instances" not in conf
    assert not any(k.startswith("spark.dynamicAllocation") for k in conf)
    assert conf["spark.executor.cores"]  # sizing still expressed


def test_max_workers_defaults_to_4x():
    conf = spec_to_conf(ClusterSpec(workers=5, local=False))
    assert conf["spark.dynamicAllocation.maxExecutors"] == "20"
