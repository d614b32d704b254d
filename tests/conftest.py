from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

# transformWithStateInPandas needs the `protobuf` runtime in DRIVER and
# WORKER processes; this container lacks the wheel but the
# google-cloud-sdk bundles a pure-Python copy. tools/pbshim/
# sitecustomize.py makes it importable; prepending it to PYTHONPATH
# here — BEFORE the JVM launches — propagates the shim to every Python
# worker (site imports sitecustomize automatically). No-op on real
# clusters where protobuf is properly installed.
_PBSHIM = os.path.join(os.path.dirname(__file__), "..", "tools", "pbshim")
_PBSHIM = os.path.abspath(_PBSHIM)
os.environ["PYTHONPATH"] = (
    _PBSHIM + os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH")
    else _PBSHIM
)

SF_SMOKE = os.environ.get("SPARK_GRAFT_SF_SMOKE", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from kmeans_mapreduce_spark.session import get_spark

    s = get_spark("kmeans-mapreduce-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
