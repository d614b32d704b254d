"""Test-only protobuf shim for transformWithStateInPandas execution.

pyspark ships the GENERATED ``pyspark/sql/streaming/proto/
StateMessage_pb2.py`` but not the ``protobuf`` runtime it needs, and
this container has no network to install the wheel. The google-cloud-sdk
on this image bundles a modern pure-Python runtime
(``google/protobuf`` 6.32.0 under ``platform/google_appengine``), which
is wire-compatible with the 6.33.0 gencode pyspark ships — one minor
version behind, which the runtime's strict ``gencode <= runtime`` check
rejects, so the check is relaxed here.

Activation: this directory is prepended to ``PYTHONPATH`` by
``tests/conftest.py`` BEFORE the SparkSession (and hence the JVM and
its Python workers) starts; Python's ``site`` machinery then imports
this module automatically in the driver and every worker process. It
no-ops when a real ``protobuf`` runtime is installed (real clusters),
or when the SDK copy is absent.

Detection detail: ``import google.protobuf`` succeeding is NOT proof of
a real runtime — Spark's TWS runner puts ``spark-core_*.jar`` on
``sys.path``, and the jar's bundled ``google/protobuf/*.proto``
RESOURCES satisfy the import as an empty namespace package. Probe for
``google.protobuf.descriptor`` instead, and purge the half-resolved
namespace modules before re-resolving against the SDK copy (a regular
package with ``__init__.py`` beats namespace portions at any path
position, but only on a fresh resolution).
"""

import os
import sys

_SDK = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _activate() -> None:
    try:
        from google.protobuf import descriptor  # noqa: F401 — real runtime
        return
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_SDK, "google", "protobuf")):
        return
    # Drop half-resolved resolutions of google(.protobuf) made before
    # the SDK path existed (e.g. the spark-core jar's namespace
    # portions) — but ONLY modules that resolved as NAMESPACE packages
    # (no __init__.py → module has no __file__). A regular already-
    # imported google.* package (google-cloud clients, say) must
    # survive: this file runs in EVERY process inheriting the test
    # PYTHONPATH, not just Spark workers, and nuking a live package
    # breaks its importers. Purging only namespace portions is also
    # sufficient: a regular google/__init__.py would beat the SDK copy
    # on re-resolution anyway, so deleting it buys nothing.
    for name in [
        m
        for m in list(sys.modules)
        if (m == "google" or m.startswith("google."))
        and getattr(sys.modules[m], "__file__", None) is None
    ]:
        del sys.modules[name]
    sys.path.append(_SDK)
    try:
        from google.protobuf import runtime_version as _rv

        # gencode 6.33 vs runtime 6.32: same major, wire-compatible;
        # the strict check would refuse to load StateMessage_pb2.
        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:
        pass


_activate()
