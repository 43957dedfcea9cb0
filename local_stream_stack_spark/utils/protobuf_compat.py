"""Locate a usable ``google.protobuf`` runtime when none is installed.

Spark 4's ``transformWithStateInPandas`` Python runner speaks a
protobuf wire protocol to the JVM state server
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``), so it needs the
protobuf runtime in BOTH the driver and the Python workers. Some
environments have no ``protobuf`` wheel installed but do carry a
pure-Python runtime bundled inside other public software (the Google
Cloud SDK ships one under ``platform/google_appengine``). This module
probes for such a bundle and wires it up:

* driver side: inserts the bundle onto ``sys.path``;
* worker side: prepends it to ``PYTHONPATH`` in ``os.environ`` — in
  local mode the JVM (and therefore every Python worker it forks)
  inherits the driver process environment, so this works IF it happens
  before the first SparkSession starts (call :func:`enable_protobuf`
  at import time in test entry points);
* version skew: a bundle one minor version older than PySpark's
  gencode trips protobuf's runtime check; protobuf's own documented
  escape hatch (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true``)
  is set alongside. Message (de)serialization is wire-stable across
  that skew, which is all the state protocol needs.

Override the probe list with ``LSS_PROTOBUF_BUNDLE=/path/to/dir``
(the directory CONTAINING the ``google`` package).
"""

from __future__ import annotations

import os
import sys

_PROBE_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
    "/usr/local/google-cloud-sdk/platform/google_appengine",
)


def have_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def find_protobuf_bundle() -> str | None:
    """First directory containing a ``google/protobuf`` runtime."""
    candidates = []
    env = os.environ.get("LSS_PROTOBUF_BUNDLE")
    if env:
        candidates.append(env)
    candidates.extend(_PROBE_DIRS)
    for d in candidates:
        if os.path.isfile(
            os.path.join(d, "google", "protobuf", "__init__.py")
        ):
            return d
    return None


def enable_protobuf() -> bool:
    """Make ``google.protobuf`` importable in the driver and (if called
    before the first SparkSession) in the Python workers. Returns True
    iff the runtime is available afterwards. Idempotent."""
    if have_protobuf():
        return True
    bundle = find_protobuf_bundle()
    if bundle is None:
        return False
    if bundle not in sys.path:
        sys.path.insert(0, bundle)
    prev = os.environ.get("PYTHONPATH", "")
    if bundle not in prev.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            bundle + ((os.pathsep + prev) if prev else "")
        )
    # protobuf's documented escape hatch for gencode-newer-than-runtime
    # skew; must equal the literal string 'true'
    os.environ.setdefault(
        "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
    )
    return have_protobuf()
