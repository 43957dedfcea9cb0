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


_SHIP_ATTR = "_lss_protobuf_shipped"


def ship_protobuf_bundle(spark) -> bool:
    """Make ``google.protobuf`` importable in driver AND workers of an
    ALREADY-RUNNING SparkSession. Returns True iff the runtime is
    usable on both sides afterwards.

    ``enable_protobuf``'s PYTHONPATH route only reaches workers when it
    runs before the JVM starts — useless for an externally-created
    session (the driver-contract case). This route works at any time:
    the bundle's pure-Python ``google/protobuf`` tree is zipped (with a
    synthesized ``google/__init__.py`` — the on-disk bundle relies on
    an implicit namespace package, which zipimport does not resolve)
    and shipped via ``addPyFile``; every Python worker prepends shipped
    files to sys.path per task, so the import resolves no matter when
    the session started. The version-skew escape hatch travels to
    workers via ``spark.executorEnv``-independent means: protobuf reads
    it from the environment, which local-mode workers inherit from the
    JVM, so for remote executors set it in spark-env; the driver-side
    variable is set here either way (harmless when already set)."""
    if have_protobuf():
        # importable in THIS process — but only a real installed wheel
        # is also visible to separately-spawned python processes. If
        # the import resolves from the probed bundle (enable_protobuf
        # ran earlier and inserted it into OUR sys.path), workers and
        # the streaming driver-runner still know nothing: fall through
        # and ship. (This exact aliasing bit once: supported() ran
        # first, have_protobuf() turned true, and the early return
        # skipped the env plumbing.)
        from google import protobuf as _pb

        src = getattr(_pb, "__file__", "") or ""
        bundle_now = find_protobuf_bundle()
        if not (bundle_now and src.startswith(bundle_now + os.sep)):
            return True  # real wheel
    if not enable_protobuf():
        return False  # no bundle on disk at all
    sc = spark.sparkContext
    if getattr(sc, _SHIP_ATTR, False):
        return True
    bundle = find_protobuf_bundle()
    if bundle is None:
        return False
    # Primary route: sc.environment entries become the envVars of
    # every PythonFunction created AFTER this call, and Spark applies
    # them when spawning Python processes — including the
    # StreamingPythonRunner that transformWithState launches on the
    # DRIVER node (which ignores addPyFile includes; verified
    # empirically: the zip route alone leaves it without protobuf).
    # Driver-local paths are fine there because that runner always
    # runs where this bundle was found.
    prev_pp = sc.environment.get("PYTHONPATH", "")
    if bundle not in prev_pp.split(os.pathsep):
        sc.environment["PYTHONPATH"] = (
            bundle + ((os.pathsep + prev_pp) if prev_pp else "")
        )
    sc.environment.setdefault(
        "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
    )
    import tempfile
    import zipfile

    zpath = os.path.join(
        tempfile.mkdtemp(prefix="lss-protobuf-"), "lss_protobuf_runtime.zip"
    )
    src = os.path.join(bundle, "google")
    with zipfile.ZipFile(zpath, "w") as zf:
        # the synthesized package init also plants protobuf's
        # documented version-skew escape hatch INSIDE the worker
        # process at import time — post-JVM-start os.environ edits in
        # the driver never reach forked workers, but this line runs
        # wherever the shipped package is imported
        zf.writestr(
            "google/__init__.py",
            "import os as _os\n"
            "_os.environ.setdefault("
            "'TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK', 'true')\n",
        )
        for root, _dirs, files in os.walk(os.path.join(src, "protobuf")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(
                        full,
                        os.path.relpath(full, os.path.dirname(src)),
                    )
    sc.addPyFile(zpath)
    setattr(sc, _SHIP_ATTR, True)
    return True
