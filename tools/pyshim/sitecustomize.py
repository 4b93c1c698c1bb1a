"""Test-environment shim: make ``google.protobuf`` importable for the
transformWithState Python runner (SURVEY B60).

This container ships no ``protobuf`` pip package, but a pure-Python
protobuf **6.32.0** runtime is present on disk inside the (public,
Apache/BSD-licensed) Google Cloud SDK at
``/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf``
with unmodified ``google.protobuf`` import paths. PySpark 4.1's generated
``StateMessage_pb2`` was built by protoc **6.33.0** and calls
``runtime_version.ValidateProtobufRuntimeVersion``, which hard-rejects a
runtime one minor version older even though the 6.32 -> 6.33 delta has no
descriptor/wire-format change that the StateMessage schema touches. So:

1. if ``google.protobuf`` is absent, append the SDK path;
2. wrap the validator to tolerate an older runtime **of the same major
   version only** (cross-major incompatibilities still raise).

Placed in its own directory so it only activates when that directory is
put on ``PYTHONPATH`` (tests/conftest.py does this BEFORE the SparkSession
launches, which is what propagates it into the Spark Python workers where
the stateful processor actually runs). Production deployments install the
real ``protobuf`` wheel and never load this file.
"""

import importlib.util
import os
import sys

_SDK = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _have_real_protobuf() -> bool:
    """True only for an actual protobuf runtime. A bare ``import
    google.protobuf`` succeeding is NOT enough: Spark workers put
    spark-core.jar on sys.path, whose ``google/protobuf/*.proto``
    resources import as an EMPTY namespace package (origin None)."""
    try:
        spec = importlib.util.find_spec("google.protobuf.descriptor")
    except (ImportError, ValueError):
        return False
    return spec is not None


def _activate() -> None:
    if _have_real_protobuf():
        return
    if not os.path.isdir(os.path.join(_SDK, "google", "protobuf")):
        return
    # drop any cached namespace-package resolution before re-importing
    sys.modules.pop("google.protobuf", None)
    sys.modules.pop("google", None)
    sys.path.append(_SDK)
    try:
        from google.protobuf import runtime_version as _rv
    except ImportError:
        return
    _orig = _rv.ValidateProtobufRuntimeVersion

    def _lenient(domain, major, minor, patch, suffix, location):
        try:
            _orig(domain, major, minor, patch, suffix, location)
        except _rv.VersionError:
            if major != _rv.MAJOR:  # cross-major: genuinely incompatible
                raise

    _rv.ValidateProtobufRuntimeVersion = _lenient


_activate()
