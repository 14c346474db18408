"""Protobuf runtime fallback for ``transformWithStateInPandas``.

PySpark's v2 stateful API talks to the JVM state server via generated
protobuf messages (``pyspark/sql/streaming/proto/StateMessage_pb2``),
so it needs the ``google.protobuf`` runtime — not installed in this
image. The Google Cloud SDK present on the machine vendors a complete
pure-Python protobuf under the ``cloudsdk.google.protobuf`` namespace;
this module aliases it into ``google.protobuf`` and shims the
``runtime_version`` gate (added in protobuf 5.x, absent in the vendored
4.23) whose only effect is a version check.

The alias must be installed in the PYTHON WORKER too: PySpark imports
``StateMessage_pb2`` lazily inside the state-client methods (NOT at
``pyspark/worker.py`` import), which runs after the worker has
unpickled the StatefulProcessor — and unpickling imports
``streaming.stateful_v2``, whose module top calls
:func:`ensure_protobuf`. That ordering is what makes a driver-side-only
repo able to ungate a worker-side dependency.

If neither a real protobuf nor the vendored copy is importable,
:func:`ensure_protobuf` returns False and the v2 operator stays gated
behind its documented capability error.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

_CLOUDSDK_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"


def _have_real_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable; True on success. Idempotent."""
    if _have_real_protobuf():
        return True
    vendored = os.path.join(_CLOUDSDK_THIRD_PARTY, "cloudsdk", "google", "protobuf")
    if not os.path.isdir(vendored):
        return False
    if _CLOUDSDK_THIRD_PARTY not in sys.path:
        sys.path.append(_CLOUDSDK_THIRD_PARTY)
    try:
        cloud_pb = importlib.import_module("cloudsdk.google.protobuf")
    except ImportError:
        return False
    google = sys.modules.get("google")
    if google is None:
        # import the REAL `google` namespace package if one exists (other
        # google-* distributions may provide it); a synthetic module with
        # an empty __path__ would shadow them and break every later
        # `import google.x` in this process
        try:
            google = importlib.import_module("google")
        except ImportError:
            google = types.ModuleType("google")
            google.__path__ = []
            sys.modules["google"] = google
    sys.modules["google.protobuf"] = cloud_pb
    google.protobuf = cloud_pb
    if not hasattr(cloud_pb, "runtime_version"):
        rv = types.ModuleType("google.protobuf.runtime_version")

        class _Domain:
            GOOGLE_INTERNAL = 1
            PUBLIC = 2

        rv.Domain = _Domain
        rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        sys.modules["google.protobuf.runtime_version"] = rv
        cloud_pb.runtime_version = rv
    return _have_real_protobuf()
