"""Locate a usable pure-Python ``google.protobuf`` runtime for the
transformWithStateInPandas state client.

The Spark 4 TWS Python worker speaks protobuf to the JVM state server
(pyspark/sql/streaming/proto/StateMessage_pb2.py). When the interpreter has
no installed ``protobuf`` distribution, a pure-Python runtime bundled with
other publicly distributed tooling on the host (e.g. the google-cloud-sdk's
app-engine platform ships the Apache-licensed protobuf package as a plain
``google/protobuf`` tree) works just as well — protobuf's pure-Python
implementation has no extension modules, so adding its parent directory to
``PYTHONPATH`` is a complete install for this purpose.

Version skew: pyspark 4.1.2's gencode is stamped 6.33.0; a located runtime
may be slightly older (6.32.0 on this host). Protobuf's own pre-registered
escape hatch for exactly this — the
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` environment variable read by
``google.protobuf.runtime_version.ValidateProtobufRuntimeVersion`` — skips
the gencode>=runtime guard; the descriptor wire format itself is stable
across these versions (proto3, no editions).

The env must be set BEFORE the JVM starts so Spark's Python workers (which
the JVM launches with its own inherited environment) can import the state
client too — hence the helper returns an env-var dict for a fresh
subprocess rather than mutating ``sys.path`` of a live session.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

# publicly distributed host locations that bundle a plain google/protobuf
# tree importable as-is (pure-Python runtime, no C extension needed)
_BUNDLED_RUNTIME_DIRS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]


def _importable_here() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def _validates(extra_env: dict[str, str]) -> bool:
    """Prove the candidate runtime actually loads pyspark's TWS gencode —
    a fresh interpreter with the candidate env, importing the real module
    the state client needs (not just the bare package)."""
    env = dict(os.environ)
    prior = env.get("PYTHONPATH", "")
    env.update(extra_env)
    if prior and "PYTHONPATH" in extra_env:
        env["PYTHONPATH"] = extra_env["PYTHONPATH"] + os.pathsep + prior
    try:
        out = subprocess.run(
            [
                sys.executable,
                "-c",
                "from pyspark.sql.streaming.proto import StateMessage_pb2 as m;"
                "assert m.StateRequest is not None; print('pb-ok')",
            ],
            capture_output=True,
            text=True,
            timeout=120,
            env=env,
        )
        return out.returncode == 0 and "pb-ok" in out.stdout
    except Exception:
        return False


def protobuf_runtime_env() -> dict[str, str] | None:
    """Env-var additions that make the TWS protobuf stack importable in a
    fresh process, or None if no usable runtime exists on this host.

    Returns {} when ``google.protobuf`` is already installed (nothing to
    add), a {PYTHONPATH, TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK} dict
    when a bundled pure-Python runtime is found and validated, else None.
    """
    if _importable_here():
        # validate the INSTALLED runtime too — the version-skew hazard this
        # module documents applies to it just the same (an installed 5.x
        # would import fine here and then crash on pyspark's 6.33 gencode
        # check inside the probe subprocess). If it fails as-is, retry with
        # the official skew escape before falling through to bundled copies.
        if _validates({}):
            return {}
        skew_escape = {"TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK": "true"}
        if _validates(skew_escape):
            return skew_escape
    for d in _BUNDLED_RUNTIME_DIRS:
        if not os.path.isfile(os.path.join(d, "google", "protobuf", "__init__.py")):
            continue
        candidate = {
            "PYTHONPATH": d,
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK": "true",
        }
        if _validates(candidate):
            return candidate
    return None
