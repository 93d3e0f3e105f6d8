from __future__ import annotations

import os
import sys

import pytest

from pagerank_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# google.protobuf is not pip-installed in this container, which
# skipped the four transformWithStateInPandas tests (the tws engine's
# driver worker imports StateMessage_pb2). The container DOES ship a
# protobuf runtime (6.32.0) inside the google-cloud-sdk app-engine
# platform dir; expose ONLY google/protobuf from it through a
# gitignored shim of per-file symlinks, with one local module
# (runtime_version.py) relaxing the gencode≤runtime minor-version
# check (pyspark 4.1.2's gencode is 6.33 — one minor ahead; the wire
# format is unchanged within a major, and the tws tests then pass).
# Must run at conftest IMPORT time: PYTHONPATH has to be set before
# the JVM (and its python workers) launch.
_PB_SRC = os.environ.get(
    "SPARK_GRAFT_PROTOBUF_DIR",
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf",
)
_PB_RUNTIME_VERSION_SHIM = '''\
"""Permissive runtime_version shim (tests only): the bundled runtime
(6.32) is one MINOR behind pyspark's gencode (6.33); within a major
version the wire format and generated-code API are stable, so accept
the skew instead of refusing to load. Major mismatch still raises."""
from enum import Enum


class Domain(Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


DOMAIN = Domain.PUBLIC
MAJOR = 6
MINOR = 32
PATCH = 0
SUFFIX = "-dev"
OSS_DOMAIN, OSS_MAJOR, OSS_MINOR, OSS_PATCH, OSS_SUFFIX = (
    DOMAIN, MAJOR, MINOR, PATCH, SUFFIX,
)


class VersionError(Exception):
    """Exception class for version violation."""


def ValidateProtobufRuntimeVersion(
    gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
):
    if gen_major != MAJOR:
        raise VersionError(
            f"protobuf gencode major {gen_major} != runtime {MAJOR} "
            f"({location})"
        )
'''


def _ensure_protobuf() -> None:
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    if not os.path.isfile(os.path.join(_PB_SRC, "descriptor.py")):
        return  # container variant without the cloud-sdk copy: the
        # tws tests keep their documented skip
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, ".tmp", "pb_shim", "google", "protobuf")
    os.makedirs(pkg, exist_ok=True)
    for entry in os.listdir(_PB_SRC):
        if entry in ("runtime_version.py", "__pycache__"):
            continue
        link = os.path.join(pkg, entry)
        if not os.path.lexists(link):
            os.symlink(os.path.join(_PB_SRC, entry), link)
    rv = os.path.join(pkg, "runtime_version.py")
    if not os.path.exists(rv):
        with open(rv, "w") as f:
            f.write(_PB_RUNTIME_VERSION_SHIM)
    shim = os.path.join(repo, ".tmp", "pb_shim")
    sys.path.append(shim)
    os.environ["PYTHONPATH"] = (
        shim + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)


_ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pagerank-mapreduce-spark-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
