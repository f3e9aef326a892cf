from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from birli_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("birli_spark_tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def gpubox_dir(tmp_path_factory):
    """The 24-file 1254670392 gpubox archive reconstructed bit-faithfully
    from the reference's own `none` dump (shared by the CLI golden
    acceptance modules — see tools/make_1254670392_fixture.py)."""
    from tools.make_1254670392_fixture import build
    dest = tmp_path_factory.mktemp("gpubox_1254670392")
    meta = build(str(dest))
    assert meta["n_scans"] == 2 and len(meta["paths"]) == 24
    return meta
