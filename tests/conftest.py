"""Shared pytest fixtures: one local SparkSession (Arrow on), engine
artifacts built once per session (SURVEY.md M0)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_task_offensive_language_detection_spark.artifacts_build import build_all
from multi_task_offensive_language_detection_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="mtold-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def artifacts():
    return build_all()


@pytest.fixture(scope="session")
def clips_fixture(tmp_path_factory):
    """(clips_dir, golden_path) — 2000-row unit tier, seed 42."""
    from tests.fixtures.clips_gen import write_clips_parquet

    d = tmp_path_factory.mktemp("clipsfx")
    return write_clips_parquet(str(d), n_rows=2000)
