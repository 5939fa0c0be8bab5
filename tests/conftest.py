"""Shared fixtures: one session-scoped SparkSession + small synthetic tables."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from webscraping_video_pipeline_spark import schemas, synth
from webscraping_video_pipeline_spark.session import get_spark

N_PAGES = 1200
N_SEEDS = 300


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages(spark):
    return spark.createDataFrame(synth.gen_pages_pdf(N_PAGES), schema=schemas.PAGES).cache()


@pytest.fixture(scope="session")
def seeds(spark):
    return spark.createDataFrame(
        synth.gen_seeds_pdf(N_SEEDS, N_PAGES), schema=schemas.SEEDS
    ).cache()


@pytest.fixture(scope="session")
def host_policy(spark):
    return spark.createDataFrame(synth.gen_host_policy_pdf(N_PAGES), schema=schemas.HOST_POLICY)


@pytest.fixture(scope="session")
def robots_cache(spark):
    return spark.createDataFrame(synth.gen_robots_pdf(N_PAGES), schema=schemas.ROBOTS_CACHE)


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="wvp_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
