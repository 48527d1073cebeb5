"""Shared fixtures. Ray is initialized ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from pdf_extraction_ray.config import tune_data_context
    tune_data_context()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def documents_rows():
    import pyarrow.parquet as pq
    return pq.read_table(os.path.join(SF_SMOKE, "documents.parquet")).to_pylist()


@pytest.fixture(scope="session")
def pages_corpus(ray_session):
    from pdf_extraction_ray.sources.corpus import ensure_pages_corpus
    return ensure_pages_corpus(SF_SMOKE)
